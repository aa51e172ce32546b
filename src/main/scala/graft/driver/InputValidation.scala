package graft.driver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11 — input validation (`run_RNApipeline_pairedG8_diskGuard.bash:58-72`):
  *   - BioProject ID must contain only `[a-zA-Z0-9_-]` (path-injection guard),
  *   - read length must match `^[0-9]+$`,
  *   - the accession-list path must exist.
  *
  * Two surfaces: scalar checks for driver-side argument handling (the reference's
  * usage/exit-1 path) and a column predicate pair for validating a whole
  * project-list frame relationally.
  */
object InputValidation {

  private val ProjectIdRe = "^[a-zA-Z0-9_-]+$"
  private val ReadLenRe = "^[0-9]+$"

  /** Scalar arg check; Left(message) mirrors the reference's ERROR lines. */
  def validateArgs(bioProjectId: String, readLength: String,
                   accListExists: Boolean = true): Either[String, (String, Int)] =
    if (!accListExists)
      Left("ERROR: Accession list file not found")
    else if (bioProjectId.isEmpty || !bioProjectId.matches(ProjectIdRe))
      Left("ERROR: Invalid characters in BioProject ID. Only alphanumeric, underscore, and hyphen allowed.")
    else if (!readLength.matches(ReadLenRe))
      Left("ERROR: Read length must be a positive integer")
    else
      // digits-only strings longer than Int.MaxValue still overflow toInt
      scala.util.Try(readLength.toInt).toOption match {
        case Some(n) if n > 0 => Right((bioProjectId, n))
        case _ => Left("ERROR: Read length must be a positive integer")
      }

  /** Column predicate: is this a legal BioProject ID? */
  def validProjectId(c: Column): Column = c.isNotNull && c.rlike(ProjectIdRe)

  /** Column predicate: is this a legal read length (digits only)? */
  def validReadLength(c: Column): Column =
    c.isNotNull && c.cast("string").rlike(ReadLenRe)

  /** Flag every project-list row (columns `project`, `read_length`) with
    * `valid` + a `reject_reason` matching the reference's error precedence. */
  def flagProjectList(projectList: DataFrame): DataFrame =
    projectList
      .withColumn("reject_reason",
        when(!validProjectId(col("project")), "invalid_project_id")
          .when(!validReadLength(col("read_length")), "invalid_read_length"))
      .withColumn("valid", col("reject_reason").isNull)
}
