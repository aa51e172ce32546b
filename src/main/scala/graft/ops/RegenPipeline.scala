package graft.ops

import java.nio.file.{Files, Path}

import graft.io.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-hoc regeneration utility (`utilities/sex_json_regen_v2.sh`) — re-runs
  * the sex conflict report, every per-sample track JSON, and the project
  * session doc independently of the full pipeline (the reference's use case:
  * a manually corrected sex assignment needs the derived artifacts rebuilt).
  *
  * Reproduced contracts:
  *   - one track per unique `geo_accession`, FIRST run wins
  *     (`sex_json_regen_v2.sh:229-233` `seen_samples`) — [[AccListOps.dedupKeepFirst]],
  *   - track-failure policy (`:296-317` `BWJSON_REQUIRED`): required → the run
  *     FAILS and no session is built; optional → failed samples are dropped and
  *     the session covers the survivors,
  *   - no tracks → no session (`:383-388`),
  *   - session rebuilt only after all track writes settle (`:329-334`
  *     afterok dependency → here: sequential composition).
  *
  * All data steps are the already-oracle-checked operators (q14 conflict
  * report, q37 track docs, q38 session assembly); this object is their
  * driver-side composition with the reference's failure semantics.
  */
object RegenPipeline {

  final case class RegenResult(
      conflictReportPath: String,
      tracksWritten: Seq[String],     // unique_names, write order
      failedSamples: Seq[String],
      sessionPath: Option[String])    // None when no tracks survived

  /** Regenerate report + tracks + session for one project.
    *
    * @param accList    S1 frame (with `_row_order`) — the corrected sample set
    * @param sexResult  per-sample sex frame (SampleID/InputSex/ComputedSex/…)
    * @param tpmLong    long-format marker TPMs for the conflict report
    * @param writeTrack injectable per-sample writer `(unique_name, doc) => success`
    *                   (the BWjson job surface; specs simulate failures). Defaults
    *                   to writing `RNAseq_<unique_name>.json` under `outDir/tracks`.
    * @param bwjsonRequired the reference's BWJSON_REQUIRED switch
    * @return Left(error) when required track writes failed, Right(result) otherwise
    */
  def regen(accList: DataFrame, sexResult: DataFrame, tpmLong: DataFrame,
            bioProjectId: String, outDir: Path, timestamp: String,
            writeTrack: (String, String) => Boolean = null,
            bwjsonRequired: Boolean = true): Either[String, RegenResult] = {
    // invalid id goes through the declared Left error channel, not an exception
    // (and through P11's shared validator for a consistent message)
    graft.driver.InputValidation.validateArgs(bioProjectId, "1") match {
      case Left(err) => return Left(err)
      case Right(_)  => ()
    }
    val trackDir = Files.createDirectories(outDir.resolve("tracks"))
    val doWrite: (String, String) => Boolean =
      if (writeTrack != null) writeTrack
      else (uname, doc) => {
        Files.writeString(trackDir.resolve(s"RNAseq_$uname.json"), doc); true
      }

    // STEP 1 — conflict report (`:223` ConflictedSampleReport)
    val reportPath = outDir.resolve(s"${bioProjectId}_sex_conflict_report.tsv").toString
    Sinks.writeTsvReport(
      ConflictReport.build(sexResult, tpmLong).orderBy(col("SampleID")), reportPath)

    // STEP 2 — per-unique-sample track docs, first run per geo_accession wins
    val unique = AccListOps.dedupKeepFirst(accList)
    val sexLookup = sexResult.select(
      col("SampleID").as("geo_accession_l"), col("ComputedSex"))
    val docs = AccListOps.withUniqueName(unique)
      .join(sexLookup, col("geo_accession") === col("geo_accession_l"), "left")
      .select(col("unique_name"), col("_row_order"),
        SessionBuilder.trackJson(bioProjectId).as("doc"))
      .orderBy(col("_row_order"))
      .collect().map(r => (r.getString(0), r.getString(2)))

    val (ok, failed) = docs.partition { case (uname, doc) =>
      try doWrite(uname, doc) catch { case _: Exception => false }
    }

    if (failed.nonEmpty && bwjsonRequired)
      return Left(s"ERROR: ${failed.length} samples had BWjson failures (CRITICAL): " +
        failed.map(_._1).mkString(", "))

    // STEP 3 — session doc over the surviving tracks only
    val sessionPath =
      if (ok.isEmpty) None // `:383-388` no tracks → no session
      else {
        val spark = accList.sparkSession
        import spark.implicits._
        val tracks = ok.map { case (uname, _) =>
          (s"RNAseq_$uname", trackDir.resolve(s"RNAseq_$uname.json").toString)
        }.toSeq.toDF("trackId", "_path")
        val withKey = AccListOps.withUniqueName(unique)
          .select(concat(lit("RNAseq_"), col("unique_name")).as("trackId_k"),
            col("Tissue"), col("Strain"), col("Sex"), col("Sample_characteristics"))
        val joined = ColorAssigner.comboKey(
          tracks.join(withKey, col("trackId") === col("trackId_k")))
          .select(col("trackId"), col("combo_key"), col("_path"))
        val json = SessionBuilder.buildSession(joined, bioProjectId, timestamp)
        val p = outDir.resolve(s"${bioProjectId}_jbrowse_session.json")
        Files.writeString(p, json)
        Some(p.toString)
      }

    Right(RegenResult(reportPath, ok.map(_._1).toSeq, failed.map(_._1).toSeq, sessionPath))
  }
}
