package graft.driver

import graft.SparkSpec

class InputValidationSpec extends SparkSpec {
  import spark.implicits._

  test("validateArgs: legal id/readlen pass; injection chars and non-numeric readlen reject (P11)") {
    assert(InputValidation.validateArgs("PRJNA123", "150") == Right(("PRJNA123", 150)))
    assert(InputValidation.validateArgs("GSE_2024-a", "100") == Right(("GSE_2024-a", 100)))
    // path-injection guard: anything outside [a-zA-Z0-9_-]
    assert(InputValidation.validateArgs("PRJ;rm -rf", "150").isLeft)
    assert(InputValidation.validateArgs("../etc", "150").isLeft)
    assert(InputValidation.validateArgs("PRJ 1", "150").isLeft)
    assert(InputValidation.validateArgs("", "150").isLeft)
    // readlen must be ^[0-9]+$
    assert(InputValidation.validateArgs("PRJ1", "abc").isLeft)
    assert(InputValidation.validateArgs("PRJ1", "-5").isLeft)
    assert(InputValidation.validateArgs("PRJ1", "1e3").isLeft)
    // digits-only but overflows Int — must reject, not throw
    assert(InputValidation.validateArgs("PRJ1", "99999999999") ==
      Left("ERROR: Read length must be a positive integer"))
    assert(InputValidation.validateArgs("PRJ1", "0").isLeft) // positive means > 0
    assert(InputValidation.validateArgs("PRJ1", "150", accListExists = false) ==
      Left("ERROR: Accession list file not found"))
  }

  test("flagProjectList: per-row valid flag + reject_reason with id-before-readlen precedence (P11)") {
    val pl = Seq(("PRJ1", "150"), ("PRJ/evil", "150"), ("PRJ2", "15x"), ("PRJ.3", "9x"))
      .toDF("project", "read_length")
    val out = InputValidation.flagProjectList(pl).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Boolean]("valid"), r.getAs[String]("reject_reason")))).toMap
    assert(out("PRJ1") == ((true, null)))
    assert(out("PRJ/evil") == ((false, "invalid_project_id")))
    assert(out("PRJ2") == ((false, "invalid_read_length")))
    // both invalid → the id check wins (reference errors out at the first check)
    assert(out("PRJ.3") == ((false, "invalid_project_id")))
  }
}
