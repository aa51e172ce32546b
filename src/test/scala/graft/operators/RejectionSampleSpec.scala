package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RejectionSampleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 2000L).toDF("doc_id")

  test("verdicts are a pure function of (id, seed): partitioning-independent") {
    val a = Sampling.rejectionSample(docs, "doc_id", lit(0.3), "s")
      .orderBy("doc_id").collect().toSeq
    val b = Sampling.rejectionSample(docs.repartition(13), "doc_id", lit(0.3), "s")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("changing the seed re-draws") {
    val a = Sampling.rejectionSample(docs, "doc_id", lit(0.5), "s1")
      .filter($"keep").count()
    val kept1 = Sampling.rejectionSample(docs, "doc_id", lit(0.5), "s1")
      .filter($"keep").select("doc_id").collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.rejectionSample(docs, "doc_id", lit(0.5), "s2")
      .filter($"keep").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === kept1.size.toLong)
    assert(kept1 !== kept2)
  }

  test("acceptance 0 keeps nothing, 1 keeps everything (draw is in [0,1))") {
    assert(Sampling.rejectionSample(docs, "doc_id", lit(0.0)).filter($"keep").count() === 0L)
    assert(Sampling.rejectionSample(docs, "doc_id", lit(1.0)).filter($"keep").count() === 2000L)
  }

  test("empirical keep rate tracks the acceptance probability") {
    val kept = Sampling.rejectionSample(docs, "doc_id", lit(0.5), "rate")
      .filter($"keep").count()
    assert(kept > 850L && kept < 1150L, s"kept=$kept of 2000 at p=0.5")
  }

  test("verdict is scan-side: no shuffle in the plan") {
    val plan = Sampling.rejectionSample(docs, "doc_id", lit(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan:\n$plan")
  }
}
