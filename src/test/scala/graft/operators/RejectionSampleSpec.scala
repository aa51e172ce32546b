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

  test("upsampleByWeight: integer weights copy exactly; fractional weights round via the draw") {
    val exact = Sampling.upsampleByWeight(docs, "doc_id", lit(3.0))
    assert(exact.count() === 6000L)
    assert(exact.groupBy("doc_id").count().filter($"count" =!= 3).count() === 0L)
    val frac = Sampling.upsampleByWeight(docs, "doc_id", lit(1.5), "s")
    val perDoc = frac.groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(perDoc.forall(c => c == 1L || c == 2L))
    val total = perDoc.sum
    assert(total > 2700L && total < 3300L, s"E[total]=3000, got $total")
    // deterministic: rerun reproduces the identical copy set
    val again = Sampling.upsampleByWeight(docs, "doc_id", lit(1.5), "s")
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = frac.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === first)
  }

  test("upsampleByWeight: copy_idx is 1..n and sub-1 weights can drop rows") {
    val out = Sampling.upsampleByWeight(docs, "doc_id", lit(0.3), "t")
    val n = out.count()
    assert(n > 400L && n < 800L, s"E=600, got $n") // ~30% of 2000
    assert(out.filter($"copy_idx" =!= 1L).count() === 0L)
  }

  test("verdict is scan-side: no shuffle in the plan") {
    val plan = Sampling.rejectionSample(docs, "doc_id", lit(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan:\n$plan")
  }
}
