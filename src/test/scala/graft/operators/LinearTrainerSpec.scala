package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearTrainerSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  /** Plain-Scala reference perceptron over collected features — the
    * distributed trainer must match it iteration for iteration. */
  private def referenceTrain(rows: Seq[(Array[Long], Long)], iters: Int): Array[Long] = {
    val w = Array.fill(dims)(0L)
    for (_ <- 1 to iters) {
      val upd = Array.fill(dims)(0L)
      for ((x, y) <- rows) {
        val margin = (0 until dims).map(d => w(d) * x(d)).sum * y
        if (margin <= 0L) (0 until dims).foreach(d => upd(d) += y * x(d))
      }
      (0 until dims).foreach(d => w(d) += upd(d))
    }
    w
  }

  private def featFrame(texts: Seq[(Long, String, Long)]) = {
    val lt = LinearTrainer
    texts.toDF("doc_id", "text", "label")
      .withColumn("_t", graft.functions.TextFunctions.tokens($"text"))
      .withColumn("_bk", lt.tokenBuckets($"_t", dims))
      .select($"doc_id", lt.countsFromBuckets($"_bk", dims).as("features"), $"label")
  }

  private val corpus = Seq(
    (1L, "alpha beta gamma alpha alpha longer text with many words here", 1L),
    (2L, "short text", -1L),
    (3L, "beta beta gamma delta epsilon zeta eta theta iota kappa lambda", 1L),
    (4L, "tiny", -1L),
    (5L, "alpha gamma", -1L))

  test("distributed batch perceptron matches the plain-Scala reference exactly") {
    val feat = featFrame(corpus)
    val rows = feat.collect().map(r =>
      (r.getSeq[Long](1).toArray, r.getLong(2))).toSeq
    for (iters <- Seq(1, 2, 4)) {
      val got = LinearTrainer.perceptronTrain(feat, "features", "label", dims, iters)
      assert(got.toSeq === referenceTrain(rows, iters).toSeq, s"iters=$iters")
    }
  }

  test("countsFromBuckets: dense integer counts summing to the token count") {
    val f = featFrame(corpus).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f(4L).sum === 1L) // "tiny" -> one token
    assert(f(1L).sum === 11L)
    assert(f.values.forall(_.length == dims))
  }

  test("zero-margin docs update (the w=0 first iteration updates on every doc)") {
    val feat = featFrame(corpus)
    val w1 = LinearTrainer.perceptronTrain(feat, "features", "label", dims, 1)
    // w1 = sum of y*x over ALL docs
    val rows = feat.collect().map(r => (r.getSeq[Long](1), r.getLong(2)))
    val expect = (0 until dims).map(d => rows.map { case (x, y) => x(d) * y }.sum)
    assert(w1.toSeq === expect)
  }

  test("predict signs by the trained dot product; empty-feature doc scores -1") {
    val w = Seq(2L, -1L, 0L, 0L, 0L, 0L, 0L, 0L)
    val df = Seq(
      (1L, Seq(3L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)),  // 6-1=5 -> +1
      (2L, Seq(0L, 4L, 0L, 0L, 0L, 0L, 0L, 0L)),  // -4 -> -1
      (3L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))). // 0 -> -1
      toDF("id", "features")
    val got = df.select($"id", LinearTrainer.predict($"features", w).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> -1L, 3L -> -1L))
  }

  test("contracts are loud") {
    val feat = featFrame(corpus)
    intercept[IllegalArgumentException](
      LinearTrainer.perceptronTrain(feat, "features", "label", 0, 1))
    intercept[IllegalArgumentException](
      LinearTrainer.perceptronTrain(feat, "features", "label", dims, 0))
    intercept[IllegalArgumentException](LinearTrainer.tokenBuckets($"x", 0))
  }
}
