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

  // ── sparse feature path ────────────────────────────────────────────────────

  private def sparseFrame(texts: Seq[(Long, String, Long)], d: Int = dims) = {
    val lt = LinearTrainer
    texts.toDF("doc_id", "text", "label")
      .withColumn("_t", graft.functions.TextFunctions.tokens($"text"))
      .withColumn("_sb", lt.sortedTokenBuckets($"_t", d))
      .select($"doc_id", lt.sparseCountsFromSorted($"_sb").as("sfeat"), $"label")
  }

  test("sparseCountsFromSorted: distinct ascending positions, counts sum to the token count") {
    val rows = sparseFrame(corpus).collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getInt(0), e.getLong(1)))
    }.toMap
    // entries agree with the dense count vector exactly
    val dense = featFrame(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, entries) <- rows) {
      assert(entries.map(_._1) === entries.map(_._1).sorted.distinct, s"doc $id")
      val fromSparse = (0 until dims).map(d =>
        entries.find(_._1 == d).map(_._2).getOrElse(0L))
      assert(fromSparse === dense(id), s"doc $id sparse != dense counts")
    }
    // zero-token doc → empty entries (no sequence(1,0) phantom runs)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("sb")
      .select(LinearTrainer.sparseCountsFromSorted($"sb").as("sfeat"))
      .collect()(0)
    assert(empty.getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }

  test("sparse training == dense training weights at equal geometry") {
    val dense = featFrame(corpus)
    val sparse = sparseFrame(corpus)
    for (iters <- Seq(1, 2, 4)) {
      val wd = LinearTrainer.perceptronTrain(dense, "features", "label", dims, iters)
      val ws = LinearTrainer.perceptronTrainSparse(sparse, "sfeat", "label", dims, iters)
      assert(ws.toSeq === wd.toSeq, s"iters=$iters")
    }
  }

  test("sparse path at dims far beyond the dense comfort zone") {
    val bigDims = 1 << 16
    val feat = sparseFrame(corpus, bigDims)
    val w = LinearTrainer.perceptronTrainSparse(feat, "sfeat", "label", bigDims, 2)
    // active buckets only: nonzero weights bounded by the corpus vocabulary
    assert(w.count(_ != 0L) <= 40 && w.count(_ != 0L) > 0)
    // and the model still classifies: dot of doc 1 (label +1 trainable corpus)
    val pred = feat.select($"doc_id",
        LinearTrainer.dotSparse($"sfeat", w.toSeq).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pred.nonEmpty)
  }

  test("averaged weights are the exact sum of per-iteration weight vectors") {
    val feat = featFrame(corpus)
    val sparse = sparseFrame(corpus)
    val rows = feat.collect().map(r => (r.getSeq[Long](1).toArray, r.getLong(2))).toSeq
    val iters = 3
    val perIter = (1 to iters).map(t => referenceTrain(rows, t))
    val expectSum = (0 until dims).map(d => perIter.map(_(d)).sum)
    val (fin, avg) = LinearTrainer.perceptronTrainAveragedSparse(
      sparse, "sfeat", "label", dims, iters)
    assert(fin.toSeq === perIter.last.toSeq)
    assert(avg.toSeq === expectSum)
  }

  test("averaged classifier is at least as accurate as the final iterate on a noisy fixture") {
    // non-separable corpus: a learnable majority pattern ('good' tokens ↔ +1)
    // plus label-noise docs that keep flipping the final iterate
    val noisy = (1L to 40L).map { i =>
      val clean = i % 10 != 0 // every 10th doc carries a flipped label
      val base = if (i % 2 == 0) "good quality useful content here" else "spam junk noise garbage filler"
      val label = (if (i % 2 == 0) 1L else -1L) * (if (clean) 1L else -1L)
      (i, base + s" tail$i", label)
    }
    val sparse = sparseFrame(noisy, 64).localCheckpoint()
    val (fin, avg) = LinearTrainer.perceptronTrainAveragedSparse(
      sparse, "sfeat", "label", 64, 5)
    def acc(w: Array[Long]): Long = sparse
      .select((when(LinearTrainer.dotSparse($"sfeat", w.toSeq) > 0, 1L)
        .otherwise(-1L) === $"label").cast("long").as("ok"))
      .agg(sum($"ok")).collect()(0).getLong(0)
    assert(acc(avg) >= acc(fin),
      s"averaged ${acc(avg)}/40 must be >= final ${acc(fin)}/40")
    assert(acc(avg) >= 30, "averaged model must actually learn the majority pattern")
  }

  test("one-vs-all recovers planted class labels; ties break to the earliest class") {
    val labeled = (1L to 60L).map { i =>
      val (cls, text) = (i % 3) match {
        case 0 => ("red", "crimson scarlet ruby red red")
        case 1 => ("green", "emerald jade lime green green")
        case _ => ("blue", "azure cobalt navy blue blue")
      }
      (i, text + s" filler$i", cls)
    }
    val lt = LinearTrainer
    val feat = labeled.toDF("doc_id", "text", "cls")
      .withColumn("_t", graft.functions.TextFunctions.tokens($"text"))
      .withColumn("_sb", lt.sortedTokenBuckets($"_t", 128))
      .select($"doc_id", lt.sparseCountsFromSorted($"_sb").as("sfeat"), $"cls")
    val models = lt.perceptronTrainOneVsAll(feat, "sfeat", "cls", 128, 3)
    assert(models.map(_._1) === Seq("blue", "green", "red"), "ascending class order")
    val preds = feat.select($"cls", lt.predictOneVsAll($"sfeat", models).as("p"))
      .collect()
    val correct = preds.count(r => r.getString(0) == r.getString(1))
    assert(correct >= 54, s"one-vs-all must recover the planted classes, got $correct/60")
    // tie-break: an empty-feature row scores 0 on every class → earliest class
    val tie = Seq((99L, Seq.empty[(Int, Long)], "x"))
      .toDF("doc_id", "sfeat", "cls")
      .select($"doc_id", $"sfeat".cast("array<struct<pos:int,cnt:bigint>>").as("sfeat"))
      .select(lt.predictOneVsAll($"sfeat", models).as("p")).collect()(0).getString(0)
    assert(tie === "blue")
    intercept[IllegalArgumentException](lt.predictOneVsAll($"sfeat", Seq.empty))
    intercept[IllegalArgumentException](
      lt.perceptronTrainOneVsAll(feat.limit(0), "sfeat", "cls", 128, 1))
  }
}
