package graft.operators

import graft.SparkSpec
import graft.expressions.PqEncode
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {

  import spark.implicits._
  private val pq = ProductQuantization

  private def vecDf(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "v")

  test("PqEncode: per-subspace L2 argmin, ties to the LOWER centroid index") {
    // m=2, dsub=2, ksub=2: subspace 0 centroids {(0,0),(1,1)}, subspace 1 {(2,2),(4,4)}
    val cb: pq.Codebooks =
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(2.0, 2.0), Seq(4.0, 4.0)))
    val df = vecDf(
      1L -> Seq(0.1, 0.1, 3.9, 3.9), // sub0 → 0, sub1 → 1
      2L -> Seq(0.9, 0.9, 2.1, 2.1), // sub0 → 1, sub1 → 0
      3L -> Seq(0.5, 0.5, 3.0, 3.0)) // exact ties in BOTH subspaces → lower index 0
    val got = pq.encode(df, "v", cb).select($"id", $"pq_codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(0, 1))
    assert(got(2L) == Seq(1, 0))
    assert(got(3L) == Seq(0, 0))
  }

  test("PqEncode: null element nulls the code array (VecDot convention)") {
    val cb: pq.Codebooks = Seq(Seq(Seq(0.0, 0.0)), Seq(Seq(0.0, 0.0)))
    val df = Seq((1L, Seq[Option[Double]](Some(1.0), None, Some(2.0), Some(3.0))))
      .toDF("id", "v")
    val out = df.select(PqEncode($"v", cb).as("c")).collect()
    assert(out.head.isNullAt(0))
  }

  test("pack/unpack roundtrip across all subspaces at the default geometry") {
    val m = 8; val ksub = 16
    // one synthetic code array exercising every field position and both extremes
    val codes = Seq(0, 15, 7, 8, 1, 14, 3, 12)
    val df = Seq((1L, codes)).toDF("id", "codes")
      .withColumn("packed", pq.packCodes($"codes", m, ksub))
    val packed = df.select($"packed").as[Long].head()
    assert(packed == codes.zipWithIndex.map { case (c, s) => c.toLong << (4 * s) }.sum)
    val back = df.select((0 until m).map(s =>
      pq.unpackCode($"packed", s, ksub).as(s"c$s")): _*).as[(Int, Int, Int, Int, Int, Int, Int, Int)].head()
    assert(back.productIterator.toSeq == codes)
  }

  test("pack/unpack roundtrip at the full-64-bit FAISS geometry (m=8, ksub=256), sign bit set") {
    val m = 8; val ksub = 256
    // top field 255 sets bit 63 → negative packed long; unpack must mask it off
    val codes = Seq(0, 255, 128, 1, 254, 63, 200, 255)
    val df = Seq((1L, codes)).toDF("id", "codes")
      .withColumn("packed", pq.packCodes($"codes", m, ksub))
    val packed = df.select($"packed").as[Long].head()
    assert(packed < 0, "top field 255 must set the sign bit — geometry check")
    val back = df.select((0 until m).map(s =>
      pq.unpackCode($"packed", s, ksub).as(s"c$s")): _*).as[(Int, Int, Int, Int, Int, Int, Int, Int)].head()
    assert(back.productIterator.toSeq == codes)
  }

  private def syntheticCorpus(n: Int, dims: Int) = {
    // deterministic, well-spread: four latent clusters + per-row jitter
    val rows = (0 until n).map { i =>
      val c = i % 4
      val v = (0 until dims).map(d =>
        math.sin(c * 10 + d) * 2.0 + math.cos(i * 0.7 + d * 0.3) * 0.25)
      (i.toLong, v)
    }
    rows.toDF("id", "v")
  }

  test("trainCodebooks: Lloyd iterations monotonically non-increase quantization error") {
    val df = syntheticCorpus(200, 16).cache()
    val m = 4; val ksub = 4
    val errs = (0 to 3).map { it =>
      pq.quantizationError(df, "v", pq.trainCodebooks(df, "v", "id", m, ksub, it))
    }
    errs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"error rose across an iteration: $errs")
    }
    // the seed codebook (4 lowest-id rows) is a poor quantizer for 4 spread
    // clusters — training must strictly improve it, not just not-regress
    assert(errs.last < errs.head * 0.9, s"training did not improve error: $errs")
  }

  test("adcTopK with an exhaustive codebook reproduces exact L2 ranking (the PQ q65-style identity)") {
    val dims = 8; val m = 4
    val df = syntheticCorpus(24, dims).cache()
    // every vector is its own centroid → quantization error 0 → ADC == exact L2²
    val cb = pq.seedCodebooks(df, "v", "id", m, ksub = 24)
    val query = df.orderBy($"id").limit(1).select($"v").as[Seq[Double]].head()
    val encoded = pq.encode(df, "v", cb)
      .select($"id", pq.packCodes($"pq_codes", m, ksub = 24).as("packed"))
    val got = pq.adcTopK(encoded, "packed", "id", cb, query, k = 5)
      .select($"id").as[Long].collect().toSeq
    val exact = df.select($"id",
      (0 until dims).map(d => ($"v" (d) - lit(query(d))) * ($"v" (d) - lit(query(d))))
        .reduce(_ + _).as("l2"))
      .orderBy($"l2", $"id").limit(5).select($"id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("adcDistance equals the driver-side LUT sum recomputed per row") {
    val dims = 8; val m = 4; val ksub = 3
    val df = syntheticCorpus(30, dims).cache()
    val cb = pq.trainCodebooks(df, "v", "id", m, ksub, iters = 2)
    val query = (0 until dims).map(d => math.sin(d * 1.3)).toSeq
    val lut = pq.adcLut(query, cb)
    val rows = pq.encode(df, "v", cb)
      .select($"id", $"pq_codes",
        pq.adcDistance(pq.packCodes($"pq_codes", m, ksub), lut, ksub).as("adc"))
      .as[(Long, Seq[Int], Double)].collect()
    rows.foreach { case (_, codes, adc) =>
      val expect = codes.zipWithIndex.map { case (c, s) => lut(s)(c) }.reduce(_ + _)
      assert(adc == expect)
    }
  }

  test("adcTopKRefined: full candidate coverage reproduces exact L2 ranking even under a coarse codebook") {
    val dims = 8; val m = 4; val ksub = 2 // deliberately lossy quantizer
    val df = syntheticCorpus(30, dims).cache()
    val cb = pq.seedCodebooks(df, "v", "id", m, ksub)
    val query = df.orderBy($"id".desc).limit(1).select($"v").as[Seq[Double]].head()
    val encoded = pq.encode(df, "v", cb)
      .select($"id", pq.packCodes($"pq_codes", m, ksub).as("packed"))
    // refineFactor * k >= corpus: stage 2 re-ranks everything exactly, so the
    // quantizer cannot cost recall — the identity that pins the refine join
    val got = pq.adcTopKRefined(encoded, "packed", "id", df, "v", cb, query,
      k = 5, refineFactor = 6)
      .select($"id").as[Long].collect().toSeq
    val exact = df.select($"id",
      (0 until dims).map(d => ($"v" (d) - lit(query(d))) * ($"v" (d) - lit(query(d))))
        .reduce(_ + _).as("l2"))
      .orderBy($"l2", $"id").limit(5).select($"id").as[Long].collect().toSeq
    assert(got == exact)
    // and the lossy single-stage ADC is genuinely worse here (guards against
    // the identity passing because the quantizer was accidentally exact)
    val adcOnly = pq.adcTopK(encoded, "packed", "id", cb, query, 5)
      .select($"id").as[Long].collect().toSeq
    assert(adcOnly != exact, "ksub=2 seed quantizer unexpectedly exact — weaken the corpus")
  }

  test("ivfPqTopK: full probe + full refine reduces to exact search; narrow probe stays within probed cells") {
    val dims = 8; val m = 4; val kCent = 3
    val df = syntheticCorpus(36, dims).cache()
    val cents = SimilaritySearch.kmeansCentroids(df, "v", "id", kCent, iters = 2)
    val cb = pq.trainCodebooks(df, "v", "id", m, ksub = 4, iters = 2)
    val query = df.orderBy($"id".desc).limit(1).select($"v").as[Seq[Double]].head()
    val encoded = SimilaritySearch.assignCells(pq.encode(df, "v", cb)
        .select($"id", pq.packCodes($"pq_codes", m, ksub = 4).as("packed"), $"v"),
        "v", cents, "cell")
      .select($"id", $"packed", $"cell").cache()
    // identity leg: every cell probed, refine re-ranks a corpus-covering set
    val got = pq.ivfPqTopK(encoded, "packed", "id", "cell", cents, cb, query,
      nprobe = kCent, k = 5, original = Some(df), vecCol = "v", refine = 8)
      .select($"id").as[Long].collect().toSeq
    val exact = df.select($"id",
      (0 until dims).map(d => ($"v" (d) - lit(query(d))) * ($"v" (d) - lit(query(d))))
        .reduce(_ + _).as("l2"))
      .orderBy($"l2", $"id").limit(5).select($"id").as[Long].collect().toSeq
    assert(got == exact)
    // narrow probe: results must come only from the probed (nearest) cell
    val near = pq.ivfPqTopK(encoded, "packed", "id", "cell", cents, cb, query,
      nprobe = 1, k = 5)
    val nearIds = near.select($"id").as[Long].collect().toSet
    val cellOf = encoded.select($"id", $"cell").as[(Long, Int)].collect().toMap
    assert(nearIds.map(cellOf).size == 1, "nprobe=1 must search exactly one cell")
  }

  test("residual IVFADC: exhaustive residual codebook reproduces exact L2 — (q−c)−(v−c) = q−v") {
    val dims = 8; val m = 4; val kCent = 3
    val df = syntheticCorpus(24, dims).cache()
    val coarse = SimilaritySearch.kmeansCentroids(df, "v", "id", kCent, iters = 2)
    val assigned = SimilaritySearch.assignCells(df, "v", coarse, "cell").cache()
    // every row's residual is its own codeword → ADC distance is EXACTLY
    // L2²(q − cen, v − cen) = L2²(q, v): the residual identity
    val cb = pq.seedCodebooksResidual(assigned, "v", "id", "cell", coarse, m, ksub = 24)
    val query = df.orderBy($"id".desc).limit(1).select($"v").as[Seq[Double]].head()
    val encoded = pq.encodeResidual(assigned, "v", "cell", coarse, cb)
      .select($"id", pq.packCodes($"pq_codes", m, ksub = 24).as("packed"), $"cell")
    val got = pq.ivfPqResidualTopK(encoded, "packed", "id", "cell", coarse, cb,
      query, nprobe = kCent, k = 5)
      .select($"id").as[Long].collect().toSeq
    val exact = df.select($"id",
      (0 until dims).map(d => ($"v" (d) - lit(query(d))) * ($"v" (d) - lit(query(d))))
        .reduce(_ + _).as("l2"))
      .orderBy($"l2", $"id").limit(5).select($"id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("residual codebooks: Lloyd improves residual error, and residual beats plain at equal geometry on clustered data") {
    val dims = 16; val m = 4; val ksub = 4; val kCent = 4
    val df = syntheticCorpus(400, dims).cache()
    val coarse = SimilaritySearch.kmeansCentroids(df, "v", "id", kCent, iters = 3)
    val assigned = SimilaritySearch.assignCells(df, "v", coarse, "cell").cache()
    val seedErr = pq.quantizationErrorResidual(assigned, "v", "cell", coarse,
      pq.seedCodebooksResidual(assigned, "v", "id", "cell", coarse, m, ksub))
    val trained = pq.trainCodebooksResidual(assigned, "v", "id", "cell", coarse, m, ksub, 3)
    val trainedErr = pq.quantizationErrorResidual(assigned, "v", "cell", coarse, trained)
    assert(trainedErr <= seedErr + 1e-12, s"residual Lloyd regressed: $seedErr -> $trainedErr")
    // the residual claim itself: same m×ksub budget spends better on
    // residual space than on the raw clustered corpus
    val plainErr = pq.quantizationError(df, "v",
      pq.trainCodebooks(df, "v", "id", m, ksub, 3))
    assert(trainedErr < plainErr,
      s"residual ($trainedErr) must beat plain ($plainErr) on clustered data")
  }

  test("codeWidth: ceil(log2 ksub) with a floor of one bit") {
    assert(pq.codeWidth(2) == 1)
    assert(pq.codeWidth(3) == 2)
    assert(pq.codeWidth(16) == 4)
    assert(pq.codeWidth(17) == 5)
    assert(pq.codeWidth(256) == 8)
  }
}
