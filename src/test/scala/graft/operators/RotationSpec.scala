package graft.operators

import graft.SparkSpec
import graft.expressions.MatVec
import org.apache.spark.sql.functions._

class RotationSpec extends SparkSpec {

  import spark.implicits._

  test("rotationMatrix: orthonormal rows (R·Rᵀ = I) and deterministic across calls") {
    val dims = 16
    val r1 = Rotation.rotationMatrix(dims)
    val r2 = Rotation.rotationMatrix(dims)
    assert(r1 == r2, "same seed must give the identical matrix")
    for (i <- 0 until dims; j <- 0 until dims) {
      val dot = (0 until dims).map(t => r1(i)(t) * r1(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-10, s"row $i · row $j = $dot")
    }
    assert(Rotation.rotationMatrix(dims, seed = 7L) != r1, "seed must matter")
  }

  test("MatVec: matches the driver-side ascending-index chain bit-exactly; rotation preserves L2") {
    val dims = 8
    val r = Rotation.rotationMatrix(dims)
    val rows = (0 until 20).map(i =>
      (i.toLong, (0 until dims).map(d => math.sin(i * 0.7 + d * 0.3) * 2.0)))
    val df = rows.toDF("id", "v")
    val got = df.select($"id", Rotation.rotate($"v", r).as("rv"))
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, v) =>
      val expect = r.map { row =>
        var acc = 0.0
        var t = 0
        while (t < dims) { acc += row(t) * v(t); t += 1 }
        acc
      }
      assert(got(id) == expect, s"MatVec chain mismatch for id=$id")
      // isometry: |rv|² == |v|² to fp tolerance (exact-NN ranks unchanged)
      val n0 = v.map(x => x * x).sum
      val n1 = got(id).map(x => x * x).sum
      assert(math.abs(n0 - n1) < 1e-9 * math.max(1.0, n0), s"norm changed: $n0 -> $n1")
    }
  }

  test("MatVec: null element nulls the output; wrong vector length raises") {
    val r = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val withNull = Seq((1L, Seq[Option[Double]](Some(1.0), None))).toDF("id", "v")
    assert(withNull.select(MatVec($"v", r)).collect().head.isNullAt(0))
    val err = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
        .select(MatVec($"v", r)).collect()
    }
    assert(err.getMessage.contains("mat_vec expects 2-dim"))
  }

  test("rotated PQ pipeline: rotation changes codes but exact neighbor ranks are invariant") {
    val dims = 16; val m = 4; val ksub = 4
    val pq = ProductQuantization
    val rows = (0 until 60).map { i =>
      // variance deliberately concentrated in the first dims (the regime a
      // rotation rebalances)
      (i.toLong, (0 until dims).map(d =>
        if (d < 4) math.sin(i * 0.9 + d) * 4.0 else math.cos(i * 0.3 + d) * 0.1))
    }
    val df = rows.toDF("id", "v").cache()
    val r = Rotation.rotationMatrix(dims)
    val rotated = df.select($"id", Rotation.rotate($"v", r).as("rv")).cache()
    val cbPlain = pq.trainCodebooks(df, "v", "id", m, ksub, 2)
    val cbRot = pq.trainCodebooks(rotated, "rv", "id", m, ksub, 2)
    // the OPQ claim at fixture scale: rotated-space training error is lower
    // when subspace variance is unbalanced
    val errPlain = pq.quantizationError(df, "v", cbPlain)
    val errRot = pq.quantizationError(rotated, "rv", cbRot)
    assert(errRot < errPlain,
      s"rotation should rebalance concentrated variance: rot=$errRot plain=$errPlain")
    // exact search in rotated space returns the same ids (isometry)
    val q = rows.head._2
    val rq = r.map(row => row.zip(q).map { case (a, b) => a * b }.sum)
    val exactPlain = SimilaritySearch.bruteForceTopK(df, "v", "id", q, 5)
      .select($"id").as[Long].collect().toSeq
    val exactRot = SimilaritySearch.bruteForceTopK(rotated, "rv", "id", rq, 5)
      .select($"id").as[Long].collect().toSeq
    assert(exactPlain == exactRot, "rotation must not change exact cosine ranks")
  }

  test("polarOrthogonal: orthogonal input is a fixed point; positive-diagonal input polars to I") {
    val r = Rotation.rotationMatrix(6, seed = 3L)
    val p = Rotation.polarOrthogonal(r.map(_.toArray).toArray)
    for (i <- 0 until 6; j <- 0 until 6)
      assert(math.abs(p(i)(j) - r(i)(j)) < 1e-10, s"($i,$j): ${p(i)(j)} vs ${r(i)(j)}")
    // polar factor of a positive diagonal matrix is the identity
    val d = Array.tabulate(4, 4)((i, j) => if (i == j) (i + 2).toDouble else 0.0)
    val pid = Rotation.polarOrthogonal(d)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(pid(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-10)
    intercept[IllegalArgumentException](
      Rotation.polarOrthogonal(Array.fill(3, 3)(0.0))) // singular is loud
  }

  test("learnedRotation: orthogonal result, quantization error beats the random rotation on anisotropic data") {
    val dims = 16; val m = 4; val ksub = 4
    val pq = ProductQuantization
    // variance concentrated in the first subspace — the OPQ regime; the
    // seeded jitter keeps the corpus full-rank (the sinusoid alone is rank
    // ~4, which exercises the ridge path instead of the Procrustes one)
    val jitter = new java.util.Random(11L)
    val rows = (0 until 80).map { i =>
      (i.toLong, (0 until dims).map(d =>
        (if (d < 4) math.sin(i * 0.9 + d) * 4.0 else math.cos(i * 0.3 + d) * 0.1)
          + jitter.nextGaussian() * 0.05))
    }
    val df = rows.toDF("id", "v").cache()
    val (learned, cbLearn) = Rotation.learnedRotation(df, "v", "id", m, ksub,
      outerIters = 2, lloydIters = 2)
    // orthogonality of the learned matrix
    for (i <- 0 until dims; j <- 0 until dims) {
      val dot = (0 until dims).map(t => learned(i)(t) * learned(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"R·Rᵀ($i,$j)=$dot")
    }
    val rand = Rotation.rotationMatrix(dims)
    val rotRand = df.select($"id", Rotation.rotate($"v", rand).as("rv")).cache()
    val cbRand = pq.trainCodebooks(rotRand, "rv", "id", m, ksub, 2)
    val rotLearn = df.select($"id", Rotation.rotate($"v", learned).as("rv")).cache()
    val errRand = pq.quantizationError(rotRand, "rv", cbRand)
    val errLearn = pq.quantizationError(rotLearn, "rv", cbLearn)
    assert(errLearn <= errRand * 1.0001,
      s"learned rotation must not lose to random on anisotropic data: " +
        s"learned=$errLearn rand=$errRand")
    // degenerate (rank-deficient) corpus: the ridge retry must still return
    // a fully orthogonal matrix rather than blow up
    val degRows = (0 until 40).map(i =>
      (i.toLong, (0 until dims).map(d => math.sin(i * 0.9 + d) * 2.0)))
    val (degRot, _) = Rotation.learnedRotation(degRows.toDF("id", "v"),
      "v", "id", m, ksub, outerIters = 1, lloydIters = 1)
    for (i <- 0 until dims; j <- 0 until dims) {
      val dot = (0 until dims).map(t => degRot(i)(t) * degRot(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-6,
        s"degenerate-path R·Rᵀ($i,$j)=$dot")
    }
  }
}
