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
}
