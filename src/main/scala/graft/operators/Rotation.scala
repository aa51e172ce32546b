package graft.operators

import graft.expressions.MatVec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-style rotation pre-transform for product quantization (Ge et al.
  * 2013, "Optimized Product Quantization"; FAISS ships the same rung as
  * `RandomRotationMatrix`): rotate every vector by one orthogonal matrix
  * BEFORE PQ so variance spreads across the subspace split instead of
  * concentrating in a few subspaces. Rotation is an isometry — L2 distances,
  * cosines and exact-NN ranks are unchanged — so it can only improve how
  * well the m-way split matches the data; the quantizer then spends its
  * m×ksub budget where the variance actually is. (Full OPQ alternates the
  * rotation with codebook training via SVD; the deterministic random
  * rotation here is the transform FAISS applies when no trained rotation is
  * available, and captures most of the gain exactly when subspace variance
  * is unbalanced — measured, not assumed: see r11_opq_ab.)
  *
  * Everything is deterministic (fixed-seed Gaussians + modified Gram-
  * Schmidt, plain IEEE double arithmetic) so the matrix is reproducible
  * inside oracle SQL as literal values: [[rotate]] is one native
  * [[graft.expressions.MatVec]] per row — ascending-index accumulation
  * chains, bit-identical to the unrolled SQL the oracle replays (q128).
  */
object Rotation {

  /** Deterministic orthogonal `dims`×`dims` matrix: fixed-seed Gaussian
    * rows orthonormalized by modified Gram-Schmidt. A seeded Gaussian
    * ensemble is full-rank with probability 1; the require guards the
    * measure-zero degenerate draw loudly rather than emitting NaN rows. */
  def rotationMatrix(dims: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    require(dims > 0, s"dims must be positive: $dims")
    val rnd = new java.util.Random(seed)
    val m = Array.fill(dims, dims)(rnd.nextGaussian())
    var j = 0
    while (j < dims) {
      var p = 0
      while (p < j) { // subtract projections onto previous rows (ascending)
        var dot = 0.0
        var t = 0
        while (t < dims) { dot += m(j)(t) * m(p)(t); t += 1 }
        t = 0
        while (t < dims) { m(j)(t) -= dot * m(p)(t); t += 1 }
        p += 1
      }
      var nrm = 0.0
      var t = 0
      while (t < dims) { nrm += m(j)(t) * m(j)(t); t += 1 }
      require(nrm > 1e-12, s"degenerate Gaussian draw at row $j — change the seed")
      val inv = 1.0 / math.sqrt(nrm)
      t = 0
      while (t < dims) { m(j)(t) *= inv; t += 1 }
      j += 1
    }
    m.map(_.toSeq).toSeq
  }

  /** Rotated vector column: one native [[MatVec]] (the rows·cols literal
    * composition would blow the codegen budget — the PqEncode rationale). */
  def rotate(vec: Column, matrix: Seq[Seq[Double]]): Column =
    MatVec(vec, matrix)

  /** LEARNED OPQ rotation (Ge et al. 2013's non-parametric alternation,
    * the step the fixed random rotation approximates): repeat
    *
    *   1. train PQ codebooks in the current rotated space (Lloyd);
    *   2. fix the codebooks, set y_i = decode(encode(R·x_i)) and solve the
    *      orthogonal Procrustes problem min_R Σ‖R·x_i − y_i‖² — whose
    *      solution is the orthogonal polar factor of the cross-covariance
    *      M = Σ y_i·x_iᵀ;
    *
    * then retrain the codebooks once in the final space so the returned
    * (rotation, codebooks) pair is consistent. Each half-step is a
    * coordinate descent on the shared quantization-error objective, so the
    * error is non-increasing in exact arithmetic — spec-pinned against the
    * random rotation on the same corpus.
    *
    * Scale shape: the only corpus-wide work per iteration is Lloyd training
    * (existing [[ProductQuantization.trainCodebooks]] machinery) and ONE
    * dims×dims cross-covariance — accumulated per partition inside
    * `mapPartitions` (the [[SequencePacking]] exemption: genuinely
    * imperative per-partition math) into a 4096-double array and reduced
    * driver-side; nothing corpus-sized ever reaches the driver. The polar
    * factor itself is a driver-side Newton iteration on a 64×64 matrix.
    * Training is statistics, not an oracle surface: partial-sum order makes
    * the low bits schedule-dependent, exactly like Lloyd means (q128's
    * oracle-pinned path keeps the deterministic fixed-seed rotation). */
  def learnedRotation(emb: DataFrame, vecCol: String, idCol: String,
                      m: Int, ksub: Int, outerIters: Int = 3,
                      lloydIters: Int = 2, seed: Long = 42L)
      : (Seq[Seq[Double]], ProductQuantization.Codebooks) = {
    require(outerIters >= 1 && lloydIters >= 1,
      s"bad outerIters=$outerIters/lloydIters=$lloydIters")
    val spark = emb.sparkSession
    import spark.implicits._
    val pq = ProductQuantization
    val dims = emb.select(size(col(vecCol))).limit(1).collect()(0).getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val x = emb.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_x")).localCheckpoint()
    var r = rotationMatrix(dims, seed)
    var it = 0
    while (it < outerIters) {
      val rotated = x.select(col("_id"), rotate(col("_x"), r).as("_rv"))
        .localCheckpoint()
      val cb = pq.trainCodebooks(rotated, "_rv", "_id", m, ksub, lloydIters)
      val cbArr = cb.map(_.map(_.toArray).toArray).toArray
      val coded = pq.encode(rotated, "_rv", cb)
        .select(col("_id"), col("pq_codes"))
        .join(x, "_id")
        .select(col("_x"), col("pq_codes")).as[(Seq[Double], Seq[Int])]
      val cross = coded.mapPartitions { rows =>
        val acc = new Array[Double](dims * dims)
        rows.foreach { case (xv, codes) =>
          val xa = xv.toArray
          var a = 0
          while (a < dims) {
            val ya = cbArr(a / dsub)(codes(a / dsub))(a % dsub)
            if (ya != 0.0) {
              var b = 0
              while (b < dims) { acc(a * dims + b) += ya * xa(b); b += 1 }
            }
            a += 1
          }
        }
        Iterator.single(acc)
      }.reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      r = polarOrthogonal(Array.tabulate(dims, dims)((a, b) => cross(a * dims + b)))
      it += 1
    }
    val rotated = x.select(col("_id"), rotate(col("_x"), r).as("_rv"))
      .localCheckpoint()
    (r, pq.trainCodebooks(rotated, "_rv", "_id", m, ksub, lloydIters))
  }

  /** Orthogonal polar factor of a square matrix via the scaled Newton
    * iteration X ← (X + X⁻ᵀ)/2 — for M = U·S·Vᵀ this converges
    * quadratically to U·Vᵀ, the Procrustes solution. Driver-side on
    * dims×dims (64×64 here).
    *
    * A RANK-DEFICIENT cross-covariance (degenerate corpora: zero-variance or
    * duplicated dimensions) leaves the Procrustes solution non-unique — any
    * orthogonal completion of the null space is equally optimal — and breaks
    * the Newton inverse. One deterministic ridge retry (M/‖M‖_F + δI,
    * δ=1e-6) then picks a single valid completion; for full-rank input the
    * plain path runs untouched. Loud on zero input or non-convergence. */
  private[operators] def polarOrthogonal(m0: Array[Array[Double]]): Seq[Seq[Double]] = {
    val n = m0.length
    require(n > 0 && m0.forall(_.length == n), "polarOrthogonal needs a square matrix")
    var fro = 0.0
    m0.foreach(_.foreach(v => fro += v * v))
    require(fro > 1e-20, "polarOrthogonal: zero cross-covariance")
    val scale = 1.0 / math.sqrt(fro)
    def attempt(ridge: Double): Seq[Seq[Double]] = {
      var x = Array.tabulate(n, n)((i, j) =>
        m0(i)(j) * scale + (if (i == j) ridge else 0.0))
      var iter = 0
      var done = false
      while (!done && iter < 100) {
        val invT = invertTranspose(x)
        val next = Array.tabulate(n, n)((i, j) => 0.5 * (x(i)(j) + invT(i)(j)))
        var diff = 0.0
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { val d = next(i)(j) - x(i)(j); diff += d * d; j += 1 }
          i += 1
        }
        x = next
        done = diff < 1e-24
        iter += 1
      }
      require(done, s"polarOrthogonal did not converge in $iter iterations")
      x.map(_.toSeq).toSeq
    }
    try attempt(0.0)
    catch { case _: IllegalArgumentException => attempt(1e-6) }
  }

  /** (Xᵀ)⁻¹ by Gauss-Jordan with partial pivoting; loud on singularity. */
  private def invertTranspose(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    val a = Array.tabulate(n, n)((i, j) => x(j)(i)) // transpose
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var c = 0
    while (c < n) {
      var p = c
      var best = math.abs(a(c)(c))
      var rIdx = c + 1
      while (rIdx < n) {
        val v = math.abs(a(rIdx)(c))
        if (v > best) { best = v; p = rIdx }
        rIdx += 1
      }
      require(best > 1e-14, s"singular matrix in polar iteration at column $c")
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
                    val ti = inv(p); inv(p) = inv(c); inv(c) = ti }
      val piv = a(c)(c)
      var j = 0
      while (j < n) { a(c)(j) /= piv; inv(c)(j) /= piv; j += 1 }
      var i = 0
      while (i < n) {
        if (i != c && a(i)(c) != 0.0) {
          val f = a(i)(c)
          var k = 0
          while (k < n) { a(i)(k) -= f * a(c)(k); inv(i)(k) -= f * inv(c)(k); k += 1 }
        }
        i += 1
      }
      c += 1
    }
    inv
  }
}
