package graft.operators

import graft.expressions.MatVec
import org.apache.spark.sql.Column

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
}
