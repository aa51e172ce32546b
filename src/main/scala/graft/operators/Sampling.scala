package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: outlier trimming and
  * per-group downsampling. Both are fully declarative (no collect, no driver
  * loop) and deterministic — rerunning on a regenerated corpus keeps the same
  * rows, which is what makes sampled corpora reproducible.
  */
object Sampling {

  /** Drop rows whose `valueCol` falls in the bottom `lo` or top (1−`hi`)
    * fraction of ROWS — the standard length-outlier trim before training
    * (truncated docs at the bottom, concatenation accidents at the top).
    *
    * Exact, value-based semantics: the kept range is [loV, hiV] where loV is the
    * smallest value whose cumulative row count reaches ceil(lo·n) (ties keep or
    * drop together — no arbitrary within-tie row split). Two aggregate jobs +
    * one broadcast: per-value counts → cumulative sum over DISTINCT values →
    * 1-row bounds crossJoined back. The unpartitioned window runs over the
    * distinct-value table, so its single-partition state is bounded by value
    * cardinality (lengths: thousands), not row count — fine at 100 TB. For a
    * genuinely high-cardinality metric column, swap the exact cumsum for
    * `approx_percentile`; the filter shape is unchanged.
    */
  def trimByValueQuantile(df: DataFrame, valueCol: String,
                          lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0, s"need 0 <= lo($lo) < hi($hi) <= 1")
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("_cum", sum(col("_cnt")).over(w))
    val total = df.agg(count(lit(1)).as("_n"))
    val bounds = cum.crossJoin(total).agg(
      min(when(col("_cum") >= ceil(lit(lo) * col("_n")), col(valueCol))).as("_lo_v"),
      min(when(col("_cum") >= ceil(lit(hi) * col("_n")), col(valueCol))).as("_hi_v"))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col("_lo_v") && col(valueCol) <= col("_hi_v"))
      .drop("_lo_v", "_hi_v")
  }

  /** Deterministic stratified downsample: keep at most `m` rows per `groupCol`
    * value, selected by md5 of the row id (a fixed pseudo-random order that
    * survives corpus regeneration, unlike `sample()` seeds which are
    * partition-layout-dependent). Executes through [[graft.plans.GroupTopK]]:
    * bounded per-group heaps prune to ≤m rows per (partition, group) BEFORE
    * the hash exchange and no sort appears in the plan — at corpus scale the
    * shuffle carries groups × m rows, not the whole table (the window
    * `row_number` formulation this replaced shuffles and sorts everything).
    * This is the source-mixing primitive: cap an over-represented crawl so it
    * can't drown the mixture. */
  def stratifiedLimit(df: DataFrame, groupCol: String, idCol: String,
                      m: Int): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    val ord = "__strat_ord"
    require(!df.columns.contains(ord), s"reserved column name in input: $ord")
    graft.plans.GroupTopK.topK(
      df.withColumn(ord, md5(col(idCol).cast("string"))),
      Seq(groupCol), Seq(ord -> true, idCol -> true), m)
      .drop(ord)
  }

  /** Diversity sampling over an embedding column: Voronoi-stratified
    * selection — assign every vector to its nearest centroid
    * ([[SimilaritySearch.assignCells]], one native NearestCentroid per row)
    * and cap each cell at `perCell` deterministic md5-ordered survivors
    * ([[stratifiedLimit]] → GroupTopK bounded heaps). SemDeDup's complement
    * in the curation toolbox: dedup removes what is too SIMILAR, this caps
    * how much of any one embedding-space REGION survives, flattening
    * density so the sample covers the space instead of its modes.
    * Output: the input columns + `cell`. Scale shape: scan-side assignment,
    * one GroupTopK shuffle keyed by cell — at 100 TB the centroid grid is
    * the knob (finer grid = finer coverage guarantee), and the per-cell
    * bound holds structurally regardless of how skewed the embedding
    * density is. */
  def diversitySample(emb: DataFrame, vecCol: String, idCol: String,
                      centroids: Seq[Seq[Double]], perCell: Int): DataFrame = {
    require(perCell > 0, s"perCell must be positive: $perCell")
    require(!emb.columns.contains("cell"), "reserved column name in input: cell")
    stratifiedLimit(
      SimilaritySearch.assignCells(emb, vecCol, centroids, "cell"),
      "cell", idCol, perCell)
  }

  /** Fractional variant of [[stratifiedLimit]]: keep ceil(frac·|group|) rows
    * per group — per-group PROPORTIONAL downsampling, the mixture-weighting
    * primitive ("take 30% of every source" preserves the mixture; a global
    * 30% limit does not). Same deterministic md5 order; the group size comes
    * from a count window over the same partition, so the plan stays one
    * shuffle by group. ceil guarantees every non-empty group keeps >= 1 row —
    * rare sources are never silently erased. */
  def stratifiedFraction(df: DataFrame, groupCol: String, idCol: String,
                         frac: Double): DataFrame = {
    require(0.0 < frac && frac <= 1.0, s"frac must be in (0,1]: $frac")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_gn", count(lit(1)).over(wAll))
      .filter(col("_rn") <= ceil(lit(frac) * col("_gn")))
      .drop("_rn", "_gn")
  }

  /** Temperature-flattened mixture cap: keep at most k·ceil(sqrt(|group|))
    * rows per group — the sublinear (T≈2) source re-weighting used to stop a
    * dominant crawl from drowning rare sources while still letting bigger
    * sources contribute more than a flat cap would. sqrt is IEEE
    * correctly-rounded (unlike pow/exp), and everything after it is integer
    * arithmetic, so the kept set is engine-exact and regeneration-stable
    * (same md5 order as the other samplers). Same one-shuffle plan shape as
    * [[stratifiedFraction]]. */
  def sqrtCapSample(df: DataFrame, groupCol: String, idCol: String,
                    k: Int = 1): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_gn", count(lit(1)).over(wAll))
      .filter(col("_rn") <= lit(k) * ceil(sqrt(col("_gn").cast("double"))))
      .drop("_rn", "_gn")
  }

  /** Uniform EXACT-k corpus sample: the k rows with the smallest
    * md5(id:seed) — deterministic and regeneration-stable where
    * `df.sample()` seeds are not, executing as TakeOrderedAndProject (k rows
    * per partition, no global sort materialization). The eval-set-carving
    * primitive. */
  def uniformExactK(df: DataFrame, idCol: String, k: Int,
                    seed: String = "sample"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.orderBy(md5(concat(col(idCol).cast("string"), lit(":" + seed))), col(idCol))
      .limit(k)
  }

  /** Keep the top-m rows per group under an explicit SCORE ordering — the
    * "best documents per source" curation cut (quality ceiling), as opposed to
    * [[stratifiedLimit]]'s unbiased md5-ordered cap. `tieBreak` must be a
    * deterministic unique column (the id) so equal scores at the cut line
    * resolve identically on every engine and rerun. Executes through
    * [[graft.plans.GroupTopK]] (bounded heaps, pre-exchange pruning, no sort —
    * q112 ≡ q106 proves equivalence with the window formulation it replaced);
    * the shuffle carries at most partitions × groups × m rows instead of the
    * full corpus. */
  def topMByScore(df: DataFrame, groupCol: String, m: Int,
                  score: Column, tieBreak: Column): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    val (s, t) = ("__topm_score", "__topm_tb")
    require(!df.columns.contains(s) && !df.columns.contains(t),
      s"reserved column names in input: $s/$t")
    graft.plans.GroupTopK.topK(
      df.withColumn(s, score).withColumn(t, tieBreak),
      Seq(groupCol), Seq(s -> false, t -> true), m)
      .drop(s, t)
  }

  /** Deterministic weighted UPSAMPLING — the other half of mixture
    * temperature: rare sources get REPEATED (multilingual/multi-domain
    * training repeats small corpora 2–5×) while [[sqrtCapSample]] trims big
    * ones. Each row emits floor(w) copies plus one more iff its deterministic
    * draw falls under frac(w) — E[copies] = w exactly, and the copy set is a
    * pure function of (id, seed), so regeneration is idempotent. Output: input
    * columns + copy_idx (1-based). Zero shuffle: the copy count and the
    * per-row explode happen in-scan; downstream shuffles see the upsampled
    * cardinality, which is the semantics, not overhead. */
  def upsampleByWeight(df: DataFrame, idCol: String, weight: Column,
                       seed: String = "upsample"): DataFrame = {
    val copies = (floor(weight) +
      when(uniformDraw(col(idCol), seed) < (weight - floor(weight)), 1L)
        .otherwise(0L)).cast("long")
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Deterministic uniform draw in [0, 1) keyed on (id, seed): the first 32
    * md5 bits scaled by 2⁻³² — a power-of-two scaling, so the double is exact
    * and engine-identical.
    *
    * DOMAIN SEPARATION: two random decisions about the same ids must use
    * DIFFERENT seeds or their draws are bit-identical and the decisions
    * correlate perfectly (e.g. a rejection pass and an upsample pass sharing a
    * seed would give every survivor of p=0.5 the fractional extra copy at
    * w=1.5 — E[copies] = 2.0, not 1.5). The operator defaults here are
    * distinct for exactly that reason. */
  def uniformDraw(id: Column, seed: String): Column =
    graft.functions.TextFunctions.md5Bits32(concat(id.cast("string"), lit(":" + seed)))
      .cast("double") / 4294967296.0

  /** Score-weighted rejection sampling (the DSIR / CCNet-style importance
    * downsample): keep a row iff its deterministic uniform draw falls under
    * `acceptProb` (a column in [0,1] — a quality score, an importance weight
    * ratio, a per-domain target rate). E[kept | row] = acceptProb, but unlike
    * `rand()`-based sampling the verdict is a pure function of (id, seed), so
    * reruns, audits, and incremental regeneration agree row-for-row.
    *
    * Zero shuffle: draw, score, and verdict are scan-side expressions.
    * Output: input columns + (accept_u, accept_p, keep). */
  def rejectionSample(df: DataFrame, idCol: String, acceptProb: Column,
                      seed: String = "0"): DataFrame =
    df.withColumn("accept_u", uniformDraw(col(idCol), seed))
      .withColumn("accept_p", acceptProb)
      .withColumn("keep", col("accept_u") < col("accept_p"))
}
