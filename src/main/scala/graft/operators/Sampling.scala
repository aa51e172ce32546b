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

  /** EXACT per-domain TOKEN-budget mixture — composing a training recipe
    * ("2 T tokens web, 300 B code, 50 B wiki": The Pile / Llama-style data
    * mixtures) needs budgets in tokens, not rows, and exact, deterministic
    * membership. Within each budgeted domain, documents are ordered by the
    * deterministic md5 draw (then id), and a document is kept iff the
    * cumulative `tokensCol` up to and including it is ≤ the domain's budget —
    * i.e. the greedy hash-ordered prefix, the windowed-cumsum semantics an
    * oracle replays directly. Domains absent from `budgets` are dropped (a
    * recipe DEFINES the output mixture).
    *
    * Scale shape — the naive window (partitionBy domain, orderBy draw) puts
    * an entire domain through ONE reducer, unusable when a domain is most of
    * 100 TB. Instead the draw's first 3 hex chars bucket each domain into
    * 4096 hash-ordered slices whose per-slice token sums form a tiny
    * histogram (≤ |budgets|·4096 rows — the ONLY collect, bounded by
    * construction). The driver prefix-scans it per domain: buckets strictly
    * before the first budget-crossing bucket are kept WHOLE (any row's
    * cumsum there is ≤ the crossing prefix ≤ budget), buckets after are
    * dropped whole, and only the single BOUNDARY bucket — ~1/4096 of the
    * domain — runs the exact cumsum window. Equality with the plain window
    * is structural: cumsum(row) = full-buckets-before offset + within-bucket
    * cumsum. */
  def tokenBudgetMix(docs: DataFrame, domainCol: String, tokensCol: String,
                     idCol: String, budgets: Map[String, Long],
                     seed: String = "mix"): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val outCols = docs.columns.toSeq
    val staged = docs
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      // the whole-bucket keep/drop equivalence with the plain window cumsum
      // needs a MONOTONE cumsum — fail loudly on a negative or NULL token
      // count instead of silently breaking the greedy-prefix semantics
      // (a NULL would vanish from the sums but still emit its row)
      .withColumn("_mix_tok",
        when(col(tokensCol).isNotNull && col(tokensCol) >= 0,
          col(tokensCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"tokenBudgetMix: negative or null $tokensCol for $idCol="),
            coalesce(col(idCol).cast("string"), lit("NULL"))))))
      .withColumn("_mix_draw",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("_mix_bucket",
        conv(substring(col("_mix_draw"), 1, 3), 16, 10).cast("int"))
    // bounded collect: ≤ |budgets| × 4096 (domain, bucket, tokens) rows
    val hist = staged
      .groupBy(col(domainCol).as("_d"), col("_mix_bucket"))
      .agg(sum(col("_mix_tok")).as("_t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val decisions = hist.groupBy(_._1).toSeq.map { case (domain, rows) =>
      val budget = budgets(domain)
      var running = 0L
      var cutoff = Int.MaxValue // no bucket crosses → whole domain kept
      var offset = 0L
      for ((_, bucket, t) <- rows.sortBy(_._2) if cutoff == Int.MaxValue) {
        if (running + t > budget) { cutoff = bucket; offset = running }
        else running += t
      }
      (domain, cutoff, offset, budget)
    }
    if (decisions.isEmpty) return docs.limit(0)
    val dec = decisions.toDF("_mix_domain", "_mix_cutoff", "_mix_offset", "_mix_budget")
    val joined = staged.join(broadcast(dec), col(domainCol) === col("_mix_domain"))
    val below = joined.filter(col("_mix_bucket") < col("_mix_cutoff"))
    val win = Window.partitionBy(col(domainCol))
      .orderBy(col("_mix_draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("_mix_bucket") === col("_mix_cutoff"))
      .withColumn("_mix_cum",
        sum(col("_mix_tok")).over(win) + col("_mix_offset"))
      .filter(col("_mix_cum") <= col("_mix_budget"))
    below.select(outCols.map(col): _*)
      .unionByName(boundary.select(outCols.map(col): _*))
  }

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
