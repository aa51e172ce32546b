package graft.expressions

import graft.functions.TextFunctions
import graft.operators.DedupSuite
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, StringType}

/** SQL surface for the operator library: every scalar/aggregate capability the
  * Column API exposes, registered as a `graft_`-prefixed SQL function, so
  * q40–q116-class pipelines are writable in pure `spark.sql(...)` with no
  * Scala imports.
  *
  * Two kinds of entries, one registry:
  *   - native Catalyst expressions ([[VecDot]], [[SortedIntersectSize]],
  *     [[BloomMightContain]], the sketch aggregates) — constructed directly;
  *   - Column-composition functions ([[TextFunctions]], [[DedupSuite]]
  *     signatures) — the SAME builders the Scala API uses, bridged
  *     Expression⇄Column per call, so SQL and Column results are one code
  *     path, not a reimplementation. Compositions containing higher-order
  *     functions resolve normally: the analyzer keeps iterating its
  *     resolution batch after the function builder returns, binding the
  *     lambda variables the composition introduced.
  *
  * Install via config (`spark.sql.extensions=graft.expressions.GraftExtensions`,
  * see [[GraftExtensions]]) or at runtime with [[registerAll]].
  *
  * Sketch/blocking parameters (k, depth, bands, n, …) must be integer
  * literals — they shape the aggregation buffer or the generated expression
  * tree, so a per-row column value cannot supply them.
  */
object SqlFunctions {

  private def c(e: Expression): Column = ColumnBridge.column(e)
  // eager: a lazy ColumnNodeExpression from a function builder survives to
  // codegen unresolved (see ColumnBridge.eagerExpression scaladoc)
  private def x(col: Column): Expression = ColumnBridge.eagerExpression(col)

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v, IntegerType) => v.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INTEGER literal, got $other")
  }

  private def doubleLit(fn: String, arg: String, e: Expression): Double = e match {
    case Literal(v, DoubleType) => v.asInstanceOf[Double]
    case Literal(v, IntegerType) => v.asInstanceOf[Int].toDouble
    // SQL parses bare `0.05` as DECIMAL(2,2), not DOUBLE — accept it, or the
    // natural call graft_lang_id_en(text, 0.05) would demand a 0.05D suffix.
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a DOUBLE literal, got $other")
  }

  private def arity(fn: String, n: Int, exprs: Seq[Expression]): Unit =
    require(exprs.length == n, s"$fn expects $n arguments, got ${exprs.length}")

  /** (name, implementing class for EXPLAIN/DESCRIBE, builder). */
  val registry: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    // ── native expressions ───────────────────────────────────────────────────
    ("vec_dot", classOf[VecDot], { exprs: Seq[Expression] =>
      arity("vec_dot", 2, exprs); VecDot(exprs(0), exprs(1)) }),
    ("sorted_intersect_size", classOf[SortedIntersectSize], { exprs: Seq[Expression] =>
      arity("sorted_intersect_size", 2, exprs)
      SortedIntersectSize(exprs(0), exprs(1)) }),
    ("bloom_might_contain", classOf[BloomMightContain], { exprs: Seq[Expression] =>
      arity("bloom_might_contain", 2, exprs)
      BloomMightContain(exprs(0), exprs(1)) }),
    // graft_repetition_signals(text, topN, dupN): the six Gopher repetition
    // signals as ONE fused native pass returning a 6-double struct — the
    // scalar core behind the graft_repetition TVF.
    ("graft_repetition_signals", classOf[RepetitionSignals], { exprs: Seq[Expression] =>
      arity("graft_repetition_signals", 3, exprs)
      RepetitionSignals(exprs(0),
        intLit("graft_repetition_signals", "topN", exprs(1)),
        intLit("graft_repetition_signals", "dupN", exprs(2))) }),
    // ── sketch aggregates (buffer shape from literal params) ─────────────────
    ("misra_gries", classOf[MisraGries], { exprs: Seq[Expression] =>
      arity("misra_gries", 2, exprs)
      MisraGries(exprs(0), intLit("misra_gries", "k", exprs(1)))
        .toAggregateExpression() }),
    ("graft_kmv_sketch", classOf[KmvSketch], { exprs: Seq[Expression] =>
      arity("graft_kmv_sketch", 2, exprs)
      KmvSketch(exprs(0), intLit("graft_kmv_sketch", "k", exprs(1)))
        .toAggregateExpression() }),
    ("graft_count_min", classOf[CountMinSketch], { exprs: Seq[Expression] =>
      arity("graft_count_min", 3, exprs)
      CountMinSketch(exprs(0), intLit("graft_count_min", "depth", exprs(1)),
        intLit("graft_count_min", "width", exprs(2))).toAggregateExpression() }),
    ("graft_bloom_agg", classOf[BloomFilterAgg], { exprs: Seq[Expression] =>
      arity("graft_bloom_agg", 3, exprs)
      BloomFilterAgg(exprs(0), intLit("graft_bloom_agg", "numBits", exprs(1)),
        intLit("graft_bloom_agg", "numHashes", exprs(2))).toAggregateExpression() }),
    // ── text analysis ────────────────────────────────────────────────────────
    ("graft_tokens", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_tokens", 1, exprs); x(TextFunctions.tokens(c(exprs(0)))) }),
    ("graft_token_count", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_token_count", 1, exprs); x(TextFunctions.tokenCount(c(exprs(0)))) }),
    ("graft_bpe_tokens", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_bpe_tokens", 1, exprs); x(TextFunctions.bpeTokens(c(exprs(0)))) }),
    ("graft_bpe_token_count", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_bpe_token_count", 1, exprs)
      x(TextFunctions.bpeTokenCount(c(exprs(0)))) }),
    ("graft_byte_remap", classOf[ByteRemapExpr], { exprs: Seq[Expression] =>
      arity("graft_byte_remap", 1, exprs)
      ByteRemapExpr(exprs(0), inverse = false) }),
    ("graft_byte_unremap", classOf[ByteRemapExpr], { exprs: Seq[Expression] =>
      arity("graft_byte_unremap", 1, exprs)
      ByteRemapExpr(exprs(0), inverse = true) }),
    ("graft_quality_score", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_quality_score", 1, exprs)
      x(TextFunctions.qualityScore(c(exprs(0)))) }),
    ("graft_lang_id_en", TextFunctions.getClass, { exprs: Seq[Expression] =>
      require(exprs.length == 1 || exprs.length == 2,
        s"graft_lang_id_en(text[, threshold]): got ${exprs.length} arguments")
      val th = if (exprs.length == 2)
        doubleLit("graft_lang_id_en", "threshold", exprs(1)) else 0.05
      x(TextFunctions.langIdEn(c(exprs(0)), th)) }),
    ("graft_lang_id", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_lang_id", 1, exprs)
      x(TextFunctions.langIdMulti(TextFunctions.tokens(c(exprs(0))))) }),
    ("graft_hashed_feature_score", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_hashed_feature_score", 1, exprs)
      x(TextFunctions.hashedFeatureScore(TextFunctions.tokens(c(exprs(0))))) }),
    ("graft_distinct_token_fraction", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_distinct_token_fraction", 1, exprs)
      x(TextFunctions.distinctTokenFraction(TextFunctions.tokens(c(exprs(0))))) }),
    ("graft_fingerprint_md5", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_fingerprint_md5", 1, exprs)
      x(TextFunctions.fingerprintMd5(c(exprs(0)))) }),
    ("graft_rolling_token_hash", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_rolling_token_hash", 1, exprs)
      x(TextFunctions.rollingTokenHash(c(exprs(0)))) }),
    ("graft_redact_pii", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_redact_pii", 1, exprs); x(TextFunctions.redactPii(c(exprs(0)))) }),
    ("graft_html_text", graft.operators.HtmlExtract.getClass, { exprs: Seq[Expression] =>
      arity("graft_html_text", 1, exprs)
      x(graft.operators.HtmlExtract.htmlToText(c(exprs(0)))) }),
    ("graft_max_run_length", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_max_run_length", 1, exprs)
      x(TextFunctions.maxRunLength(c(exprs(0)))) }),
    // ── URL handling ─────────────────────────────────────────────────────────
    ("graft_url_host", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_url_host", 1, exprs); x(TextFunctions.urlHost(c(exprs(0)))) }),
    ("graft_registrable_domain", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_registrable_domain", 1, exprs)
      x(TextFunctions.registrableDomain(c(exprs(0)))) }),
    ("graft_canonical_url", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_canonical_url", 1, exprs)
      x(TextFunctions.canonicalUrl(c(exprs(0)))) }),
    // ── dedup / blocking signatures ──────────────────────────────────────────
    ("graft_word_shingles", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_word_shingles", 2, exprs)
      x(TextFunctions.wordShingles(c(exprs(0)),
        intLit("graft_word_shingles", "n", exprs(1)))) }),
    ("graft_char_shingles", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_char_shingles", 2, exprs)
      x(TextFunctions.charShingles(c(exprs(0)),
        intLit("graft_char_shingles", "n", exprs(1)))) }),
    ("graft_minhash", DedupSuite.getClass, { exprs: Seq[Expression] =>
      arity("graft_minhash", 3, exprs)
      x(DedupSuite.minHashSignature(
        TextFunctions.wordShingles(c(exprs(0)), intLit("graft_minhash", "n", exprs(1))),
        intLit("graft_minhash", "numHashes", exprs(2)))) }),
    ("graft_lsh_bands", DedupSuite.getClass, { exprs: Seq[Expression] =>
      arity("graft_lsh_bands", 3, exprs)
      x(DedupSuite.lshBands(c(exprs(0)),
        intLit("graft_lsh_bands", "numHashes", exprs(1)),
        intLit("graft_lsh_bands", "bands", exprs(2)))) }),
    ("graft_simhash", DedupSuite.getClass, { exprs: Seq[Expression] =>
      require(exprs.length == 1 || exprs.length == 2,
        s"graft_simhash(text[, bits]): got ${exprs.length} arguments")
      val bits = if (exprs.length == 2)
        intLit("graft_simhash", "bits", exprs(1)) else 16
      x(DedupSuite.simHash(c(exprs(0)), bits)) }),
    // ── sharding / splits ────────────────────────────────────────────────────
    ("graft_hash_bucket", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_hash_bucket", 2, exprs)
      x(TextFunctions.hashBucket(c(exprs(0)),
        intLit("graft_hash_bucket", "buckets", exprs(1)))) }),
    ("graft_split_assign", TextFunctions.getClass, { exprs: Seq[Expression] =>
      arity("graft_split_assign", 4, exprs)
      x(TextFunctions.splitAssign(c(exprs(0)),
        intLit("graft_split_assign", "buckets", exprs(1)),
        intLit("graft_split_assign", "trainUpTo", exprs(2)),
        intLit("graft_split_assign", "valUpTo", exprs(3)))) }),
    // ── vectors ──────────────────────────────────────────────────────────────
    ("graft_cosine", classOf[VecDot], { exprs: Seq[Expression] =>
      arity("graft_cosine", 2, exprs)
      x(NativeVec.cosine(c(exprs(0)), c(exprs(1)))) }),
    // ── data layout ──────────────────────────────────────────────────────────
    // graft_zvalue(dim1, dim2[, dim3…], bits): Morton interleave of already-
    // bucketized dims (variadic cols, trailing INTEGER-literal bit width —
    // it shapes the generated expression tree, so it cannot be a column).
    ("graft_zvalue", graft.operators.Layout.getClass, { exprs: Seq[Expression] =>
      require(exprs.length >= 3,
        s"graft_zvalue(dim1, dim2[, …], bits): got ${exprs.length} arguments")
      x(graft.operators.Layout.zValue(exprs.init.map(c),
        intLit("graft_zvalue", "bits", exprs.last))) }),
    ("graft_zbucket", graft.operators.Layout.getClass, { exprs: Seq[Expression] =>
      arity("graft_zbucket", 2, exprs)
      x(graft.operators.Layout.bucket(c(exprs(0)),
        intLit("graft_zbucket", "bits", exprs(1)))) }))

  private def strLit(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a STRING literal, got $other")
  }

  /** TABLE functions — `SELECT * FROM graft_jaccard_pairs('docs', ...)`:
    * the operators that return a RELATION rather than a scalar and therefore
    * cannot ride the scalar registry. The first argument names a table or
    * temp view, resolved against `session` — [[registerAll]] passes the
    * session it was handed (captured at registration, so analysis from a
    * thread whose `SparkSession.active` differs still resolves the catalog
    * the caller registered against), while the [[GraftExtensions]] config
    * path passes `SparkSession.active` by name (no session exists at
    * injection; `sql()`/`ofRows` run analysis inside `withActive`, so active
    * IS the analyzing session there). The remaining arguments are literal
    * operator parameters, passed to the SAME Scala builders the Column API
    * uses — one code path, like the scalar surface.
    *
    * SIDE-EFFECT CAVEAT (user-facing): the Jaccard/containment builders run
    * their driver-side regime gate — count jobs, and possibly a gram-index
    * `localCheckpoint` — while the enclosing query is ANALYZED, so even
    * `EXPLAIN SELECT ... FROM graft_jaccard_pairs(...)` launches Spark jobs.
    * That is the cost of one code path with the adaptive Scala operator;
    * MinHash-pair and group-topk construction are fully lazy. */
  def tableRegistry(session: () => SparkSession): Seq[(String, Class[_],
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    def plan(df: org.apache.spark.sql.DataFrame) = ColumnBridge.logicalPlan(df)
    def tbl(name: String) = session().table(name)
    Seq(
      ("graft_jaccard_pairs", DedupSuite.getClass, { exprs: Seq[Expression] =>
        arity("graft_jaccard_pairs", 6, exprs)
        val f = "graft_jaccard_pairs"
        plan(DedupSuite.ngramJaccardPairs(tbl(strLit(f, "table", exprs(0))),
          strLit(f, "idCol", exprs(1)), strLit(f, "textCol", exprs(2)),
          strLit(f, "blockCol", exprs(3)), intLit(f, "n", exprs(4)),
          doubleLit(f, "threshold", exprs(5)))) }),
      ("graft_containment_pairs", DedupSuite.getClass, { exprs: Seq[Expression] =>
        arity("graft_containment_pairs", 6, exprs)
        val f = "graft_containment_pairs"
        plan(DedupSuite.ngramContainmentPairs(tbl(strLit(f, "table", exprs(0))),
          strLit(f, "idCol", exprs(1)), strLit(f, "textCol", exprs(2)),
          strLit(f, "blockCol", exprs(3)), intLit(f, "n", exprs(4)),
          doubleLit(f, "threshold", exprs(5)))) }),
      ("graft_minhash_pairs", DedupSuite.getClass, { exprs: Seq[Expression] =>
        arity("graft_minhash_pairs", 6, exprs)
        val f = "graft_minhash_pairs"
        plan(DedupSuite.minHashLshPairs(tbl(strLit(f, "table", exprs(0))),
          strLit(f, "idCol", exprs(1)), strLit(f, "textCol", exprs(2)),
          intLit(f, "shingleSize", exprs(3)), intLit(f, "numHashes", exprs(4)),
          intLit(f, "bands", exprs(5)))) }),
      // graft_pq_encode('tbl', 'idCol', 'vecCol', m, ksub): product-
      // quantization codes from a pure-SQL FROM clause — (id, sub, code)
      // rows, one per subspace. Codebooks are the deterministic seed (the
      // ksub lowest-id vectors' subvectors, the q120 convention): geometry
      // params are literals, the codebook matrix itself is data-derived at
      // analysis time (same driver-side-work caveat as the pair TVFs above).
      // Trained codebooks stay Column-API — a trained matrix is not a SQL
      // literal.
      ("graft_pq_encode", graft.operators.ProductQuantization.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_pq_encode", 5, exprs)
        val f = "graft_pq_encode"
        val df = tbl(strLit(f, "table", exprs(0)))
        val idCol = strLit(f, "idCol", exprs(1))
        val vecCol = strLit(f, "vecCol", exprs(2))
        val m = intLit(f, "m", exprs(3))
        val ksub = intLit(f, "ksub", exprs(4))
        val pq = graft.operators.ProductQuantization
        val cb = pq.seedCodebooks(df, vecCol, idCol, m, ksub)
        import org.apache.spark.sql.functions.{col, posexplode}
        plan(pq.encode(df, vecCol, cb)
          .select(col(idCol), posexplode(col("pq_codes")).as(Seq("sub", "code")))
          .select(col(idCol), col("sub").cast("long").as("sub"),
            col("code").cast("long").as("code"))) }),
      // graft_adc_topk('tbl', 'idCol', 'vecCol', m, ksub, queryId, k): the
      // SEARCH side of the PQ surface from a pure-SQL FROM clause — packed-
      // code ADC top-k against the row whose id = queryId (the q121
      // convention), seed codebooks as graft_pq_encode. (id, adc_dist) rows,
      // ascending distance. Query vector and codebooks are data-derived at
      // analysis time (same driver-side-work caveat as the pair TVFs).
      ("graft_adc_topk", graft.operators.ProductQuantization.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_adc_topk", 7, exprs)
        val f = "graft_adc_topk"
        val df = tbl(strLit(f, "table", exprs(0)))
        val idCol = strLit(f, "idCol", exprs(1))
        val vecCol = strLit(f, "vecCol", exprs(2))
        val m = intLit(f, "m", exprs(3))
        val ksub = intLit(f, "ksub", exprs(4))
        val queryId = intLit(f, "queryId", exprs(5))
        val k = intLit(f, "k", exprs(6))
        val pq = graft.operators.ProductQuantization
        import org.apache.spark.sql.functions.{col, lit}
        val cb = pq.seedCodebooks(df, vecCol, idCol, m, ksub)
        val q = df.filter(col(idCol) === lit(queryId))
          .select(col(vecCol).cast("array<double>")).collect().headOption
          .map(_.getSeq[Double](0).toSeq)
          .getOrElse(throw new IllegalArgumentException(
            s"$f: no row with $idCol = $queryId"))
        val encoded = pq.encode(df, vecCol, cb)
          .select(col(idCol), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
        plan(pq.adcTopK(encoded, "packed", idCol, cb, q, k)) }),
      // graft_image_neardup('tbl', maxHamming): image near-duplicate pairs
      // from a pure-SQL FROM clause — the table carries (media_id, payload)
      // binary rows; decode → aHash → Hamming-banded candidates → exact-L1
      // verify, the same Scala chain q137 pins. (id_a, id_b, hamming, l1).
      ("graft_image_neardup", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_image_neardup", 2, exprs)
        val f = "graft_image_neardup"
        plan(graft.operators.Multimodal.imageNearDupPairs(
          tbl(strLit(f, "table", exprs(0))),
          maxHamming = intLit(f, "maxHamming", exprs(1)))) }),
      // graft_repetition('tbl', 'idCol', 'textCol', topN, dupN): the six
      // Gopher repetition quality signals from a pure-SQL FROM clause —
      // duplicate line/paragraph occurrence+character fractions and the
      // top-topN-gram / duplicated-dupN-gram character coverage fractions,
      // exactly the q151/q152 chain; thresholding stays in the caller's SQL.
      ("graft_repetition", graft.operators.RepetitionStats.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_repetition", 5, exprs)
        val f = "graft_repetition"
        import org.apache.spark.sql.functions.col
        plan(graft.operators.RepetitionStats.withRepetitionSignals(
            tbl(strLit(f, "table", exprs(0))),
            strLit(f, "textCol", exprs(2)),
            topN = intLit(f, "topN", exprs(3)),
            dupN = intLit(f, "dupN", exprs(4)))
          .select(col(strLit(f, "idCol", exprs(1))),
            col("dup_line_frac"), col("dup_line_char_frac"),
            col("dup_para_frac"), col("dup_para_char_frac"),
            col("top_gram_char_frac"), col("dup_gram_char_frac"))) }),
      // graft_audio_neardup('tbl', maxHamming): audio near-duplicate pairs
      // from a pure-SQL FROM clause — the table carries (media_id, payload)
      // WAV rows; RIFF parse → 64-frame energy hash → Hamming-banded
      // candidates → exact-L1 verify, the same Scala chain q153 pins.
      // (id_a, id_b, hamming, l1).
      ("graft_audio_neardup", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_audio_neardup", 2, exprs)
        val f = "graft_audio_neardup"
        plan(graft.operators.Multimodal.audioNearDupPairs(
          tbl(strLit(f, "table", exprs(0))),
          maxHamming = intLit(f, "maxHamming", exprs(1)))) }),
      // graft_bm25_index('/index/path', 'term1,term2,…', topK): top-k BM25
      // retrieval over a PERSISTED saveTextIndex layout from a pure-SQL FROM
      // clause — corpus stats from meta/terms, per-term tf rows from the
      // term_bucket-pruned postings, the identical fixed-order IEEE score
      // chain; (doc_id, n_tokens, score) rows, exactly q150's surface.
      ("graft_bm25_index", graft.operators.Retrieval.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_bm25_index", 3, exprs)
        val f = "graft_bm25_index"
        val path = strLit(f, "indexPath", exprs(0))
        val terms = strLit(f, "terms", exprs(1)).split(",").map(_.trim).toSeq
        val k = intLit(f, "topK", exprs(2))
        val ret = graft.operators.Retrieval
        plan(ret.bm25TopKFromIndex(ret.loadTextIndex(session(), path), terms, k)) }),
      // graft_audio_neardup_index('probes', 'indexPath', maxHamming): audio
      // near-dup of a (media_id, payload) probe view AGAINST a persisted
      // MediaIndex — the probes hash in-scan, the catalog side reads parquet
      // fingerprints (never re-decoded); (id_a=probe, id_b=indexed, hamming,
      // l1) rows, exactly q161's chain.
      ("graft_audio_neardup_index", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_audio_neardup_index", 3, exprs)
        val f = "graft_audio_neardup_index"
        plan(graft.operators.Multimodal.audioNearDupAgainstIndex(
          tbl(strLit(f, "probes", exprs(0))),
          strLit(f, "indexPath", exprs(1)),
          maxHamming = intLit(f, "maxHamming", exprs(2)))) }),
      // graft_image_neardup_index('probes', 'indexPath', maxHamming): image
      // near-dup of a (media_id, payload) probe view AGAINST a persisted
      // MediaIndex — the hash family (ahash/dhash) comes from the index
      // meta; probes hash in-scan, the catalog side reads parquet
      // fingerprints; (id_a=probe, id_b=indexed, hamming, l1) rows, exactly
      // q164's chain.
      ("graft_image_neardup_index", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_image_neardup_index", 3, exprs)
        val f = "graft_image_neardup_index"
        plan(graft.operators.Multimodal.imageNearDupAgainstIndex(
          tbl(strLit(f, "probes", exprs(0))),
          strLit(f, "indexPath", exprs(1)),
          maxHamming = intLit(f, "maxHamming", exprs(2)))) }),
      // graft_video_neardup_index('probes', 'indexPath', every, maxHamming,
      // minOverlap): video near-dup of a (media_id, payload) GIF-clip probe
      // view AGAINST a persisted frame-hash MediaIndex — probes demux
      // in-scan, frame-level banding across probe/index, directional
      // containment verify; (id_a=probe, id_b=indexed, m_a, n_a, m_b, n_b,
      // overlap) rows, exactly q163's chain.
      ("graft_video_neardup_index", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_video_neardup_index", 5, exprs)
        val f = "graft_video_neardup_index"
        plan(graft.operators.Multimodal.videoNearDupAgainstIndex(
          tbl(strLit(f, "probes", exprs(0))),
          strLit(f, "indexPath", exprs(1)),
          every = intLit(f, "every", exprs(2)),
          maxHamming = intLit(f, "maxHamming", exprs(3)),
          minOverlap = doubleLit(f, "minOverlap", exprs(4)))) }),
      // graft_video_neardup('table', every, maxHamming, minOverlap): video
      // near-dup over a (media_id, payload) GIF-clip view — per-frame aHash
      // in the demux scan, frame-level Hamming banding, exact directional-
      // containment verify; (id_a, id_b, m_a, n_a, m_b, n_b, overlap) rows.
      ("graft_video_neardup", graft.operators.Multimodal.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_video_neardup", 4, exprs)
        val f = "graft_video_neardup"
        plan(graft.operators.Multimodal.videoNearDupPairs(
          tbl(strLit(f, "table", exprs(0))),
          every = intLit(f, "every", exprs(1)),
          maxHamming = intLit(f, "maxHamming", exprs(2)),
          minOverlap = doubleLit(f, "minOverlap", exprs(3)))) }),
      // graft_unigram_encode('trainTbl', 'encodeTbl', 'idCol', 'textCol',
      // maxPieceLen, vocabSize, iters): the FULL unigram-LM tokenizer chain
      // from a pure-SQL FROM clause — hard-EM training on trainTbl
      // (substring seeds + Viterbi-EM, the q170 loop), then Viterbi-encode
      // encodeTbl with the trained model; (doc_id, pos, token) rows,
      // exactly q171's chain. Training runs at ANALYSIS time (the
      // graft_bpe_encode caveat: iters Viterbi jobs).
      ("graft_unigram_encode", graft.operators.UnigramLm.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_unigram_encode", 7, exprs)
        val f = "graft_unigram_encode"
        val train = tbl(strLit(f, "trainTbl", exprs(0)))
        val enc = tbl(strLit(f, "encodeTbl", exprs(1)))
        val idCol = strLit(f, "idCol", exprs(2))
        val textCol = strLit(f, "textCol", exprs(3))
        val maxLen = intLit(f, "maxPieceLen", exprs(4))
        val ul = graft.operators.UnigramLm
        val model = ul.trainUnigram(train, textCol, maxLen,
          intLit(f, "vocabSize", exprs(5)), intLit(f, "iters", exprs(6)))
        plan(ul.encodeUnigram(enc, idCol, textCol, model, maxLen)) }),
      // graft_bigram_oov('trainTbl', 'scoreTbl', 'idCol', 'textCol',
      // minCount): the bigram-LM OOV novelty filter from a pure-SQL FROM
      // clause — trains the count table on trainTbl, scores scoreTbl
      // (idCol, n_bigrams, n_oov, oov_rate), exactly q142's chain.
      ("graft_bigram_oov", graft.operators.NgramLm.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_bigram_oov", 5, exprs)
        val f = "graft_bigram_oov"
        val train = tbl(strLit(f, "trainTbl", exprs(0)))
        val score = tbl(strLit(f, "scoreTbl", exprs(1)))
        val idCol = strLit(f, "idCol", exprs(2))
        val textCol = strLit(f, "textCol", exprs(3))
        val minCount = intLit(f, "minCount", exprs(4))
        val lm = graft.operators.NgramLm.bigramCounts(train, textCol)
        plan(graft.operators.NgramLm.oovBigramRate(score, idCol, textCol,
          lm, minCount.toLong)) }),
      // graft_bpe_encode('trainTbl', 'encodeTbl', 'idCol', 'textCol',
      // rounds[, byteLevel]): the FULL tokenizer chain from a pure-SQL FROM
      // clause — train the merge table on trainTbl (the q113 loop), derive
      // the alphabet+merges vocabulary, encode encodeTbl scan-side with the
      // native BpeApply expression, explode to (idCol, pos, token_sym,
      // token_id). Optional 6th arg byteLevel (0/1, default 0) switches the
      // whole chain to the GPT-2 byte-level convention (256-entry base
      // alphabet — no OOV possible; see ByteRemap). Training runs at
      // ANALYSIS time (the Jaccard-TVF driver-side-work caveat, amplified:
      // rounds argmax jobs).
      ("graft_bpe_encode", graft.operators.BpeTrainer.getClass,
        { exprs: Seq[Expression] =>
        require(exprs.length == 5 || exprs.length == 6,
          s"graft_bpe_encode expects 5 or 6 arguments, got ${exprs.length}")
        val f = "graft_bpe_encode"
        val train = tbl(strLit(f, "trainTbl", exprs(0)))
        val enc = tbl(strLit(f, "encodeTbl", exprs(1)))
        val idCol = strLit(f, "idCol", exprs(2))
        val textCol = strLit(f, "textCol", exprs(3))
        val rounds = intLit(f, "rounds", exprs(4))
        val byteLevel =
          exprs.length == 6 && intLit(f, "byteLevel", exprs(5)) != 0
        val bpe = graft.operators.BpeTrainer
        import org.apache.spark.sql.functions.{broadcast, col, posexplode}
        val merges = bpe.trainMerges(train, textCol, rounds, byteLevel)
        val voc = bpe.vocab(train, textCol, merges, byteLevel)
        plan(bpe.encodeToIds(enc, textCol, merges, voc, byteLevel = byteLevel)
          .select(col(idCol), posexplode(col("token_ids")))
          .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
            col("col").as("token_id"))
          .join(broadcast(voc.select(col("sym").as("token_sym"),
            col("id").as("token_id"))), Seq("token_id"))
          .select(col(idCol), col("pos"), col("token_sym"), col("token_id"))) }),
      // graft_ivfpq_search('queries', 'qidCol', 'qvecCol', '/index/path',
      // nprobe, k): the BATCH (query-table) IVFADC join over a PERSISTED
      // index (savePqIndex layout) from a pure-SQL FROM clause — loadPqIndex
      // reads the geometry tables (vocab-sized collects) plus the
      // cell-partitioned code frame, a stored rotation seed rotates the
      // query vectors into index space, and the search is the exact
      // ivfPqTopKJoin plan q126 pins (probe GroupTopK, in-scan LUT column,
      // static probe-union cell pruning, per-query GroupTopK).
      // (query_id, vec_id, adc_dist) rows, <= k per query.
      ("graft_ivfpq_search", graft.operators.ProductQuantization.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_ivfpq_search", 6, exprs)
        val f = "graft_ivfpq_search"
        val q = tbl(strLit(f, "queries", exprs(0)))
        val qid = strLit(f, "qidCol", exprs(1))
        val qvec = strLit(f, "qvecCol", exprs(2))
        val path = strLit(f, "indexPath", exprs(3))
        val nprobe = intLit(f, "nprobe", exprs(4))
        val k = intLit(f, "k", exprs(5))
        val pq = graft.operators.ProductQuantization
        val idx = pq.loadPqIndex(session(), path)
        import org.apache.spark.sql.functions.col
        // stored pre-transform (seed-derived OR a persisted learned matrix)
        // rotates queries into index space
        val queries = idx.rotationMatrix(idx.coarse.head.length).fold(q) { rot =>
          q.withColumn(qvec, graft.operators.Rotation.rotate(col(qvec), rot))
        }
        plan(pq.ivfPqTopKJoin(queries, qid, qvec, idx.codes, "packed",
          "vec_id", "cell", idx.coarse, idx.codebooks, nprobe, k,
          residual = idx.residual)) }),
      // graft_knn_graph_sdc('tbl', 'idCol', 'vecCol', m, ksub, k): the FULL
      // k-NN graph by symmetric (code-to-code) distance from a pure-SQL FROM
      // clause — seed codebooks as graft_pq_encode, one synthetic coarse cell
      // (no IVF pruning: every pair is considered; the cell-adjacency scale
      // path stays Scala-side where a trained coarse grid exists).
      // (query_id, idCol, sdc_dist) rows, ≤ k per node, self-excluded.
      ("graft_knn_graph_sdc", graft.operators.ProductQuantization.getClass,
        { exprs: Seq[Expression] =>
        arity("graft_knn_graph_sdc", 6, exprs)
        val f = "graft_knn_graph_sdc"
        val df = tbl(strLit(f, "table", exprs(0)))
        val idCol = strLit(f, "idCol", exprs(1))
        val vecCol = strLit(f, "vecCol", exprs(2))
        val m = intLit(f, "m", exprs(3))
        val ksub = intLit(f, "ksub", exprs(4))
        val k = intLit(f, "k", exprs(5))
        val pq = graft.operators.ProductQuantization
        import org.apache.spark.sql.functions.{col, lit}
        val cb = pq.seedCodebooks(df, vecCol, idCol, m, ksub)
        val encoded = pq.encode(df, vecCol, cb)
          .select(col(idCol),
            pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
            lit(0).as("_cell"))
        plan(pq.knnGraphSdc(encoded, encoded, idCol, "packed", "_cell",
          Seq(Seq(0.0)), cb, nprobe = 1, k = k)) }),
      // graft_group_topk('tbl', 'g1,g2', 'score desc, id asc', k): the custom
      // whole-operator plan (bounded per-group heaps, k rows per
      // (partition, group) at the exchange — see graft.plans.GroupTopK) from
      // a pure-SQL FROM clause. Order specs default to asc; include a unique
      // tie-break column for a deterministic boundary, as with the Scala API.
      ("graft_group_topk", graft.plans.GroupTopK.getClass, { exprs: Seq[Expression] =>
        arity("graft_group_topk", 4, exprs)
        val f = "graft_group_topk"
        val groups = strLit(f, "groupCols", exprs(1)).split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val orderBy = strLit(f, "orderBy", exprs(2)).split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq.map { spec =>
            spec.split("\\s+") match {
              case Array(name) => (name, true)
              case Array(name, dir) if dir.equalsIgnoreCase("asc") => (name, true)
              case Array(name, dir) if dir.equalsIgnoreCase("desc") => (name, false)
              case _ => throw new IllegalArgumentException(
                s"$f: orderBy spec '$spec' is not 'col [asc|desc]'")
            }
          }
        require(groups.nonEmpty && orderBy.nonEmpty,
          s"$f: groupCols and orderBy must be non-empty")
        plan(graft.plans.GroupTopK.topK(tbl(strLit(f, "table", exprs(0))),
          groups, orderBy, intLit(f, "k", exprs(3)))) }))
  }

  /** Runtime registration on an existing session (the `spark.sql.extensions`
    * path only applies at session creation). Idempotent: re-registering a
    * name replaces the identical builder. Table functions resolve their table
    * argument against THIS session, captured here (see [[tableRegistry]]). */
  def registerAll(spark: SparkSession): Unit = {
    registry.foreach { case (name, cls, builder) =>
      ColumnBridge.registerFunction(spark, name,
        new ExpressionInfo(cls.getName, name), builder)
    }
    tableRegistry(() => spark).foreach { case (name, cls, builder) =>
      ColumnBridge.registerTableFunction(spark, name,
        new ExpressionInfo(cls.getName, name), builder)
    }
  }
}
