package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson–Spärck Jones Okapi weighting) over a
  * document corpus — the query-side consumer of the inverted-index prep (q90)
  * and the standard relevance score for retrieval-augmented training-data
  * selection.
  *
  * Formula per (doc, term): idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
  * summed over query terms in fixed order. The idf is the RATIONAL core of the
  * Robertson form, (N − df + 0.5)/(df + 0.5), without the enclosing log: log is
  * monotone, so top-k per term is unchanged, and the rational form is exact
  * IEEE division — bit-identical across engines (same trick as
  * [[TfIdf]]'s rational idf; production rankers that want the damped scale put
  * the log back and lose only oracle-exactness, not correctness).
  *
  * Scale shape: two corpus passes, both scan-shaped. Pass 1 reduces map-side to
  * (N, Σdl, df per query term) — a handful of longs; at 100 TB with a standing
  * query workload these come precomputed from the inverted index's df column
  * instead. Pass 2 computes every per-doc term frequency with higher-order
  * functions during the scan (no explode, no shuffle) and feeds
  * TakeOrderedAndProject — the global top-k materializes k rows per partition,
  * never a global sort. Defaults k1=1.5, b=0.75 are in the standard Okapi range
  * and exactly representable in binary, so the arithmetic chain is
  * reproducible down to the last bit.
  */
object Retrieval {

  /** Per-document BM25 scores for `queryTerms`: (id, n_tokens, score), one row
    * per document (docs matching no term score 0.0). */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    val staged = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), size(col("_toks")).cast("long").as("_dl"))

    // Pass 1: corpus stats — one aggregate job, map-side combined to 2+|q| longs.
    val statCols = count(lit(1)).as("n") +: sum(col("_dl")).as("sdl") +:
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("_toks"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = staged.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = stats.getAs[Long]("n")
    require(n > 0, "bm25Scores: empty corpus (avgdl undefined — every score would be NaN)")
    val avgdl = stats.getAs[Long]("sdl").toDouble / n.toDouble

    // Pass 2: scan-side scoring; fixed-order term sum keeps doubles exact.
    val dl = col("_dl").cast("double")
    val termScores = queryTerms.zipWithIndex.map { case (t, i) =>
      val df = stats.getAs[Long](s"df_$i")
      val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
      val tf = size(filter(col("_toks"), x => x === t)).cast("double")
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / lit(avgdl))))
    }
    staged.select(col(idCol), col("_dl").as("n_tokens"),
      termScores.reduceLeft(_ + _).as("score"))
  }

  /** Top-k BM25 retrieval, deterministically tie-broken by ascending id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int,
               k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Inverted-index build (retrieval prep, the producer side of [[bm25Scores]]'
    * document frequencies): one row per distinct term — (term, df,
    * postings_head). `df` is the EXACT document frequency; `postings_head` is
    * the first `headPostings` doc ids of the id-sorted postings list,
    * comma-joined.
    *
    * The head cap is the scale contract: a stopword-class term's full postings
    * list is corpus-sized, so materializing it whole in one row would bottom
    * out in a single straggler task (and a 2 GB array limit) at 100 TB. The
    * verified surface is (exact df, bounded head); full lists shard by term —
    * the same relation keyed (term, doc_id) without the collect_list.
    *
    * Plan shape: distinct terms in-scan (array_distinct before the explode,
    * so a doc contributes each term once), one hash aggregate by term;
    * collect_list is bounded post-sort by `slice`. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    headPostings: Int = 32): DataFrame = {
    require(headPostings > 0, s"headPostings must be positive: $headPostings")
    docs
      .select(col(idCol), explode(array_distinct(
        TextFunctions.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(
          slice(array_sort(collect_list(col(idCol))), 1, headPostings),
          x => x.cast("string"))).as("postings_head"))
  }

  // ── persisted text index (the savePqIndex layout discipline) ──────────────

  /** A loaded [[saveTextIndex]] index: corpus stats driver-side (two longs),
    * the term→df table and the full sharded postings lazy. */
  final case class TextIndex(nDocs: Long, sumDl: Long, nBuckets: Int,
                             terms: DataFrame, postings: DataFrame,
                             doclens: DataFrame) {
    def avgdl: Double = sumDl.toDouble / nDocs.toDouble
  }

  /** The COMMITTED index state at `path`: the highest-numbered `meta_gN`
    * directory whose `_SUCCESS` marker landed — the single commit point of
    * the save/append protocol. Returns (gen, n_docs, sum_dl, n_buckets,
    * committed gens). */
  private def committedMeta(spark: org.apache.spark.sql.SparkSession,
                            path: String): Option[(Int, Long, Long, Int, Seq[Int])] = {
    import spark.implicits._
    GenCommit.listGens(spark, path, "meta_g", requireSuccess = true).sorted.lastOption
      .map { g =>
        val m = spark.read.parquet(s"$path/meta_g$g")
          .select(col("n_docs"), col("sum_dl"), col("n_buckets").cast("int"),
            col("gens"))
          .as[(Long, Long, Int, Seq[Int])].collect().head
        (g, m._1, m._2, m._3, m._4)
      }
  }

  /** Driver-side twin of [[TextFunctions.hashBucket]] for a literal term —
    * first 32 md5 bits of the string, mod `buckets` (the same arithmetic the
    * column expression and every oracle use). */
  private[operators] def bucketOfLiteral(s: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** Persist the retrieval index for `docs` — the statistics [[bm25Scores]]
    * recomputes per run, written once at ingest time (the savePqIndex
    * discipline: an index is a DATASET, not a driver object):
    *
    *   - `postings`: the FULL sharded postings relation (term, doc_id, tf),
    *     written `partitionBy(term_bucket)` ([[TextFunctions.hashBucket]] of
    *     the term, `nBuckets` dirs) so a query-term lookup prunes at FILE
    *     level — one row per (term, doc) pair, never a corpus-sized list in
    *     one row (the [[invertedIndex]] head-cap rationale, solved by layout
    *     instead of truncation);
    *   - `doclens`: (doc_id, dl) — the per-doc length BM25's normalizer
    *     needs;
    *   - `terms`: (term, df) exact document frequencies (vocab-sized);
    *   - `meta`: one row (n_docs, sum_dl, n_buckets, committed gens).
    *
    * Exact integer statistics throughout, so a reloaded index ranks
    * BIT-IDENTICALLY to the from-corpus pass (spec-pinned).
    *
    * Commit protocol (shared with [[appendToTextIndex]]): every write lands
    * under an explicit GENERATION — `gen=N` partitions for postings/doclens,
    * `terms_gN` / `meta_gN` directories for the derived tables — and a
    * generation becomes visible only when its `meta_gN` directory commits
    * (`_SUCCESS` marker). Readers take the highest committed meta and filter
    * postings/doclens to its `gens` list, so a crash at ANY point leaves the
    * previously committed index exactly as it was and orphaned files from
    * the failed attempt are never read. */
  def saveTextIndex(docs: DataFrame, idCol: String, textCol: String,
                    path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    // resolve the input FIRST (select analyzes eagerly — a typo'd column
    // throws here), THEN clear the path: a bad call must not destroy a good
    // committed index before writing nothing
    val staged = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).cast("long").as("dl"))
    // a fresh save owns the path: clear stale generations from any previous
    // index here, or their higher-numbered metas would shadow this one —
    // fencing out in-flight appenders first (a held lease refuses loudly)
    // and keeping the WHOLE rebuild fenced (withSaveFence re-creates the
    // lease right after the recursive delete, so a second concurrent save
    // fails on the acquire instead of interleaving overwrite writes)
    GenCommit.withSaveFence(spark, path) { tok =>
    staged.select(col("doc_id"), col("dl"), lit(0).as("gen"))
      .write.mode("overwrite").partitionBy("gen").parquet(s"$path/doclens")
    val postings = staged
      .select(col("doc_id"), explode(col("_toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    postings
      .withColumn("term_bucket", TextFunctions.hashBucket(col("term"), nBuckets))
      .withColumn("gen", lit(0))
      .write.mode("overwrite").partitionBy("gen", "term_bucket")
      .parquet(s"$path/postings")
    // df from the postings relation: one row per (term, doc) ⇒ count = docs
    // containing the term — the exact array_contains statistic
    spark.read.parquet(s"$path/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/terms_g0")
    val stats = staged.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .as[(Long, Long)].collect().head
    GenCommit.assertHeld(spark, path, tok) // commit fence
    // the commit: meta_g0 landing (with _SUCCESS) makes generation 0 visible
    Seq((stats._1, stats._2, nBuckets, Seq(0)))
      .toDF("n_docs", "sum_dl", "n_buckets", "gens")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_g0")
    }
  }

  /** Append `newDocs` to a PERSISTED [[saveTextIndex]] index WITHOUT
    * re-tokenizing the already-indexed corpus — the [[ProductQuantization
    * .appendToPqIndex]] discipline for the text side: new postings/doclens
    * parquet files land beside the old ones (file-level term_bucket pruning
    * keeps working across both generations), while the two vocabulary-sized
    * tables rebuild incrementally — `terms` as old-df ⊕ new-per-term doc
    * counts (a driver-side merge of two vocab-sized reads; NEVER a full
    * postings rescan) and `meta` by adding the new corpus stats.
    *
    * Loud contracts: the index must exist (no committed meta fails loudly),
    * the bucket count comes from META — not a caller parameter — so the new
    * postings shard exactly like the old, and `newDocs` ids must be disjoint
    * from the COMMITTED ids (an overlapping append would double-count df/dl
    * for every downstream reader).
    *
    * Crash safety: the append is a new GENERATION. Postings/doclens land
    * under a fresh `gen=N` partition, the merged vocabulary under `terms_gN`,
    * and the single COMMIT is the final `meta_gN` write — readers only see
    * generations listed by the highest committed meta, so a crash anywhere
    * mid-append leaves the old index fully consistent AND readable, and a
    * retry simply takes the next generation number (the orphaned files of
    * the failed attempt are never listed, at the cost of dead bytes until a
    * fresh [[saveTextIndex]] reclaims the path). */
  def appendToTextIndex(newDocs: DataFrame, idCol: String, textCol: String,
                        path: String): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    // writer lease: held while the generation is in flight, so a racing
    // vacuum cannot reclaim it as an orphan and a second appender fails
    // loudly instead of interleaving generation numbers. The committed meta
    // is read INSIDE the lease: read before it, a concurrent append could
    // commit between the read and our acquire and our meta — carrying the
    // stale gens list — would hide its committed generation.
    GenCommit.withLease(spark, path) { tok =>
    val (metaGen, nDocs, sumDl, nBuckets, gens) = committedMeta(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"appendToTextIndex: no committed index meta at $path — saveTextIndex first"))
    // next generation: strictly above everything on disk — committed gens AND
    // orphans from crashed attempts (doclens partition dirs + meta dirs are
    // both pure filesystem listings)
    val newGen = GenCommit.nextGen(spark, path, "doclens", gens)
    // one evaluation for the whole generation: the clash check, doclens,
    // postings, terms merge, and meta stats below each re-run this plan —
    // a non-deterministic newDocs (sample, order-dependent dedup) would
    // otherwise commit mutually inconsistent shards as a "valid" generation
    val staged = newDocs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).cast("long").as("dl"))
      .localCheckpoint()
    val clashes = staged.select(col("doc_id"))
      .join(spark.read.parquet(s"$path/doclens")
          .filter(col("gen").isin(gens: _*)).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .limit(5).as[Long].collect()
    require(clashes.isEmpty,
      s"appendToTextIndex: doc ids already indexed at $path: ${clashes.mkString(", ")}")
    staged.select(col("doc_id"), col("dl"), lit(newGen).as("gen"))
      .write.mode("append").partitionBy("gen").parquet(s"$path/doclens")
    val postings = staged
      .select(col("doc_id"), explode(col("_toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    postings
      .withColumn("term_bucket", TextFunctions.hashBucket(col("term"), nBuckets))
      .withColumn("gen", lit(newGen))
      .write.mode("append").partitionBy("gen", "term_bucket")
      .parquet(s"$path/postings")
    // vocab-sized driver merge of the committed terms table with the new
    // per-term doc counts — never a full postings rescan
    val newDf = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val oldDf = spark.read.parquet(s"$path/terms_g$metaGen")
      .select(col("term"), col("df").cast("long"))
      .as[(String, Long)].collect().toMap
    val merged = (oldDf.keySet ++ newDf.keySet).toSeq.map(t =>
      (t, oldDf.getOrElse(t, 0L) + newDf.getOrElse(t, 0L)))
    merged.toDF("term", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/terms_g$newGen")
    val (newN, newSdl) = staged
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("sdl"))
      .as[(Long, Long)].collect().head
    GenCommit.assertHeld(spark, path, tok) // commit fence (TTL takeover aborts here)
    // the commit: once meta_gN lands with _SUCCESS the new generation is
    // visible atomically (readers pick the highest committed meta)
    Seq((nDocs + newN, sumDl + newSdl, nBuckets, gens :+ newGen))
      .toDF("n_docs", "sum_dl", "n_buckets", "gens")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_g$newGen")
    }
  }

  /** Reclaim the dead bytes crashed appends leave behind ([[GenCommit
    * .vacuum]]): orphaned postings/doclens `gen=N` partitions never listed
    * by any committed meta, plus superseded `terms_gN`/`meta_gN` dirs below
    * the current generation. Nothing reachable from the committed meta is
    * touched; scores are bit-identical before and after (spec-pinned).
    * Refuses (throws) while an append's writer lease is fresh — an
    * in-flight generation looks like an orphan until its meta commits; a
    * stale lease (dead writer) ages out after the TTL. Returns the number
    * of directories removed. */
  def vacuumTextIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Int =
    // the meta read happens INSIDE the held lease (the vacuum thunk): read
    // before acquisition, an append committing in between would get its
    // fresh generation — absent from the stale gens list — reclaimed
    GenCommit.vacuum(spark, path, Seq("doclens", "postings"), Seq("terms_g")) {
      val (metaGen, _, _, _, gens) = committedMeta(spark, path)
        .getOrElse(throw new IllegalArgumentException(
          s"vacuumTextIndex: no committed index meta at $path — saveTextIndex first"))
      (gens, metaGen)
    }

  /** Load a [[saveTextIndex]] index: the highest COMMITTED meta collects
    * driver-side; terms, postings and doclens stay lazy, filtered to the
    * committed generations (uncommitted files from a crashed append are
    * invisible — `gen` is a partition column, so the filter prunes at file
    * level and never reads the orphans). */
  def loadTextIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): TextIndex = {
    val (metaGen, nDocs, sumDl, nBuckets, gens) = committedMeta(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"loadTextIndex: no committed index meta at $path — saveTextIndex first"))
    require(nDocs > 0, s"loadTextIndex: empty corpus index at $path")
    TextIndex(nDocs, sumDl, nBuckets,
      spark.read.parquet(s"$path/terms_g$metaGen"),
      spark.read.parquet(s"$path/postings")
        .filter(col("gen").isin(gens: _*)).drop("gen"),
      spark.read.parquet(s"$path/doclens")
        .filter(col("gen").isin(gens: _*)).drop("gen"))
  }

  /** Per-document BM25 scores from a PERSISTED index — [[bm25Scores]]
    * without its two corpus passes: corpus stats come from the meta/terms
    * tables (the standing-workload shape the [[bm25Scores]] scaladoc
    * promises), per-term tf rows come from the postings relation with BOTH
    * the term predicate and its term_bucket literal (file-level pruning),
    * and the score chain is the IDENTICAL fixed-order IEEE expression — a
    * reloaded index scores bit-identically (spec-pinned; q150 runs q94's
    * oracle THROUGH the persistence round-trip). One row per indexed doc,
    * non-matching docs score 0.0, exactly as the from-corpus pass. */
  def bm25ScoresFromIndex(index: TextIndex, queryTerms: Seq[String],
                          k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    val dfs: Map[String, Long] = index.terms
      .filter(col("term").isin(queryTerms: _*))
      .select(col("term"), col("df").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = index.nDocs
    val avgdl = index.avgdl
    val withTfs = queryTerms.zipWithIndex.foldLeft(
      index.doclens.select(col("doc_id"), col("dl"))) { case (acc, (t, i)) =>
      acc.join(
        // int literal: the partition column reads back as INT, and a same-
        // type comparison keeps partition pruning cast-free
        index.postings
          .filter(col("term_bucket") === lit(bucketOfLiteral(t, index.nBuckets).toInt)
            && col("term") === t)
          .select(col("doc_id"), col("tf").as(s"_tf$i")),
        Seq("doc_id"), "left")
    }
    val dl = col("dl").cast("double")
    val termScores = queryTerms.zipWithIndex.map { case (t, i) =>
      val df = dfs.getOrElse(t, 0L)
      val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
      val tf = coalesce(col(s"_tf$i"), lit(0L)).cast("double")
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / lit(avgdl))))
    }
    withTfs.select(col("doc_id"), col("dl").as("n_tokens"),
      termScores.reduceLeft(_ + _).as("score"))
  }

  /** Top-k BM25 from a persisted index — [[bm25TopK]]'s reload twin. */
  def bm25TopKFromIndex(index: TextIndex, queryTerms: Seq[String], topK: Int,
                        k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    bm25ScoresFromIndex(index, queryTerms, k1, b)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal rank fusion (Cormack, Clarke & Büttner 2009): fuse N ranked
    * candidate lists into one by score = Σ_lists 1/(k0 + rank_list), rank
    * 1-based, items absent from a list contributing 0 — THE standard hybrid
    * retrieval combiner (BM25 list × embedding-ANN list), robust to the
    * lists' incomparable raw scores because only ranks survive.
    *
    * Each list arrives as (frame, ordering): the frame carries `idCol`
    * (and `queryCol` in batch mode), the ordering ranks it (ties broken by
    * ascending id — every ranking here is deterministic or it isn't a
    * ranking). Contributions join FULL-outer and add in LIST order
    * (left-assoc, fixed arity — the oracle-replayable IEEE shape; a groupBy
    * sum would add in shuffle order). Inputs are top-k candidate LISTS, and
    * the bound is STRUCTURAL, not just contractual: each list is pre-trimmed
    * to its top `maxListSize` rows under its own ordering before ranking —
    * unbatched via TakeOrderedAndProject (k rows per partition, never a
    * global sort), batch mode via GroupTopK per query — so the rank windows
    * (single-partition in unbatched mode) see at most `maxListSize` rows per
    * query no matter what the caller feeds in. Items beyond the trim
    * contribute 0, which IS the RRF definition (ranks past the candidate
    * list don't exist). Batch mode (`queryCol` set) partitions the windows
    * by query and takes the fused top-k through GroupTopK. Output:
    * ([queryCol,] idCol, rrf_score) — topK rows per query, descending score,
    * ties to the lower id. */
  def rrfFuse(lists: Seq[(DataFrame, Seq[(String, Boolean)])], idCol: String,
              topK: Int, k0: Int = 60,
              queryCol: Option[String] = None,
              maxListSize: Int = 10000): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(topK > 0 && k0 >= 0, s"bad topK=$topK/k0=$k0")
    require(maxListSize >= topK,
      s"maxListSize=$maxListSize must cover topK=$topK")
    val keyCols = queryCol.toSeq :+ idCol
    val contribs = lists.zipWithIndex.map { case ((df, ord), i) =>
      require(ord.nonEmpty, s"list $i needs an ordering")
      val fullOrd = ord :+ (idCol -> true)
      val sort = fullOrd.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }
      // structural bound on the rank windows: only the top maxListSize of
      // each list (per query in batch mode) can contribute
      val trimmed = queryCol match {
        case Some(q) => graft.plans.GroupTopK.topK(df, Seq(q), fullOrd, maxListSize)
        case None    => df.orderBy(sort: _*).limit(maxListSize)
      }
      val w = queryCol.fold(Window.orderBy(sort: _*))(q =>
        Window.partitionBy(col(q)).orderBy(sort: _*))
      trimmed.select(keyCols.map(col) :+
        (lit(1.0) / (lit(k0) + row_number().over(w)).cast("double"))
          .as(s"_rrf$i"): _*)
    }
    val joined = contribs.reduce((a, b) => a.join(b, keyCols, "full"))
    val fused = joined.select(keyCols.map(col) :+
      lists.indices.map(i => coalesce(col(s"_rrf$i"), lit(0.0)))
        .reduce(_ + _).as("rrf_score"): _*)
    queryCol match {
      case Some(q) => graft.plans.GroupTopK.topK(fused,
        Seq(q), Seq("rrf_score" -> false, idCol -> true), topK)
      case None => fused.orderBy(col("rrf_score").desc, col(idCol)).limit(topK)
    }
  }
}
