package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composition every 100 TB text
  * pipeline runs before tokenization:
  *
  *   1. quality gate ([[TextFunctions.qualityScore]] ≥ threshold),
  *   2. language filter ([[TextFunctions.langIdEn]]),
  *   3. near-duplicate removal: MinHash-LSH candidate pairs over the SURVIVORS
  *      ([[DedupSuite.minHashLshPairs]]) resolved into clusters
  *      ([[DedupSuite.connectedComponents]]), keeping each cluster's min-id
  *      document ([[DedupSuite.canonicalByCluster]]).
  *
  * Scale shape: steps 1–2 are scan-side column predicates (zero shuffle, and
  * they shrink the corpus BEFORE the dedup shuffles — filter-first ordering is
  * the point); step 3 shuffles only (id, band) pairs and id-pair edges.
  */
object CurationPipeline {

  /** Curate `docs`: returns the kept subset (same schema as the input). */
  def curate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.5,
             shingleSize: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val filtered = docs.filter(
      TextFunctions.qualityScore(col(textCol)) >= minQuality &&
        TextFunctions.langIdEn(col(textCol)) === "en")
    val pairs = DedupSuite
      .minHashLshPairs(filtered, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("id_a"), col("id_b"))
    DedupSuite.canonicalByCluster(filtered, idCol, pairs)
  }

  /** Curation survival report: per-stage kept counts (one pass per stage). */
  def report(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.5): DataFrame = {
    import docs.sparkSession.implicits._
    val total = docs.count()
    val q = docs.filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
    val nQ = q.count()
    val l = q.filter(TextFunctions.langIdEn(col(textCol)) === "en")
    val nL = l.count()
    val nFinal = curate(docs, idCol, textCol, minQuality).count()
    Seq(
      ("input", total),
      ("quality_gate", nQ),
      ("language_filter", nL),
      ("near_dup_canonical", nFinal)).toDF("stage", "n_docs")
  }
}
