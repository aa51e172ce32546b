package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level deduplication — the cheapest dedup tier in a crawl pipeline,
  * run BEFORE any content hashing: the same page refetched under fragment /
  * tracking-param / case / default-port / trailing-slash variants collapses
  * onto one canonical key ([[TextFunctions.canonicalUrl]]) and one survivor
  * (minimum id — deterministic and regeneration-stable) is kept per key.
  *
  * Scale shape: one shuffle, keyed by the canonical URL (dedup cannot do
  * better — grouping by key IS the operation); the verdict is a window `min`
  * over the key partition, so rows move once and nothing joins back. At
  * 100 TB the canonical key is also the right partition key to persist,
  * making the next incremental crawl's dedup an anti-join against an index
  * (the q76 pattern). */
object UrlDedup {

  /** One row per input doc: (id, canonical_url, keep) — keep = this row has
    * the minimum id for its canonical URL. */
  def dedupByCanonicalUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = docs.select(col(idCol),
      TextFunctions.canonicalUrl(col(urlCol)).as("canonical_url"))
    canon.select(col(idCol), col("canonical_url"),
      (col(idCol) ===
        min(col(idCol)).over(Window.partitionBy(col("canonical_url")))).as("keep"))
  }
}
