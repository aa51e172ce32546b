package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location for repeated large joins (SURVEY §4 "external sort
  * before merge-join" → Spark's native answer).
  *
  * A join key that is reused across many queries (gene_id in matrix merges,
  * sample_id in per-sample pivots) should be bucketed ONCE at write time; every
  * later equi-join or aggregation on that key then runs shuffle-free — at 100 TB
  * the dominant cost of J2-style matrix merges is otherwise the repeated exchange
  * of both sides.
  *
  * Buckets also bound file sizes: `numBuckets` should put one bucket's rows
  * comfortably in executor memory at target scale (SURVEY §7.4-6).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously bucketed on the same key with the same bucket
    * count: planned as a SortMergeJoin with NO Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
