package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned coverage aggregation with BPM normalization (A10) — the one genuinely
  * big-data aggregation in the pipeline.
  *
  * Re-expresses the deeptools `bamCoverage --normalizeUsing BPM --binSize 10
  * --minMappingQuality 255` stage (`STAR_bigwig2.sh:245-251`): per 10-bp genomic bin,
  * count MAPQ≥255 read starts and normalize to Bins Per Million:
  * `bpm(bin) = count(bin) * 1e6 / Σ count(all bins)`.
  *
  * Scale shape (25M reads/sample × thousands of samples):
  *   - the filter is pushed to the scan; the groupBy `(sample, chrom, bin)` does
  *     map-side partial aggregation, so shuffle volume is #bins, not #reads,
  *   - the per-sample totals are a second tiny aggregate broadcast back — NO
  *     single-partition window (`sum over ()` would serialize at 100 TB).
  */
object CoverageBins {

  /** @param reads (sample_id, chrom, pos, mapq)
    * @return (sample_id, chrom, bin_start, cnt, value) — value BPM-normalized */
  def bpm(reads: DataFrame, binSize: Int = 10, minMapq: Int = 255): DataFrame = {
    val binned = reads
      .filter(col("mapq") >= minMapq)
      .groupBy(
        col("sample_id"), col("chrom"),
        (floor(col("pos") / binSize) * binSize).cast("long").as("bin_start"))
      .agg(count(lit(1)).as("cnt"))

    val totals = binned.groupBy(col("sample_id"))
      .agg(sum(col("cnt")).as("_total"))

    binned.join(broadcast(totals), Seq("sample_id"))
      .withColumn("value", col("cnt").cast("double") * 1e6 / col("_total").cast("double"))
      .drop("_total")
  }
}
