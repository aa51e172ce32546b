package graft.tools

import graft.operators.{DedupSuite, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Image perceptual-hash near-dup scan: synthesize a PNG corpus (one 8×8
  * grayscale image per document id, q137's construction with planted
  * near-dups at id%5==1 and exact twins at id%5==2), then time the REAL
  * pipeline phases separately — decode+aHash (the per-row codec scan),
  * Hamming-banded candidate generation, and exact-L1 verify. Synthesis cost
  * is fixture cost and excluded from the operator timings (payloads are
  * checkpointed first).
  *
  * Usage: ImageHashScan <docsDir> [label]   (docsDir has documents.parquet;
  * only doc_id is read)
  */
object ImageHashScan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ImageHashScan <docsDir> [label]")
    val dir = args(0)
    val label = args.lift(1).getOrElse(dir.split('/').last)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // Unlike q137's oracle-replayable arithmetic (whose mod-256 polynomial
    // spans only ~65k distinct images — fine at oracle scale, degenerate at
    // 500k), the scan corpus needs full-entropy pixels so candidate density
    // reflects the OPERATOR, not fixture collisions: splitmix64 on (base, p).
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def grayFor(id: Long, p: Int): Int = {
      val b = if (id % 5 == 1) id - 1 else if (id % 5 == 2) id - 2 else id
      val g0 = ((mix(b * 64L + p) % 256 + 256) % 256).toInt
      if (id % 5 == 1 && p == 0) { if (g0 < 128) g0 + 48 else g0 - 48 } else g0
    }
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map(id => (id, Multimodal.encodePngGray(8, 8,
        Array.tabulate(64)(p => grayFor(id, p)))))
      .toDF("media_id", "payload")
      .localCheckpoint(true) // fixture cost ends here
    val n = media.count()

    val t0 = System.nanoTime()
    val hashes = Multimodal.imageAHashes(media).toDF().localCheckpoint(true)
    val hashSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val cand = DedupSuite.hammingBandedPairs(
      hashes.select(col("media_id"), col("fp")), "media_id", "fp",
      bits = 64, maxHamming = 3).localCheckpoint(true)
    val nPairs = cand.count()
    val bandSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val verified = cand
      .join(hashes.select(col("media_id").as("id_a"), col("gray").as("_ga")), Seq("id_a"))
      .join(hashes.select(col("media_id").as("id_b"), col("gray").as("_gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        aggregate(zip_with(col("_ga"), col("_gb"),
          (a, b) => abs(a - b).cast("long")), lit(0L), (acc, v) => acc + v).as("l1"))
    val nTight = verified.filter(col("l1") <= 64).count()
    val verifySec = (System.nanoTime() - t2) / 1e9
    val planted = cand.filter(
      (col("id_b") - col("id_a") <= 2) && (pmod(col("id_a"), lit(5)) === 0)).count()

    println(f"""{"metric":"image_hash_scan","label":"$label","n_images":$n,"hash_sec":$hashSec%.2f,"images_per_sec":${(n / math.max(hashSec, 1e-9)).toLong},"band_sec":$bandSec%.2f,"candidate_pairs":$nPairs,"verify_sec":$verifySec%.2f,"tight_pairs_l1_64":$nTight,"planted_family_pairs":$planted}""")
    spark.stop()
  }
}
