package graft.tools

import graft.operators.{DedupSuite, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audio energy-hash near-dup scan: synthesize a WAV corpus (one 2048-sample
  * 16-bit mono clip per id, near-dups planted at id%5==1 — frame-0 amplitude
  * nudge — and exact re-encodes at id%5==2), then time the REAL pipeline
  * phases separately — RIFF parse + 64-frame energy hash (the per-row codec
  * scan), Hamming-banded candidate generation, and exact-L1 verify on the
  * energy arrays. Synthesis cost is fixture cost and excluded (payloads are
  * checkpointed first).
  *
  * Like ImageHashScan (and unlike q153's oracle-replayable mod-4096
  * polynomial), the sample stream is full-entropy splitmix64 so candidate
  * density reflects the OPERATOR, not fixture collisions.
  *
  * Usage: AudioHashScan <nClips> [label]
  */
object AudioHashScan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AudioHashScan <nClips> [label]")
    val nClips = args(0).toLong
    val label = args.lift(1).getOrElse(s"n$nClips")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def sampleFor(id: Long, t: Int): Short = {
      val b = if (id % 5 == 1) id - 1 else if (id % 5 == 2) id - 2 else id
      val s0 = (((mix(b * 2048L + t) % 4096) + 4096) % 4096 - 2048).toInt
      (if (id % 5 == 1 && t < 32) s0 + 192 else s0).toShort
    }
    val media = spark.range(0, nClips, 1, 32).select(col("id")).as[Long]
      .map(id => (id, Multimodal.encodeWav(
        Array.tabulate(2048)(t => sampleFor(id, t)), 8000)))
      .toDF("media_id", "payload")
      .localCheckpoint(true) // fixture cost ends here
    val n = media.count()

    val t0 = System.nanoTime()
    val hashes = Multimodal.audioEnergyHashes(media, frames = 64)
      .toDF().localCheckpoint(true)
    val hashSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val cand = DedupSuite.hammingBandedPairs(
      hashes.select(col("media_id"), col("fp")), "media_id", "fp",
      bits = 64, maxHamming = 3).localCheckpoint(true)
    val nPairs = cand.count()
    val bandSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val verified = cand
      .join(hashes.select(col("media_id").as("id_a"), col("energies").as("_ea")), Seq("id_a"))
      .join(hashes.select(col("media_id").as("id_b"), col("energies").as("_eb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        aggregate(zip_with(col("_ea"), col("_eb"),
          (a, b) => abs(a - b)), lit(0L), (acc, v) => acc + v).as("l1"))
    // planted nudge delta is exactly 32*192 = 6144; exact twins are 0
    val nTight = verified.filter(col("l1") <= 6144).count()
    val verifySec = (System.nanoTime() - t2) / 1e9
    val planted = cand.filter(
      (col("id_b") - col("id_a") <= 2) && (pmod(col("id_a"), lit(5)) === 0)).count()

    println(f"""{"metric":"audio_hash_scan","label":"$label","n_clips":$n,"hash_sec":$hashSec%.2f,"clips_per_sec":${(n / math.max(hashSec, 1e-9)).toLong},"band_sec":$bandSec%.2f,"candidate_pairs":$nPairs,"verify_sec":$verifySec%.2f,"tight_pairs_l1_6144":$nTight,"planted_family_pairs":$planted}""")
    spark.stop()
  }
}
