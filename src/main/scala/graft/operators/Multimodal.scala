package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: opaque `binary` payloads with
  * typed metadata, processed by per-partition batch transforms.
  *
  * The decode kernels themselves (JPEG/PNG/audio codecs) are NOT in this
  * container, so [[decodeStub]] is a clearly-marked deterministic fake — the
  * Spark-side shape is real: binary column + metadata struct, `mapPartitions`
  * batch processing with one decoder init per partition (the Scala analog of
  * `mapInPandas` batching), partition sizing by byte budget.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Feature row produced by the decode/extract stage. */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, sha_prefix: String,
                                 mean_byte: Double, feature: Array[Float])

  /** Wrap an id + binary payload into the canonical media frame. */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta"))

  /** ??? — STUB: a real deployment links an image/audio codec here (initialized
    * once per partition, fed byte batches). This deterministic fake derives a
    * 8-dim "feature" from the payload bytes so the plumbing (batching, schema,
    * partition shape) is testable end-to-end without the codec. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Decode / feature-extract over payload batches: one decoder per partition,
    * rows streamed through it (never materializing the whole partition). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init: real codecs (and this digest) are set up ONCE here
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val feat = decodeStub(bytes)
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
          md.reset()
          MediaFeatures(id, bytes.length.toLong,
            md.digest(bytes).take(4).map("%02x".format(_)).mkString,
            mean, feat)
        }
      }
  }

  /** ??? — STUB resize: a real deployment decodes, scales to `w`×`h`, re-encodes.
    * The fake keeps the byte-length contract (w·h bytes) deterministically so
    * downstream batching/schema logic is exercised for real. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    }
    out
  }

  final case class ResizedMedia(media_id: Long, width: Int, height: Int,
                                payload: Array[Byte])

  /** Resize stage: same per-partition batch shape as [[extractFeatures]]. */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would happen HERE
        it.map { case (id, payload) =>
          ResizedMedia(id, w, h,
            resizeStub(if (payload == null) Array.emptyByteArray else payload, w, h))
        }
      }
  }

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: emit every `every`-th fixed-size chunk of the payload as a
    * "frame" (??? — STUB for a real demuxer; one row in → many rows out is the
    * genuine plumbing being exercised: a flatMap generator, so a 100 GB video
    * partition streams frames without buffering them all). */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = if (payload == null) Array.emptyByteArray else payload
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by every).iterator.map { f =>
          MediaFrame(id, f, java.util.Arrays.copyOfRange(bytes, f * frameBytes,
            (f + 1) * frameBytes))
        }
      }
  }
}
