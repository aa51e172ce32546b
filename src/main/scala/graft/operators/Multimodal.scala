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
        // decoder init would happen HERE, once per partition
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val feat = decodeStub(bytes)
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
          MediaFeatures(id, bytes.length.toLong,
            java.security.MessageDigest.getInstance("MD5").digest(bytes)
              .take(4).map("%02x".format(_)).mkString,
            mean, feat)
        }
      }
  }
}
