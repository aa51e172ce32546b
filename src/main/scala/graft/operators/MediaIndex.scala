package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted media-FINGERPRINT index — the text-index/savePqIndex
  * persistence discipline applied to the image/audio/video hash families:
  * fingerprints (and their exact-verify payloads — grayscale thumbnails,
  * frame energies) are computed ONCE at ingest and stored as a DATASET, so
  * an iterative crawl near-dups each arriving batch against the index
  * without ever re-decoding the already-indexed payload bytes. At media
  * scale the DECODE is the expensive leg (the fingerprint table is ~100
  * bytes/item against multi-KB..MB payloads) — recomputing hashes from
  * payloads every run, as the batch near-dup operators do, is exactly what
  * an index exists to avoid.
  *
  * Layout (the [[GenCommit]] protocol, shared with [[Retrieval]]'s text
  * index): `fingerprints/gen=N/` data partitions, `meta_gN` commit dirs
  * (kind, n_items, gens). A crash mid-append leaves the old index readable
  * and consistent; a retry takes the next generation.
  *
  * The frame is keyed by `media_id`; every other column rides along (fp,
  * energies, gray, frame_idx — whatever the modality's verify needs).
  * `kind` names the hash family (e.g. "audio_energy_64", "image_ahash_64",
  * "video_frame_ahash_64") and appends must match it — banding fingerprints
  * from different hash functions would silently produce garbage candidates.
  */
object MediaIndex {

  /** A loaded index: meta driver-side, fingerprints lazy (committed
    * generations only; `gen` stripped). */
  final case class Index(kind: String, nItems: Long, fingerprints: DataFrame)

  private def committedMeta(spark: SparkSession,
                            path: String): Option[(Int, String, Long, Seq[Int])] = {
    import spark.implicits._
    GenCommit.listGens(spark, path, "meta_g", requireSuccess = true)
      .sorted.lastOption.map { g =>
        val m = spark.read.parquet(s"$path/meta_g$g")
          .select(col("kind"), col("n_items"), col("gens"))
          .as[(String, Long, Seq[Int])].collect().head
        (g, m._1, m._2, m._3)
      }
  }

  /** Persist `hashes` (media_id + modality columns) as a fresh index at
    * `path` — clears any previous index there (a fresh save owns the path). */
  def save(hashes: DataFrame, kind: String, path: String): Unit = {
    require(hashes.columns.contains("media_id"),
      "MediaIndex.save: hashes must carry a media_id column")
    val spark = hashes.sparkSession
    import spark.implicits._
    // materialize BEFORE deleting the old index: a decode failure in the new
    // batch must leave any previously committed index at `path` intact
    val staged = hashes.localCheckpoint()
    // fence out in-flight appenders before destroying the path (a held lease
    // refuses loudly), then keep the WHOLE rebuild fenced: withSaveFence
    // re-creates the lease right after the recursive delete, so a second
    // concurrent save fails on the acquire instead of interleaving its
    // overwrite writes with ours
    GenCommit.withSaveFence(spark, path) { tok =>
      staged.withColumn("gen", lit(0))
        .write.mode("overwrite").partitionBy("gen").parquet(s"$path/fingerprints")
      val n = staged.select(countDistinct(col("media_id"))).as[Long].collect().head
      GenCommit.assertHeld(spark, path, tok) // commit fence
      Seq((kind, n, Seq(0))).toDF("kind", "n_items", "gens")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_g0")
    }
  }

  /** Append `newHashes` as a new generation. Loud contracts: the index must
    * exist, `kind` must match the committed meta (mixed hash families band
    * into garbage), the columns must match the committed fingerprint schema,
    * and the new media_ids must be disjoint from the COMMITTED ids. */
  def append(newHashes: DataFrame, kind: String, path: String): Unit = {
    val spark = newHashes.sparkSession
    import spark.implicits._
    // the expensive leg (decode + fingerprint) materializes BEFORE the lease
    // is taken, so the hold window is the metadata checks and writes only
    val staged = newHashes.localCheckpoint()
    // writer lease: held while the generation is in flight, so a racing
    // vacuum cannot reclaim it as an orphan and a second appender fails
    // loudly instead of interleaving generation numbers. The committed meta
    // is read INSIDE the lease: read before it, a concurrent append could
    // commit between the read and our acquire and our meta — carrying the
    // stale gens list — would hide its committed generation (and hand it to
    // the next vacuum as an "orphan").
    GenCommit.withLease(spark, path) { tok =>
      val (_, idxKind, nItems, gens) = committedMeta(spark, path)
        .getOrElse(throw new IllegalArgumentException(
          s"MediaIndex.append: no committed index meta at $path — save first"))
      require(idxKind == kind,
        s"MediaIndex.append: index at $path holds '$idxKind' fingerprints, not '$kind'")
      val committed = spark.read.parquet(s"$path/fingerprints")
        .filter(col("gen").isin(gens: _*))
      // names AND types: a same-named generation with drifted types (int vs
      // long ids, array<int> energies) would commit fine and poison every
      // cross-generation read later
      def shape(df: DataFrame) = df.schema.fields.filterNot(_.name == "gen")
        .map(f => (f.name, f.dataType.simpleString)).sortBy(_._1).toSeq
      require(shape(staged) == shape(committed),
        s"MediaIndex.append: columns ${shape(staged)} != indexed ${shape(committed)}")
      val clashes = staged.select(col("media_id")).distinct()
        .join(committed.select(col("media_id")), Seq("media_id"), "left_semi")
        .limit(5).as[Long].collect()
      require(clashes.isEmpty,
        s"MediaIndex.append: media ids already indexed at $path: ${clashes.mkString(", ")}")
      val newGen = GenCommit.nextGen(spark, path, "fingerprints", gens)
      staged.withColumn("gen", lit(newGen))
        .write.mode("append").partitionBy("gen").parquet(s"$path/fingerprints")
      val n = staged.select(countDistinct(col("media_id"))).as[Long].collect().head
      GenCommit.assertHeld(spark, path, tok) // commit fence (TTL takeover aborts here)
      // the commit: meta_gN landing (with _SUCCESS) makes the generation visible
      Seq((kind, nItems + n, gens :+ newGen)).toDF("kind", "n_items", "gens")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_g$newGen")
    }
  }

  /** Reclaim dead bytes left by crashed appends ([[GenCommit.vacuum]]):
    * orphaned fingerprint `gen=N` partitions and superseded `meta_gN` dirs.
    * Probe results identical before/after (spec-pinned). Refuses (throws)
    * while an append's writer lease is fresh — an in-flight generation
    * looks like an orphan until its meta commits; a stale lease (dead
    * writer) ages out after the TTL. Returns the number of directories
    * removed. */
  def vacuum(spark: SparkSession, path: String): Int =
    // the meta read happens INSIDE the held lease (the vacuum thunk): read
    // before acquisition, an append committing in between would get its
    // fresh generation — absent from the stale gens list — reclaimed
    GenCommit.vacuum(spark, path, Seq("fingerprints"), Nil) {
      val (metaGen, _, _, gens) = committedMeta(spark, path)
        .getOrElse(throw new IllegalArgumentException(
          s"MediaIndex.vacuum: no committed index meta at $path — save first"))
      (gens, metaGen)
    }

  /** Load the committed index at `path` (uncommitted generations from a
    * crashed append are invisible — file-level `gen` partition pruning). */
  def load(spark: SparkSession, path: String): Index = {
    val (_, kind, nItems, gens) = committedMeta(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"MediaIndex.load: no committed index meta at $path — save first"))
    Index(kind, nItems,
      spark.read.parquet(s"$path/fingerprints")
        .filter(col("gen").isin(gens: _*)).drop("gen"))
  }
}
