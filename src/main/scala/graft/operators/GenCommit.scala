package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared generation-commit protocol helpers for persisted indexes
  * ([[Retrieval]]'s text index, [[MediaIndex]]): data files land under
  * explicit `gen=N` partitions, derived tables under `<name>_gN` dirs, and
  * the single COMMIT point is a `meta_gN` directory whose `_SUCCESS` marker
  * landed — readers take the highest committed meta and filter to its gens
  * list, so a crash mid-append leaves the previous index consistent and a
  * retry just takes the next generation number. */
private[operators] object GenCommit {

  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Generation numbers visible as `<prefix>N` child directories of `base`
    * (e.g. `meta_g3`, `gen=2`) — a pure filesystem listing, no data read.
    * With `requireSuccess`, only dirs whose `_SUCCESS` marker landed count
    * (the committed set); without, every dir counts (orphans included — the
    * namespace a fresh generation number must clear). */
  def listGens(spark: SparkSession, base: String, prefix: String,
               requireSuccess: Boolean): Seq[Int] = {
    val f = fs(spark, base)
    val p = new org.apache.hadoop.fs.Path(base)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith(prefix)) None
      else scala.util.Try(n.stripPrefix(prefix).toInt).toOption.filter { _ =>
        !requireSuccess ||
          f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
      }
    }
  }

  /** The next generation number: strictly above every committed gen AND
    * every orphan visible in the data dir or the meta namespace. */
  def nextGen(spark: SparkSession, path: String, dataDir: String,
              committed: Seq[Int]): Int =
    1 + (committed ++ listGens(spark, s"$path/$dataDir", "gen=", requireSuccess = false)
      ++ listGens(spark, path, "meta_g", requireSuccess = false)).max

  /** Reclaim dead bytes: delete `gen=N` data partitions whose N is not in
    * the committed `gens` list (orphans of crashed appends) and superseded
    * derived/meta directories (`<prefix>N` with N ≠ the current `metaGen` —
    * readers only ever open the highest committed meta and ITS derived
    * tables). Every deletion is safe against READERS and against a crash
    * mid-vacuum (nothing reachable from the current committed meta is
    * touched — a partial vacuum is a smaller but equally consistent index).
    * NOT safe against a CONCURRENT APPEND: an in-flight generation's data
    * looks like an orphan until its meta commits, and vacuuming it away
    * would let the append commit a meta whose data is gone — run vacuum
    * only from the single writer, between appends (the same single-writer
    * assumption the append protocol itself makes). Returns the number of
    * directories removed. */
  def vacuum(spark: SparkSession, path: String, dataDirs: Seq[String],
             gens: Seq[Int], metaGen: Int,
             derivedPrefixes: Seq[String]): Int = {
    val f = fs(spark, path)
    val committed = gens.toSet
    var removed = 0
    def drop(p: String): Unit =
      if (f.delete(new org.apache.hadoop.fs.Path(p), true)) removed += 1
    for (d <- dataDirs;
         g <- listGens(spark, s"$path/$d", "gen=", requireSuccess = false)
         if !committed(g))
      drop(s"$path/$d/gen=$g")
    for (p <- derivedPrefixes :+ "meta_g";
         g <- listGens(spark, path, p, requireSuccess = false)
         if g != metaGen)
      drop(s"$path/$p$g")
    removed
  }
}
