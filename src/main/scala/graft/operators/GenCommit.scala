package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared generation-commit protocol helpers for persisted indexes
  * ([[Retrieval]]'s text index, [[MediaIndex]], [[ProductQuantization]]'s
  * code frame): data files land under explicit `gen=N` partitions, derived
  * tables under `<name>_gN` dirs, and the single COMMIT point is a `meta_gN`
  * directory whose `_SUCCESS` marker landed — readers take the highest
  * committed meta and filter to its gens list, so a crash mid-append leaves
  * the previous index consistent and a retry just takes the next generation
  * number. */
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

  // ── writer lease ────────────────────────────────────────────────────────
  //
  // An in-flight append's generation is indistinguishable from a crashed
  // append's orphan until its meta commits — a vacuum racing an append
  // would reclaim the live generation and let the append commit a meta
  // whose data is gone. The lease turns that scaladoc contract into a
  // mechanism: appenders hold `_lease` (an atomic filesystem create) for
  // the duration of the write, vacuum REFUSES while a fresh lease exists,
  // and a second appender fails loudly instead of interleaving. A lease
  // older than `ttlMs` is STALE (its writer's JVM died mid-append — the
  // crash the generation protocol already tolerates) and is taken over, so
  // a crash never wedges the index. Pick `ttlMs` above the longest append
  // the deployment runs; the default is generous for batch ingest.
  //
  // OWNERSHIP: the lease file carries `<millis> <uuid-token>`; acquire
  // returns the token and release/commit verify it still matches. A
  // slow-but-alive writer whose lease aged past the TTL and was taken over
  // therefore CANNOT delete the new holder's lease on its way out (the old
  // unconditional delete would have let a third writer interleave), and its
  // own commit fails loudly at the [[assertHeld]] fence instead of landing
  // an unfenced meta.

  val DefaultLeaseTtlMs: Long = 30L * 60L * 1000L

  private def leasePath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_lease")

  /** Full text of the lease file (`"<millis> <token>"`), None if absent or
    * unreadable. */
  private def leaseBody(f: org.apache.hadoop.fs.FileSystem,
                        lp: org.apache.hadoop.fs.Path): Option[String] =
    if (!f.exists(lp)) None
    else scala.util.Try {
      val in = f.open(lp)
      try {
        val buf = new Array[Byte](128) // "<epoch-millis> <uuid>" fits well under
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim
      } finally in.close()
    }.toOption

  /** The millis timestamp of a lease file, None if absent. An existing but
    * empty/corrupt lease (its writer died between create and write) falls
    * back to the FILE's modification time, so it ages out by TTL exactly
    * like a written lease instead of wedging acquirers forever while
    * counting as absent to vacuum — both readers see the same age. */
  private def leaseTs(f: org.apache.hadoop.fs.FileSystem,
                      lp: org.apache.hadoop.fs.Path): Option[Long] =
    if (!f.exists(lp)) None
    else leaseBody(f, lp)
      .flatMap(s => scala.util.Try(s.split("\\s+")(0).toLong).toOption)
      .orElse(scala.util.Try(f.getFileStatus(lp).getModificationTime).toOption)

  /** Acquire the writer lease at `path` (atomic create — two concurrent
    * acquirers cannot both win) and return this writer's OWNERSHIP TOKEN.
    * A fresh lease held by someone else is a loud IllegalStateException; a
    * stale one (older than `ttlMs`) is taken over via an atomic RENAME to a
    * tombstone, so two racing takers cannot both claim it (the loser's
    * rename finds no source and fails loud) and a taker can never delete
    * another taker's freshly written lease. */
  def acquireLease(spark: SparkSession, path: String,
                   ttlMs: Long = DefaultLeaseTtlMs): String = {
    val f = fs(spark, path)
    val lp = leasePath(path)
    val now = System.currentTimeMillis()
    leaseTs(f, lp).foreach { ts =>
      if (now - ts < ttlMs) throw new IllegalStateException(
        s"writer lease at $path is held (age ${now - ts} ms < ttl $ttlMs ms) — " +
          "another append is in flight; retry after it commits, or " +
          "GenCommit.breakLease if its writer is known dead")
      // stale: the writer's JVM died mid-append. Rename is the atomic fence:
      // exactly one taker moves the stale file aside; a concurrent taker's
      // rename finds no source and loses loudly below.
      val tomb = new org.apache.hadoop.fs.Path(path,
        s"_lease_tomb_${java.util.UUID.randomUUID().toString.take(8)}")
      if (!f.rename(lp, tomb)) throw new IllegalStateException(
        s"writer lease at $path was taken over concurrently")
      f.delete(tomb, false)
    }
    val token = java.util.UUID.randomUUID().toString
    val out = try f.create(lp, false) catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"writer lease at $path was acquired concurrently", e)
    }
    try out.write(s"$now $token".getBytes("UTF-8")) finally out.close()
    token
  }

  /** Verify the lease at `path` is still THIS writer's (token match) — the
    * commit fence: call immediately before making a generation visible, so
    * a writer whose lease aged out and was taken over aborts loudly instead
    * of landing an unfenced meta beside the new holder's writes. */
  def assertHeld(spark: SparkSession, path: String, token: String): Unit = {
    val held = leaseBody(fs(spark, path), leasePath(path))
      .exists(_.split("\\s+").lastOption.contains(token))
    if (!held) throw new IllegalStateException(
      s"writer lease at $path is no longer held by this writer (aged past the " +
        "TTL and taken over, or broken by an operator) — aborting before an " +
        "unfenced commit; the orphaned generation is vacuum-reclaimable")
  }

  /** Release a lease this writer holds (append epilogue) — verifies the
    * ownership token first, so a writer that lost its lease to a TTL
    * takeover throws instead of deleting the NEW holder's lease. */
  def releaseLease(spark: SparkSession, path: String, token: String): Unit = {
    assertHeld(spark, path, token)
    fs(spark, path).delete(leasePath(path), false)
  }

  /** Operator intervention: drop a lease whose writer is known dead without
    * waiting out the TTL (the only UNCONDITIONAL delete — everything
    * in-protocol releases through the token check). */
  def breakLease(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(leasePath(path), false)

  /** Run `body` (given the ownership token) holding the writer lease;
    * always released on exit (an in-JVM failure releases immediately — only
    * a JVM death leaves the stale file the TTL reclaims). A body that lost
    * the lease to a TTL takeover gets a loud release-time failure rather
    * than a silent delete of the new holder's lease — and should call
    * [[assertHeld]] itself right before its commit write. */
  def withLease[T](spark: SparkSession, path: String,
                   ttlMs: Long = DefaultLeaseTtlMs)(body: String => T): T = {
    val token = acquireLease(spark, path, ttlMs)
    try body(token) finally releaseLease(spark, path, token)
  }

  /** Reclaim dead bytes: delete `gen=N` data partitions whose N is not in
    * the committed gens list (orphans of crashed appends) and superseded
    * derived/meta directories (`<prefix>N` with N ≠ the current metaGen —
    * readers only ever open the highest committed meta and ITS derived
    * tables). The committed state comes from the `meta` thunk, evaluated
    * INSIDE the held lease: reading it before acquisition would let an
    * append commit between the read and the lease and get its fresh
    * generation (absent from the stale gens list) reclaimed. Every deletion
    * is safe against READERS and against a crash mid-vacuum (nothing
    * reachable from the current committed meta is touched — a partial
    * vacuum is a smaller but equally consistent index). A CONCURRENT APPEND
    * is fenced by the writer lease: appenders hold `_lease` while their
    * generation is in flight, and vacuum throws rather than reclaim what
    * might be a live generation (a stale lease — writer died — ages out
    * after `ttlMs` and no longer blocks). Returns the number of directories
    * removed. */
  def vacuum(spark: SparkSession, path: String, dataDirs: Seq[String],
             derivedPrefixes: Seq[String],
             ttlMs: Long = DefaultLeaseTtlMs)
            (meta: => (Seq[Int], Int)): Int =
    // HOLD the lease for the whole meta-read + list-and-delete pass, not
    // merely observe it: a check-then-act vacuum would race an appender
    // acquiring between the check and the deletes and reclaim its live
    // generation. A fresh lease refuses loudly (acquireLease's message); a
    // stale one is taken over — a dead writer's orphans are exactly what
    // vacuum reclaims.
    withLease(spark, path, ttlMs) { _ =>
      val (gens, metaGen) = meta
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

  /** The save-path fence: acquire the lease (refusing while an append is in
    * flight), recursively CLEAR `path` (a fresh save owns it — this removes
    * the now-ours lease with the rest), immediately RE-ACQUIRE so the whole
    * rebuild stays fenced (two concurrent saves would otherwise both pass
    * the first acquire — the second finding no lease after the first's
    * delete — and interleave their overwrite writes), then run `body` under
    * the new lease with the commit fence on release. */
  def withSaveFence[T](spark: SparkSession, path: String,
                       ttlMs: Long = DefaultLeaseTtlMs)(body: String => T): T = {
    acquireLease(spark, path, ttlMs)
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    withLease(spark, path, ttlMs)(body)
  }
}
