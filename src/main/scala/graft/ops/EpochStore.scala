package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared epoch/manifest machinery for the persisted on-disk indexes (the
  * dedup LSH index and the ANN/IVF index).
  *
  * Layout (one index root `path`):
  * {{{
  *   <path>/current               # pointer file naming the live epoch dir
  *   <path>/data/<table>-NNNNNNNNN/   # immutable parquet data dirs, never rewritten
  *   <path>/epoch-NNNNNNNNN/
  *     manifest/                  # parquet (table, dir): which data dirs form each table
  *     ... per-index small tables (dropped/centroids/meta), rewritten per epoch
  * }}}
  *
  * The delta-epoch contract: data dirs are IMMUTABLE once written. A new
  * epoch's manifest references the previous epoch's data dirs plus fresh
  * delta dirs for new arrivals — appending to a 100 TB index writes only
  * the delta, never a copy of the standing data. Small per-epoch tables
  * (tombstones, centroids, meta) are rewritten each epoch; they are O(keys)
  * or O(1), not O(corpus). The epoch becomes live via ONE atomic pointer
  * rename ([[commitEpoch]]); [[gc]] afterwards deletes epochs older than
  * the retention window and any data dir no retained manifest references.
  *
  * Concurrency: readers resolve the pointer once per operation and keep
  * reading that epoch (retention gives them a grace window — size it with
  * `retainEpochs`). Writers must be SINGLE at a time per index: two
  * concurrent writers would both derive epoch N+1 from N and the loser's
  * rows would silently vanish. Two layers enforce that:
  *
  *   - a WRITER LEASE ([[withLease]]): every lifecycle op creates
  *     `<path>/lease` before doing any work and deletes it after its
  *     commit, so a second writer fails IMMEDIATELY — before burning a
  *     full append — instead of at the final rename. A crashed writer's
  *     lease goes stale by age and is taken over automatically
  *     (`staleMs`, default 1 h — size it above the longest expected
  *     build, below the tolerable lockout after a crash);
  *   - the [[commitEpoch]] tripwire: the pointer is re-read immediately
  *     before the rename and the commit fails loudly if it moved. This
  *     backstops the one hole a create-based lease has (two takeover-ers
  *     of the SAME stale lease can both think they won; object stores
  *     with atomic create-if-absent close even that).
  */
private[graft] object EpochStore {

  val LeaseFileName = "lease"
  val DefaultLeaseStaleMs: Long = 60L * 60L * 1000L

  /** Acquire the single-writer lease on the index at `path`, failing
    * loudly if a live (non-stale) lease exists. Returns the fencing token
    * to pass to [[releaseLease]]. Staleness is judged against the store's
    * own modification time for the lease file, so writer clock skew only
    * shifts the takeover horizon, never the liveness decision.
    */
  def acquireLease(
      spark: SparkSession, path: String,
      staleMs: Long = DefaultLeaseStaleMs): String = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = hadoopFs(spark, path)
    val p = new HPath(path, LeaseFileName)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false) // create-if-absent: fails when held
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val age =
        try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age > staleMs) {
        fs.delete(p, false) // stale: the holder crashed — take over
        if (!tryCreate())
          throw new IllegalStateException(
            s"writer lease on index at $path was contended during stale-lease " +
            "takeover — another writer won; retry once it finishes")
      } else
        throw new IllegalStateException(
          s"another writer holds the lease on index at $path " +
          s"(age ${age} ms, stale after $staleMs ms). Index lifecycles are " +
          "single-writer: wait for the holder to finish; a crashed holder's " +
          "lease is taken over automatically once stale")
    }
    token
  }

  /** The current content of the lease file (the holder's fencing token),
    * or None when no lease exists.
    */
  private def readLeaseToken(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = hadoopFs(spark, path)
    val p = new HPath(path, LeaseFileName)
    try {
      val st = fs.getFileStatus(p)
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Release the lease IF still held with `token` — a stale-lease takeover
    * may have replaced it, in which case the new holder's lease is left
    * untouched (our epoch either committed before the takeover horizon or
    * the fence/tripwire failed it).
    */
  def releaseLease(spark: SparkSession, path: String, token: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    if (readLeaseToken(spark, path).contains(token)) {
      hadoopFs(spark, path).delete(new HPath(path, LeaseFileName), false)
      ()
    }
  }

  /** Fencing tokens of leases held by THIS thread, keyed by index path —
    * [[withLease]] registers them so [[commitEpoch]] can verify, right
    * before the pointer rename, that the lease still carries our token.
    * Thread-local is correct because a lifecycle op runs body and commit
    * on the acquiring thread ([[inParallel]] workers only write data
    * dirs, never commit).
    */
  private val leaseFences = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  /** Run `body` under the writer lease — the wrapper every index lifecycle
    * op (build / append / compact) uses. The lease is released on ANY
    * exit: an uncommitted failure leaves only debris the next build's
    * reset (or GC) clears. While the body runs, the fencing token is
    * registered for [[commitEpoch]]'s pre-rename lease check.
    */
  def withLease[T](
      spark: SparkSession, path: String,
      staleMs: Long = DefaultLeaseStaleMs)(body: => T): T = {
    val token = acquireLease(spark, path, staleMs)
    leaseFences.set(leaseFences.get + (path -> token))
    try body
    finally {
      leaseFences.set(leaseFences.get - path)
      releaseLease(spark, path, token)
    }
  }

  // ---- per-epoch id bloom (the O(1) duplicate-id append guard) ----
  //
  // The dup-id guard otherwise scans the standing id column every append
  // (O(corpus) narrow IO per daily batch). Each epoch carries a bloom over
  // every id ever committed; a clean append probes the batch against it —
  // zero hits PROVES disjointness (blooms have no false negatives) and the
  // exact semi-join is skipped entirely. Any hit (a true dup or an fpp
  // false positive) falls back to the exact check, so correctness never
  // depends on the bloom. Appends grow the bloom by MERGING a delta bloom
  // built with the standing file's own (items, fpp) parameters (same bit
  // geometry ⇒ mergeable without touching standing data); past its
  // capacity the fpp degrades gracefully toward always-fall-back — i.e.
  // exactly today's behavior — and compaction right-sizes a fresh one.

  val IdBloomMinItems: Long = 1L << 20
  val IdBloomMaxItems: Long = 1L << 24 // ~19 MB of bits at 1% — stays well
                                       // under task-binary warning size
  val IdBloomFpp: Double = 0.01

  /** Canonical batch id frame for counter-lifecycle replay guards: one
    * row per distinct doc id, in the string form the index's `ids` table
    * and bloom hash. Shared by the token-frequency and classifier
    * lifecycles so the guard's shape has ONE definition.
    */
  def counterBatchIds(df: DataFrame, idCol: String): DataFrame =
    df.select(org.apache.spark.sql.functions.col(idCol)
      .cast("string").as("id")).distinct()

  /** The counter-fold replay guard's two numbers — the batch's
    * distinct-id count and its overlap with the standing `ids` table —
    * in the fewest jobs. A bloom-cleared batch pays ONE count job
    * (overlap is exactly 0: the bloom has no false negatives); a bloom
    * hit pays ONE left-join aggregate returning both numbers, instead of
    * the prior separate semi-join count + total count. Standing `ids`
    * rows are globally unique (disjoint appends are the store's commit
    * invariant), so the left join cannot multiply batch rows. Callers
    * should pass a persisted `batchIds` — the guard, the ids delta write
    * and the bloom merge all re-read it.
    */
  def counterGuardCounts(
      spark: SparkSession, epochDir: String,
      batchIds: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    if (!idGuardNeedsExact(spark, epochDir, batchIds, "id"))
      (0L, batchIds.count())
    else {
      val standing = readTable(spark, epochDir, "ids")
        .select(col("id"), lit(1L).as("__hit"))
      // total counts DISTINCT batch ids, not post-join rows: standing ids
      // are globally unique by the disjoint-append invariant, but if that
      // is ever violated (a corrupted or partially-compacted epoch) the
      // left join multiplies batch rows — a row-count total would inflate
      // in lockstep with overlap and the replay guard could mis-drive
      // silently. Distinct-counting pins total to the batch alone, so a
      // broken ids table can only inflate overlap, which fails LOUD.
      val r = batchIds.join(standing, Seq("id"), "left")
        .agg(countDistinct(col("id")).as("__t"), count(col("__hit")).as("__o"))
        .head()
      (r.getLong(1), r.getLong(0))
    }
  }

  /** Counter folds are replay-guarded BY id — a null id can never match
    * the committed `ids` table, so a replayed null-id batch would pass
    * the overlap check and double-count silently. Reject it loudly (one
    * pushdown-friendly limit-1 probe of the raw frame).
    */
  def requireCounterIdsNotNull(
      df: DataFrame, idCol: String, op: String): Unit =
    require(df.where(org.apache.spark.sql.functions.col(idCol).isNull)
      .limit(1).count() == 0L,
      s"$op: null ids in '$idCol' cannot be replay-guarded (a replayed " +
      "null-id batch would double-count its tokens) — assign ids first")

  /** Bloom capacity for a corpus of `n` ids: 4× headroom for future
    * appends, clamped to keep the probe-side plan literal small.
    */
  def idBloomItems(n: Long): Long =
    math.min(IdBloomMaxItems, math.max(IdBloomMinItems, 4L * n))

  /** Serialized bloom over a frame's id column (any type — hashed through
    * its canonical string form so build and probe agree across epochs).
    */
  def buildIdBloom(ids: DataFrame, idCol: String, items: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    // empty input (e.g. an empty append's delta) NPEs inside
    // stat.bloomFilter — an empty filter with the same geometry merges fine
    val bf =
      if (ids.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(items, fpp)
      else ids.stat.bloomFilter(xxhash64(col(idCol).cast("string")), items, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mergeIdBlooms(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val bos = new java.io.ByteArrayOutputStream()
    fa.writeTo(bos)
    bos.toByteArray
  }

  /** Persist an epoch's id bloom (one parquet row: parameters + bits). */
  def writeIdBloom(
      spark: SparkSession, epochDir: String,
      bytes: Array[Byte], items: Long, fpp: Double): Unit = {
    import spark.implicits._
    Seq((items, fpp, bytes)).toDF("expected_items", "fpp", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(s"$epochDir/idbloom")
  }

  /** (items, fpp, bits) of the epoch's id bloom; None on epochs written
    * before blooms existed (the guard then falls back to the exact check,
    * and the next append upgrades the index with a full bloom).
    */
  def readIdBloom(spark: SparkSession, epochDir: String): Option[(Long, Double, Array[Byte])] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = s"$epochDir/idbloom"
    if (!hadoopFs(spark, p).exists(new HPath(p))) None
    else {
      val r = spark.read.parquet(p).head()
      Some((r.getLong(0), r.getDouble(1), r.getAs[Array[Byte]](2)))
    }
  }

  /** Does the duplicate-id guard need the exact semi-join for this batch?
    * `false` ⇒ the epoch's bloom proved every batch id unseen (no false
    * negatives), so a clean append touches NO standing id data at all.
    */
  def idGuardNeedsExact(
      spark: SparkSession, epochDir: String,
      batch: DataFrame, idCol: String): Boolean =
    readIdBloom(spark, epochDir) match {
      case None => true
      case Some((_, _, bytes)) =>
        import org.apache.spark.sql.functions.col
        !batch.where(
          Decontam.bloomMightContainKey(bytes, col(idCol).cast("string"))).isEmpty
    }

  /** The successor epoch's bloom: merge a delta over the batch ids into
    * the standing bloom (same parameters ⇒ same bit geometry), or — on a
    * pre-bloom index — build the full bloom once from `allIds` (the same
    * narrow scan the exact guard just paid anyway). Returns
    * (items, fpp, bytes) to hand to [[writeIdBloom]].
    */
  def appendedIdBloom(
      spark: SparkSession, epochDir: String,
      batch: DataFrame, allIds: => DataFrame, idCol: String): (Long, Double, Array[Byte]) =
    readIdBloom(spark, epochDir) match {
      case Some((items, fpp, bytes)) =>
        (items, fpp,
          mergeIdBlooms(bytes, buildIdBloom(batch, idCol, items, fpp)))
      case None =>
        val ids = allIds
        val items = idBloomItems(ids.count())
        (items, IdBloomFpp, buildIdBloom(ids, idCol, items, IdBloomFpp))
    }

  /** Hard-reset an index path that has no committed pointer (debris from a
    * never-committed first build), PRESERVING the caller's lease file.
    */
  def resetKeepingLease(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = hadoopFs(spark, path)
    val root = new HPath(path)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        if (st.getPath.getName != LeaseFileName) fs.delete(st.getPath, true)
      }
  }

  /** Run independent Spark WRITE jobs concurrently, one thread each —
    * SparkContext schedules jobs from separate threads in parallel, so
    * sibling table writes of one epoch (buckets / sets / tombstones)
    * overlap instead of paying the per-job scheduling floor serially.
    * Every action is awaited; the first failure is rethrown AFTER all
    * threads finish (in-flight siblings may complete their writes — they
    * are pre-commit debris the failed lifecycle's next attempt or GC
    * clears, exactly as with sequential writes). Commit ordering is
    * unchanged: callers invoke this strictly before the manifest write
    * and pointer rename.
    */
  def inParallel(actions: (() => Unit)*): Unit = {
    if (actions.lengthCompare(2) < 0) { actions.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(actions.size)
    try {
      val futures = actions.map(a => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = a()
      }))
      var firstFailure: Throwable = null
      var interrupted = false
      futures.foreach { f =>
        // await with a timeout so an interrupt of the AWAITING thread
        // still awaits the remaining arms (the documented contract: the
        // failure is rethrown AFTER all threads finish) without becoming
        // un-cancellable: a hung arm re-offers the interrupt every poll
        var done = false
        while (!done) {
          try {
            f.get(10, java.util.concurrent.TimeUnit.SECONDS)
            done = true
          } catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure == null) firstFailure = e.getCause
              done = true
            case _: java.util.concurrent.TimeoutException =>
              // still running — if we were interrupted earlier, give up
              // on awaiting a hung arm rather than spinning forever
              if (interrupted) { f.cancel(true); done = true }
            case _: InterruptedException =>
              interrupted = true
          }
        }
      }
      if (interrupted) {
        // a CANCELLED lifecycle must not proceed to manifest + commit:
        // re-assert the flag and propagate, so withLease releases and
        // nothing is published (debris is cleared by the next build/GC)
        Thread.currentThread().interrupt()
        if (firstFailure != null) throw firstFailure
        throw new InterruptedException(
          "inParallel: awaiting thread interrupted — lifecycle aborted " +
          "after all arms finished; no epoch was committed")
      }
      if (firstFailure != null) throw firstFailure
    } finally pool.shutdown()
  }

  def epochName(n: Long): String = f"epoch-$n%09d"
  def epochNumber(name: String): Long = name.stripPrefix("epoch-").toLong
  def dataDirName(table: String, n: Long): String = f"$table%s-$n%09d"

  def hadoopFs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def deleteDir(spark: SparkSession, dir: String): Unit =
    hadoopFs(spark, dir).delete(new org.apache.hadoop.fs.Path(dir), true)

  /** Name of the committed epoch (contents of the `current` pointer), or
    * None when the pointer does not exist (no index / fresh build).
    */
  def currentEpoch(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = hadoopFs(spark, path)
    val ptr = new HPath(path, "current")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(ptr).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Directory of the live epoch, resolved through the `current` pointer.
    * Resolve ONCE per operation and read every table through the returned
    * dir: a concurrent append commits a NEW epoch and retains predecessors,
    * so a resolved dir stays complete and self-consistent for the whole
    * operation (as long as retention covers the operation's lifetime).
    */
  def epochDir(spark: SparkSession, path: String): String = {
    val name = currentEpoch(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no index at $path (missing 'current' pointer) — this build reads " +
        "the epoch-based layout; (re)build the index first"))
    s"$path/$name"
  }

  /** Atomically point `<path>/current` at `epoch` — the single commit point
    * of build/append/compact. The pointer is staged to a sibling file and
    * renamed over with `FileContext.rename(OVERWRITE)` (atomic on HDFS-like
    * stores): a crash strictly before this line leaves the old epoch fully
    * live, a crash after it the new one — there is no state in between.
    *
    * `expectCurrent` is the pointer value the writer resolved when it
    * STARTED (None = fresh build, pointer must not exist): if the live
    * pointer moved in the meantime, another writer committed concurrently
    * and this epoch was derived from a stale base — fail loudly instead of
    * silently dropping the other writer's rows.
    */
  def commitEpoch(
      spark: SparkSession, path: String, epoch: String,
      expectCurrent: Option[String]): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
    val live = currentEpoch(spark, path)
    require(live == expectCurrent,
      s"concurrent writer detected on index at $path: the 'current' pointer " +
      s"is ${live.getOrElse("absent")} but this writer derived $epoch from " +
      s"${expectCurrent.getOrElse("an empty index")} — committing would " +
      "silently drop the other writer's rows. Indexes require a single " +
      "writer at a time; re-run this batch against the new live epoch")
    // epoch-fenced lease check: when this thread committed under
    // [[withLease]], the lease file must still carry OUR token. This
    // closes the double-takeover hole the create-based lease leaves on
    // stores without atomic create-if-absent (two claimants of the same
    // stale lease both pass tryCreate; the last content write wins): the
    // displaced claimant now fails HERE, before the pointer rename, while
    // the pointer tripwire above remains the backstop for races that slip
    // between this read and the rename.
    leaseFences.get.get(path).foreach { token =>
      require(readLeaseToken(spark, path).contains(token),
        s"writer lease on index at $path was taken over during this " +
        s"lifecycle (stale-lease double-takeover) — aborting commit of " +
        s"$epoch before the pointer rename; no epoch was committed and " +
        "the new holder's lease is left untouched. Re-run this batch " +
        "once the other writer finishes")
    }
    val fs = hadoopFs(spark, path)
    val tmp = new HPath(path, "current_tmp")
    val out = fs.create(tmp, true)
    try out.write(epoch.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(
      fs.makeQualified(new HPath(path)).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp),
      fs.makeQualified(new HPath(path, "current")), Options.Rename.OVERWRITE)
  }

  /** Write an epoch's manifest: which `data/` dirs form each logical table,
    * in (table, dir) rows. Tiny — one row per data dir.
    */
  def writeManifest(
      spark: SparkSession, epochDir: String,
      entries: Seq[(String, String)]): Unit = {
    import spark.implicits._
    entries.toDF("table", "dir").coalesce(1)
      .write.mode("overwrite").parquet(s"$epochDir/manifest")
  }

  def readManifest(spark: SparkSession, epochDir: String): Seq[(String, String)] =
    spark.read.parquet(s"$epochDir/manifest")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  /** A logical table of the epoch at `epochDir`: the union of its manifest's
    * data dirs, read as ONE multi-path parquet scan (a single FileScan node
    * — delta history does not deepen the plan).
    */
  def readTable(spark: SparkSession, epochDir: String, table: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(epochDir).getParent.toString
    val dirs = readManifest(spark, epochDir).collect {
      case (t, d) if t == table => s"$root/data/$d"
    }
    require(dirs.nonEmpty,
      s"epoch at $epochDir has no data dirs for table '$table' in its manifest")
    spark.read.parquet(dirs: _*)
  }

  /** Garbage-collect after a successful commit: keep the committed epoch
    * plus `retain - 1` predecessors (grace for readers that already
    * resolved them), delete every other epoch dir (older generations AND
    * crashed future attempts), then delete any `data/` dir no retained
    * manifest references. Data dirs referenced by a retained epoch are
    * untouched — carried-forward files survive until compaction drops the
    * last reference to them.
    */
  def gc(spark: SparkSession, path: String, committed: String, retain: Int): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val fs = hadoopFs(spark, path)
    val floor = epochNumber(committed) - retain + 1
    val epochs = fs.listStatus(new HPath(path)).map(_.getPath.getName)
      .filter(_.startsWith("epoch-"))
    val (kept, doomed) = epochs.partition { nm =>
      val n = epochNumber(nm)
      n >= floor && n <= epochNumber(committed)
    }
    doomed.foreach(nm => fs.delete(new HPath(path, nm), true))
    val referenced = kept.flatMap { nm =>
      // a retained epoch without a manifest is a crashed-in-range attempt;
      // treat it as referencing nothing (its data dirs die with it here)
      if (fs.exists(new HPath(s"$path/$nm/manifest")))
        readManifest(spark, s"$path/$nm").map(_._2)
      else Seq.empty
    }.toSet
    val dataRoot = new HPath(path, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { st =>
        if (!referenced.contains(st.getPath.getName)) fs.delete(st.getPath, true)
      }
    }
  }
}
