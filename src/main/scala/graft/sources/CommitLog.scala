package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only commit log for a versioned parquet table — the missing
  * half of the reference's durability pair: `lake_snapshot` is the
  * FSImage checkpoint (full copies), this is the FSEditLog journal
  * (reference server/namenode/FSEditLog.java:1, FSImage.java:1 —
  * namespace state = image + replayed edits; here table state =
  * replayed add/remove-file actions).
  *
  * Layout under `tableDir`:
  * {{{
  *   _log/000000000.log     one file per committed version
  *   _log/000000001.log
  *   data/<name>/...        parquet data, referenced by log actions
  * }}}
  *
  * Each log file is a tiny text journal: `ts <millis>` then one
  * `add <relpath>` / `remove <relpath>` per line. A version commits by
  * CREATING its log file exclusively (`FileSystem.create(path,
  * overwrite = false)`): two concurrent writers racing for version N
  * cannot both succeed — the loser sees FileAlreadyExists, re-reads
  * the log and retries at N+1 (the optimistic analogue of the
  * reference's single-writer edit log; cf. LeaseManager.java:63 for
  * the lease-based variant used on the streaming state swap).
  *
  * Reads reconstruct the active file set at any version (`snapshot`)
  * or wall-clock instant (`snapshotAsOf`) by replaying the log — pure
  * driver-side metadata ops (a NameNode replaying edits), after which
  * the data read is an ordinary pruned parquet scan. At 100 TB the
  * log stays tiny (it scales with commits, not data), replay is
  * O(versions), and nothing ever rewrites a data file: version reads
  * are stable under concurrent appends.
  */
object CommitLog {

  private def logDir(tableDir: String) = new Path(tableDir, "_log")
  private def logFile(tableDir: String, v: Int) =
    new Path(logDir(tableDir), f"$v%09d.log")

  /** One committed version: (version, commit ts millis, adds, removes)
    * with paths relative to the table dir; `isCheckpoint` marks an
    * image commit (its adds are a self-contained snapshot, so replay
    * may start at it). `tags` carries ceremony markers (`upgrade` /
    * `rollback` / `finalize`) — unknown tags replay as no-ops, so old
    * readers skip them instead of failing. */
  final case class Commit(version: Int, ts: Long, adds: Seq[String], removes: Seq[String],
                          isCheckpoint: Boolean = false, tags: Set[String] = Set.empty)

  /** All committed versions in order (driver-side metadata read). A
    * log file without the terminal `end` marker is a commit that died
    * mid-write: its version number is burned but it carries NO
    * actions — the unclosed-edit-log-segment rule, so a torn write
    * can never surface as a half-applied commit. */
  def commits(fs: FileSystem, tableDir: String): Seq[Commit] = {
    val dir = logDir(tableDir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".log"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val text =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        if (!lines.lastOption.contains("end")) None
        else {
          val ts = lines.collectFirst { case l if l.startsWith("ts ") => l.drop(3).toLong }
            .getOrElse(0L)
          Some(Commit(
            st.getPath.getName.stripSuffix(".log").toInt, ts,
            lines.collect { case l if l.startsWith("add ") => l.drop(4) },
            lines.collect { case l if l.startsWith("remove ") => l.drop(7) },
            isCheckpoint = lines.contains("ckpt"),
            tags = lines.collect { case l if l.startsWith("tag ") => l.drop(4) }.toSet))
        }
      }
  }

  /** Highest version number present in the log dir, committed or
    * burned — the next attempt must go past both. */
  private def maxVersionOnDisk(fs: FileSystem, tableDir: String): Option[Int] = {
    val dir = logDir(tableDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".log"))
      .map(_.stripSuffix(".log").toInt).maxOption
  }

  /** Journal read STABLE against in-flight writers. tryCommit's
    * create-then-write leaves a sub-millisecond window where a
    * version FILE exists but its body is not yet terminated;
    * `commits()` correctly skips it (the burned-version rule for
    * crashed writers), but a diff-then-CAS ceremony reading the
    * journal inside that window would claim `next` ABOVE the
    * in-flight version while computing its set difference WITHOUT it
    * — the CAS succeeds and the in-flight commit's adds silently
    * reappear (caught by the restore/append race spec: a restore
    * that never saw the racing append's v2 landed at v3 and left the
    * appended file active). The fix waits only on versions whose
    * file is PRESENT but unparseable: a live writer terminates in
    * milliseconds; a crashed writer never does and, past the grace
    * bound, stays a burned version exactly as before. Vacuumed
    * history (no file at all) never waits.
    *
    * Versions once diagnosed burned are remembered (ADVICE r11: a
    * permanently burned file otherwise re-pays the full grace wait on
    * EVERY journal read forever — each checkpoint/restore/drain on
    * that table stalling 2s). The diagnosis is keyed on the file's
    * (length, mtime) identity: a crashed writer's file never changes,
    * so the cache holds; a NEW in-flight file reusing the version
    * number after a dir wipe presents a different identity and gets
    * the full grace wait again — the race guarantee is preserved.
    *
    * Two hardening rules (ADVICE r11 follow-up): (1) EVICTION — a
    * diagnosis whose log file is GONE from disk (dir wiped, history
    * vacuumed, table recreated) is dropped at the next journal read,
    * so the map cannot grow past the live burned files and a
    * same-version successor always starts from a clean slate;
    * (2) the (length, mtime) identity is only as sharp as the
    * filesystem's mtime granularity (1s on some FSs) — eviction
    * closes the delete-then-recreate alias (the file vanishes between
    * reads), and within a single uninterrupted existence a log file
    * is create-exclusive and append-only, so same-length-same-mtime
    * genuinely is the same unchanged burned file. */
  private val burnedDiagnosed =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def stableCommits(fs: FileSystem, tableDir: String): Seq[Commit] = {
    def allOnDisk(): Seq[(Int, Long, Long)] = {
      val dir = logDir(tableDir)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.endsWith(".log"))
        .map(st => (st.getPath.getName.stripSuffix(".log").toInt,
          st.getLen, st.getModificationTime))
    }
    def unknown(listing: Seq[(Int, Long, Long)],
                known: Set[Int]): Seq[(Int, Long, Long)] =
      listing.filter { case (v, _, _) => !known.contains(v) }
    def waitable(xs: Seq[(Int, Long, Long)]): Seq[(Int, Long, Long)] =
      xs.filter { case (v, len, mt) =>
        burnedDiagnosed.get(s"$tableDir#$v") != ((len, mt))
      }
    var cs = commits(fs, tableDir)
    // ONE listing serves both the eviction sweep and the first pending
    // check (self-review r12: a second listStatus per journal read is
    // pure metadata-latency waste on object-store-like filesystems).
    // Taken AFTER the journal read: the race guard needs any version
    // file that appears after `cs` was read to show up here as pending.
    val firstListing = allOnDisk()
    // evict stale diagnoses: version file gone = diagnosis void
    locally {
      val live = firstListing.map(_._1).toSet
      val prefix = s"$tableDir#"
      // non-numeric suffix = a DIFFERENT tableDir extending this
      // prefix ("a/b#2" vs "a/b") — never evict those here
      burnedDiagnosed.keySet.removeIf { k =>
        k.startsWith(prefix) &&
          k.stripPrefix(prefix).toIntOption.exists(v => !live.contains(v))
      }
    }
    var pending = waitable(unknown(firstListing, cs.map(_.version).toSet))
    var waitedMs = 0L
    while (waitedMs < 2000L && pending.nonEmpty) {
      Thread.sleep(20L); waitedMs += 20L
      cs = commits(fs, tableDir)
      pending = waitable(unknown(allOnDisk(), cs.map(_.version).toSet))
    }
    // grace expired with versions still unparseable: burned — record
    // each at its observed identity so the wait is paid at most once
    pending.foreach { case (v, len, mt) =>
      burnedDiagnosed.put(s"$tableDir#$v", (len, mt))
    }
    cs
  }

  /** Attempt to commit exactly version `v` (create-exclusive). Returns
    * false ONLY when another writer won the race for `v`; any other IO
    * failure (permissions, disk full, torn write) propagates — it is
    * an error, not a version conflict. */
  def tryCommit(fs: FileSystem, tableDir: String, v: Int, ts: Long,
                adds: Seq[String], removes: Seq[String],
                checkpointMarker: Boolean = false,
                tags: Seq[String] = Nil): Boolean = {
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): mutations refused, reads unaffected")
    fs.mkdirs(logDir(tableDir))
    val f = logFile(tableDir, v)
    val marker = (if (checkpointMarker) Seq("ckpt") else Seq.empty) ++ tags.map("tag " + _)
    val body = (s"ts $ts" +: marker ++: (adds.map("add " + _) ++ removes.map("remove " + _)) :+ "end")
      .mkString("", "\n", "\n")
    val out =
      try fs.create(f, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: java.io.IOException if fs.exists(f) => return false // lost the race
      }
    try { out.write(body.getBytes("UTF-8")); out.close() }
    catch { case e: java.io.IOException =>
      // we own this version number; leave the terminator-less file as
      // a burned version rather than a parseable half-commit
      try out.close() catch { case _: java.io.IOException => () }
      throw e
    }
    true
  }

  /** Commit at the next available version, retrying under contention.
    * Returns the version written. */
  def commit(fs: FileSystem, tableDir: String, ts: Long,
             adds: Seq[String], removes: Seq[String],
             checkpointMarker: Boolean = false,
             tags: Seq[String] = Nil): Int = {
    var v = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    while (!tryCommit(fs, tableDir, v, ts, adds, removes, checkpointMarker, tags)) v += 1
    v
  }

  private def frozenMarker(tableDir: String) = new Path(tableDir, "_frozen")

  /** SAFE MODE for a versioned table — the reference's
    * ClientProtocol.setSafeMode (protocol/ClientProtocol.java:648)
    * plus FSNamesystem.SafeModeInfo's threshold machine
    * (server/namenode/FSNamesystem.java:3997): while the `_frozen`
    * marker exists, every commit attempt is refused loudly
    * (SafeModeException analogue —
    * server/namenode/SafeModeException.java:1) BEFORE any journal or
    * data I/O, so a refused write burns no version and replay is
    * byte-identical to a history in which it never happened; reads
    * replay normally throughout.
    *
    * Two modes, as in the reference:
    *  - STARTUP (`enterSafeMode`): carries a per-mille replay
    *    threshold. Verification progress arrives via
    *    `reportVerified` (the block-report analogue: each call
    *    actually READS the named active files — a parquet
    *    footer-count job, metadata-only however large the files —
    *    and accumulates them in the marker). The moment
    *    verified/active ≥ threshold the marker is deleted: automatic
    *    exit, no operator action (SafeModeInfo.canLeave).
    *  - MANUAL (`enterSafeModeManual`): the threshold is
    *    unreachable by construction (the reference sets it to 1.5 —
    *    FSNamesystem.java:4064); only `leaveSafeMode` exits.
    *
    * All state is the one marker file, rewritten per report — a
    * driver-side metadata op like the journal itself; the only
    * cluster work is the verification read, which is one job per
    * report over only the files being reported. */
  final case class SafeModeState(manual: Boolean, thresholdPm: Int,
                                 verified: Set[String])

  /** Enter startup safe mode: frozen until `reportVerified` calls
    * push the verified fraction of active files to `thresholdPm`
    * per-mille (1000 = every active file, the strict default). */
  def enterSafeMode(fs: FileSystem, tableDir: String,
                    thresholdPm: Int = 1000): Unit =
    writeSafeMode(fs, tableDir, SafeModeState(manual = false, thresholdPm, Set.empty))

  /** Enter manual safe mode: no threshold can exit it (reference:
    * manual SafeModeInfo sets threshold 1.5, unreachable); only
    * `leaveSafeMode` does. */
  def enterSafeModeManual(fs: FileSystem, tableDir: String): Unit =
    writeSafeMode(fs, tableDir, SafeModeState(manual = true, 0, Set.empty))

  /** Back-compat alias for the pre-threshold API: manual freeze. */
  def freeze(fs: FileSystem, tableDir: String): Unit =
    enterSafeModeManual(fs, tableDir)

  def leaveSafeMode(fs: FileSystem, tableDir: String): Unit = {
    fs.delete(frozenMarker(tableDir), false); ()
  }

  /** Back-compat alias: manual leave. */
  def unfreeze(fs: FileSystem, tableDir: String): Unit =
    leaveSafeMode(fs, tableDir)

  def isFrozen(fs: FileSystem, tableDir: String): Boolean =
    fs.exists(frozenMarker(tableDir))

  /** Current safe-mode state, None when the table is writable. A
    * marker whose content predates the threshold machine (or was
    * hand-placed) parses as MANUAL — the conservative reading: it
    * never self-exits. */
  def safeMode(fs: FileSystem, tableDir: String): Option[SafeModeState] = {
    val f = frozenMarker(tableDir)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val pm = lines.collectFirst { case l if l.startsWith("startup ") =>
      l.drop(8).toInt }
    Some(SafeModeState(
      manual = pm.isEmpty,
      thresholdPm = pm.getOrElse(0),
      verified = lines.collect { case l if l.startsWith("safe ") => l.drop(5) }.toSet))
  }

  private def writeSafeMode(fs: FileSystem, tableDir: String,
                            st: SafeModeState): Unit = {
    val head = if (st.manual) "manual" else s"startup ${st.thresholdPm}"
    val body = (head +: st.verified.toSeq.sorted.map("safe " + _))
      .mkString("", "\n", "\n")
    val out = fs.create(frozenMarker(tableDir), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** One verification report: (verified so far, active total, still
    * frozen). Each named relPath must be an ACTIVE journal entry; it
    * counts as verified only after an actual read succeeds — a
    * parquet count() over exactly those files, which Spark answers
    * from footers (no row scan), so a report is cheap at any file
    * size while still proving the footer + schema are intact. In
    * startup mode, crossing the threshold deletes the marker
    * (automatic exit); manual mode records progress but never
    * exits. */
  /** Reporter serialization (ADVICE r9): the marker rewrite is a
    * read-modify-write, so concurrent reporters would lose each
    * other's verified progress, and a report racing `leaveSafeMode`
    * could re-create the marker an admin just deleted. Within one
    * JVM, reports for the same table serialize on this per-table
    * lock and re-read the marker INSIDE the critical section (only
    * the verification reads — the expensive part — run unlocked);
    * the re-read also makes a concurrent `leaveSafeMode` win: a
    * vanished marker means the table was opened, and the report
    * records nothing rather than re-freezing it. Cross-JVM the
    * safe-mode protocol assumes the reference's deployment shape —
    * ONE namenode-role driver issues reports (block reports all
    * land on the active NameNode, FSNamesystem.java:3997); multiple
    * independent report-issuing drivers on one table are out of
    * contract. */
  private val safeModeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def reportVerified(spark: SparkSession, tableDir: String,
                     relPaths: Seq[String]): (Int, Int, Boolean) = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val pre = safeMode(fs, tableDir).getOrElse(
      return (0, activeFiles(fs, tableDir).size, false))
    val active = activeFiles(fs, tableDir)
    // the actual read — a corrupt footer throws here and the file
    // simply never joins the verified set. Runs OUTSIDE the lock: it
    // is the only cluster work in a report. Files the PRE-READ marker
    // already records skip the read (a re-reported full active set
    // must not re-pay O(files) verification I/O every cadence); the
    // lock-protected fold below still merges against the CURRENT
    // marker, so a concurrent reporter's progress is never lost.
    val ok = relPaths.filter(active.contains).filter { rel =>
      pre.verified.contains(rel) || {
        // footer verification is a FOOTER read either way — the r17
        // form scheduled a Spark count job per file (count() prunes
        // to footer metadata), paying job scheduling for a
        // metadata-sized check ~O(files) times per report cadence;
        // the footers are now opened directly (r18, the quotaUsage
        // discipline). A torn/corrupt footer throws on open, an
        // empty entry verifies vacuously-false exactly like the
        // schema-inference failure did — any failure means
        // unverified, never an op abort
        try {
          val conf = spark.sparkContext.hadoopConfiguration
          val p = new Path(resolve(tableDir, rel))
          // Any non-underscore entry that is NOT a parquet part file
          // fails verification (ADVICE r18): the r18 form silently
          // ignored such files, so a torn/corrupt sidecar data file
          // that previously made spark.read.parquet fail (marking the
          // entry unverified) passed as long as the suffixed parts
          // were intact — this restores the old fail-unverified scope.
          val st = fs.getFileStatus(p)
          val (entries, parts) =
            if (st.isDirectory) {
              val es = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
              (es, es.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
            } else (Array(st), Array(st)) // a bare-file entry verifies by its own footer
          parts.length == entries.length && parts.nonEmpty && parts.forall { f =>
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
            try rd.getRecordCount >= 0L finally rd.close()
          }
        }
        catch { case scala.util.control.NonFatal(_) => false }
      }
    }
    val lock = safeModeLocks.computeIfAbsent(tableDir, _ => new Object)
    lock.synchronized {
      // re-read under the lock: fold OUR verifications into the
      // CURRENT marker state, not the pre-read snapshot
      val st = safeMode(fs, tableDir).getOrElse(
        return (0, active.size, false)) // table was opened meanwhile
      val next = st.copy(verified = st.verified ++ ok)
      val exit = !next.manual &&
        next.verified.count(active.contains) * 1000L >=
          next.thresholdPm.toLong * active.size
      if (exit) leaveSafeMode(fs, tableDir)
      else writeSafeMode(fs, tableDir, next)
      (next.verified.count(active.contains), active.size, !exit)
    }
  }

  /** Write `df` under `tableDir/<relPath>` and commit the addition. */
  def writeCommit(spark: SparkSession, tableDir: String, df: DataFrame,
                  relPath: String, ts: Long): Int = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): write refused before any data I/O")
    df.write.mode("overwrite").parquet(s"$tableDir/$relPath")
    commit(fs, tableDir, ts, adds = Seq(relPath), removes = Seq.empty)
  }

  /** Resolve a journal entry to a readable path: entries beginning
    * with '/' are EXTERNAL absolute references (written by shallow
    * clones — the clone's journal points at the source's data files,
    * zero bytes copied); everything else is tableDir-relative. The
    * vacuum/retention passes only ever delete LOCAL `data/` entries,
    * so external references are structurally out of their reach. */
  private def resolve(tableDir: String, p: String): String =
    if (p.startsWith("/")) p else s"$tableDir/$p"

  /** SHALLOW CLONE: start `dstDir` as a new table whose v0 journal
    * references `srcDir`'s currently-active data files by absolute
    * path — a metadata-only commit, no data copied (reference
    * analogue: HDFS snapshots share blocks; FSImage.java:1 — state is
    * what the journal says, not where bytes sit). The clone then
    * evolves independently: its own adds/removes never touch the
    * source, and a later checkpoint() materializes it fully local.
    *
    * The Delta shallow-clone hazard — source retention deleting data
    * files a clone still references — is CLOSED here by back-
    * references: cloneFrom registers the clone in the source's
    * `_clones/` directory (the HDFS-snapshot refcount idea,
    * server/namenode/INodeFile.java:1 — shared blocks are not
    * reclaimable while a snapshot references them), and
    * vacuumOrphans / dropHistoryBefore treat every data file still
    * referenced by a registered live clone's journal as pinned. The
    * pin releases itself: once the clone checkpoints and drops its
    * pre-checkpoint history (or the clone dir is deleted), its
    * journal holds no external references and the marker is swept on
    * the source's next vacuum. The clone's own vacuum can never
    * touch the source regardless (it only deletes LOCAL `data/`
    * entries — see resolve()). */
  def cloneFrom(fs: FileSystem, srcDir: String, dstDir: String, ts: Long): Int = {
    val active = activeSet(commits(fs, srcDir)).map(resolve(srcDir, _))
    require(active.nonEmpty, s"nothing to clone: no active files in $srcDir")
    val v = commit(fs, dstDir, ts, adds = active, removes = Seq.empty)
    val out = fs.create(cloneMarker(srcDir, dstDir), true)
    try out.write(dstDir.getBytes("UTF-8")) finally out.close()
    v
  }

  private def clonesDir(tableDir: String) = new Path(tableDir, "_clones")

  private def cloneMarker(srcDir: String, dstDir: String): Path = {
    val sane = dstDir.replaceAll("[^A-Za-z0-9]", "_").takeRight(64)
    // hash disambiguates dst paths that sanitize identically
    new Path(clonesDir(srcDir), f"${sane}_${dstDir.hashCode & 0x7fffffff}%08x.ref")
  }

  /** Registered clone dirs of this table (back-reference markers). */
  def registeredClones(fs: FileSystem, tableDir: String): Seq[String] = {
    val dir = clonesDir(tableDir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".ref")).map { st =>
      val in = fs.open(st.getPath)
      try {
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(buf); new String(buf, "UTF-8")
      } finally in.close()
    }
  }

  /** Relative paths under `tableDir` still referenced by registered
    * live clones' journals — pinned against vacuum. Stale markers
    * (clone gone, or its journal no longer references this source)
    * are swept as a side effect. */
  private def clonePinned(fs: FileSystem, tableDir: String): Set[String] = {
    registeredClones(fs, tableDir).flatMap { dst =>
      val refs =
        if (!fs.exists(logDir(dst))) Seq.empty
        else commits(fs, dst).flatMap(_.adds)
          .filter(_.startsWith(tableDir + "/"))
          .map(_.drop(tableDir.length + 1))
      if (refs.isEmpty) fs.delete(cloneMarker(tableDir, dst), false)
      refs
    }.toSet
  }

  /** Active (journal-entry) file set at a version — the ORDER-
    * SENSITIVE replay: a remove-then-re-add history resolves to
    * active, which naive all-adds-minus-all-removes set algebra gets
    * wrong. Every consumer of "what files is the table at version N"
    * must come through here (or snapshot), never reimplement replay. */
  def activeFiles(fs: FileSystem, tableDir: String, version: Int = Int.MaxValue): Seq[String] =
    activeSet(commits(fs, tableDir).filter(_.version <= version))

  /** Active (relative) file set after replaying the log through the
    * given versions. */
  private def activeSet(cs: Seq[Commit]): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet.empty[String]
    cs.foreach { c => active ++= c.adds; active --= c.removes }
    active.toSeq
  }

  /** One incremental replay over an already-read journal: each commit
    * paired with the active-file count AFTER applying it. Equals
    * `activeFiles(_, _, c.version).size` for every commit (spec-pinned)
    * but costs O(V) total instead of O(V^2) per-version replays — and
    * taking the commit list (not fs+dir) makes "one journal read" a
    * property of the signature, not caller discipline. */
  def journalTimeline(cs: Seq[Commit]): Seq[(Commit, Long)] = {
    val active = scala.collection.mutable.LinkedHashSet.empty[String]
    cs.sortBy(_.version).map { c =>
      active ++= c.adds; active --= c.removes
      (c, active.size.toLong)
    }
  }

  /** Read the table as of a version (default: latest). */
  def snapshot(spark: SparkSession, tableDir: String, version: Int = Int.MaxValue): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val paths = activeSet(commits(fs, tableDir).filter(_.version <= version))
    require(paths.nonEmpty, s"no active files in $tableDir at version $version")
    spark.read.parquet(paths.map(resolve(tableDir, _)): _*)
  }

  /** Read the table as it stood at a wall-clock instant (time travel
    * by timestamp: all commits with ts <= asOfMillis). */
  def snapshotAsOf(spark: SparkSession, tableDir: String, asOfMillis: Long): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val paths = activeSet(commits(fs, tableDir).filter(_.ts <= asOfMillis))
    require(paths.nonEmpty, s"no active files in $tableDir as of $asOfMillis")
    spark.read.parquet(paths.map(resolve(tableDir, _)): _*)
  }

  /** FSImage-style checkpoint: materialize the CURRENT active set
    * into one compacted image dir, then commit (add image, remove
    * every active file) — the image+journal pairing of the reference
    * (FSImage.java checkpoint absorbs the edit log; later reads of
    * the head replay just the image commit forward). Older versions
    * keep reading their original files, which stay on disk until a
    * retention pass drops their versions. Returns the image version. */
  def checkpoint(spark: SparkSession, tableDir: String, ts: Long): Int = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): checkpoint refused before any data I/O")
    // CAS ordering: claim the next version number BEFORE reading the
    // state it will swap — any commit that lands after this read
    // occupies >= next, so tryCommit loses the create-exclusive race
    // and the ceremony aborts instead of acting on a stale snapshot.
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val base = stableCommits(fs, tableDir)
    val active = activeSet(base)
    require(active.nonEmpty, s"nothing to checkpoint in $tableDir")
    val image = s"data/ckpt-$next"
    spark.read.parquet(active.map(resolve(tableDir, _)): _*)
      .write.mode("overwrite").parquet(s"$tableDir/$image")
    // Compare-and-swap, not blind retry: the image reflects the active
    // set AS OF `base`, so it may only commit at the exact next
    // version. If a concurrent writer got there first, retrying at a
    // higher version would resurrect whatever that writer removed —
    // delete the stale image and make the caller redo the checkpoint.
    if (!tryCommit(fs, tableDir, next, ts, adds = Seq(image), removes = active,
        checkpointMarker = true)) {
      fs.delete(new Path(tableDir, image), true)
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during checkpoint — retry")
    }
    next
  }

  /** CHECKPOINT CADENCE — the reference's automatic image policy
    * (server/namenode/Checkpointer.java:1 triggers a checkpoint when
    * the edit log outgrows a threshold; SecondaryNameNode.java:1 is
    * the daemon form): checkpoint only when replay cost — commits
    * since the last image (or since v0) — exceeds `maxReplay`. The
    * decision is a driver-side metadata read; below threshold the
    * call is free. Returns the image version, or None if replay is
    * still cheap. Idempotent at the cadence level: a call right
    * after a triggered checkpoint sees replay length 1 and declines. */
  def maybeCheckpoint(spark: SparkSession, tableDir: String, ts: Long,
                      maxReplay: Int): Option[Int] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val cs = commits(fs, tableDir)
    val lastCkpt = cs.filter(_.isCheckpoint).lastOption.map(_.version).getOrElse(-1)
    val replay = cs.count(_.version > lastCkpt)
    if (replay > maxReplay) Some(checkpoint(spark, tableDir, ts)) else None
  }

  /** SAVE NAMESPACE — the admin's explicit image-NOW verb (reference
    * protocol/ClientProtocol.java:660 saveNamespace: "Save namespace
    * image" on demand, vs Checkpointer.java's threshold cadence).
    * maybeCheckpoint asks "is replay expensive yet?"; saveNamespace is
    * the operator saying "image now, before I do something risky" at
    * any replay length — EXCEPT zero: when the journal head is already
    * an image the namespace on disk IS the namespace in memory, and
    * the verb declines rather than stamping a redundant image (the
    * reference's no-op when nothing changed since the last
    * checkpoint). Returns the image version, None when declined.
    * After a successful save, replay-from-image is 0 commits. */
  def saveNamespace(spark: SparkSession, tableDir: String, ts: Long): Option[Int] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (commits(fs, tableDir).lastOption.exists(_.isCheckpoint)) None
    else Some(checkpoint(spark, tableDir, ts))
  }

  // ------------------------------------------------------------------
  // Storage-directory admission (reference ClientProtocol.java:669
  // restoreFailedStorage, FSImage storage-dir state machine): a
  // replica/standby storage location that failed is marked RETIRED —
  // the journal stops shipping to it — until the admin explicitly
  // re-admits it, at which point it resyncs from the journal,
  // delta-proportionally, and rejoins.
  // ------------------------------------------------------------------

  private def retiredMarker(dir: String) = new Path(dir, "_retired")

  /** Mark a standby/replica storage dir RETIRED (failed): ship refuses
    * it until re-admitted. Idempotent. */
  def retireStorage(fs: FileSystem, dir: String): Unit = {
    fs.mkdirs(new Path(dir))
    val out = fs.create(retiredMarker(dir), true)
    out.write("retired\n".getBytes("UTF-8")); out.close()
  }

  def isRetired(fs: FileSystem, dir: String): Boolean =
    fs.exists(retiredMarker(dir))

  /** RESTORE FAILED STORAGE (ClientProtocol.java:669): re-admit a
    * retired storage dir and resync it from the primary's journal.
    * The resync is `ship` — cost proportional to the versions MISSED
    * while retired (their log files + newly-added data dirs), never
    * the table. Returns the versions shipped to catch up. */
  def restoreFailedStorage(spark: SparkSession, primaryDir: String,
                           dir: String): Seq[Int] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(retiredMarker(dir), false)
    ship(spark, primaryDir, dir)
  }

  /** Retention: make history before `v` unreadable and reclaimable.
    * Replay must still reconstruct every retained version from the
    * truncated log, so the cut lands on the latest CHECKPOINT commit
    * at or before `v` (an image commit is a self-contained replay
    * start — the FSImage rule: an image plus the edits after it is
    * the full state). Log files before the cut are deleted and their
    * now-unreferenced data dirs are vacuumed. Returns the dropped
    * version numbers. */
  def dropHistoryBefore(fs: FileSystem, tableDir: String, v: Int,
                        graceMs: Long = 3600000L): Seq[Int] = {
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): history deletion refused")
    val cs = commits(fs, tableDir)
    val cut = cs.filter(c => c.isCheckpoint && c.version <= v).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no checkpoint at or before version $v in $tableDir — checkpoint() first"))
    // delete every log file below the cut, committed or burned
    val dropped = fs.listStatus(logDir(tableDir)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".log"))
      .map(_.stripSuffix(".log").toInt).filter(_ < cut.version).sorted
    dropped.foreach(d => fs.delete(logFile(tableDir, d), false))
    vacuumOrphans(fs, tableDir, graceMs)
    dropped
  }

  /** HOT-STANDBY SHIP — one tailing step of the reference's backup
    * node (server/namenode/BackupNode.java:1 receives streamed edits,
    * BackupImage.java:1 applies them to its own image): copy every
    * journal version the standby lacks, byte-identical, plus the data
    * dirs those versions add. Per ship the cost is proportional to
    * the DELTA (new log files + newly-added data), never the table:
    * a ship with no new commits touches only the two log listings,
    * and a metadata-only commit (remove/restore/tag) ships as one
    * tiny log file. Data dirs are copied BEFORE their log file so a
    * torn ship can never leave the standby's journal referencing
    * data it does not hold (the closed-segment rule: the log file is
    * the commit point on the standby too). Removes need no I/O — the
    * standby keeps the dropped dirs until its own retention pass,
    * exactly like a backup namenode holding blocks until its own
    * deletion schedule. External absolute references (shallow-clone
    * entries) are NOT copied: they point outside the primary and
    * resolve identically from the standby. Returns the shipped
    * version numbers (empty = already in sync).
    *
    * Torn-file discipline, both directions:
    * - PRIMARY side: a terminator-less log file is either a burned
    *   version (its writer died) or a commit mid-write — including
    *   BELOW the completed head (a writer that lost the version race
    *   can still be writing its file while the winner of a later
    *   version completes). The two are indistinguishable by content,
    *   so ship copies ONLY completed commits. A burned version that
    *   stays burned simply never ships — it carries no actions, so
    *   standby replay is identical without it.
    * - STANDBY side: a ship interrupted mid-copy leaves a
    *   terminator-less log file on the standby. Only COMPLETED
    *   standby files count as already-shipped, so a torn copy is
    *   re-copied (overwrite) on the next cycle instead of silently
    *   burning that version on the standby forever. */
  def ship(spark: SparkSession, primaryDir: String, standbyDir: String): Seq[Int] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (isRetired(fs, standbyDir))
      throw new java.io.IOException(
        s"$standbyDir is retired (failed storage): re-admit it via " +
          "restoreFailedStorage before shipping")
    if (!fs.exists(logDir(primaryDir))) return Seq.empty // nothing committed yet
    val have = commits(fs, standbyDir).map(c => logFile(standbyDir, c.version).getName).toSet
    val conf = spark.sparkContext.hadoopConfiguration
    fs.mkdirs(logDir(standbyDir))
    val byVersion = commits(fs, primaryDir).map(c => c.version -> c).toMap
    val pending = fs.listStatus(logDir(primaryDir)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".log") && !have(n) &&
          byVersion.contains(n.stripSuffix(".log").toInt) // completed only
      }
      .sortBy(_.getPath.getName)
    pending.map { st =>
      val v = st.getPath.getName.stripSuffix(".log").toInt
      byVersion.get(v).foreach { c =>
        c.adds.filterNot(_.startsWith("/")).foreach { rel =>
          org.apache.hadoop.fs.FileUtil.copy(
            fs, new Path(primaryDir, rel), fs, new Path(standbyDir, rel),
            false, true, conf)
        }
      }
      org.apache.hadoop.fs.FileUtil.copy(
        fs, st.getPath, fs, new Path(logDir(standbyDir), st.getPath.getName),
        false, true, conf)
      v
    }
  }

  // ------------------------------------------------------------------
  // Layout upgrade ceremony (reference protocol/ClientProtocol.java:684
  // finalizeUpgrade, :694 distributedUpgradeProgress): an upgrade swaps
  // the active set for a new layout in ONE tagged commit while the
  // pre-upgrade state stays reachable for rollback; finalize closes
  // the rollback window. The state machine is derived purely from
  // replayed tags — no side files, so it inherits the journal's
  // atomicity and survives crashes at any point.
  // ------------------------------------------------------------------

  /** The pending (started, neither rolled back nor finalized) upgrade
    * commit, if any. */
  def pendingUpgrade(fs: FileSystem, tableDir: String): Option[Commit] =
    pendingUpgradeIn(commits(fs, tableDir))

  private def pendingUpgradeIn(cs: Seq[Commit]): Option[Commit] =
    cs.filter(_.tags("upgrade")).lastOption.filter { up =>
      !cs.exists(c => c.version > up.version && (c.tags("rollback") || c.tags("finalize")))
    }

  /** Begin a layout upgrade: write `df` as the new layout and swap it
    * for the entire current active set in one tagged commit. Refused
    * while another upgrade is pending (the reference's one-upgrade-at-
    * a-time rule). Compare-and-swap like checkpoint(): the swap is
    * computed against the active set as of planning, so it may only
    * land at the exact next version — a concurrent commit aborts the
    * ceremony rather than silently resurrecting removed files.
    * Returns the upgrade version. */
  def startUpgrade(spark: SparkSession, tableDir: String, df: DataFrame,
                   relPath: String, ts: Long): Int = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // CAS ordering: claim the next version BEFORE reading the state
    // the swap is computed from — a commit landing after this read
    // occupies >= next, so tryCommit loses and the ceremony aborts
    // (it can never act on a stale active set).
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val cs = stableCommits(fs, tableDir)
    if (pendingUpgradeIn(cs).isDefined)
      throw new IllegalStateException(
        s"$tableDir has a pending upgrade: rollback or finalize it first")
    val old = activeSet(cs)
    df.write.mode("overwrite").parquet(s"$tableDir/$relPath")
    if (!tryCommit(fs, tableDir, next, ts, adds = Seq(relPath), removes = old,
        tags = Seq("upgrade"))) {
      fs.delete(new Path(tableDir, relPath), true)
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during upgrade — retry")
    }
    next
  }

  /** Roll back the pending upgrade: one inverse commit (re-add what
    * the upgrade removed, remove its new layout) tagged `rollback`.
    * The upgrade's files stay on disk for history reads until
    * retention drops them — rollback is a metadata flip, O(1) in data
    * size. CAS-pinned against the ceremony state it inspected. */
  def rollbackUpgrade(fs: FileSystem, tableDir: String, ts: Long): Int = {
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val up = pendingUpgradeIn(stableCommits(fs, tableDir)).getOrElse(
      throw new IllegalStateException(s"$tableDir: no pending upgrade to roll back"))
    if (!tryCommit(fs, tableDir, next, ts, adds = up.removes, removes = up.adds,
        tags = Seq("rollback")))
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during rollback — retry")
    next
  }

  /** Finalize the pending upgrade: close the rollback window with an
    * empty tagged commit. Afterwards rollbackUpgrade refuses and the
    * pre-upgrade layout becomes retention-reclaimable. */
  def finalizeUpgrade(fs: FileSystem, tableDir: String, ts: Long): Int = {
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    pendingUpgradeIn(stableCommits(fs, tableDir)).getOrElse(
      throw new IllegalStateException(s"$tableDir: no pending upgrade to finalize"))
    if (!tryCommit(fs, tableDir, next, ts, adds = Nil, removes = Nil,
        tags = Seq("finalize")))
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during finalize — retry")
    next
  }

  // ------------------------------------------------------------------
  // Symlink / view layer (reference protocol/ClientProtocol.java:839
  // createSymlink, :855 getLinkTarget; FSDirectory symlink INodes): a
  // named alias over a commit-log table, optionally pinned to a
  // version — the lake's view object. Links live under
  // `root/_links/<name>.lnk` and are created CREATE-EXCLUSIVELY, the
  // same atomic-claim discipline as version commits: racing creates
  // cannot both win.
  // ------------------------------------------------------------------

  private def linkFile(root: String, name: String) = new Path(root, s"_links/$name.lnk")

  /** One namespace link: alias -> target (a table dir or another link
    * name, both relative to the root), optionally pinned to a table
    * version. */
  final case class Link(name: String, target: String, version: Option[Int])

  /** Create link `name` -> `target`. Fails if the name exists — the
    * reference's createSymlink contract; remove first to repoint. A
    * link body ends with the same terminal `end` marker as commits: a
    * crash between the exclusive create and the body write leaves a
    * DEAD file (no terminator) that readers skip and a retrying
    * create reclaims — the name can't wedge. */
  def createLink(fs: FileSystem, root: String, name: String, target: String,
                 version: Option[Int] = None): Unit = {
    require(name.nonEmpty && !name.contains("/"), s"link name must be a simple name: '$name'")
    val f = linkFile(root, name)
    fs.mkdirs(f.getParent)
    // reclaim a torn claim: present on disk but unreadable as a link
    if (fs.exists(f) && linkTarget(fs, root, name).isEmpty) fs.delete(f, false)
    val out =
      try fs.create(f, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.io.IOException(s"link exists: $name")
        case e: java.io.IOException if fs.exists(f) =>
          throw new java.io.IOException(s"link exists: $name", e)
      }
    val body = (s"target $target" +: version.map(v => s"version $v").toSeq :+ "end")
      .mkString("", "\n", "\n")
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  def removeLink(fs: FileSystem, root: String, name: String): Boolean =
    fs.delete(linkFile(root, name), false)

  /** The raw (unresolved) target of a link — getLinkTarget. A file
    * without the terminal `end` marker is a torn create: treated as
    * absent (and reclaimable by createLink). */
  def linkTarget(fs: FileSystem, root: String, name: String): Option[Link] = {
    val f = linkFile(root, name)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (!lines.lastOption.contains("end")) return None
    lines.collectFirst { case l if l.startsWith("target ") => l.drop(7) }
      .map(t => Link(name, t,
        lines.collectFirst { case l if l.startsWith("version ") => l.drop(8).toInt }))
  }

  /** All links under the root (the listing surface — symlinks show up
    * in namespace listings with their targets, as in the reference's
    * FileStatus.isSymlink). */
  def listLinks(fs: FileSystem, root: String): Seq[Link] = {
    val dir = new Path(root, "_links")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".lnk")).map(_.stripSuffix(".lnk")).sorted
      .flatMap(n => linkTarget(fs, root, n))
  }

  /** Resolve a link through chains (a target that is itself a link
    * name) to (table dir relative to root, pinned version). The
    * OUTERMOST version pin along the chain wins — an alias of a pinned
    * view keeps the pin, a pinned alias of a live view adds one.
    * Bounded depth guards cycles. */
  def resolveLink(fs: FileSystem, root: String, name: String,
                  maxDepth: Int = 8): (String, Option[Int]) = {
    var cur = name
    var pin: Option[Int] = None
    var depth = 0
    var next = linkTarget(fs, root, cur)
    if (next.isEmpty) throw new java.io.FileNotFoundException(s"no such link: $name")
    while (next.isDefined) {
      depth += 1
      // depth counts FOLLOWED links, so a valid chain of exactly
      // maxDepth links resolves; only depth > maxDepth (a cycle or a
      // genuinely deeper chain) aborts
      if (depth > maxDepth)
        throw new java.io.IOException(s"link chain too deep (cycle?) resolving $name")
      val l = next.get
      pin = pin.orElse(l.version)
      cur = l.target
      next = linkTarget(fs, root, cur)
    }
    (cur, pin)
  }

  /** Read the table a link points at, honoring a version pin — the
    * open-through-symlink path. */
  def readLink(spark: SparkSession, root: String, name: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val (table, pin) = resolveLink(fs, root, name)
    snapshot(spark, s"$root/$table", pin.getOrElse(Int.MaxValue))
  }

  /** RESTORE-to-version — undelete as one journal commit (reference
    * FSImage.java:1 rollback semantics; NameNode.java:474 trash: a
    * delete is reversible because the state that mattered is
    * metadata). Makes version `v`'s active file set CURRENT again by
    * committing the set difference (re-add what was dropped since,
    * drop what was added since) — no data file is read, copied, or
    * rewritten, so restore is O(metadata) at any table size. The
    * restored lineage then diverges under new commits, and every
    * pre-restore version stays readable via snapshot(version):
    * restore adds history, never erases it. CAS-pinned like the
    * other ceremonies. Returns the restore commit's version. */
  def restore(fs: FileSystem, tableDir: String, v: Int, ts: Long): Int = {
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val cs = stableCommits(fs, tableDir)
    val target = activeSet(cs.filter(_.version <= v))
    require(target.nonEmpty, s"nothing to restore: version $v has no active files in $tableDir")
    val current = activeSet(cs)
    val adds = target.filterNot(current.toSet)
    val removes = current.filterNot(target.toSet)
    if (!tryCommit(fs, tableDir, next, ts, adds, removes, tags = Seq("restore")))
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during restore — retry")
    next
  }

  /** DECOMMISSION / DRAIN a storage prefix (reference
    * server/namenode/DecommissionManager.java:1 — retire a node by
    * re-replicating its blocks elsewhere first; ClientProtocol.java:675
    * refreshNodes): rewrite the prefix's ACTIVE rows into
    * `destRelPath` (the only data I/O, proportional to what is being
    * drained, never the table), then swap the references in ONE
    * checkpoint-marked commit whose adds list the full post-drain
    * active set — a self-contained replay start, so a follow-up
    * `dropHistoryBefore(drainVersion)` physically retires the drained
    * dirs while every surviving file keeps its byte identity (nothing
    * else is rewritten). Returns (commit version, drained relpaths). */
  def drain(spark: SparkSession, tableDir: String, prefix: String,
            destRelPath: String, ts: Long): (Int, Seq[String]) = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val active = activeSet(stableCommits(fs, tableDir))
    val doomed = active.filter(p => p == prefix || p.startsWith(prefix + "/"))
    require(doomed.nonEmpty, s"nothing to drain: no active files under $prefix in $tableDir")
    // The overwrite-write below (and the delete on CAS failure) would
    // clobber live data if destRelPath is already an active path — the
    // mirror of the doomed-nonempty check on the other side.
    require(!active.exists(p => p == destRelPath || p.startsWith(destRelPath + "/")
        || destRelPath.startsWith(p + "/")),
      s"drain dest $destRelPath overlaps an active path in $tableDir")
    val survivors = active.filterNot(doomed.toSet)
    spark.read.parquet(doomed.map(resolve(tableDir, _)): _*)
      .write.mode("overwrite").parquet(s"$tableDir/$destRelPath")
    if (!tryCommit(fs, tableDir, next, ts, adds = survivors :+ destRelPath,
        removes = doomed, checkpointMarker = true, tags = Seq("drain"))) {
      fs.delete(new Path(tableDir, destRelPath), true)
      throw new java.util.ConcurrentModificationException(
        s"$tableDir advanced past version $next during drain — retry")
    }
    (next, doomed)
  }

  /** Delete data directories never referenced by any commit (staging
    * leftovers from crashed writers). Paths referenced by ANY version
    * are kept — old versions stay readable. `graceMs` protects a LIVE
    * writer that has staged parquet but not yet committed: only dirs
    * last modified more than the grace window ago are eligible (the
    * Delta-VACUUM retention-window discipline; pass 0 only when no
    * writer can be in flight, e.g. tests). */
  def vacuumOrphans(fs: FileSystem, tableDir: String,
                    graceMs: Long = 3600000L): Seq[String] = {
    val referenced = commits(fs, tableDir).flatMap(_.adds).toSet ++
      clonePinned(fs, tableDir) ++ // shallow-clone back-references pin files
      // hflush-published in-flight files are lease-protected: readable
      // mid-write by opt-in, so never vacuum-eligible however old —
      // they leave through promoteFlush or reclaimFlush, exactly like
      // an under-construction HDFS file leaves through close or lease
      // recovery, never through the block scanner. The PINNED view
      // (marker UNION complete tmp) — mid-replace, either file may be
      // the only reference to staged data
      flushPinned(fs, tableDir).values.flatten
    val dataDir = new Path(tableDir, "data")
    if (!fs.exists(dataDir)) return Seq.empty
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(dataDir).toSeq
      .filter(_.getModificationTime <= cutoff)
      .map(st => s"data/${st.getPath.getName}")
      // a top-level entry is an orphan only if NO referenced relpath
      // lives at or under it — callers may commit nested relpaths
      // (add "data/2024/jan" must protect "data/2024")
      .filterNot(top => referenced.exists(r => r == top || r.startsWith(top + "/")))
      .map { orphan => fs.delete(new Path(tableDir, orphan), true); orphan }
  }

  // ======== FLUSH VISIBILITY — hflush / fsync ========

  private def inflightDir(tableDir: String) = new Path(tableDir, "_inflight")
  private def flushMarker(tableDir: String, writer: String) =
    new Path(inflightDir(tableDir), s"$writer.flush")

  /** hflush/fsync — mid-write visibility for an in-flight batch
    * (reference DFSOutputStream.java:1399 fsync/hflush +
    * ClientProtocol.java:798 fsync: flushed-but-unclosed bytes become
    * readable to readers that ASK for them, while default readers
    * still see only the closed state). The writer stages parquet
    * under the table dir as usual, then publishes the staged relpaths
    * in a PROVISIONAL marker — `_inflight/<writer>.flush` — outside
    * the journal: `commits()`/`snapshot()` never see it, while
    * [[snapshotWithInflight]] (the opt-in tail read) unions it. Each
    * flush REPLACES the writer's marker via write-tmp + rename, and a
    * marker without the terminal `end` is skipped by readers — a torn
    * flush can never surface half a set (tryCommit's terminator rule).
    * The flushed set leaves the provisional state exactly two ways,
    * mirroring an under-construction HDFS file: [[promoteFlush]] at
    * close (becomes an ordinary journal commit) or [[reclaimFlush]]
    * under lease recovery (crashed writer; staged files deleted).
    * While provisional, the files are vacuum-pinned (see
    * [[vacuumOrphans]]). Metadata-only: markers scale with concurrent
    * writers, never with data. */
  def flush(fs: FileSystem, tableDir: String, writer: String,
            adds: Seq[String], ts: Long): Unit = {
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): flush refused before any metadata I/O")
    fs.mkdirs(inflightDir(tableDir))
    val body = (s"ts $ts" +: adds.map("add " + _) :+ "end")
      .mkString("", "\n", "\n")
    val tmp = new Path(inflightDir(tableDir), s"$writer.flush.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = flushMarker(tableDir, writer)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"flush marker swap failed: $dst")
  }

  /** Parse every complete flush file in `_inflight/`: (writer, isTmp,
    * adds). Markers without the terminal `end` (torn mid-swap) parse
    * as absent; a tmp that vanishes mid-listing (renamed over the
    * marker) reads as absent too. */
  private def parsedFlushFiles(fs: FileSystem,
                               tableDir: String): Seq[(String, Boolean, Seq[String])] = {
    val dir = inflightDir(tableDir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".flush") || n.endsWith(".flush.tmp")
      }
      .flatMap { st =>
        val text =
          try {
            val in = fs.open(st.getPath)
            try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
            finally in.close()
          } catch {
            // a tmp can legitimately vanish mid-listing (renamed over
            // the marker) — absent is the correct reading
            case _: java.io.FileNotFoundException => ""
          }
        val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        if (!lines.lastOption.contains("end")) None
        else {
          val name = st.getPath.getName
          Some((name.stripSuffix(".tmp").stripSuffix(".flush"), name.endsWith(".tmp"),
            lines.collect { case l if l.startsWith("add ") => l.drop(4) }))
        }
      }
  }

  /** The CURRENT flushed-but-unpromoted set, per writer: the newest
    * complete flush file wins — a complete `.tmp` is the SUCCESSOR
    * mid-install (flush()'s replace is write-tmp → delete-dst →
    * rename), so it supersedes the installed marker. This is what
    * readers and promotion must see: each flush REPLACES the writer's
    * set, so a writer that crashed after writing a complete tmp whose
    * staged relpaths differ from its marker's must promote ONLY the
    * tmp's set — unioning would commit old-plus-new adds and duplicate
    * rows (ADVICE r12). A torn tmp is ignored and its installed
    * predecessor, if any, still serves. */
  def flushedAdds(fs: FileSystem, tableDir: String): Map[String, Seq[String]] = {
    parsedFlushFiles(fs, tableDir)
      .groupBy(_._1)
      .map { case (w, xs) =>
        // complete tmp (isTmp=true) sorts after the marker
        w -> xs.sortBy(_._2).last._3.distinct
      }
  }

  /** Every relpath ANY complete flush file still references, per
    * writer — marker UNION tmp. This is the PINNING/RECLAIM view, not
    * the read view: during flush()'s replace there is an instant where
    * only the tmp holds the set, and conversely a crashed writer's
    * superseded marker may reference staged files the tmp dropped —
    * vacuum must not delete either until promoteFlush or reclaimFlush
    * retires them (self-review r12; ADVICE r12 scoped the union to
    * exactly this path). */
  def flushPinned(fs: FileSystem, tableDir: String): Map[String, Seq[String]] = {
    parsedFlushFiles(fs, tableDir)
      .groupBy(_._1)
      .map { case (w, xs) => w -> xs.flatMap(_._3).distinct }
  }

  /** The opt-in tail read: the latest committed snapshot plus every
    * currently flushed (unpromoted) add — what a tailing consumer
    * sees when it asks for flushed data, the reference's
    * open-for-read-with-flushed-length path. */
  def snapshotWithInflight(spark: SparkSession, tableDir: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val committed = activeFiles(fs, tableDir)
    val flushed = flushedAdds(fs, tableDir).values.flatten.toSeq.distinct
      .filterNot(committed.toSet)
    val all = committed ++ flushed
    require(all.nonEmpty, s"no active or flushed files in $tableDir")
    spark.read.parquet(all.map(resolve(tableDir, _)): _*)
  }

  /** Close: promote the writer's flushed set into an ordinary journal
    * commit — the data is now visible to EVERY reader — and retire
    * the provisional marker. Returns the committed version. */
  def promoteFlush(spark: SparkSession, tableDir: String, writer: String,
                   ts: Long): Int = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val adds = flushedAdds(fs, tableDir).getOrElse(writer,
      throw new java.io.IOException(s"no flushed set for $writer in $tableDir"))
    val v = commit(fs, tableDir, ts, adds = adds, removes = Seq.empty)
    fs.delete(flushMarker(tableDir, writer), false)
    fs.delete(new Path(inflightDir(tableDir), s"$writer.flush.tmp"), false)
    v
  }

  /** Lease-recovery reclaim of a crashed writer's unpromoted flush:
    * the marker is dropped and its staged files deleted — UNLESS the
    * journal references them (a commit always wins; the recovery then
    * only retires the marker). Returns the deleted relpaths. */
  def reclaimFlush(fs: FileSystem, tableDir: String, writer: String): Seq[String] = {
    // the PINNED view: reclaim deletes everything the crashed writer
    // still references from EITHER flush file — a superseded marker's
    // dropped relpaths are dead staging too
    val adds = flushPinned(fs, tableDir).getOrElse(writer, Seq.empty)
    val referenced = commits(fs, tableDir).flatMap(_.adds).toSet
    val doomed = adds.filterNot(referenced)
    doomed.foreach(rel => fs.delete(new Path(tableDir, rel), true))
    fs.delete(flushMarker(tableDir, writer), false)
    fs.delete(new Path(inflightDir(tableDir), s"$writer.flush.tmp"), false)
    doomed
  }
}
