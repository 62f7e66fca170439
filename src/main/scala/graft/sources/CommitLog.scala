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
    * may start at it). */
  final case class Commit(version: Int, ts: Long, adds: Seq[String], removes: Seq[String],
                          isCheckpoint: Boolean = false)

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
            isCheckpoint = lines.contains("ckpt")))
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

  /** Attempt to commit exactly version `v` (create-exclusive). Returns
    * false ONLY when another writer won the race for `v`; any other IO
    * failure (permissions, disk full, torn write) propagates — it is
    * an error, not a version conflict. */
  def tryCommit(fs: FileSystem, tableDir: String, v: Int, ts: Long,
                adds: Seq[String], removes: Seq[String],
                checkpointMarker: Boolean = false): Boolean = {
    if (isFrozen(fs, tableDir))
      throw new java.io.IOException(
        s"$tableDir is frozen (safe mode): mutations refused, reads unaffected")
    fs.mkdirs(logDir(tableDir))
    val f = logFile(tableDir, v)
    val marker = if (checkpointMarker) Seq("ckpt") else Seq.empty
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
             checkpointMarker: Boolean = false): Int = {
    var v = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    while (!tryCommit(fs, tableDir, v, ts, adds, removes, checkpointMarker)) v += 1
    v
  }

  private def frozenMarker(tableDir: String) = new Path(tableDir, "_frozen")

  /** Safe mode for a versioned table (the reference's
    * ClientProtocol.setSafeMode analogue): while frozen, every commit
    * attempt is refused; reads replay normally. */
  def freeze(fs: FileSystem, tableDir: String): Unit = {
    val out = fs.create(frozenMarker(tableDir), true)
    try out.write("frozen\n".getBytes("UTF-8")) finally out.close()
  }

  def unfreeze(fs: FileSystem, tableDir: String): Unit = {
    fs.delete(frozenMarker(tableDir), false); ()
  }

  def isFrozen(fs: FileSystem, tableDir: String): Boolean =
    fs.exists(frozenMarker(tableDir))

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

  /** Active (relative) file set after replaying the log through the
    * given versions. */
  private def activeSet(cs: Seq[Commit]): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet.empty[String]
    cs.foreach { c => active ++= c.adds; active --= c.removes }
    active.toSeq
  }

  /** Read the table as of a version (default: latest). */
  def snapshot(spark: SparkSession, tableDir: String, version: Int = Int.MaxValue): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val paths = activeSet(commits(fs, tableDir).filter(_.version <= version))
    require(paths.nonEmpty, s"no active files in $tableDir at version $version")
    spark.read.parquet(paths.map(p => s"$tableDir/$p"): _*)
  }

  /** Read the table as it stood at a wall-clock instant (time travel
    * by timestamp: all commits with ts <= asOfMillis). */
  def snapshotAsOf(spark: SparkSession, tableDir: String, asOfMillis: Long): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val paths = activeSet(commits(fs, tableDir).filter(_.ts <= asOfMillis))
    require(paths.nonEmpty, s"no active files in $tableDir as of $asOfMillis")
    spark.read.parquet(paths.map(p => s"$tableDir/$p"): _*)
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
    val base = commits(fs, tableDir)
    val active = activeSet(base)
    require(active.nonEmpty, s"nothing to checkpoint in $tableDir")
    val next = maxVersionOnDisk(fs, tableDir).map(_ + 1).getOrElse(0)
    val image = s"data/ckpt-$next"
    spark.read.parquet(active.map(p => s"$tableDir/$p"): _*)
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

  /** Delete data directories never referenced by any commit (staging
    * leftovers from crashed writers). Paths referenced by ANY version
    * are kept — old versions stay readable. `graceMs` protects a LIVE
    * writer that has staged parquet but not yet committed: only dirs
    * last modified more than the grace window ago are eligible (the
    * Delta-VACUUM retention-window discipline; pass 0 only when no
    * writer can be in flight, e.g. tests). */
  def vacuumOrphans(fs: FileSystem, tableDir: String,
                    graceMs: Long = 3600000L): Seq[String] = {
    val referenced = commits(fs, tableDir).flatMap(_.adds).toSet
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
}
