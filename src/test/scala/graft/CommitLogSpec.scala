package graft

import graft.sources.CommitLog
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

class CommitLogSpec extends SparkSpec {

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def freshTable(name: String): String = {
    val dir = s"/root/repo/target/scratch/commitlog/$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("version reads are stable under later commits; asOf replays by timestamp") {
    val dir = freshTable("versions")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") >= 2), "data/b", ts = 200L)
    val n0 = CommitLog.snapshot(spark, dir, version = 0).count()
    val n1 = CommitLog.snapshot(spark, dir, version = 1).count()
    CommitLog.commit(fs, dir, ts = 300L, adds = Nil, removes = Seq("data/a"))
    // old versions unchanged after the delete commit
    assert(CommitLog.snapshot(spark, dir, version = 0).count() == n0)
    assert(CommitLog.snapshot(spark, dir, version = 1).count() == n1)
    assert(CommitLog.snapshot(spark, dir).count() == n1 - n0)
    // timestamp travel: boundary inclusive, mid-range picks the commit before
    assert(CommitLog.snapshotAsOf(spark, dir, 100L).count() == n0)
    assert(CommitLog.snapshotAsOf(spark, dir, 250L).count() == n1)
    assert(CommitLog.snapshotAsOf(spark, dir, 300L).count() == n1 - n0)
  }

  test("two writers racing for one version: exactly one wins, loser lands on the next") {
    val dir = freshTable("race")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r, "data/base", ts = 100L)
    // both writers target version 1
    val winA = CommitLog.tryCommit(fs, dir, 1, 200L, Seq("data/a"), Nil)
    val winB = CommitLog.tryCommit(fs, dir, 1, 201L, Seq("data/b"), Nil)
    assert(winA && !winB, "create-exclusive must admit exactly one writer per version")
    // the loser's retry path (commit) appends at the next free version
    val v = CommitLog.commit(fs, dir, 201L, Seq("data/b"), Nil)
    assert(v == 2)
    val cs = CommitLog.commits(fs, dir)
    assert(cs.map(_.version) == Seq(0, 1, 2))
    assert(cs(1).adds == Seq("data/a") && cs(2).adds == Seq("data/b"))
  }

  test("checkpoint compacts the journal; head and history both stay readable") {
    val dir = freshTable("checkpoint")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") >= 2), "data/b", ts = 200L)
    CommitLog.commit(fs, dir, ts = 300L, adds = Nil, removes = Seq("data/a"))
    val headBefore = CommitLog.snapshot(spark, dir)
      .collect().map(_.getInt(0)).sorted.toSeq
    val v = CommitLog.checkpoint(spark, dir, ts = 400L)
    // head content identical through the image
    assert(CommitLog.snapshot(spark, dir)
      .collect().map(_.getInt(0)).sorted.toSeq == headBefore)
    // the image commit replaced the active files with one dir
    val cs = CommitLog.commits(fs, dir)
    assert(cs.last.version == v && cs.last.adds == Seq(s"data/ckpt-$v"))
    // pre-checkpoint versions still read their original files
    assert(CommitLog.snapshot(spark, dir, version = 1).count() == r.count())
    // appends continue on top of the image
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 1), "data/c", ts = 500L)
    assert(CommitLog.snapshot(spark, dir).count() ==
      headBefore.size + r.filter(col("r_regionkey") < 1).count())
  }

  test("retention truncates history at a checkpoint; head replays from the image") {
    val dir = freshTable("retention")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") >= 2), "data/b", ts = 200L)
    CommitLog.commit(fs, dir, ts = 300L, adds = Nil, removes = Seq("data/a"))
    // retention without a checkpoint must refuse (nothing to replay from)
    intercept[IllegalArgumentException] { CommitLog.dropHistoryBefore(fs, dir, 2) }
    val ck = CommitLog.checkpoint(spark, dir, ts = 400L)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 1), "data/c", ts = 500L)
    val headBefore = CommitLog.snapshot(spark, dir).count()
    // graceMs = 0: no writer is in flight in the test
    val dropped = CommitLog.dropHistoryBefore(fs, dir, ck, graceMs = 0L)
    assert(dropped == Seq(0, 1, 2))
    // head still replays (image + later edits); pre-cut data reclaimed
    assert(CommitLog.snapshot(spark, dir).count() == headBefore)
    assert(CommitLog.snapshot(spark, dir, version = ck).count() ==
      r.filter(col("r_regionkey") >= 2).count())
    assert(!fs.exists(new Path(dir, "data/a")) && !fs.exists(new Path(dir, "data/b")))
    // truncated versions are gone
    intercept[IllegalArgumentException] {
      CommitLog.snapshot(spark, dir, version = 1).count()
    }
  }

  test("freeze refuses commits (safe mode) while reads keep replaying") {
    val dir = freshTable("freeze")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r, "data/base", ts = 100L)
    CommitLog.freeze(fs, dir)
    intercept[java.io.IOException] {
      CommitLog.commit(fs, dir, 200L, Seq("data/x"), Nil)
    }
    assert(CommitLog.snapshot(spark, dir).count() == r.count()) // reads fine
    CommitLog.unfreeze(fs, dir)
    CommitLog.writeCommit(spark, dir, r, "data/more", ts = 300L)
    assert(CommitLog.snapshot(spark, dir).count() == 2 * r.count())
  }

  test("streaming commit-log sink: each micro-batch is a version; history time-travels") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Ev
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshTable("stream_sink")
    val ck = s"/root/repo/target/scratch/commitlog/stream_sink_ck"
    fs.delete(new Path(ck), true)
    fs.delete(new Path(ck + "2"), true)
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val stream = MemoryStream[Ev]
    val q = StreamingOps.commitLogSink(stream.toDF(), dir, ck)
    try {
      stream.addData(events.take(300)); q.processAllAvailable()
      stream.addData(events.drop(300)); q.processAllAvailable()
    } finally q.stop()
    val cs = CommitLog.commits(fs, dir)
    assert(cs.length == 2 && cs.map(_.version) == Seq(0, 1))
    // version 0 = first batch only; head = everything
    assert(CommitLog.snapshot(spark, dir, version = 0).count() == 300)
    assert(CommitLog.snapshot(spark, dir).count() == events.length)
    // restarting from the SAME checkpoint commits nothing new (batch
    // ids at or below the sink's high-water mark are skipped)
    val stream2 = MemoryStream[Ev]
    val q2 = StreamingOps.commitLogSink(stream2.toDF(), dir, ck)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(CommitLog.commits(fs, dir).length == 2, "same-checkpoint restart re-committed")
    // a DIFFERENT producer (fresh checkpoint) writes under its own
    // sink prefix: its batch 0 cannot collide with this stream's
    // batch 0 — the data lands instead of being silently dropped
    val stream3 = MemoryStream[Ev]
    val q3 = StreamingOps.commitLogSink(stream3.toDF(), dir, ck + "2")
    try {
      stream3.addData(events.take(10)); q3.processAllAvailable()
    } finally q3.stop()
    assert(CommitLog.commits(fs, dir).length == 3, "second producer's batch was dropped")
    assert(CommitLog.snapshot(spark, dir).count() == events.length + 10)
  }

  test("vacuum removes only never-referenced staging dirs") {
    val dir = freshTable("vacuum")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r, "data/live", ts = 100L)
    // a crashed writer's staging leftovers: data written, commit never created
    r.write.parquet(s"$dir/data/orphan")
    // a referenced-then-removed dir must SURVIVE vacuum (old versions
    // still read it)
    CommitLog.writeCommit(spark, dir, r, "data/retired", ts = 200L)
    CommitLog.commit(fs, dir, 300L, Nil, Seq("data/retired"))
    // fresh orphans survive the default grace window (live-writer
    // protection); with grace 0 they are reclaimed
    assert(CommitLog.vacuumOrphans(fs, dir).isEmpty)
    val removed = CommitLog.vacuumOrphans(fs, dir, graceMs = 0L)
    assert(removed == Seq("data/orphan"))
    assert(fs.exists(new Path(dir, "data/retired")))
    assert(CommitLog.snapshot(spark, dir, version = 1).count() == 2 * r.count())
  }

  test("checkpoint cadence: free below threshold, compacts above, declines after") {
    val dir = freshTable("cadence")
    val n = Tables.nation(spark, sfDir)
    def slice(r: Int) = n.filter(col("n_nationkey") % 5 === r)
    (0 to 2).foreach(r =>
      CommitLog.writeCommit(spark, dir, slice(r), s"data/m$r", ts = 100L * (r + 1)))
    // replay = 3, cadence 3: not yet
    assert(CommitLog.maybeCheckpoint(spark, dir, ts = 400L, maxReplay = 3).isEmpty)
    assert(!CommitLog.commits(fs, dir).exists(_.isCheckpoint), "no image below threshold")
    CommitLog.writeCommit(spark, dir, slice(3), "data/m3", ts = 500L)
    val total = CommitLog.snapshot(spark, dir).count()
    // replay = 4 > 3: image commit lands, content unchanged
    val v = CommitLog.maybeCheckpoint(spark, dir, ts = 600L, maxReplay = 3)
    assert(v.contains(4), s"image should land at the next version: $v")
    assert(CommitLog.commits(fs, dir).exists(c => c.isCheckpoint && c.version == 4))
    assert(CommitLog.snapshot(spark, dir).count() == total)
    // replay = 1 right after: declines
    assert(CommitLog.maybeCheckpoint(spark, dir, ts = 700L, maxReplay = 3).isEmpty)
    // post-image appends replay image + delta; pre-image history readable
    CommitLog.writeCommit(spark, dir, slice(4), "data/m4", ts = 800L)
    assert(CommitLog.snapshot(spark, dir).count() == n.count())
    assert(CommitLog.snapshot(spark, dir, version = 2).count() ==
      slice(0).count() + slice(1).count() + slice(2).count())
  }

  test("restore makes an old version current again, then diverges; history intact") {
    val dir = freshTable("restore")
    val n = Tables.nation(spark, sfDir)
    def slice(r: Int) = n.filter(col("n_nationkey") % 4 === r)
    CommitLog.writeCommit(spark, dir, slice(0), "data/m0", ts = 100L) // v0
    CommitLog.writeCommit(spark, dir, slice(1), "data/m1", ts = 200L) // v1
    CommitLog.writeCommit(spark, dir, slice(2), "data/m2", ts = 300L) // v2
    val v1Keys = CommitLog.snapshot(spark, dir, version = 1)
      .select("n_nationkey").collect().map(_.getInt(0)).sorted.toSeq
    val rv = CommitLog.restore(fs, dir, v = 1, ts = 400L)
    assert(rv == 3, "restore is one ordinary journal commit")
    // head == v1 exactly, via pure metadata (no data dir was touched)
    assert(CommitLog.snapshot(spark, dir)
      .select("n_nationkey").collect().map(_.getInt(0)).sorted.toSeq == v1Keys)
    // pre-restore history is still readable — restore adds, never erases
    assert(CommitLog.snapshot(spark, dir, version = 2).count() ==
      slice(0).count() + slice(1).count() + slice(2).count())
    // post-restore append lands on the restored lineage: 0,1,3 — not 2
    CommitLog.writeCommit(spark, dir, slice(3), "data/m3", ts = 500L)
    val headKeys = CommitLog.snapshot(spark, dir)
      .select("n_nationkey").collect().map(_.getInt(0) % 4).toSet
    assert(headKeys == Set(0, 1, 3), s"diverged head should hold slices 0,1,3: $headKeys")
  }

  test("drain retires a storage dir; survivors keep byte identity, content unchanged") {
    val dir = freshTable("drain")
    val n = Tables.nation(spark, sfDir)
    def slice(r: Int) = n.filter(col("n_nationkey") % 3 === r)
    CommitLog.writeCommit(spark, dir, slice(0), "data/store0", ts = 100L)
    CommitLog.writeCommit(spark, dir, slice(1), "data/store1", ts = 200L)
    CommitLog.writeCommit(spark, dir, slice(2), "data/store2", ts = 300L)
    val total = CommitLog.snapshot(spark, dir).count()
    def identity(store: String): Map[String, (Long, Long)] =
      fs.listStatus(new Path(s"$dir/data/$store")).filter(_.isFile)
        .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
    val id0 = identity("store0"); val id2 = identity("store2")
    val (v, moved) = CommitLog.drain(spark, dir, "data/store1", "data/absorbed1", ts = 400L)
    assert(moved == Seq("data/store1"), s"drain should move exactly store1: $moved")
    CommitLog.dropHistoryBefore(fs, dir, v, graceMs = 0L) // physical retire
    assert(!fs.exists(new Path(s"$dir/data/store1")), "drained dir must be gone")
    assert(identity("store0") == id0 && identity("store2") == id2,
      "surviving stores must keep byte identity — drain rewrites only what it drains")
    assert(CommitLog.snapshot(spark, dir).count() == total, "drain must not change content")
    // drained rows now live in the absorbed location
    assert(fs.exists(new Path(s"$dir/data/absorbed1")))
  }

  test("clone checkpoint localizes the external references; source untouched") {
    val src = freshTable("clone_src")
    val dst = freshTable("clone_dst")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, src, r.filter(col("r_regionkey") < 3), "data/a", ts = 100L)
    CommitLog.cloneFrom(fs, src, dst, ts = 200L)
    val before = CommitLog.snapshot(spark, dst).count()
    // the clone holds NO data of its own yet — journal only
    assert(!fs.exists(new Path(s"$dst/data")))
    // checkpoint materializes the active set locally
    CommitLog.checkpoint(spark, dst, ts = 300L)
    assert(CommitLog.snapshot(spark, dst).count() == before)
    assert(fs.exists(new Path(s"$dst/data")), "checkpoint should localize the clone")
    // source table is structurally untouched and still readable
    assert(CommitLog.snapshot(spark, src).count() == before)
    // vacuum on the clone can never reach the source's files
    CommitLog.vacuumOrphans(fs, dst, graceMs = 0L)
    assert(CommitLog.snapshot(spark, src).count() == before)
  }

  test("source retention cannot break a live clone: back-references pin, then release") {
    val src = freshTable("pin_src")
    val dst = freshTable("pin_dst")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, src, r.filter(col("r_regionkey") < 3), "data/a", ts = 100L)
    CommitLog.cloneFrom(fs, src, dst, ts = 200L)
    val cloneRows = CommitLog.snapshot(spark, dst).count()
    assert(CommitLog.registeredClones(fs, src) == Seq(dst))
    // source moves on: checkpoint supersedes data/a, retention runs
    CommitLog.writeCommit(spark, src, r.filter(col("r_regionkey") >= 3), "data/b", ts = 300L)
    val ck = CommitLog.checkpoint(spark, src, ts = 400L)
    val reclaimed = CommitLog.dropHistoryBefore(fs, src, ck, graceMs = 0L)
    assert(reclaimed.nonEmpty, "history should actually drop")
    // data/a is no longer in the source's journal, but the clone
    // still references it — it must survive the vacuum
    assert(fs.exists(new Path(s"$src/data/a")), "clone-pinned file was vacuumed")
    assert(CommitLog.snapshot(spark, dst).count() == cloneRows,
      "clone must stay readable through source retention")
    // clone localizes + drops its external-ref history -> pin releases
    val cloneCk = CommitLog.checkpoint(spark, dst, ts = 500L)
    CommitLog.dropHistoryBefore(fs, dst, cloneCk, graceMs = 0L)
    CommitLog.vacuumOrphans(fs, src, graceMs = 0L)
    assert(!fs.exists(new Path(s"$src/data/a")),
      "released pin should let the source reclaim the file")
    assert(CommitLog.registeredClones(fs, src).isEmpty,
      "stale clone marker should be swept")
    assert(CommitLog.snapshot(spark, dst).count() == cloneRows,
      "localized clone unaffected by source reclaim")
  }

  test("journalTimeline: one O(V) fold equals per-version activeFiles replay") {
    val dir = freshTable("timeline")
    val n = Tables.nation(spark, sfDir)
    def slice(r: Int) = n.filter(col("n_nationkey") % 4 === r)
    CommitLog.writeCommit(spark, dir, slice(0), "data/m0", ts = 100L)
    CommitLog.writeCommit(spark, dir, slice(1), "data/m1", ts = 200L)
    CommitLog.commit(fs, dir, 300L, Nil, Seq("data/m0"))
    CommitLog.checkpoint(spark, dir, ts = 400L)
    CommitLog.writeCommit(spark, dir, slice(2), "data/m2", ts = 500L)
    CommitLog.restore(fs, dir, v = 1, ts = 600L)
    val cs = CommitLog.commits(fs, dir)
    val timeline = CommitLog.journalTimeline(cs)
    assert(timeline.map(_._1.version) == cs.map(_.version).sorted)
    // the single-pass counts must equal the O(V^2) per-version replay
    timeline.foreach { case (c, nActive) =>
      assert(nActive == CommitLog.activeFiles(fs, dir, c.version).size.toLong,
        s"timeline diverges from replay at v${c.version}")
    }
  }

  test("restore racing an append: one winner per version, journal linearizes") {
    val n = Tables.nation(spark, sfDir)
    var sawRestoreLose = false
    var sawRestoreWin = false
    for (trial <- 0 until 4) {
      val dir = freshTable(s"race_restore_$trial")
      CommitLog.writeCommit(spark, dir, n.filter(col("n_nationkey") < 5), "data/m0", ts = 100L)
      CommitLog.writeCommit(spark, dir, n.filter(col("n_nationkey") >= 5), "data/m1", ts = 200L)
      n.limit(1).write.parquet(s"$dir/data/m2") // appended data, staged pre-race
      // both contenders enter targeting version 2
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      @volatile var restoreV: Int = -1
      @volatile var restoreLost = false
      val rt = new Thread(() => {
        barrier.await()
        try restoreV = CommitLog.restore(fs, dir, v = 0, ts = 300L)
        catch { case _: java.util.ConcurrentModificationException => restoreLost = true }
      })
      @volatile var appendV: Int = -1
      val at = new Thread(() => {
        barrier.await()
        appendV = CommitLog.commit(fs, dir, 301L, Seq("data/m2"), Nil)
      })
      rt.start(); at.start(); rt.join(30000); at.join(30000)
      assert(appendV >= 2, "append must always land (commit retries past losses)")
      if (restoreLost) { sawRestoreLose = true; restoreV = CommitLog.restore(fs, dir, v = 0, ts = 400L) }
      else sawRestoreWin = true
      // exactly one commit per version, contiguous — create-exclusive linearized the race
      val vs = CommitLog.commits(fs, dir).map(_.version)
      assert(vs == (0 to vs.max), s"journal must be contiguous with one winner per slot: $vs")
      assert(vs.max == 3 && Set(restoreV, appendV) == Set(2, 3),
        s"restore@$restoreV append@$appendV must occupy versions 2 and 3 exactly")
      // replay is consistent with whichever order won
      val expectHead =
        if (restoreV > appendV) Set("data/m0") // restore last: back to v0's set
        else Set("data/m0", "data/m2") // append on the restored lineage
      assert(CommitLog.activeFiles(fs, dir).toSet == expectHead)
      assert(CommitLog.snapshot(spark, dir).count() ==
        expectHead.toSeq.map(p => spark.read.parquet(s"$dir/$p").count()).sum)
    }
    info(s"race coverage: restore lost=$sawRestoreLose won=$sawRestoreWin")
  }

  test("drain racing an append: loser cleans its staging, retry succeeds") {
    val n = Tables.nation(spark, sfDir)
    for (trial <- 0 until 3) {
      val dir = freshTable(s"race_drain_$trial")
      def slice(r: Int) = n.filter(col("n_nationkey") % 3 === r)
      CommitLog.writeCommit(spark, dir, slice(0), "data/store0", ts = 100L)
      CommitLog.writeCommit(spark, dir, slice(1), "data/store1", ts = 200L)
      slice(2).write.parquet(s"$dir/data/late")
      val total = CommitLog.snapshot(spark, dir).count()
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      @volatile var drainLost = false
      val dt = new Thread(() => {
        barrier.await()
        try CommitLog.drain(spark, dir, "data/store1", "data/absorbed", ts = 300L)
        catch { case _: java.util.ConcurrentModificationException => drainLost = true }
      })
      val at = new Thread(() => {
        barrier.await()
        CommitLog.commit(fs, dir, 301L, Seq("data/late"), Nil)
      })
      dt.start(); at.start(); dt.join(60000); at.join(60000)
      if (drainLost) {
        // CAS failure path must have deleted the staged rewrite
        assert(!fs.exists(new Path(s"$dir/data/absorbed")),
          "losing drain must clean up its staging dir")
        CommitLog.drain(spark, dir, "data/store1", "data/absorbed", ts = 400L)
      }
      val vs = CommitLog.commits(fs, dir).map(_.version)
      assert(vs == (0 to vs.max), s"journal must stay contiguous: $vs")
      // content: everything except nothing — drain moves, append adds
      assert(CommitLog.snapshot(spark, dir).count() == total + slice(2).count())
      assert(!CommitLog.activeFiles(fs, dir).contains("data/store1"))
      assert(CommitLog.activeFiles(fs, dir).contains("data/absorbed"))
    }
  }

  test("drain refuses a dest that overlaps an active path") {
    val dir = freshTable("drain_guard")
    val n = Tables.nation(spark, sfDir)
    CommitLog.writeCommit(spark, dir, n.filter(col("n_nationkey") < 5), "data/store0", ts = 100L)
    CommitLog.writeCommit(spark, dir, n.filter(col("n_nationkey") >= 5), "data/store1", ts = 200L)
    // dest == an active path, dest under an active path, active path under dest
    intercept[IllegalArgumentException] {
      CommitLog.drain(spark, dir, "data/store1", "data/store0", ts = 300L)
    }
    intercept[IllegalArgumentException] {
      CommitLog.drain(spark, dir, "data/store1", "data/store0/sub", ts = 300L)
    }
    intercept[IllegalArgumentException] {
      CommitLog.drain(spark, dir, "data/store1", "data", ts = 300L)
    }
    // live data untouched by the refused ceremonies
    assert(CommitLog.snapshot(spark, dir).count() == n.count())
  }

  test("deleting a clone wholesale releases its pin on the next source vacuum") {
    val src = freshTable("pin2_src")
    val dst = freshTable("pin2_dst")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, src, r, "data/a", ts = 100L)
    CommitLog.cloneFrom(fs, src, dst, ts = 200L)
    CommitLog.writeCommit(spark, src, r.limit(1), "data/b", ts = 300L)
    val ck = CommitLog.checkpoint(spark, src, ts = 400L)
    fs.delete(new Path(dst), true) // clone abandoned
    CommitLog.dropHistoryBefore(fs, src, ck, graceMs = 0L)
    assert(!fs.exists(new Path(s"$src/data/a")),
      "dead clone must not pin source files")
    assert(CommitLog.registeredClones(fs, src).isEmpty)
  }

  test("saveNamespace images now, declines on a fresh image, re-arms on append") {
    val dir = freshTable("save_ns")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") >= 2), "data/b", ts = 200L)
    // explicit verb fires below any cadence threshold
    assert(CommitLog.maybeCheckpoint(spark, dir, 250L, maxReplay = 10).isEmpty)
    val v = CommitLog.saveNamespace(spark, dir, ts = 300L)
    assert(v.contains(2), s"image-now must checkpoint at the head, got $v")
    // head already an image: decline, don't stamp a redundant image
    assert(CommitLog.saveNamespace(spark, dir, ts = 400L).isEmpty)
    assert(CommitLog.commits(fs, dir).count(_.isCheckpoint) == 1)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") === 0),
      "data/c", ts = 500L)
    assert(CommitLog.saveNamespace(spark, dir, ts = 600L).nonEmpty)
    // content preserved through both images
    assert(CommitLog.snapshot(spark, dir).count() ==
      r.count() + r.filter(col("r_regionkey") === 0).count())
  }

  test("retired storage is fenced from ship until restoreFailedStorage re-admits") {
    val primary = freshTable("rfs_primary")
    val replica = freshTable("rfs_replica")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, primary, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    assert(CommitLog.ship(spark, primary, replica) == Seq(0))
    CommitLog.retireStorage(fs, replica)
    CommitLog.writeCommit(spark, primary, r.filter(col("r_regionkey") >= 2), "data/b", ts = 200L)
    intercept[java.io.IOException] { CommitLog.ship(spark, primary, replica) }
    // re-admission resyncs exactly the missed delta and drops the fence
    assert(CommitLog.restoreFailedStorage(spark, primary, replica) == Seq(1))
    assert(!CommitLog.isRetired(fs, replica))
    assert(CommitLog.snapshot(spark, replica).count() == r.count())
    // idempotent on an in-sync dir
    assert(CommitLog.restoreFailedStorage(spark, primary, replica).isEmpty)
  }

  test("burned version pays the grace wait at most once (ADVICE r11)") {
    val dir = freshTable("burned_once")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r, "data/a", ts = 100L)
    CommitLog.commit(fs, dir, ts = 200L, adds = Seq("data/a2"), removes = Nil)
    // a crashed writer: version file present, body never terminated
    val burned = new Path(s"$dir/_log/5.log")
    val out = fs.create(burned, false)
    out.write("ts 300\nadd data/ghost\n".getBytes("UTF-8")); out.close()
    def timedRestore(v: Int): Long = {
      val t0 = System.nanoTime()
      CommitLog.restore(fs, dir, v, ts = 400L + v)
      (System.nanoTime() - t0) / 1000000L
    }
    // first stable read diagnoses the burned file: pays the full grace
    val first = timedRestore(0)
    assert(first >= 1500L, s"first read should pay the ~2s grace, took ${first}ms")
    // diagnosis cached: subsequent ceremonies on this table are fast
    val second = timedRestore(0)
    assert(second < 1500L, s"burned diagnosis must be cached, took ${second}ms")
    // the burned version stayed burned: ghost never entered the lineage
    assert(!CommitLog.commits(fs, dir).exists(_.adds.contains("data/ghost")))
    assert(CommitLog.snapshot(spark, dir).count() == r.count())
  }

  test("burned diagnosis evicts when the file is wiped: a recreated in-flight file re-pays the grace (ADVICE r11)") {
    val dir = freshTable("burned_evict")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r, "data/a", ts = 100L)
    val burned = new Path(s"$dir/_log/5.log")
    def crashWriter(): Unit = {
      val out = fs.create(burned, false)
      out.write("ts 300\nadd data/ghost\n".getBytes("UTF-8")); out.close()
    }
    def timedRestore(v: Int): Long = {
      val t0 = System.nanoTime()
      CommitLog.restore(fs, dir, v, ts = 400L)
      (System.nanoTime() - t0) / 1000000L
    }
    crashWriter()
    assert(timedRestore(0) >= 1500L, "first read pays the grace")
    assert(timedRestore(0) < 1500L, "diagnosis cached")
    // the burned file is wiped (vacuumed history / dir recreate) and a
    // NEW in-flight writer reuses the version number with the same
    // length — identity (len, mtime) alone cannot tell them apart on a
    // coarse-mtime filesystem; eviction at the file-gone read restores
    // the full grace guarantee for the successor
    fs.delete(burned, false)
    assert(timedRestore(0) < 1500L, "no wait with the file gone (and diagnosis evicted)")
    crashWriter()
    assert(timedRestore(0) >= 1500L,
      "a recreated same-version in-flight file must re-pay the full grace")
  }

  test("hflush: opt-in tail sees the flushed set, default readers don't; promote converges; torn marker invisible") {
    val dir = freshTable("flush")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/b")
    CommitLog.flush(fs, dir, "w1", Seq("data/b"), ts = 150L)
    assert(CommitLog.snapshot(spark, dir).count() == 2, "default read: committed only")
    assert(CommitLog.snapshotWithInflight(spark, dir).count() == 5, "tail read: plus flushed")
    // a torn marker (no terminator — crashed mid-swap) parses as absent
    val torn = fs.create(new Path(s"$dir/_inflight/w2.flush"), true)
    torn.write("ts 160\nadd data/ghost\n".getBytes("UTF-8")); torn.close()
    assert(CommitLog.flushedAdds(fs, dir).keySet == Set("w1"))
    // zero-grace vacuum: the flushed file is lease-protected
    assert(CommitLog.vacuumOrphans(fs, dir, graceMs = 0L).isEmpty)
    // re-flush REPLACES the writer's marker (hflush is repeatable)
    CommitLog.flush(fs, dir, "w1", Seq("data/b"), ts = 170L)
    assert(CommitLog.snapshotWithInflight(spark, dir).count() == 5)
    // close: the set becomes an ordinary version, the marker retires
    val v = CommitLog.promoteFlush(spark, dir, "w1", ts = 200L)
    assert(CommitLog.snapshot(spark, dir, version = v).count() == 5)
    assert(!CommitLog.flushedAdds(fs, dir).contains("w1"))
    // with no marker left, the staged file is pinned by the JOURNAL now
    assert(CommitLog.vacuumOrphans(fs, dir, graceMs = 0L).isEmpty)
  }

  test("append-reopen contract (reference TestFileAppend2/3): a committed entry reopens " +
    "under lease and extends; visible length is the closed state until close " +
    "promotes the flushed tail; one appender at a time; a fenced close fails " +
    "and recovery finalizes at the flushed length") {
    // The reference's append (ClientProtocol.append; pinned by
    // test/hdfs/.../TestFileAppend2.java testSimpleAppend and
    // TestFileAppend3.java TC1/TC2/TC5/TC11/TC12) maps onto the
    // commit-log world as: reopen = acquire the table's writer lease,
    // extend = stage additional parquet + publish it in the writer's
    // flush marker (the hflush ceremony — DFSOutputStream.hflush),
    // close = verify the lease then promoteFlush (an ordinary journal
    // commit at the extended length). "Visible length" is the row
    // count a reader serves: default readers see the last CLOSED
    // state; readers that ask (snapshotWithInflight — the reference's
    // getVisibleLength after hflush) see the flushed tail.
    import graft.streaming.StreamingOps
    val dir = freshTable("append_reopen")
    val docs = Tables.documents(spark, sfDir)
    val stateDir = s"$dir/_appender"
    // --- TC1 shape: create file, write len1, CLOSE (an ordinary commit)
    val len1 = docs.filter(col("doc_id") % 4 === 0).count()
    CommitLog.writeCommit(spark, dir, docs.filter(col("doc_id") % 4 === 0),
      "data/e0", ts = 100L)
    assert(CommitLog.snapshot(spark, dir).count() == len1)
    // --- reopen to append (fs.append): lease + staged extension
    StreamingOps.acquireLease(fs, stateDir, "m1")
    val len2 = docs.filter(col("doc_id") % 4 === 1).count()
    docs.filter(col("doc_id") % 4 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/e0_app1")
    CommitLog.flush(fs, dir, "m1", Seq("data/e0_app1"), ts = 150L)
    // hflush visibility: the reader that asks sees len1+len2, the
    // default reader still sees the closed len1 (TC11 step b)
    assert(CommitLog.snapshot(spark, dir).count() == len1)
    assert(CommitLog.snapshotWithInflight(spark, dir).count() == len1 + len2)
    // --- TC5: only one simultaneous append — machine M2's reopen fails
    intercept[StreamingOps.LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "m2")
    }
    // --- close: verify lease, promote, release — reopen-and-read
    // sees the full extended length (AppendTestUtil.check)
    StreamingOps.verifyLease(fs, stateDir, "m1")
    CommitLog.promoteFlush(spark, dir, "m1", ts = 200L)
    StreamingOps.releaseLease(fs, stateDir, "m1")
    assert(CommitLog.snapshot(spark, dir).count() == len1 + len2)
    // --- TC2/TC12 shape: append AGAIN at a non-boundary (the second
    // extension of an already-extended entry) — same ceremony, full
    // length len1+len2+len3 after close
    val len3 = docs.filter(col("doc_id") % 4 === 2).count()
    StreamingOps.acquireLease(fs, stateDir, "m2") // released lease reopens
    docs.filter(col("doc_id") % 4 === 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/e0_app2")
    CommitLog.flush(fs, dir, "m2", Seq("data/e0_app2"), ts = 250L)
    StreamingOps.verifyLease(fs, stateDir, "m2")
    CommitLog.promoteFlush(spark, dir, "m2", ts = 260L)
    StreamingOps.releaseLease(fs, stateDir, "m2")
    assert(CommitLog.snapshot(spark, dir).count() == len1 + len2 + len3)
    // --- TC11: appender hflushes, then is FENCED before close (the
    // rename-then-close case: the writer's close() must throw) —
    // recovery then finalizes the file at the flushed length, exactly
    // what the reference's lease recovery does to the hflushed tail
    val len4 = docs.filter(col("doc_id") % 4 === 3).count()
    StreamingOps.acquireLease(fs, stateDir, "m3")
    docs.filter(col("doc_id") % 4 === 3).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/e0_app3")
    CommitLog.flush(fs, dir, "m3", Seq("data/e0_app3"), ts = 300L)
    StreamingOps.recoverLease(fs, stateDir, "recoverer") // the fence
    intercept[StreamingOps.LeaseHeldException] { // m3's close() throws
      StreamingOps.verifyLease(fs, stateDir, "m3")
    }
    // the recoverer finalizes at the last hflush: the flushed set
    // becomes a journal commit, the writer's marker retires
    CommitLog.promoteFlush(spark, dir, "m3", ts = 310L)
    StreamingOps.releaseLease(fs, stateDir, "recoverer")
    assert(CommitLog.snapshot(spark, dir).count() == len1 + len2 + len3 + len4)
    assert(!CommitLog.flushedAdds(fs, dir).contains("m3"))
  }

  test("reclaimFlush deletes only unpromoted staged files; journal references always win") {
    val dir = freshTable("flush_reclaim")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/b")
    // the crashed writer's flush named BOTH its staged file and an
    // already-committed one (e.g. a flush taken after a concurrent
    // compaction re-added the path) — only the unreferenced one dies
    CommitLog.flush(fs, dir, "w1", Seq("data/b", "data/a"), ts = 150L)
    val reclaimed = CommitLog.reclaimFlush(fs, dir, "w1")
    assert(reclaimed == Seq("data/b"))
    assert(fs.exists(new Path(s"$dir/data/a")), "journal-referenced file survives")
    assert(!fs.exists(new Path(s"$dir/data/b")), "unpromoted staged file reclaimed")
    assert(CommitLog.flushedAdds(fs, dir).isEmpty)
    assert(CommitLog.snapshot(spark, dir).count() == 2, "committed truth intact")
  }

  test("crash mid-replace: a complete tmp supersedes the marker for reads/promote, union only pins/reclaims") {
    val dir = freshTable("flush_replace_crash")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/old")
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/new")
    // marker holds set A...
    CommitLog.flush(fs, dir, "w1", Seq("data/old"), ts = 150L)
    // ...then the writer crashes between tmp-write and rename while
    // REPLACING it with set B (different relpaths): a complete
    // .flush.tmp beside a stale marker
    val tmp = fs.create(new Path(s"$dir/_inflight/w1.flush.tmp"), true)
    tmp.write("ts 160\nadd data/new\nend\n".getBytes("UTF-8")); tmp.close()
    // read view resolves to the SUCCESSOR set only (ADVICE r12: a
    // union here would promote old-plus-new and duplicate rows)
    assert(CommitLog.flushedAdds(fs, dir)("w1") == Seq("data/new"))
    assert(CommitLog.snapshotWithInflight(spark, dir).count() == 5,
      "tail read: committed plus the successor set, never both staged sets")
    // pinning view still protects BOTH staged sets mid-replace
    assert(CommitLog.flushPinned(fs, dir)("w1").toSet == Set("data/old", "data/new"))
    assert(CommitLog.vacuumOrphans(fs, dir, graceMs = 0L).isEmpty,
      "zero-grace vacuum must not touch either staged set")
    // promote commits exactly B
    val v = CommitLog.promoteFlush(spark, dir, "w1", ts = 200L)
    assert(CommitLog.commits(fs, dir).find(_.version == v).get.adds == Seq("data/new"))
    assert(CommitLog.snapshot(spark, dir, version = v).count() == 5)
    // the superseded set is now unreferenced dead staging — vacuum takes it
    assert(CommitLog.vacuumOrphans(fs, dir, graceMs = 0L) == Seq("data/old"))
    assert(fs.exists(new Path(s"$dir/data/new")) && !fs.exists(new Path(s"$dir/data/old")))
  }

  test("crash mid-replace then writer death: reclaim deletes both staged sets") {
    val dir = freshTable("flush_replace_reclaim")
    val r = Tables.region(spark, sfDir)
    CommitLog.writeCommit(spark, dir, r.filter(col("r_regionkey") < 2), "data/a", ts = 100L)
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/old")
    r.filter(col("r_regionkey") >= 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/data/new")
    CommitLog.flush(fs, dir, "w1", Seq("data/old"), ts = 150L)
    val tmp = fs.create(new Path(s"$dir/_inflight/w1.flush.tmp"), true)
    tmp.write("ts 160\nadd data/new\nend\n".getBytes("UTF-8")); tmp.close()
    val reclaimed = CommitLog.reclaimFlush(fs, dir, "w1")
    assert(reclaimed.toSet == Set("data/old", "data/new"),
      "lease recovery reclaims EVERYTHING the crashed writer staged")
    assert(CommitLog.flushedAdds(fs, dir).isEmpty)
    assert(CommitLog.snapshot(spark, dir).count() == 2, "committed truth intact")
  }
}
