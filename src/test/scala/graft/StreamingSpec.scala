package graft

import graft.operators.Streaming
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Replays the events table through MemoryStream and asserts each
  * streaming graph converges to its batch-query truth. Sentinel
  * events push the watermark far past the data so every window /
  * session finalizes in append mode.
  */
class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Ev] = {
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  /** Watermark-advancing event; user_id=1 so it survives user filters
    * (its own far-future sessions are excluded by date filters). */
  private def sentinel(id: Long, daysAhead: Int): Ev =
    Ev(id, java.sql.Timestamp.valueOf(s"2024-03-${daysAhead} 00:00:00"), 1L, "view", 0.0)

  private val dataEnd = java.sql.Timestamp.valueOf("2024-02-15 00:00:00")

  /** Run a streaming graph over (events, then sentinels) to a memory
    * sink and return the finalized rows. */
  private def runToSink(name: String, graph: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val q = graph(stream.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      stream.addData(loadEvents())
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10))
      q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  test("seasonality stream converges to the batch bucket map under any chunking") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = loadEvents()
    val want = graft.operators.Analytics.tsSeasonality.fn(spark, sfDir)
      .collect().map(_.toString).sorted
    for ((chunk, name) <- Seq(events.size -> "season_one", 997 -> "season_many")) {
      val stream = MemoryStream[Ev]
      val q = StreamingOps.seasonalityStream(stream.toDF()).writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try {
        events.grouped(chunk).foreach { g => stream.addData(g); q.processAllAvailable() }
      } finally q.stop()
      val got = StreamingOps.seasonalityHot(spark.table(name))
        .collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"$name: streaming map diverged (got ${got.length}, want ${want.length})")
    }
  }

  test("tumbling windows stream to a parquet file sink with checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val outPath = graft.operators.Lake.scratch("stream_sink/out")
    val ckPath = graft.operators.Lake.scratch("stream_sink/ck")
    Seq(outPath, ckPath).foreach { p =>
      val f = new java.io.File(p)
      def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); () }
      if (f.exists()) rm(f)
    }
    val stream = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(stream.toDF()).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckPath)
      .outputMode("append").start()
    try {
      stream.addData(loadEvents())
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10))
      q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20))
      q.processAllAvailable()
    } finally q.stop()
    val files = spark.read.parquet(outPath)
      .filter(col("window_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Streaming.stTumblingWindow.fn(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(files == want, s"missing=${(want -- files).take(3)} extra=${(files -- want).take(3)}")
  }

  test("streaming tumbling windows converge to the batch query") {
    val got = runToSink("tumbling_sink", StreamingOps.tumblingCounts)
      .filter(col("window_start") < lit("2024-02-15").cast("timestamp"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Streaming.stTumblingWindow.fn(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("foreachBatch CDC upsert converges to the latest-per-key batch truth") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stateDir = graft.operators.Lake.scratch("cdc_state")
    val ckDir = graft.operators.Lake.scratch("cdc_ck")
    Seq(stateDir, ckDir, stateDir + ".tmp").foreach { p =>
      val f = new java.io.File(p)
      def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); () }
      if (f.exists()) rm(f)
    }
    val evs = loadEvents()
    val stream = MemoryStream[Ev]
    val q = StreamingOps.cdcUpsert(stream.toDF(), stateDir, ckDir)
    try {
      // three uneven micro-batches: keep-latest must be batch-split invariant
      val (a, rest) = evs.splitAt(evs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.read.parquet(stateDir)
      .select("user_id", "last_value", "last_event").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val want = Streaming.stCdcUpsert.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("CDC state swap recovers a mid-swap crash without losing state") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stateDir = graft.operators.Lake.scratch("cdc_recover")
    Seq("", ".old", ".tmp").foreach { sfx =>
      fs.delete(new org.apache.hadoop.fs.Path(stateDir + sfx), true)
    }
    val v1 = Seq((1L, 10.0, 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user_id", "last_value", "last_event", "ts")
    StreamingOps.commitState(fs, v1, stateDir)
    // simulate dying between "retire current" and "promote new":
    // state dir renamed aside, no new version in place
    assert(fs.rename(new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + ".old")))
    StreamingOps.recoverState(fs, stateDir)
    val recovered = spark.read.parquet(stateDir).collect()
    assert(recovered.length == 1 && recovered(0).getLong(0) == 1L,
      "retired version must be restored")
    // a normal commit after recovery merges cleanly
    val v2 = Seq((2L, 20.0, 200L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("user_id", "last_value", "last_event", "ts")
    StreamingOps.commitState(fs,
      StreamingOps.keepLatest(spark.read.parquet(stateDir).unionByName(v2)), stateDir)
    assert(spark.read.parquet(stateDir).count() == 2)
  }

  test("streaming hopping windows converge to the batch query") {
    val got = runToSink("hopping_sink", StreamingOps.hoppingCounts)
      .filter(col("window_start") < lit("2024-02-15").cast("timestamp"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Streaming.stHoppingWindow.fn(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("file-sink query resumes from checkpoint without duplicating windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val outPath = graft.operators.Lake.scratch("stream_resume/out")
    val ckPath = graft.operators.Lake.scratch("stream_resume/ck")
    Seq(outPath, ckPath).foreach { p =>
      val f = new java.io.File(p)
      def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); () }
      if (f.exists()) rm(f)
    }
    val all = loadEvents().sortBy(_.ts.getTime)
    val (first, second) = all.splitAt(all.length / 2)

    // run 1: first half, then stop
    val s1 = MemoryStream[Ev]
    val q1 = StreamingOps.tumblingCounts(s1.toDF()).writeStream
      .format("parquet").option("path", outPath)
      .option("checkpointLocation", ckPath).outputMode("append").start()
    try { s1.addData(first); q1.processAllAvailable() } finally q1.stop()

    // run 2: fresh query, same checkpoint — second half + sentinels.
    // MemoryStream offsets restart at 0, so replay ALL events: the
    // checkpoint must skip the already-committed prefix exactly.
    val s2 = MemoryStream[Ev]
    val q2 = StreamingOps.tumblingCounts(s2.toDF()).writeStream
      .format("parquet").option("path", outPath)
      .option("checkpointLocation", ckPath).outputMode("append").start()
    try {
      s2.addData(first)
      s2.addData(second)
      s2.addData(sentinel(9000001L, 10))
      s2.addData(sentinel(9000002L, 20))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outPath)
      .filter(col("window_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == got.toSet.size, "duplicate windows after recovery")
    val want = Streaming.stTumblingWindow.fn(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
  }

  test("streaming session_window converges to the batch query") {
    val got = runToSink("session_sink",
        df => StreamingOps.sessionWindows(df.filter(col("user_id") < 40)))
      .filter(col("session_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Streaming.stSessionWindow.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("sessionizer merges cross-batch late events (start moves back; far-predating event is its own session)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val base = java.sql.Timestamp.valueOf("2024-02-01 12:00:00")
    def ev(id: Long, offsetSec: Long) =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetSec * 1000), 7L, "view", 1.0)
    val q = StreamingOps.sessionizeWithState(
        stream.toDS().filter(col("user_id") < 40).as[Ev])
      .toDF().writeStream
      .format("memory").queryName("late_sink").outputMode("append").start()
    try {
      stream.addData(ev(1, 0))      // anchor at T
      q.processAllAvailable()
      stream.addData(ev(2, -600))   // late, 10 min BEFORE start, within 30-min gap → merge
      q.processAllAvailable()
      stream.addData(ev(3, -3000))  // late, 40 min before merged start → separate session
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10)); q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_sink")
      .filter(col("session_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    val tm600 = new java.sql.Timestamp(base.getTime - 600 * 1000)
    val tm3000 = new java.sql.Timestamp(base.getTime - 3000 * 1000)
    assert(got == Set((7L, tm600, 2L, 600.0), (7L, tm3000, 1L, 0.0)), s"got=$got")
  }

  test("sessionizer merges two mutually-within-gap late events into one session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val base = java.sql.Timestamp.valueOf("2024-02-01 12:00:00")
    def ev(id: Long, offsetSec: Long) =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetSec * 1000), 7L, "view", 1.0)
    val q = StreamingOps.sessionizeWithState(
        stream.toDS().filter(col("user_id") < 40).as[Ev])
      .toDF().writeStream
      .format("memory").queryName("late_merge_sink").outputMode("append").start()
    try {
      stream.addData(ev(1, 0))      // anchor at T
      q.processAllAvailable()
      stream.addData(ev(2, -3000))  // late, 50 min before anchor → own span
      q.processAllAvailable()
      stream.addData(ev(3, -2800))  // late, within the 30-min gap of ev(2) → MERGE
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10)); q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_merge_sink")
      .filter(col("session_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    val tm3000 = new java.sql.Timestamp(base.getTime - 3000 * 1000)
    // batch truth: ONE merged 2-event early session + the anchor —
    // never two n=1 singletons for the mutually-within-gap late pair
    assert(got == Set((7L, tm3000, 2L, 200.0), (7L, base, 1L, 0.0)), s"got=$got")
  }

  test("sessionizer bridging late event fuses earlier spans with the open session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val base = java.sql.Timestamp.valueOf("2024-02-01 12:00:00")
    def ev(id: Long, offsetSec: Long) =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetSec * 1000), 7L, "view", 1.0)
    val q = StreamingOps.sessionizeWithState(
        stream.toDS().filter(col("user_id") < 40).as[Ev])
      .toDF().writeStream
      .format("memory").queryName("bridge_sink").outputMode("append").start()
    try {
      stream.addData(ev(1, 0))      // anchor
      q.processAllAvailable()
      stream.addData(ev(2, -3000))  // late span 50 min back
      q.processAllAvailable()
      stream.addData(ev(3, -1500))  // bridges: within gap of BOTH
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10)); q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bridge_sink")
      .filter(col("session_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    val tm3000 = new java.sql.Timestamp(base.getTime - 3000 * 1000)
    assert(got == Set((7L, tm3000, 3L, 3000.0)), s"got=$got")
  }

  test("state-swap lease: a live second writer is refused, fenced after expiry") {
    import graft.streaming.StreamingOps.LeaseHeldException
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stateDir = graft.operators.Lake.scratch("lease_state")
    // drop any lease epoch files left by earlier runs
    val parent = new org.apache.hadoop.fs.Path(stateDir).getParent
    if (fs.exists(parent))
      fs.listStatus(parent).filter(_.getPath.getName.startsWith("lease_state.lease.e"))
        .foreach(st => fs.delete(st.getPath, false))
    // writer A holds the lease; writer B must be refused while it lives
    StreamingOps.acquireLease(fs, stateDir, "writer-A", ttlMs = 600000L)
    val refused = intercept[LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    }
    assert(refused.holder == "writer-A")
    // A renews its own lease without error
    StreamingOps.acquireLease(fs, stateDir, "writer-A", ttlMs = 600000L)
    // a non-holder release must NOT free it (fencing)
    StreamingOps.releaseLease(fs, stateDir, "writer-B")
    intercept[LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    }
    // holder releases; B acquires
    StreamingOps.releaseLease(fs, stateDir, "writer-A")
    StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    StreamingOps.releaseLease(fs, stateDir, "writer-B")
    // a crashed writer's EXPIRED lease is fenced and taken over
    StreamingOps.acquireLease(fs, stateDir, "dead-writer", ttlMs = -1000L)
    StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    StreamingOps.releaseLease(fs, stateDir, "writer-B")
  }

  test("renewLease: heartbeat extends the fence past the original TTL; stale and never-held heartbeats throw") {
    import graft.streaming.StreamingOps.LeaseHeldException
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stateDir = graft.operators.Lake.scratch("renew_state")
    val parent = new org.apache.hadoop.fs.Path(stateDir).getParent
    if (fs.exists(parent))
      fs.listStatus(parent).filter(_.getPath.getName.startsWith("renew_state.lease.e"))
        .foreach(st => fs.delete(st.getPath, false))
    // never-held: the heartbeat is strictly a renewal, not an acquire
    intercept[LeaseHeldException] {
      StreamingOps.renewLease(fs, stateDir, "writer-A", ttlMs = 1000L)
    }
    // A: 1000ms lease, renewed at ~600ms — at ~1200ms (past the
    // ORIGINAL expiry) B must still be refused: renewal moved the fence
    StreamingOps.acquireLease(fs, stateDir, "writer-A", ttlMs = 1000L)
    Thread.sleep(600L)
    StreamingOps.renewLease(fs, stateDir, "writer-A", ttlMs = 1000L)
    Thread.sleep(600L) // ~1200ms since acquire, ~600ms since renewal
    intercept[LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 1000L)
    }
    StreamingOps.verifyLease(fs, stateDir, "writer-A")
    // A goes silent one full TTL: B fences; A's next heartbeat throws —
    // a fenced writer learns at heartbeat time, not at commit time
    Thread.sleep(1100L)
    StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    val stale = intercept[LeaseHeldException] {
      StreamingOps.renewLease(fs, stateDir, "writer-A", ttlMs = 1000L)
    }
    assert(stale.holder == "writer-B")
    StreamingOps.releaseLease(fs, stateDir, "writer-B")
  }

  test("two-tier lease expiry: soft licenses a competing client, hard licenses the " +
    "background scan, recoverLease fences immediately (TestLeaseRecovery2)") {
    import graft.streaming.StreamingOps.LeaseHeldException
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stateDir = graft.operators.Lake.scratch("two_tier_lease")
    val parent = new org.apache.hadoop.fs.Path(stateDir).getParent
    if (fs.exists(parent))
      fs.listStatus(parent).filter(_.getPath.getName.startsWith("two_tier_lease.lease.e"))
        .foreach(st => fs.delete(st.getPath, false))
    // --- testImmediateRecoveryOfLease: both limits LONG (the test's
    // 1h/1h phase) — a competing acquire refuses, but recoverLease
    // closes at once, from a different client AND from any caller,
    // with no limit consulted
    StreamingOps.acquireLease(fs, stateDir, "writer-A",
      ttlMs = 3600000L, hardMs = 3600000L)
    intercept[LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "other-user", ttlMs = 1000L)
    }
    assert(!StreamingOps.checkLease(fs, stateDir),
      "background scan must not touch a hard-live lease")
    StreamingOps.recoverLease(fs, stateDir, "other-user", ttlMs = 3600000L)
    intercept[LeaseHeldException] { // A was fenced immediately
      StreamingOps.verifyLease(fs, stateDir, "writer-A")
    }
    StreamingOps.releaseLease(fs, stateDir, "other-user")
    // --- testSoftLeaseRecovery: soft SHORT (the test's 1s), hard
    // LONG — after soft expiry a competing client's acquire (the
    // create-over-under-construction path) recovers, while the
    // background scan still refuses (hard-live)
    StreamingOps.acquireLease(fs, stateDir, "writer-A",
      ttlMs = 100L, hardMs = 3600000L)
    Thread.sleep(200L) // soft-expired, hard-live
    assert(!StreamingOps.checkLease(fs, stateDir),
      "soft expiry licenses a competing CLIENT, never the background scan")
    StreamingOps.acquireLease(fs, stateDir, "other-user", ttlMs = 600000L)
    intercept[LeaseHeldException] { // the recovered writer is fenced
      StreamingOps.renewLease(fs, stateDir, "writer-A", ttlMs = 100L)
    }
    StreamingOps.releaseLease(fs, stateDir, "other-user")
    // --- testHardLeaseRecovery: hard SHORT (the test's 1s) — the
    // namenode's scan reclaims unilaterally once expiredHardLimit,
    // and the silent writer's next write attempt is killed
    StreamingOps.acquireLease(fs, stateDir, "writer-A",
      ttlMs = 50L, hardMs = 150L)
    Thread.sleep(250L) // past the hard limit
    assert(StreamingOps.checkLease(fs, stateDir),
      "background scan must reclaim a hard-expired lease")
    intercept[LeaseHeldException] { // the writer thread gets killed
      StreamingOps.verifyLease(fs, stateDir, "writer-A")
    }
    // the reclaimed lease is REMOVED, not held: a new writer acquires
    StreamingOps.acquireLease(fs, stateDir, "writer-B", ttlMs = 600000L)
    StreamingOps.releaseLease(fs, stateDir, "writer-B")
  }

  test("lease file compatibility: a live legacy-format lease fences acquirers; " +
    "a garbled lease file is an error, never an absent lease (ADVICE r15)") {
    import graft.streaming.StreamingOps.LeaseHeldException
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stateDir = graft.operators.Lake.scratch("legacy_lease")
    val parent = new org.apache.hadoop.fs.Path(stateDir).getParent
    if (fs.exists(parent))
      fs.listStatus(parent).filter(_.getPath.getName.startsWith("legacy_lease.lease.e"))
        .foreach(st => fs.delete(st.getPath, false))
    def writeRaw(epoch: Int, text: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(stateDir + s".lease.e$epoch")
      val out = fs.create(p, true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    // pre-two-tier `holder expiry` form, expiry one hour out: a LIVE
    // legacy lease must refuse a new acquirer, not be silently fenced
    writeRaw(0, s"old-writer ${System.currentTimeMillis() + 3600000L}")
    val refused = intercept[LeaseHeldException] {
      StreamingOps.acquireLease(fs, stateDir, "new-writer", ttlMs = 1000L)
    }
    assert(refused.holder == "old-writer")
    // an EXPIRED legacy lease is fenced and taken over like any other
    writeRaw(1, s"old-writer ${System.currentTimeMillis() - 1000L}")
    StreamingOps.acquireLease(fs, stateDir, "new-writer", ttlMs = 600000L)
    StreamingOps.releaseLease(fs, stateDir, "new-writer")
    // a garbled lease file guards state we can't reason about:
    // acquiring over it must throw, not fence
    writeRaw(7, "not a lease at all")
    intercept[java.io.IOException] {
      StreamingOps.acquireLease(fs, stateDir, "new-writer", ttlMs = 1000L)
    }
    // a 4-TOKEN garble shaped like the current format but with
    // non-numeric fields must take the same fail-closed IOException
    // path, not escape as NumberFormatException (ADVICE r16)
    writeRaw(8, "not a lease file")
    val e4 = intercept[java.io.IOException] {
      StreamingOps.acquireLease(fs, stateDir, "new-writer", ttlMs = 1000L)
    }
    assert(e4.getMessage.contains("unparseable lease"),
      s"4-token garble must be the documented unparseable-lease error, got: $e4")
    fs.delete(new org.apache.hadoop.fs.Path(stateDir + ".lease.e7"), false)
    fs.delete(new org.apache.hadoop.fs.Path(stateDir + ".lease.e8"), false)
  }

  test("streaming near-dup dedup flags exactly the batch pipeline's dup set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.DocEv
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => DocEv(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    val stream = MemoryStream[DocEv]
    val q = StreamingOps.streamNearDup(stream.toDF())
      .toDF().writeStream
      .format("memory").queryName("neardup_sink").outputMode("append").start()
    try {
      // replay in three uneven micro-batches
      stream.addData(docs.take(100)); q.processAllAvailable()
      stream.addData(docs.slice(100, 350)); q.processAllAvailable()
      stream.addData(docs.drop(350)); q.processAllAvailable()
    } finally q.stop()
    val flagged = spark.table("neardup_sink")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val want = graft.api.Graft.dedup.minhashPairs(
        Tables.documents(spark, sfDir), "doc_id", "text", threshold = 0.8)
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty, "expected injected near-dups at sf0.001")
    assert(flagged == want,
      s"missing=${(want -- flagged).take(5)} extra=${(flagged -- want).take(5)}")
    // every flag names a genuinely lower-id doc
    spark.table("neardup_sink").collect()
      .foreach(r => assert(r.getLong(1) < r.getLong(0)))

    // OUT-OF-ORDER replay: shuffled arrival (higher ids often first)
    // must converge to the same dup set — the flag is emitted by
    // whichever side of a pair arrives later
    val shuffled = new scala.util.Random(7).shuffle(docs.toSeq)
    val stream2 = MemoryStream[DocEv]
    val q2 = StreamingOps.streamNearDup(stream2.toDF())
      .toDF().writeStream
      .format("memory").queryName("neardup_ooo_sink").outputMode("append").start()
    try {
      stream2.addData(shuffled.take(170)); q2.processAllAvailable()
      stream2.addData(shuffled.slice(170, 320)); q2.processAllAvailable()
      stream2.addData(shuffled.drop(320)); q2.processAllAvailable()
    } finally q2.stop()
    val flaggedOoo = spark.table("neardup_ooo_sink")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flaggedOoo == want,
      s"out-of-order missing=${(want -- flaggedOoo).take(5)} extra=${(flaggedOoo -- want).take(5)}")
  }

  test("flatMapGroupsWithState sessionizer matches the batch sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val q = StreamingOps.sessionizeWithState(
        stream.toDS().filter(col("user_id") < 40).as[Ev])
      .toDF().writeStream
      .format("memory").queryName("fmgs_sink").outputMode("append").start()
    try {
      stream.addData(loadEvents())
      q.processAllAvailable()
      stream.addData(sentinel(9000001L, 10))
      q.processAllAvailable()
      stream.addData(sentinel(9000002L, 20))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fmgs_sink")
      .filter(col("session_start") < lit(dataEnd))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Streaming.stSessionWindow.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("streaming lateness profile converges to the batch audit exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // feed in ARRIVAL order (the jittered order the batch audit
    // models), chunked arbitrarily — per-key state folds across
    // batches must reproduce the batch truth bit-for-bit
    val arrival = loadEvents().sortBy { e =>
      val tsSec = StreamingOps.tsToMicros(e.ts) / 1000000L
      (tsSec + (e.event_id % 15) * 60, e.event_id)
    }
    val stream = MemoryStream[Ev]
    val q = StreamingOps.latenessProfile(stream.toDF()).writeStream
      .format("memory").queryName("lateness_sink").outputMode("update").start()
    try {
      arrival.grouped(1500).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // latest cumulative row per type == the batch audit
    val got = spark.table("lateness_sink")
      .groupBy(col("event_type"))
      .agg(max(struct(col("n_events"), col("n_late"), col("max_late_sec"),
        col("total_late_sec"))).as("s"))
      .select(col("event_type"), col("s.n_events"), col("s.n_late"),
        col("s.max_late_sec"), col("s.total_late_sec"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = graft.operators.Analytics.stLatenessAudit.fn(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
         r.getAs[Long]("max_late_sec"), r.getAs[Long]("total_late_sec"))).toMap
    assert(got == want, s"stream $got != batch $want")
  }

  test("streaming transition emission converges to the batch matrix exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.transitionStream(stream.toDF()).writeStream
      .format("memory").queryName("trans_sink").outputMode("append").start()
    try {
      ordered.grouped(1700).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("trans_sink")
      .groupBy(col("from_type"), col("to_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.operators.Insights.qEventTransitions.fn(spark, sfDir)
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    assert(got == want, s"stream counts != batch matrix")
  }

  test("streaming trailing-baseline anomaly converges to the batch audit exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val want = graft.operators.Analytics.tsBaselineAnomaly.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("day")) ->
        (r.getAs[Long]("n_scored"), r.getAs[Long]("n_anomalous"),
          r.getAs[Double]("baseline_mu"))).toMap
    assert(want.nonEmpty, "degenerate batch truth")
    // two different chunkings must both converge to the same batch truth
    Seq(1100, 3700).zipWithIndex.foreach { case (chunkSize, qi) =>
      val stream = MemoryStream[Ev]
      val q = StreamingOps.anomalyStream(stream.toDF()).writeStream
        .format("memory").queryName(s"anomaly_sink_$qi").outputMode("update").start()
      try {
        ordered.grouped(chunkSize).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      // counters are cumulative within a (type, day): the max struct is
      // the final row (the latenessProfile spec discipline)
      val got = spark.table(s"anomaly_sink_$qi")
        .groupBy(col("event_type"), col("day"))
        .agg(max(struct(col("n_scored"), col("n_anomalous"), col("baseline_mu"))).as("s"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) -> {
          val s = r.getStruct(2); (s.getLong(0), s.getLong(1), s.getDouble(2))
        }).toMap
      assert(got == want,
        s"chunk=$chunkSize missing=${(want.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- want.keySet).take(3)} " +
          s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
    }
  }

  test("streaming CUSUM drift monitor converges to the batch truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val want = graft.operators.Streaming.stCusumDrift.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("gpos"), r.getAs[Long]("gneg"),
          r.getAs[Long]("flag"))).toMap
    assert(want.nonEmpty, "degenerate batch truth")
    // two different chunkings must both converge to the same batch truth
    Seq(ordered.size, 1300).zipWithIndex.foreach { case (chunkSize, qi) =>
      val stream = MemoryStream[Ev]
      val q = StreamingOps.cusumStream(stream.toDF()).writeStream
        .format("memory").queryName(s"cusum_sink_$qi").outputMode("update").start()
      try {
        ordered.grouped(chunkSize).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      // a day's cents grow monotonically across provisional emissions,
      // so the max struct per (type, day) is its FINAL row
      val got = spark.table(s"cusum_sink_$qi")
        .groupBy(col("event_type"), col("day"))
        .agg(max(struct(col("cents"), col("gpos"), col("gneg"), col("flag"))).as("s"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) -> {
          val s = r.getStruct(2); (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
        }).toMap
      assert(got == want,
        s"chunk=$chunkSize missing=${(want.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- want.keySet).take(3)} " +
          s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
    }
  }

  test("streaming funnel stage log converges to the batch truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val want = graft.operators.Streaming.stFunnelSteps.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage"),
        r.getAs[Long]("t_stage"))).toSet
    assert(want.nonEmpty, "degenerate batch truth")
    assert(want.exists(_._2 == "3_purchase"), "no user completes the funnel")
    Seq(ordered.size, 900).zipWithIndex.foreach { case (chunkSize, qi) =>
      val stream = MemoryStream[Ev]
      val q = StreamingOps.funnelSteps(stream.toDF()).writeStream
        .format("memory").queryName(s"funnel_sink_$qi").outputMode("append").start()
      try {
        ordered.grouped(chunkSize).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      // append mode + emit-once state guard: plain set equality, and
      // duplicate emissions would surface as a count mismatch
      val rows = spark.table(s"funnel_sink_$qi").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage"),
          r.getAs[Long]("t_stage")))
      assert(rows.length == rows.toSet.size, s"chunk=$chunkSize emitted duplicates")
      val got = rows.toSet
      assert(got == want,
        s"chunk=$chunkSize missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("streaming rate limiter converges to the batch admission truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.rateLimitStream(stream.toDF()).writeStream
      .format("memory").queryName("ratelimit_sink").outputMode("update").start()
    try {
      ordered.grouped(1300).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // counters are cumulative per key: the max struct (led by the
    // strictly-growing n_total) is the final row per key
    val got = spark.table("ratelimit_sink")
      .groupBy(col("user_id"), col("window_start"))
      .agg(max(struct(col("n_total"), col("n_kept"), col("n_dropped"),
        col("last_admitted"))).as("s"))
      .collect().map { r =>
        val s = r.getStruct(2)
        (r.getLong(0), r.getTimestamp(1)) ->
          (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      }.toMap
    val want = Streaming.stRateLimit.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("window_start")) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("last_admitted"))).toMap
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("streaming windowed top-k converges to the batch leaderboard exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.windowTopkStream(stream.toDF()).writeStream
      .format("memory").queryName("topk_sink").outputMode("update").start()
    try {
      ordered.grouped(1900).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // win_total grows monotonically per window: the final board per
    // window is the row set carrying that window's max win_total
    val sink = spark.table("topk_sink")
    val finals = sink.groupBy(col("window_start").as("ws"))
      .agg(max(col("win_total")).as("wt"))
    val got = sink.join(finals,
        col("window_start") === col("ws") && col("win_total") === col("wt"))
      .select(col("window_start"), col("rank"), col("event_type"), col("n"),
        col("win_total")).distinct()
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val want = Streaming.stWindowedTopk.fn(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Long]("win_total"))).toMap
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("streaming feed-silence monitor converges to the batch gap truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.feedSilenceStream(stream.toDF()).writeStream
      .format("memory").queryName("feedsilence_sink").outputMode("append").start()
    try {
      // odd chunk size so hour boundaries land mid-batch
      ordered.grouped(1700).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("feedsilence_sink").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("gap_start_hr"),
        r.getAs[Long]("gap_end_hr"), r.getAs[Long]("gap_hours"))).toSet
    val want = Streaming.stFeedSilence.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("gap_start_hr"),
        r.getAs[Long]("gap_end_hr"), r.getAs[Long]("gap_hours"))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "corpus must exercise at least one silence gap")
  }

  test("streaming anomaly gate converges to the batch prefix-window truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.streamAnomaly(stream.toDF()).writeStream
      .format("memory").queryName("anomaly_sink").outputMode("append").start()
    try {
      ordered.grouped(1100).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("anomaly_sink").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("v_cents"), r.getAs[Long]("n_prior"))).toSet
    val want = Streaming.stStreamAnomaly.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("v_cents"), r.getAs[Long]("n_prior"))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "corpus must exercise at least one flagged arrival")
  }

  test("streaming quota gate converges to the batch prefix-sum truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.Doc
    val ordered = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long"))
      .collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_.doc_id)
    val stream = MemoryStream[Doc]
    val q = StreamingOps.quotaGate(stream.toDF()).writeStream
      .format("memory").queryName("quota_sink").outputMode("append").start()
    try {
      // odd chunk size so source budgets cross mid-batch
      ordered.grouped(37).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("quota_sink").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("cum"))).toSet
    val want = Streaming.stQuotaGate.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("cum"))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "corpus must exercise an over-budget tail")
  }

  test("streaming sessionizer converges to the closed-session batch truth exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = loadEvents().sortBy(e => (StreamingOps.tsToMicros(e.ts), e.event_id))
    val want = graft.operators.Streaming.stSessionize.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_sec"),
        r.getAs[Long]("duration_sec"))).toSet
    assert(want.nonEmpty, "degenerate batch truth")
    assert(want.exists(_._3 > 1), "no multi-event closed session in the corpus")
    Seq(ordered.size, 1100).zipWithIndex.foreach { case (chunkSize, qi) =>
      val stream = MemoryStream[Ev]
      val q = StreamingOps.sessionize(stream.toDF()).writeStream
        .format("memory").queryName(s"sess_sink_$qi").outputMode("append").start()
      try {
        ordered.grouped(chunkSize).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      // append mode + close-once emission: set equality, duplicates
      // would surface as a count mismatch
      val rows = spark.table(s"sess_sink_$qi").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
          r.getAs[Long]("n_events"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("duration_sec")))
      assert(rows.length == rows.toSet.size, s"chunk=$chunkSize emitted duplicates")
      val got = rows.toSet
      assert(got == want,
        s"chunk=$chunkSize missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("stream anomaly: the 3-sigma flag is exact at the documented Q-accumulator edge") {
    import spark.implicits._
    // prior state pinned just under the documented bound: qm (sum of
    // squared cents) within half a percent of 2^63 at n = 1e9 events
    val n = 1000000000L
    def model(n: BigInt, c: BigInt, sm: BigInt, qm: BigInt): Boolean = {
      val lhs = (n * c - sm) * (n * c - sm)
      lhs > 9 * (n * qm - sm * sm)
    }
    // zero-variance prior: every prior value exactly 95900 cents
    val sm0 = n * 95900L
    val qm0 = n * (95900L * 95900L) // 9.197e18, just under 2^63
    assert(qm0 > 0 && qm0 > Long.MaxValue / 1000L * 990L,
      "the case must actually sit at the documented edge")
    // bimodal prior: half 95000, half 96800 (sigma = 900 cents)
    val sm1 = (n / 2) * 95000L + (n / 2) * 96800L
    val qm1 = (n / 2) * (95000L * 95000L) + (n / 2) * (96800L * 96800L)
    val cases = Seq(
      ("flat_on_mean", n, 95900L, sm0, qm0),
      ("flat_off_mean", n, 95901L, sm0, qm0),
      ("spread_inside_3s", n, 95900L + 2600L, sm1, qm1),
      ("spread_outside_3s", n, 95900L + 2800L, sm1, qm1),
      ("spread_low_outlier", n, 95900L - 2800L, sm1, qm1))
    val df = cases.map { case (t, nn, c, sm, qm) => (t, nn, c, sm, qm) }
      .toDF("tag", "n", "c", "sm", "qm")
    val flagged = df.filter(expr(Streaming.anomalyFlagSql))
      .select("tag").as[String].collect().toSet
    cases.foreach { case (tag, nn, c, sm, qm) =>
      assert(flagged.contains(tag) ==
        model(BigInt(nn), BigInt(c), BigInt(sm), BigInt(qm)),
        s"$tag: flag disagrees with the BigInt model at the Q edge")
    }
    // and the model itself behaves: zero-variance flags any deviation,
    // the sigma=900 prior flags only beyond 2700 cents
    assert(!flagged.contains("flat_on_mean") && flagged.contains("flat_off_mean"))
    assert(!flagged.contains("spread_inside_3s") && flagged.contains("spread_outside_3s"))
    assert(flagged.contains("spread_low_outlier"))
  }

  test("stream anomaly PAST the retired int64 Q bound: decimal accumulator and BigInt state stay exact (VERDICT r13 #4)") {
    import spark.implicits._
    def model(n: BigInt, c: BigInt, sm: BigInt, qm: BigInt): Boolean = {
      val lhs = (n * c - sm) * (n * c - sm)
      lhs > 9 * (n * qm - sm * sm)
    }
    // --- flag expression at qm far beyond 2^63 (the old edge was
    // ~9.2e18; these sit at ~1e22-1e28, only representable once the
    // accumulator is decimal(38,0)/HUGEINT) ---
    val n12 = BigInt("1000000000000") // 1e12 events/key
    val cMean = BigInt("95900")
    val smB = n12 * cMean
    val qmSpread = (n12 / 2) * BigInt(95000L) * BigInt(95000L) +
      (n12 / 2) * BigInt(96800L) * BigInt(96800L) // ~9.2e21 > 2^63
    assert(qmSpread > BigInt(Long.MaxValue), "case must sit past the old bound")
    val bigCases = Seq(
      ("b12_on_mean", n12, cMean, smB, qmSpread),
      ("b12_inside_3s", n12, cMean + 2600, smB, qmSpread),
      ("b12_outside_3s", n12, cMean + 2800, smB, qmSpread),
      // huge VALUES too: c = 1e14 cents, qm ~ 3e29
      ("bigval_on_mean", BigInt(31), BigInt("100000000000000"),
        BigInt(31) * BigInt("100000000000000"),
        BigInt(31) * BigInt("100000000000000") * BigInt("100000000000000")),
      ("bigval_off_mean", BigInt(31), BigInt("100300000000000"),
        BigInt(31) * BigInt("100000000000000"),
        BigInt(31) * BigInt("100000000000000") * BigInt("100000000000000")))
    val bigDf = bigCases.map { case (t, n, c, sm, qm) =>
      (t, n.toString, c.toString, sm.toString, qm.toString)
    }.toDF("tag", "ns", "cs", "sms", "qms")
      .selectExpr("tag", "cast(ns as decimal(38,0)) as n",
        "cast(cs as decimal(38,0)) as c", "cast(sms as decimal(38,0)) as sm",
        "cast(qms as decimal(38,0)) as qm")
    val bigFlagged = bigDf
      .filter(expr(graft.operators.Streaming.anomalyFlagSql))
      .select("tag").as[String].collect().toSet
    bigCases.foreach { case (tag, n, c, sm, qm) =>
      assert(bigFlagged.contains(tag) == model(n, c, sm, qm),
        s"$tag: flag disagrees with the BigInt model past the old Q bound")
    }
    assert(bigFlagged == Set("b12_outside_3s", "bigval_off_mean"), s"$bigFlagged")

    // --- end-to-end past int64: per-event c² = 1e28 overflows the old
    // long fold on the FIRST event; batch (prefixSumsExact with the
    // decimal c² column) and streaming (BigInt state) must both match
    // a driver BigInt prequential model exactly ---
    implicit val sqlCtx = spark.sqlContext
    val base = 1.0e12 // dollars; c = 1e14 cents, exact in Double
    val vals: Seq[Double] =
      (0 until 30).map(i => if (i % 2 == 0) base else base * 1.002) ++
        Seq(base * 1.001, base * 1.010, base * 1.0035)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      StreamingOps.Ev(i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        user_id = 1L, event_type = "huge", value = v)
    }
    // driver model
    var (mn, msm, mqm) = (BigInt(0), BigInt(0), BigInt(0))
    val wantFlags = scala.collection.mutable.Set.empty[Long]
    evs.foreach { e =>
      val c = BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toBigIntExact.get
      if (mn >= 30 && model(mn, c, msm, mqm)) wantFlags += e.event_id
      mn += 1; msm += c; mqm += c * c
    }
    assert(wantFlags.nonEmpty && !wantFlags.contains(30L) &&
      wantFlags.contains(31L), s"model flags: $wantFlags")
    // batch arm: the op's exact pipeline shape over the synthetic frame
    val batchIn = evs.toDF()
      .select(col("event_type"), col("event_id"), col("ts"),
        expr("cast(cast(value as decimal(15,2)) * 100 as bigint)").as("c"))
      .withColumn("one", lit(1L))
      .withColumn("c2", col("c").cast("decimal(38,0)") * col("c"))
    val batchFlags = graft.functions.Ranks.prefixSumsExact(batchIn,
        orderCols = Seq("ts", "event_id"), partCols = Seq("event_type"),
        sums = Seq("one" -> "n", "c" -> "sm", "c2" -> "qm"),
        inclusive = false)
      .filter(col("n") >= 30 && expr(graft.operators.Streaming.anomalyFlagSql))
      .select("event_id").as[Long].collect().toSet
    assert(batchFlags == wantFlags.toSet,
      s"batch past-int64 flags $batchFlags != model $wantFlags")
    // streaming arm, chunked so the state crosses batches mid-warmup
    val stream = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.streamAnomaly(stream.toDF()).writeStream
      .format("memory").queryName("anomaly_big_sink").outputMode("append").start()
    try {
      evs.grouped(7).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamFlags = spark.table("anomaly_big_sink")
      .select("event_id").as[Long].collect().toSet
    assert(streamFlags == wantFlags.toSet,
      s"streaming past-int64 flags $streamFlags != model $wantFlags")
  }
}
