package graft.streaming

import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming graphs over the events stream (SURVEY.md §2).
  *
  * Each graph converges to the corresponding batch query in
  * operators.Streaming — that equivalence is asserted by
  * StreamingSpec, which replays the same events through MemoryStream.
  *
  * State discipline for 100 TB/day streams: every stateful operator
  * carries a watermark so state is bounded and evicted; session state
  * is O(open sessions per user); nothing buffers unbounded history.
  */
object StreamingOps {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        n_events: Long, span_secs: Double)

  /** Open-session state for the custom sessionizer. */
  case class SessionState(start: Long, last: Long, n: Long) // micros epoch

  val GapMicros: Long = 30L * 60 * 1000000
  private val WatermarkDelay = "1 hour"

  /** java.sql.Timestamp <-> epoch micros without precision loss
    * (getTime alone is millis and would truncate). */
  def tsToMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000 * 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  /** 1h tumbling windows per event type, watermarked (append mode):
    * streaming form of st_tumbling_window. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** 1h windows hopping every 15 minutes, watermarked (append mode):
    * streaming form of st_hopping_window. Each event updates 4
    * overlapping windows' state; the watermark closes a window once
    * event time passes its end + delay. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Built-in session_window sessionization (streaming form of
    * st_session_window). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).cast("double") / 1e6)
          .as("span_secs"),
        min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("span_secs"))

  /** Streaming dedup: first event per (user_id, event_type), state
    * bounded by the watermark (st_stream_dedup's batch truth counts
    * all events; the streaming form keeps the first arrival per key). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Stream-static enrichment join + aggregation (complete mode):
    * streaming form of st_enrich_join. The static dim would be
    * broadcast on a cluster. */
  def enrichEvents(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(customers),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))

  /** Stream-stream interval join (purchases within 24h of a signup):
    * streaming form of st_interval_join. Both sides watermarked so
    * join state is evicted once the range can no longer match. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", WatermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "25 hours")
    signups.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOUR"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  /** LEFT OUTER stream-stream interval join: unmatched signups emit
    * their NULL-purchase row only after the purchase watermark passes
    * the end of their 24h window (the engine must prove absence, not
    * just observe it). Streaming form of st_interval_join_outer. */
  def intervalJoinOuter(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", WatermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "25 hours")
    signups.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOUR"), "leftOuter")
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  /** keep-latest over state-schema rows — associative, so it can be
    * applied per-batch and again at merge time. */
  private[graft] def keepLatest(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("last_event").desc)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("last_value"), col("last_event"), col("ts"))
  }

  /** Crash recovery for the versioned state swap: a missing state dir
    * with a retired version present means a prior commit died between
    * renames — restore the retired version before merging. */
  private[graft] def recoverState(fs: org.apache.hadoop.fs.FileSystem, stateDir: String): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(stateDir)
    val oldP = new org.apache.hadoop.fs.Path(stateDir + ".old")
    if (!fs.exists(dirP) && fs.exists(oldP) && !fs.rename(oldP, dirP))
      throw new java.io.IOException(s"cdcUpsert: could not restore $oldP")
  }

  /** Versioned swap, every rename checked: write the new version to
    * .tmp (materializing the read of the current state first), retire
    * current to .old, promote .tmp, drop .old. Production would commit
    * through a transactional table format; this keeps the same
    * foreachBatch contract with a restorable window instead of a lossy
    * one. */
  private[graft] def commitState(fs: org.apache.hadoop.fs.FileSystem,
                                 merged: DataFrame, stateDir: String): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(stateDir)
    val tmpP = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
    val oldP = new org.apache.hadoop.fs.Path(stateDir + ".old")
    merged.write.mode("overwrite").parquet(stateDir + ".tmp")
    fs.delete(oldP, true)
    if (fs.exists(dirP) && !fs.rename(dirP, oldP))
      throw new java.io.IOException(s"cdcUpsert: could not retire $dirP")
    if (!fs.rename(tmpP, dirP))
      throw new java.io.IOException(s"cdcUpsert: could not promote $tmpP")
    fs.delete(oldP, true)
    ()
  }

  /** CDC-style upsert sink via foreachBatch: every micro-batch is
    * reduced to its latest purchase per user, merged with the keyed
    * parquet state (keep-latest by (ts, event_id)), and the state dir
    * is swapped through the checked versioned commit above. Converges
    * to the st_cdc_upsert batch truth regardless of how events are
    * split across micro-batches, because keep-latest is associative.
    * Returns the started query. */
  def cdcUpsert(events: DataFrame, stateDir: String,
                checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    events
      .filter(col("event_type") === "purchase")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        recoverState(fs, stateDir)
        val fresh = keepLatest(batch.select(col("user_id"),
          col("value").as("last_value"), col("event_id").as("last_event"), col("ts")))
        val dirP = new org.apache.hadoop.fs.Path(stateDir)
        val merged =
          if (fs.exists(dirP)) keepLatest(spark.read.parquet(stateDir).unionByName(fresh))
          else fresh
        commitState(fs, merged, stateDir)
        ()
      }
      .start()
  }

  /** Custom-state sessionizer via flatMapGroupsWithState: the shape to
    * reach for when session output needs logic session_window can't
    * express (e.g. per-session feature vectors). Emits a session when
    * the event-time timeout passes its last event + gap. */
  def sessionizeWithState(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          def toOut(st: SessionState) = SessionOut(
            user, microsToTs(st.start), st.n, (st.last - st.start).toDouble / 1e6)

          if (!evs.hasNext && state.hasTimedOut) {
            val out = state.getOption.map(toOut).iterator
            state.remove()
            out
          } else {
            // micro-batch delivery is unordered within the batch
            val sorted = evs.toSeq.sortBy(e => (tsToMicros(e.ts), e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsToMicros(e.ts)
              cur match {
                case Some(st) if t > st.last + GapMicros =>
                  // Strictly after the open session: close it, start anew.
                  closed ::= toOut(st)
                  cur = Some(SessionState(t, t, 1))
                case Some(st) if t < st.start - GapMicros =>
                  // Cross-batch late event predating the open session by
                  // more than the gap: a separate earlier session — emit
                  // it directly, keep the open session untouched.
                  closed ::= toOut(SessionState(t, t, 1))
                case Some(st) =>
                  // Within gap of [start, last] on either side: merge,
                  // moving session_start back for late pre-start events
                  // so output matches the batch session_window truth.
                  cur = Some(SessionState(
                    math.min(st.start, t), math.max(st.last, t), st.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last / 1000 + GapMicros / 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
