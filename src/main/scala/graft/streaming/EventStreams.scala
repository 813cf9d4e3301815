package graft.streaming

import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for stateful streaming ops. */
final case class StreamEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

/** A closed (or timed-out) session emitted by the streaming sessionizer. */
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Typed event (with type) for the streaming funnel state machine. */
final case class TypedEvent(
    event_id: Long, user_id: Long, event_type: String, ts: java.sql.Timestamp)

/** A funnel stage advance: `stage` 1..3, with the qualifying event time. */
final case class FunnelOut(user_id: Long, stage: Int, stage_name: String, at_us: Long)

/** Per-user funnel progress carried between micro-batches. */
final case class FunnelProgress(stage: Int, atUs: Long)

/** Open-session state carried between micro-batches. */
final case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** Event-stream transforms (SURVEY §2.4), written once against a
  * DataFrame so the SAME code serves batch (oracle-checked) and
  * Structured Streaming (`readStream` + watermark, spec-checked) — the
  * Spark analogue of the reference's streaming-ingestion path
  * (reference: docs/arrow_iceberg_cache_design.md §4 "Streaming
  * Ingestion" + the Flight `do_get` stream, src/flight_server/server.py:41).
  */
object EventStreams {

  /** Hourly tumbling-window counts/sums per event type. On a stream,
    * apply `withWatermark("ts", ...)` upstream; the plan is identical.
    * Scale: map-side partial aggregation, shuffle on (window, type). */
  def hourlyWindowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("sum_value"))

  /** Batch projection of [[hourlyWindowed]] with an epoch-seconds window
    * start (cross-engine-stable output shape). */
  def hourlyWindowedBatch(events: DataFrame): DataFrame =
    hourlyWindowed(events).select(
      unix_timestamp(col("window.start")).as("ws_epoch"),
      col("event_type"), col("n_events"), col("sum_value"))

  /** Stream dedup (SURVEY §2.4 T3): drop rows whose `idCols` repeat
    * within the watermark horizon. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`) so per-key state is EVICTED once the
    * watermark passes — bounded state at any stream length, the only
    * formulation that survives an unbounded 100 TB-scale stream.
    * Works identically on a batch frame (watermark is a no-op there). */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Watermarked stream-stream interval join (SURVEY §2.4 T4): each
    * `purchase` event joins the same user's `view` events from the
    * preceding `windowMinutes` — the attribution join. Both sides carry
    * event-time watermarks and the join predicate bounds the time
    * difference, which is exactly what lets Spark EVICT buffered rows
    * once the watermark passes: state stays proportional to the join
    * window, not the stream length — the only interval-join formulation
    * that survives an unbounded stream. The same code runs in batch
    * (watermarks are no-ops there), so the semantics are testable
    * against a plain SQL interval join. */
  def viewPurchaseJoin(
      views: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("v_ts")).as("v_us"),
        col("purchase_value"))
  }

  val SessionGapMicros: Long = 30L * 60 * 1000 * 1000

  /** Gap-based sessionization (30-min inactivity) via window functions:
    * lag → new-session flag → running sum = session id. Scale: two
    * window passes over the same (user_id) partitioning — one shuffle. */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > SessionGapMicros, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(wRun).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }

  /** Streaming gap-based sessionization: custom state per user via
    * `flatMapGroupsWithState` (the Structured Streaming analogue of the
    * batch [[sessionize]]); sessions close on a 30-min event gap or an
    * event-time timeout once the watermark passes. Scale: state is one
    * small record per open session per user, partitioned by user_id.
    */
  def sessionizeStream(events: Dataset[StreamEvent]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L

    val fn = (userId: Long, rows: Iterator[StreamEvent], state: GroupState[SessionState]) => {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.startUs, s.lastUs, s.n))
      } else {
        val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        val closed = Seq.newBuilder[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val us = micros(e.ts)
          cur match {
            case Some(s) if us - s.lastUs > SessionGapMicros =>
              closed += SessionOut(userId, s.startUs, s.lastUs, s.n)
              cur = Some(SessionState(us, us, 1))
            case Some(s) =>
              cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
            case None =>
              cur = Some(SessionState(us, us, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000L + SessionGapMicros / 1000L)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")
  val FunnelStageNames: Seq[String] = Seq("view", "click_after_view", "purchase_after_click")

  /** Streaming ordered funnel (SURVEY §2.4 T6): the live counterpart of
    * the batch `q_funnel` — a per-user state machine advancing through
    * `stages` in order, where each stage's qualifying event must be
    * STRICTLY LATER than the previous stage's timestamp; a stage
    * advance is emitted the micro-batch it happens. The stage list is a
    * parameter, so the same operator runs any ordered-conversion
    * definition (default: the battery's view → click → purchase).
    *
    * Scale: state is ONE tiny record (stage, ts) per user, partitioned
    * by user_id; a user who completes the funnel has their state REMOVED
    * — long-run state is proportional to in-flight users, not stream
    * length or total users.
    */
  def funnelStream(
      events: Dataset[TypedEvent],
      stages: Seq[String] = FunnelStages): Dataset[FunnelOut] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._

    val stageNames = stages.zipWithIndex.map { case (s, i) =>
      if (i == 0) s else s"${s}_after_${stages(i - 1)}"
    }

    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L

    val fn = (userId: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelProgress]) => {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[FunnelOut]
      var cur = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
      sorted.foreach { e =>
        if (cur.stage < stages.size &&
            e.event_type == stages(cur.stage) &&
            micros(e.ts) > cur.atUs) {
          cur = FunnelProgress(cur.stage + 1, micros(e.ts))
          out += FunnelOut(userId, cur.stage, stageNames(cur.stage - 1), cur.atUs)
        }
      }
      if (cur.stage >= stages.size) state.remove()
      else if (cur.stage > 0) state.update(cur)
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
