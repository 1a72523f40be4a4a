package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface. The reference has no streaming machinery
  * (SURVEY.md §1.3) — `VectorEntry` is only documented as the streaming
  * ingest record (`/root/reference/aeuc_vector_db/types.py:7`). This
  * module provides the north-star streaming operators over the events
  * schema: watermarked windowed aggregation, session windows, and a
  * custom stateful sessionizer via flatMapGroupsWithState.
  *
  * All transforms take a DataFrame that may be batch or streaming — the
  * same plan serves both (test batch parity, deploy streaming).
  */
object Streaming {

  /** Tumbling-window counts/sums per event_type with a watermark for
    * state eviction — the canonical streaming aggregation.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Hopping (sliding) window counts — every event lands in
    * length/slide windows (two here); the watermark evicts window
    * state `watermark` past each window's END. Batch-identical to the
    * `events_hopping` contract query's shape.
    */
  def hoppingAgg(events: DataFrame, watermark: String = "3 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Built-in session windows: events within `gapSeconds` of each other
    * merge into one session per user.
    */
  def sessionAgg(events: DataFrame, gapSeconds: Int = 1800,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Tumbling-window per-type counts — the stream-safe stage of
    * [[trendingTypes]]: a watermarked windowed aggregation whose state
    * is (windows × types) small. Factored out so the streaming run and
    * the batch ranking consume the SAME plan (batch parity pinned in
    * StreamingSpec).
    */
  def windowCounts(events: DataFrame, windowSeconds: Long,
      watermark: Option[String] = None): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    val in = watermark.fold(events)(events.withWatermark("ts", _))
    in.groupBy(window(col("ts"), s"$windowSeconds seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
  }

  /** Trending event types: the top `topK` types per tumbling window by
    * count (ties to the lexicographically first type). Ranking is not
    * incrementally maintainable, so the streaming deployment runs
    * [[windowCounts]] and ranks in the (micro-batch or batch) sink —
    * exactly what this composition does. The rank window partitions on
    * window_start AFTER the aggregate bounded rows to windows × types;
    * it never sees the raw stream.
    */
  def trendingTypes(events: DataFrame, windowSeconds: Long, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    windowCounts(events, windowSeconds)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("window_start"))
          .orderBy(col("n").desc, col("event_type"))))
      .filter(col("rank") <= topK)
      .orderBy(col("window_start"), col("rank"))
  }

  /** Watermarked ingest dedup — drops replayed records by `event_id`,
    * keeping dedup state only within the watermark horizon (the
    * at-least-once → exactly-once repair step in front of any streaming
    * sink; unbounded-state `dropDuplicates` would never evict). Spark
    * forbids the within-watermark node on batch inputs
    * (UnsupportedOperationChecker), so the batch branch is the
    * unbounded-horizon `dropDuplicates` — identical output whenever
    * replays arrive inside the watermark horizon, which is the delivery
    * failure mode this operator exists for; StreamingSpec pins the
    * stream result equal to the batch result on a replayed fixture, and
    * the stream_dedup_ingest contract query hash-checks the batch form.
    */
  def dedupIngest(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("event_id"))
    else events.dropDuplicates(Seq("event_id"))

  /** Stream-stream inner join: each error event matched to the click
    * events from the same user within the preceding `windowSeconds`.
    * This is the streaming form of the batch as-of candidate set
    * (`operators/Joins.asOfJoin` feeds on the same shape): both sides
    * carry watermarks AND the join condition bounds the event-time
    * distance, which is exactly what Structured Streaming requires to
    * evict join state — without the interval bound the engine would
    * buffer both streams forever. Works identically on batch inputs.
    */
  def clickErrorJoin(events: DataFrame, windowSeconds: Int = 600,
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
      .withWatermark("error_ts", watermark)
    errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("e_user").as("user_id"), col("error_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Streaming SCD2 dimension lookup — the stream-static form of
    * [[graft.operators.Cdc.scd2Lookup]]: enrich a fact STREAM with the
    * dimension version effective at each fact's event time.
    *
    * The batch operator's as-of carry is a non-time window over a
    * union — unsupported on streams — so the streaming shape is the
    * stream-static LEFT join on key + the half-open interval
    * predicate, with the dimension broadcast (a dimension is small
    * relative to the fact stream by construction; Spark re-reads the
    * static side per micro-batch, so a dim updated between batches is
    * picked up). Versions never overlap per key, so the interval
    * predicate matches at most one dim row per fact — the join cannot
    * fan out. Identical output to the batch operator on the same rows
    * (spec-pinned), including gap→NULL and the boundary rule (ts at a
    * version end fails `ts < to` there and matches the successor's
    * `from <= ts`).
    */
  def scd2LookupStream(facts: DataFrame, dim: DataFrame): DataFrame = {
    // dim columns get private aliases BEFORE the join: the batch
    // operator accepts fact payloads with any names (asofJoin prefixes
    // the dim side), and a facts stream carrying its own `state` or
    // `effective_from_ts` column must not make the references here
    // ambiguous — the streaming contract stays as wide as the batch one
    val d = broadcast(dim.filter(col("key").isNotNull)
      .select(col("key").as("__scd2_key"), col("state").as("__scd2_state"),
        col("effective_from_ts").as("__scd2_ef"),
        col("effective_to_ts").as("__scd2_et")))
    facts.join(d,
        facts("key") === col("__scd2_key") &&
          col("__scd2_ef") <= facts("ts") &&
          (col("__scd2_et").isNull || facts("ts") < col("__scd2_et")),
        "left")
      .select(facts.columns.map(facts(_)).toIndexedSeq ++ Seq(
        col("__scd2_state").as("dim_state"),
        col("__scd2_ef").as("dim_effective_from_ts")): _*)
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionizer — the mapGroupsWithState path for
    * semantics session_window can't express (e.g. emitting only closed
    * sessions with per-session derived state). Event-time ordering is
    * guaranteed per-group within a micro-batch by sorting the iterator.
    *
    * LIMITATION of the default (`NoTimeout`): an idle user's trailing
    * session is emitted only when a later out-of-gap event for that user
    * arrives — this keeps session boundaries purely event-time-driven
    * and the plan identical in batch and streaming. Pass
    * `GroupStateTimeout.ProcessingTimeTimeout()` to ALSO close sessions
    * after `gapMillis` of wall-clock silence (lower emission latency,
    * but boundaries then depend on arrival time, and the engine runs
    * continuous empty micro-batches to evaluate timers — a production
    * trade-off, not suitable under `processAllAvailable`-style test
    * drivers, which never quiesce against a timer-driven stream).
    */
  def statefulSessionize(events: Dataset[Event], gapMillis: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())(
      implicit enc: org.apache.spark.sql.Encoder[Session],
      enc2: org.apache.spark.sql.Encoder[Long],
      enc3: org.apache.spark.sql.Encoder[SessionState]): Dataset[Session] = {
    require(timeout == GroupStateTimeout.NoTimeout() ||
      timeout == GroupStateTimeout.ProcessingTimeTimeout(),
      "statefulSessionize supports NoTimeout or ProcessingTimeTimeout; " +
        "EventTimeTimeout needs setTimeoutTimestamp, which this operator does not use")
    val timerDriven = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed with no new events: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMillis =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timerDriven) state.setTimeoutDuration(gapMillis)
            }
            closed.iterator
          }
      }
  }
}
