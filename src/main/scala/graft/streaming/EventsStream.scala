package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event record for the typed streaming path (events table minus `props`,
  * which windowing/sessionization never reads — pruning it keeps state rows
  * small, which is what bounds memory on a 1000-executor streaming job). */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** A closed (or flushed) session emitted by [[EventsStream.sessionized]]. */
final case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Per-user in-flight session state kept by flatMapGroupsWithState. */
final case class SessionState(
    start: Long,
    last: Long,
    n: Long,
    total: Double)

/** Structured Streaming over the events stream (SURVEY §2 F1/F2).
  *
  * Reference analog: the reference's ingest is a batch REST pull
  * (/root/reference/dw2_wc_increment.py) re-run on a schedule; the streaming
  * re-expression is the same computation running continuously with event-time
  * semantics — watermarks bound state exactly the way the reference's
  * "last 45 days" increment window bounds its pull.
  *
  * Both transforms are plan-only functions of an input DataFrame/Dataset, so
  * one definition serves the streaming path and its batch mirror
  * (q20_events_window / q19_sessionize share the semantics; specs assert the
  * streaming results against the batch computation on the same rows).
  *
  * Scale design: state is keyed by high-cardinality keys (window×type,
  * user_id) so state shards across executors; watermark eviction bounds state
  * size; sessionization emits and drops state on timeout instead of holding
  * closed sessions.
  */
object EventsStream {

  /** Schema for file-based ingestion (events.parquet without nanos — a real
    * deployment lands micros; the sf tables' nanos are handled in Tables). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-stream entry point: a directory where event parquet files land. */
  def fromFiles(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** F1: watermarked tumbling-window counts per event_type.
    * Works on a streaming or batch DataFrame with (ts, event_type, value).
    * Output columns match q20_events_window's batch mirror. */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** F12: watermarked SLIDING-window counts — `window(ts, length, slide)`,
    * q45's streaming half (q45 spells the same assign-then-reduce plan in
    * batch for the DuckDB oracle). Each event lands in length/slide = 4
    * windows; the watermark closes a window when event time passes its end
    * + delay, so state is bounded by (windows in flight) × (event types).
    * Output columns match q45's batch mirror. */
  def slidingCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      slide: String = "15 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** F3: streaming exact-dedup on event_id. `dropDuplicates` after a
    * watermark keeps only the id-state young enough to matter — at-least-once
    * sources (Kafka replays, file re-lands) become effectively-once without
    * unbounded state. Batch mirror: dropDuplicates on the same column. */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay).dropDuplicates("event_id")

  /** F4: stream-static enrichment — the streaming fact joins a static dim
    * (re-read per micro-batch, broadcast by the planner when small). The
    * reference does the same join batch-wise when attaching the date dim to
    * fresh increments (dw5). */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, key)

  /** F5: stream-stream interval join — each purchase matched to the same
    * user's clicks in the `lookback` window before it (attribution while
    * both streams are in flight). The watermark on BOTH inputs plus the
    * two-sided time-range condition is what lets Spark bound the join
    * state: a buffered click can be evicted once the watermark guarantees
    * no future purchase's lookback window can reach it. Without the range
    * condition the click state would grow forever — the streaming analog
    * of q30's "no equi-key, no bound" trap, solved by the time bound
    * instead of bins. Batch mirror: the same join on static frames
    * (StreamIntervalJoinSpec asserts equality on identical rows). */
  def clickAttribution(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }

  /** F13: stream-stream LEFT OUTER interval join — F5 with the unmatched
    * side kept: a purchase with no qualifying click inside the lookback
    * window emits exactly once with NULL click columns, after the watermark
    * passes the window's horizon and the engine can PROVE no match is still
    * coming (the "organic conversion" rows an attribution report needs —
    * an inner join silently drops them). State eviction is the same
    * two-sided watermark + time-range bound as F5; the outer rows are
    * emitted from evicted state, so lateness of the null verdict is the
    * watermark delay, never unbounded. */
  def clickAttributionOuter(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }

  /** F2: gap-based sessionization with custom state.
    * A session closes when no event arrives within `gapSeconds` of the last
    * one; the watermark timeout flushes idle state so it cannot grow without
    * bound. Batch-mirror semantics: q19_sessionize (lag+cumsum). */
  def sessionized(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed the open session's horizon: emit and drop.
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            // Micro-batch arrival order within a group is not guaranteed:
            // sort this batch's rows by event time before folding.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            for (s <- cur) {
              state.update(s)
              // Time out once the watermark passes last-event + gap: nothing
              // arriving after that could extend this session.
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
