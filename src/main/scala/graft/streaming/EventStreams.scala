package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirror of the batch event pipelines (builder
  * contract: "readStream → transforms → writeStream; watermarks + windowed
  * aggs; mapGroupsWithState for custom state").
  *
  * The reference models events as batch tables (SURVEY.md §1.1 — no streams
  * exist there); this module exposes the same semantics over unbounded
  * input so the engine covers continuous ingestion:
  *  - windowed revenue (tumbling window + watermark bounds state),
  *  - streaming dedup (watermarked dropDuplicates = the W1 pattern online),
  *  - sessionization via flatMapGroupsWithState (gap-timeout sessions).
  *
  * Scale notes: state is partitioned by group key across executors; the
  * watermark bounds state size (late events beyond it are dropped), which is
  * what makes these stateful operators viable on unbounded 100 TB/day feeds.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Int,
                                  start_ts: Timestamp, end_ts: Timestamp,
                                  total_value: Double)
  // public: the state encoder's generated code must access the fields.
  // start/last are MICROSECONDS since epoch: java.sql.Timestamp carries
  // sub-millisecond precision (parquet TIMESTAMP(MICROS/NANOS) events), and
  // truncating to getTime's milliseconds would make a streaming replay
  // diverge from the batch computation on µs-precision data.
  final case class SessionState(n: Int, start: Long, last: Long, total: Double)

  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): Timestamp = {
    val ts = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Tumbling-window per-type revenue with a watermark for late data
    * (the streaming shape of gold_daily_revenue). */
  def windowedRevenue(events: DataFrame, window_ : String = "1 hour",
                      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(sum(col("value")).as("revenue"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("revenue"), col("n_events"))

  /** Streaming exact dedup on event_id, state bounded by the watermark —
    * the online form of the W1 keep-first pattern.
    *
    * Uses dropDuplicatesWithinWatermark: plain dropDuplicates("event_id")
    * only evicts state when the event-time column is part of the dedup key,
    * so on an id-only key its state would grow without bound. The
    * WithinWatermark variant expires each id's state once the watermark
    * passes its event time — bounded state on an unbounded feed.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization with flatMapGroupsWithState: a session closes
    * either inline (a later event arrives past the gap) or by timeout after
    * `gapMinutes` of inactivity.
    *
    * The DEFAULT timeout is event-time: the input gets a watermark and each
    * open session times out when the WATERMARK passes `last event + gap` —
    * so closes are driven by the data's own clock and a historical replay
    * produces byte-identical sessions regardless of wall-clock speed (the
    * processing-time variant closes sessions `gapMinutes` of *wall-clock*
    * time after the last batch, which under replay at 1000× speed closes
    * everything late). `ProcessingTimeTimeout` remains available for
    * genuinely wall-clock-driven jobs; `NoTimeout` for inline-only closing. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout(),
                 watermarkDelay: String = "10 minutes")
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout()
    val procTime = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    // plain vals: the state function closes over these, and a captured
    // Dataset reference would not survive serialization to executors
    val streaming = events.isStreaming
    val src =
      if (eventTime && streaming) events.withWatermark("ts", watermarkDelay)
      else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.n,
              microsTs(s.start), microsTs(s.last), s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapMinutes * 60000000L =>
                  cur = Some(SessionState(s.n + 1, s.start, t, s.total + e.value))
                case Some(s) =>
                  closed += SessionSummary(userId, s.n, microsTs(s.start),
                    microsTs(s.last), s.total)
                  cur = Some(SessionState(1, t, t, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (procTime) state.setTimeoutDuration(s"$gapMinutes minutes")
              else if (eventTime && streaming) {
                // a within-watermark late row can leave s.last behind the
                // current watermark; the timeout must still be in its future.
                // Timeout granularity is ms (the API's unit) — ceil so a
                // µs-tail session never times out a hair early.
                val floor = state.getCurrentWatermarkMs() + 1
                state.setTimeoutTimestamp(
                  math.max(math.floorDiv(s.last + 999L, 1000L) + gapMinutes * 60000L, floor))
              }
            }
            closed.iterator
          }
      }
  }

  /** Stream-static enrichment join: a streaming fact joined to a batch
    * dimension. The dim side broadcasts per micro-batch (and is re-read each
    * batch, so a slowly-changing dimension table stays fresh without
    * restarting the query) — the streaming form of the q29 star-enrichment
    * pattern. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join: pair each left event with
    * right events of the same `key` whose timestamp falls within
    * [left.ts, left.ts + withinMinutes] — e.g. refunds correlated to the
    * purchase they follow. Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, so Spark can expire
    * buffered state on each side once the watermark passes the window: state
    * stays bounded on unbounded feeds, which is what makes a stream-stream
    * join viable at 100 TB/day. Right-side columns come back `_r`-suffixed. */
  def intervalJoinStreams(left: DataFrame, right: DataFrame, key: String,
                          tsCol: String = "ts", withinMinutes: Int = 60,
                          watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val renamed = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_r"))
    val r = renamed.withWatermark(s"${tsCol}_r", watermark)
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col(s"${tsCol}_r") >= col(tsCol) &&
        col(s"${tsCol}_r") <= col(tsCol) + expr(s"INTERVAL $withinMinutes MINUTES"))
  }

  /** File-source entry: treat a directory of parquet event files as an
    * unbounded stream (readStream; file discovery is incremental). */
  def readEventStream(spark: SparkSession, dir: String,
                      schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)
}
