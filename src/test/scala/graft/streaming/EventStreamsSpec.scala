package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.EventStreams._

/** Streaming semantics driven end-to-end with a file source feeding
  * readStream and memory sinks (availableNow trigger = process-everything
  * batch over the streaming engine, deterministic for asserts). */
class EventStreamsSpec extends SparkSpec {

  private def eventDf(rows: Seq[Event]) = {
    import spark.implicits._
    rows.toDF()
  }

  private val base = Seq(
    Event(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "purchase", 100.0),
    Event(2, Timestamp.valueOf("2024-01-01 10:20:00"), 1, "purchase", 50.0),
    Event(2, Timestamp.valueOf("2024-01-01 10:20:00"), 1, "purchase", 50.0), // dup id
    Event(3, Timestamp.valueOf("2024-01-01 11:10:00"), 2, "refund", -30.0),
    Event(4, Timestamp.valueOf("2024-01-01 11:40:00"), 2, "purchase", 80.0))

  private def runStream(out: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(if (name == "dedup") "append" else "complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  test("windowed revenue over a file-backed stream") {
    val dir = Files.createTempDirectory("stream_in").toFile.getAbsolutePath
    eventDf(base).write.mode("overwrite").parquet(dir)
    val stream = readEventStream(spark, dir, eventDf(base))
    runStream(windowedRevenue(stream), "winrev")
    val rows = spark.table("winrev").collect()
    // 10:00 purchase window: 100+50+50 (dup not removed here) = 200
    val w10 = rows.find(r => r.getTimestamp(0).toString.startsWith("2024-01-01 10:00") &&
      r.getString(2) == "purchase").get
    assert(w10.getDouble(3) === 200.0)
    val w11 = rows.find(r => r.getTimestamp(0).toString.startsWith("2024-01-01 11:00") &&
      r.getString(2) == "refund").get
    assert(w11.getDouble(3) === -30.0)
  }

  test("streaming dedup drops the duplicate event_id") {
    val dir = Files.createTempDirectory("stream_in2").toFile.getAbsolutePath
    eventDf(base).write.mode("overwrite").parquet(dir)
    val stream = readEventStream(spark, dir, eventDf(base))
    runStream(dedupStream(stream), "dedup")
    assert(spark.table("dedup").count() === 4) // 5 rows, 1 dup id
  }

  test("sessionization groups events by inactivity gap (batch semantics check)") {
    // flatMapGroupsWithState logic validated on the batch path: sessions are
    // defined by >30min gaps per user.
    import spark.implicits._
    val events = Seq(
      Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "a", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "a", 3.0), // new session
      Event(4, Timestamp.valueOf("2024-01-01 10:00:00"), 2, "a", 4.0))
    // run through the same per-group logic by replaying it directly
    val grouped = events.groupBy(_.user_id).view.mapValues(_.sortBy(_.ts.getTime))
    def sessionsOf(es: Seq[Event], gapMin: Int): Seq[Seq[Event]] =
      es.foldLeft(Vector.empty[Vector[Event]]) { (acc, e) =>
        acc.lastOption match {
          case Some(s) if e.ts.getTime - s.last.ts.getTime <= gapMin * 60000L =>
            acc.init :+ (s :+ e)
          case _ => acc :+ Vector(e)
        }
      }
    assert(sessionsOf(grouped(1L).toSeq, 30).map(_.map(_.event_id)) ===
      Seq(Vector(1L, 2L), Vector(3L)))
    assert(sessionsOf(grouped(2L).toSeq, 30).size === 1)
  }

  test("sessionization runs through the streaming engine and closes sessions across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMinutes = 30,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("live_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("live_sessions").count() === 0) // session still open
      // an event past the gap closes the first session inline
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "a", 3.0))
      q.processAllAvailable()
      val closed = spark.table("live_sessions").collect()
      assert(closed.length === 1)
      assert(closed(0).getLong(0) === 1L)      // user_id
      assert(closed(0).getInt(1) === 2)        // n_events in first session
      assert(closed(0).getDouble(4) === 3.0)   // total_value 1+2
    } finally q.stop()
  }

  test("event-time timeout closes sessions when the watermark passes the gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // default timeout = EventTimeTimeout, watermark 10 minutes
    val q = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("et_sessions").count() === 0) // open, watermark at 10:00
      // OTHER-user events advance the watermark to 12:50 — past user 1's
      // 10:40 gap deadline. No user-1 event arrives: the close is purely
      // watermark-driven (event time), not wall-clock-driven.
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 13:00:00"), 2, "b", 5.0))
      q.processAllAvailable()
      input.addData(Event(4, Timestamp.valueOf("2024-01-01 13:01:00"), 2, "b", 6.0))
      q.processAllAvailable()
      val u1 = spark.table("et_sessions").filter(col("user_id") === 1).collect()
      assert(u1.length === 1)
      assert(u1(0).getInt(1) === 2)       // both events in the closed session
      assert(u1(0).getDouble(4) === 3.0)  // total_value
      assert(u1(0).getTimestamp(3) === Timestamp.valueOf("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("streaming sessionization ≡ batch q36-form sessions on the real events table") {
    // The driver cannot oracle streams, so equivalence is proven here: the
    // SAME fixture (the real events table) through (a) the streaming engine
    // (MemoryStream → flatMapGroupsWithState, event-time timeouts, chunked
    // in-order arrival) and (b) the INDEPENDENT batch implementation q36
    // uses (lag + gap flag + running-sum window), collected and compared as
    // sorted session tuples.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evDf = sf("events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val evs = evDf.as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    assert(evs.length === 1000)

    // (b) batch truth, q36's window-function form at the same 30-min gap
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = evDf
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // millisecond gap arithmetic, matching the streaming engine (q36's
      // oracle-facing variant truncates to seconds for DuckDB date_diff
      // parity; the equivalence property needs the same clock resolution on
      // both sides)
      .withColumn("new_session",
        // NTZ-safe millisecond gap (epoch extraction is illegal on NTZ):
        // boundary-count at ms resolution == unix_millis subtraction
        when(col("prev_ts").isNull ||
          expr("timestampdiff(MILLISECOND, date_trunc('millisecond', prev_ts), date_trunc('millisecond', ts))") > 1800000L,
          1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"),
        col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2), r.getTimestamp(3),
        math.round(r.getDouble(4) * 100)))
      .sortBy(t => (t._1, t._3.getTime))

    // (a) the streaming engine: 8 in-order chunks, then a far-future
    // sentinel on a synthetic user so the global watermark passes every open
    // session's gap deadline and event-time timeouts flush the tails
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("equiv_sessions")
      .outputMode("append").start()
    try {
      evs.grouped(math.ceil(evs.length / 8.0).toInt).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val flushTs = new Timestamp(evs.map(_.ts.getTime).max + 24L * 3600 * 1000)
      input.addData(Event(-1L, flushTs, -1L, "__flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("equiv_sessions")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2), r.getTimestamp(3),
          math.round(r.getDouble(4) * 100)))
        .sortBy(t => (t._1, t._3.getTime))
      assert(streamed.length === batch.length,
        s"session count: streaming ${streamed.length} vs batch ${batch.length}")
      val firstDiff = streamed.zip(batch).find { case (a, b) => a != b }
      assert(firstDiff.isEmpty, s"first differing session (streamed vs batch): $firstDiff")
    } finally q.stop()
  }

  test("streaming dedup ≡ batch q17-form keep-first on events with injected duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evDf = sf("events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val evs = evDf.as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val dups = evs.filter(_.event_id % 7 == 0) // ~1/7 redelivered exactly

    // batch truth via the q17 pattern: row_number keep-first per event_id
    // over the duplicated input (duplicates are exact copies, so this equals
    // the distinct original set)
    val dupDf = evDf.union(spark.createDataset(dups.toIndexedSeq).toDF())
    val keepFirst = Window.partitionBy(col("event_id")).orderBy(col("ts"))
    val batch = dupDf
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1).drop("rn")
      .as[Event].collect()
      .sortBy(e => (e.event_id, e.ts.getTime))

    // streaming: duplicates delivered in the SAME chunk as their originals
    // (within the watermark, the hard case — state must drop them)
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDF()).writeStream.format("memory")
      .queryName("equiv_dedup").outputMode("append").start()
    try {
      evs.grouped(math.ceil(evs.length / 4.0).toInt).foreach { chunk =>
        val redelivered = chunk ++ chunk.filter(_.event_id % 7 == 0)
        input.addData(redelivered.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("equiv_dedup").as[Event].collect()
        .sortBy(e => (e.event_id, e.ts.getTime))
      assert(streamed.length === evs.length) // every duplicate dropped
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension per batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_enrich").toFile.getAbsolutePath
    eventDf(base).write.mode("overwrite").parquet(dir)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = readEventStream(spark, dir, eventDf(base))
    val q = enrichStream(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("enriched")
    assert(out.count() === 5)
    assert(out.filter(col("tier") === "gold").count() === 3)  // user 1's events
    assert(out.filter(col("tier") === "silver").count() === 2) // user 2's events
  }

  test("watermarked stream-stream interval join matches refunds to purchases in-window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[Event]
    val refunds = MemoryStream[Event]
    val joined = intervalJoinStreams(
      purchases.toDF(), refunds.toDF(), key = "user_id", withinMinutes = 60)
    val q = joined.writeStream.format("memory").queryName("pr_join")
      .outputMode("append").start()
    try {
      purchases.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "purchase", 100.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:00:00"), 2, "purchase", 50.0))
      refunds.addData(
        Event(10, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "refund", -100.0), // in window
        Event(11, Timestamp.valueOf("2024-01-01 13:00:00"), 2, "refund", -50.0))  // 3h later: out
      q.processAllAvailable()
      val rows = spark.table("pr_join").collect()
      assert(rows.length === 1)
      val r = spark.table("pr_join")
        .select(col("user_id"), col("event_id"), col("event_id_r")).head
      assert(r.getLong(0) === 1L && r.getLong(1) === 1L && r.getLong(2) === 10L)
    } finally q.stop()
  }
}
