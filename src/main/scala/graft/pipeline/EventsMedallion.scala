package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._

/** Port of the reference's minimal medallion pipeline
  * (semantics.sql:30-241; fixture spec FIXTURES.md A1).
  *
  * Raw keeps every anomaly on purpose (duplicates, NULL amounts, negative
  * refunds — semantics.sql:55-58); silver dedups keep-earliest and
  * normalizes; gold derives revenue KPIs. Expected outcomes (the reference's
  * inline comments, which function as golden assertions) are enforced in
  * EventsMedallionSpec: 20 raw → 18 silver rows, NULL→0.00, refunds negative
  * in total_revenue.
  */
object EventsMedallion {

  final case class RawEvent(event_id: Int, user_id: Int, event_type: String,
                            amount: Option[Double], event_ts: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 20 seed rows, cloned from the anomaly structure of semantics.sql:59-79:
    * rows 1&2 and 6&7 are exact duplicates apart from event_id; rows 5&15
    * have NULL amount; refunds are negative. */
  val seed: Seq[RawEvent] = Seq(
    RawEvent(1, 101, "purchase", Some(120.00), ts("2025-02-01 09:00:00")),
    RawEvent(2, 101, "purchase", Some(120.00), ts("2025-02-01 09:00:00")), // dup of 1
    RawEvent(3, 101, "refund", Some(-20.00), ts("2025-02-01 12:30:00")),
    RawEvent(4, 102, "purchase", Some(50.00), ts("2025-02-01 10:15:00")),
    RawEvent(5, 102, "purchase", None, ts("2025-02-01 18:45:00")),         // NULL amount
    RawEvent(6, 103, "signup", Some(0.00), ts("2025-02-02 08:00:00")),
    RawEvent(7, 103, "signup", Some(0.00), ts("2025-02-02 08:00:00")),     // dup of 6
    RawEvent(8, 103, "purchase", Some(75.50), ts("2025-02-02 09:30:00")),
    RawEvent(9, 104, "view", Some(0.00), ts("2025-02-02 11:00:00")),
    RawEvent(10, 104, "purchase", Some(200.00), ts("2025-02-02 11:05:00")),
    RawEvent(11, 104, "refund", Some(-200.00), ts("2025-02-03 09:00:00")),
    RawEvent(12, 105, "signup", Some(0.00), ts("2025-02-03 10:00:00")),
    RawEvent(13, 105, "purchase", Some(35.25), ts("2025-02-03 10:30:00")),
    RawEvent(14, 105, "purchase", Some(64.75), ts("2025-02-03 14:00:00")),
    RawEvent(15, 106, "purchase", None, ts("2025-02-03 15:00:00")),        // NULL amount
    RawEvent(16, 106, "view", Some(0.00), ts("2025-02-04 09:00:00")),
    RawEvent(17, 106, "purchase", Some(89.99), ts("2025-02-04 09:10:00")),
    RawEvent(18, 107, "purchase", Some(10.00), ts("2025-02-04 12:00:00")),
    RawEvent(19, 107, "refund", Some(-10.00), ts("2025-02-05 08:00:00")),
    RawEvent(20, 107, "view", Some(0.00), ts("2025-02-05 08:30:00")))

  def pipeline(rawDf: SparkSession => DataFrame): Pipeline = new Pipeline("events_medallion", Seq(
    Stage("raw_events")((s, _) => rawDf(s)),

    // Silver (semantics.sql:120-151): keep-earliest dedup on the full
    // business key, NULL amount → 0.00, cast to DECIMAL(10,2).
    Stage("silver_events")((_, st) =>
      dedupKeepEarliest(
        st("raw_events"),
        Seq("user_id", "event_type", "amount", "event_ts"),
        Seq(col("event_id").asc))
        .withColumn("amount", coalesce(col("amount"), lit(0.0)).cast("decimal(10,2)"))),

    // Gold: revenue KPIs (semantics.sql:191-241).
    Stage("gold_revenue", Materialization.Table)((_, st) =>
      st("silver_events")
        .filter(col("event_type").isin("purchase", "refund"))
        .agg(sum(col("amount")).as("total_revenue"),
          countIf(col("event_type") === "purchase").as("purchase_count"),
          avg(when(col("event_type") === "purchase", col("amount"))).as("avg_purchase"))),

    Stage("gold_daily_revenue")((_, st) =>
      st("silver_events")
        .filter(col("event_type").isin("purchase", "refund"))
        .groupBy(to_date(col("event_ts")).as("day"))
        .agg(sum(col("amount")).as("daily_revenue"), count(lit(1)).as("n_events"))
        .orderBy(col("day")))))

  /** Pipeline over the inline seed (what the spec runs). */
  def seeded(): Pipeline = pipeline { s =>
    import s.implicits._
    seed.toDF()
  }
}
