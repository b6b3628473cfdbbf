package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ai.AiFunctions
import graft.ops.RelationalOps._

/** Port of the logistics AI pipeline (logistics_AI.sql:47-283; FIXTURES.md
  * A6): free-text driver notes classified with AI_CLASSIFY into a closed
  * issue set, struct extraction via AI_GENERATE, prompt assembly with ||
  * concatenation, and the gold risk histogram
  * (logistics_AI.sql:267-278) — deterministic stub backend makes every gold
  * number exactly assertable.
  */
object LogisticsAiPipeline {

  final case class DeliveryEvent(delivery_id: Long, route_id: String, driver_id: String,
                                 scheduled_dt: Timestamp, actual_dt: Timestamp,
                                 destination_city: String, destination_region: String,
                                 driver_notes: String)

  private def ts(s: String) = Timestamp.valueOf(s)

  val issueLabels = Seq("traffic", "weather", "access problem", "mechanical", "none")

  /** 8 rows with the known issue mix (traffic/weather/access/mechanical/none). */
  val seed = Seq(
    DeliveryEvent(1, "R1", "D1", ts("2025-05-01 09:00:00"), ts("2025-05-01 11:30:00"), "Oakland", "WEST", "stuck in heavy traffic on the bridge for two hours, customer angry"),
    DeliveryEvent(2, "R1", "D2", ts("2025-05-01 10:00:00"), ts("2025-05-01 10:05:00"), "Fresno", "WEST", "smooth run, nothing to report"),
    DeliveryEvent(3, "R2", "D1", ts("2025-05-02 08:00:00"), ts("2025-05-02 12:00:00"), "Denver", "CENTRAL", "severe weather, heavy snow closed the pass"),
    DeliveryEvent(4, "R2", "D3", ts("2025-05-02 09:00:00"), ts("2025-05-02 09:10:00"), "Austin", "CENTRAL", "gate code missing, access problem at the dock"),
    DeliveryEvent(5, "R3", "D2", ts("2025-05-03 07:00:00"), ts("2025-05-03 10:45:00"), "Boston", "EAST", "truck mechanical failure, engine overheated, very late"),
    DeliveryEvent(6, "R3", "D3", ts("2025-05-03 08:00:00"), ts("2025-05-03 08:02:00"), "Miami", "EAST", "delivered early, all good"),
    DeliveryEvent(7, "R1", "D4", ts("2025-05-04 09:00:00"), ts("2025-05-04 13:00:00"), "Seattle", "WEST", "traffic jam after an accident, unacceptable delay says client"),
    DeliveryEvent(8, "R2", "D4", ts("2025-05-04 10:00:00"), ts("2025-05-04 10:20:00"), "Chicago", "CENTRAL", "minor weather slowdown, somewhat late"))

  def seeded(): Pipeline = new Pipeline("logistics_ai", Seq(
    Stage("raw_deliveries")((s, _) => { import s.implicits._; seed.toDF() }),

    // Silver (logistics_AI.sql:107-160): lateness flag + AI enrichment. The
    // prompt is assembled with concat (the reference's || operator) and the
    // struct fields are read with bracket-style access.
    Stage("silver_deliveries")((s, st) => {
      AiFunctions.register(s)
      st("raw_deliveries")
        .withColumn("delay_minutes",
          ((col("actual_dt").cast("long") - col("scheduled_dt").cast("long")) / 60).cast("int"))
        .withColumn("is_late", col("delay_minutes") > 15)
        .withColumn("issue_label", AiFunctions.aiClassify(
          concat(lit("Classify the delivery issue: "), col("driver_notes")),
          typedlit(issueLabels)))
        .withColumn("ai", AiFunctions.aiGenerateIssue(col("driver_notes")))
        .withColumn("severity", col("ai")("severity"))
        .withColumn("requires_apology", col("ai")("requires_apology"))
        .drop("ai")
    }),

    // Gold risk histogram (logistics_AI.sql:267-278): conditional aggregates
    // per issue label + late rate per region.
    Stage("gold_issue_histogram", Materialization.Table)((_, st) =>
      st("silver_deliveries")
        .groupBy(col("issue_label"))
        .agg(count(lit(1)).as("n"),
          countIf(col("is_late")).as("n_late"),
          countIf(col("requires_apology")).as("n_apology"),
          round(avg(col("delay_minutes")), 2).as("avg_delay_min"))),

    Stage("gold_region_late_rate")((_, st) =>
      st("silver_deliveries")
        .groupBy(col("destination_region"))
        .agg(rate(col("is_late")).as("late_rate"), count(lit(1)).as("n")))))
}
