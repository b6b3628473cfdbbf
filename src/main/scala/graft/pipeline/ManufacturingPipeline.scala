package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._

/** Port of the manufacturing quality suite (manufacturing.sql:22-381;
  * FIXTURES.md A4) — the reference's executable-invariant pattern: health
  * check views whose EMPTY result is the pass condition (SURVEY.md §5.2),
  * plus the MTBF computation rewritten from rn-self-join to lead() (J5→W3).
  */
object ManufacturingPipeline {

  final case class Machine(machine_id: String, site: String, line: String,
                           install_ts: Timestamp, status: String)
  final case class SensorReading(reading_id: Long, machine_id: String,
                                 sensor_type: String, reading_ts: Timestamp,
                                 value: Double, unit: String)
  final case class WorkOrder(wo_id: Long, machine_id: String, open_ts: Timestamp,
                             close_ts: Option[Timestamp], wo_type: String,
                             part: String, qty: Int, status: String)
  /** Inline sensor-bounds dim — the reference builds it with UNION ALL of
    * literal SELECTs (manufacturing.sql:81-84). */
  final case class SensorBound(sensor_type: String, min_value: Double, max_value: Double)

  private def ts(s: String) = Timestamp.valueOf(s)

  val machineSeed = Seq(
    Machine("M001", "PLANT_A", "L1", ts("2020-01-15 00:00:00"), "ACTIVE"),
    Machine("M002", "PLANT_A", "L2", ts("2021-06-01 00:00:00"), "ACTIVE"),
    Machine("M003", "PLANT_B", "L1", ts("2019-03-20 00:00:00"), "MAINTENANCE"))

  /** Anomalies (manufacturing.sql:53-54): duplicate reading 5001; RPM 50
    * below the 100 lower bound; TEMP 120 within the 0–150 bound (must NOT be
    * flagged); orphan machine M999. */
  val readingSeed = Seq(
    SensorReading(5001, "M001", "TEMP", ts("2025-03-01 08:00:00"), 72.5, "C"),
    SensorReading(5001, "M001", "TEMP", ts("2025-03-01 08:00:00"), 72.5, "C"), // dup
    SensorReading(5002, "M001", "TEMP", ts("2025-03-01 09:00:00"), 120.0, "C"), // in range
    SensorReading(5003, "M001", "RPM", ts("2025-03-01 08:00:00"), 50.0, "rpm"), // OUT of range
    SensorReading(5004, "M002", "RPM", ts("2025-03-01 08:30:00"), 1500.0, "rpm"),
    SensorReading(5005, "M002", "PRESSURE", ts("2025-03-01 09:00:00"), 4.2, "bar"),
    SensorReading(5006, "M999", "TEMP", ts("2025-03-01 10:00:00"), 65.0, "C"),  // orphan FK
    SensorReading(5007, "M003", "TEMP", ts("2025-03-02 08:00:00"), 80.1, "C"))

  val workOrderSeed = Seq(
    WorkOrder(9001, "M001", ts("2025-01-10 08:00:00"), Some(ts("2025-01-11 17:00:00")), "REPAIR", "BEARING", 2, "CLOSED"),
    WorkOrder(9002, "M001", ts("2025-02-20 09:00:00"), Some(ts("2025-02-21 12:00:00")), "REPAIR", "BELT", 1, "CLOSED"),
    WorkOrder(9003, "M001", ts("2025-03-15 10:00:00"), None, "REPAIR", "MOTOR", 1, "OPEN"),
    WorkOrder(9004, "M002", ts("2025-02-01 08:00:00"), Some(ts("2025-02-01 16:00:00")), "PM", "FILTER", 4, "CLOSED"),
    WorkOrder(9005, "M002", ts("2025-03-05 11:00:00"), Some(ts("2025-03-06 09:00:00")), "REPAIR", "SEAL", 1, "CLOSED"),
    WorkOrder(9006, "M003", ts("2025-03-10 07:00:00"), Some(ts("2025-03-09 07:00:00")), "REPAIR", "PUMP", 1, "CLOSED")) // close<open!

  val boundSeed = Seq(
    SensorBound("TEMP", 0.0, 150.0),
    SensorBound("RPM", 100.0, 5000.0),
    SensorBound("PRESSURE", 0.5, 10.0))

  def seeded(): Pipeline = new Pipeline("manufacturing", Seq(
    Stage("raw_machines")((s, _) => { import s.implicits._; machineSeed.toDF() }),
    Stage("raw_readings")((s, _) => { import s.implicits._; readingSeed.toDF() }),
    Stage("raw_work_orders")((s, _) => { import s.implicits._; workOrderSeed.toDF() }),
    Stage("sensor_bounds")((s, _) => { import s.implicits._; boundSeed.toDF() }),

    // Quality views — each must be EMPTY to pass, except the dup/range/fk
    // probes which must flag EXACTLY the seeded anomalies.

    // HAVING-based duplicate detection (manufacturing.sql:86-91).
    Stage("qc_duplicate_readings")((_, st) =>
      st("raw_readings").groupBy(col("reading_id"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)),

    // Out-of-range vs the inline bounds dim (manufacturing.sql:92-103);
    // broadcast the 3-row dim.
    Stage("qc_out_of_range")((_, st) =>
      st("raw_readings").join(broadcast(st("sensor_bounds")), "sensor_type")
        .filter(col("value") < col("min_value") || col("value") > col("max_value"))
        .select(col("reading_id"), col("machine_id"), col("sensor_type"), col("value"))),

    // Anti-join FK probe (manufacturing.sql:220-225).
    Stage("qc_fk_violations")((_, st) =>
      antiJoin(st("raw_readings"), st("raw_machines"),
        st("raw_readings")("machine_id") === st("raw_machines")("machine_id"))
        .select(col("reading_id"), col("machine_id"))),

    // Temporal sanity (manufacturing.sql:228-241): close before open.
    Stage("qc_temporal")((_, st) =>
      st("raw_work_orders")
        .filter(col("close_ts").isNotNull && col("close_ts") < col("open_ts"))),

    // Silver: readings minus every flagged row.
    Stage("silver_readings")((_, st) => {
      val r = dedupKeepLatest(st("raw_readings"), Seq("reading_id"), Seq(col("reading_ts").desc))
      val inRange = r.join(broadcast(st("sensor_bounds")), "sensor_type")
        .filter(col("value").between(col("min_value"), col("max_value")))
        .drop("min_value", "max_value")
      semiJoin(inRange, st("raw_machines"),
        inRange("machine_id") === st("raw_machines")("machine_id"))
    }),

    // MTBF via lead() over work orders (rewrite of manufacturing.sql:289-317).
    Stage("gold_mtbf")((_, st) => {
      val repairs = st("raw_work_orders").filter(col("wo_type") === "REPAIR")
      leadCol(repairs, col("open_ts"), "next_open",
        Seq(col("machine_id")), Seq(col("open_ts"), col("wo_id")))
        .withColumn("gap_days", datediff(to_date(col("next_open")), to_date(col("open_ts"))))
        .groupBy(col("machine_id"))
        .agg(avg(col("gap_days")).as("mtbf_days"), count(col("gap_days")).as("n_intervals"))
    }),

    // Gold daily reading profile + reconciliation (manufacturing.sql:345-364):
    // recompute the silver aggregate and return mismatching rows (must be empty).
    Stage("gold_daily_profile", Materialization.Table)((_, st) =>
      st("silver_readings")
        .groupBy(col("machine_id"), to_date(col("reading_ts")).as("day"))
        .agg(count(lit(1)).as("n_readings"), avg(col("value")).as("avg_value"))),

    Stage("qc_reconciliation")((_, st) => {
      val recomputed = st("silver_readings")
        .groupBy(col("machine_id"), to_date(col("reading_ts")).as("day"))
        .agg(count(lit(1)).as("n2"))
      st("gold_daily_profile").join(recomputed, Seq("machine_id", "day"), "full")
        .filter(col("n_readings") =!= col("n2") ||
          col("n_readings").isNull || col("n2").isNull)
    })))
}
