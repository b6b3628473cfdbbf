package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden assertions cloned from the reference's inline expected-outcome
  * comments (SURVEY.md §5.1): the seeded anomalies must be provably fixed. */
class PipelineSpec extends SparkSpec {

  test("events medallion: 20 raw → 18 silver; revenue KPIs exact") {
    val r = EventsMedallion.seeded().run(spark)
    assert(r("raw_events").count() === 20)
    assert(r("silver_events").count() === 18)
    val gold = r("gold_revenue").head
    // purchases: 120+50+0(null)+75.5+200+35.25+64.75+0(null)+89.99+10 = 645.49
    // refunds: -20-200-10 = -230 → total 415.49
    assert(gold.getDecimal(0).doubleValue() === 415.49)
    assert(gold.getLong(1) === 10L) // purchase_count
    val daily = r("gold_daily_revenue").collect()
    assert(daily.map(_.getLong(2)).sum === 13L) // purchase+refund events in silver
  }

  test("clinic: dedup, enum/null filters, 90-day interval join, KPIs") {
    val r = ClinicPipeline.seeded().run(spark)
    // 8 raw − 1 dup − 1 invalid enum − 1 null patient = 5 silver encounters
    assert(r("silver_encounters").count() === 5)
    // 9 raw labs − 1 dup − 1 null result − 1 '???' = 6 silver labs
    assert(r("silver_labs").count() === 6)
    val enriched = r("enriched_encounters")
    // P001 encounter: TROPONIN same-day ✓, HBA1C 2024-10-01 is >90d before
    // 2025-02-10 ✗ → exactly 1 lab joined
    assert(enriched.filter(col("encounter_id") === 1001 && col("lab_id").isNotNull).count() === 1)
    // orphan A999 lab never appears
    assert(enriched.filter(col("lab_id") === 2006).count() === 0)
    val kpis = r("gold_department_kpis")
    val cardio = kpis.filter(col("department") === "CARDIO").head
    assert(cardio.getLong(1) === 1L)       // n_encounters (1004 was invalid enum)
    assert(cardio.getDouble(2) === 2.0)    // LOS: admit 02-10 → discharge 02-12 = 2 days
    val endo = kpis.filter(col("department") === "ENDO").head
    assert(endo.getLong(3) === 1L)         // E11% diabetic count
  }

  test("manufacturing quality gates flag exactly the seeded anomalies") {
    val r = ManufacturingPipeline.seeded().run(spark)
    val dups = r("qc_duplicate_readings").collect()
    assert(dups.length === 1 && dups(0).getLong(0) === 5001L)
    val oor = r("qc_out_of_range").collect()
    assert(oor.length === 1 && oor(0).getLong(0) === 5003L) // RPM 50; TEMP 120 NOT flagged
    val fk = r("qc_fk_violations").collect()
    assert(fk.length === 1 && fk(0).getString(1) === "M999")
    val temporal = r("qc_temporal").collect()
    assert(temporal.length === 1 && temporal(0).getLong(0) === 9006L)
    // silver removed: 1 dup + 1 out-of-range + 1 orphan → 8-3 = 5 rows
    assert(r("silver_readings").count() === 5)
    // reconciliation invariant: empty = pass
    assert(r("qc_reconciliation").count() === 0)
    // MTBF for M001: repairs 01-10, 02-20, 03-15 → gaps 41+23 → avg 32
    val mtbf = r("gold_mtbf").filter(col("machine_id") === "M001").head
    assert(mtbf.getDouble(1) === 32.0)
    assert(mtbf.getLong(2) === 2L)
  }

  test("dialect: mixed-format timestamp sniffing parses all four formats") {
    import spark.implicits._
    val df = Seq(
      "2025/08/18 09:15:33",
      "2025-08-18T10:01:00Z",
      "18-08-2025 11:45",
      "1692369600",
      "garbage").toDF("s")
      .select(col("s"), DremioDialect.toTimestampMulti(col("s")).as("ts"))
    val out = df.collect()
    assert(out(0).getTimestamp(1).toString === "2025-08-18 09:15:33.0")
    assert(out(1).getTimestamp(1).toString === "2025-08-18 10:01:00.0")
    assert(out(2).getTimestamp(1).toString === "2025-08-18 11:45:00.0")
    assert(out(3).getTimestamp(1).toString === "2023-08-18 14:40:00.0") // epoch UTC
    assert(out(4).isNullAt(1))
  }

  test("dialect: format token translation") {
    assert(DremioDialect.translateFormat("YYYY/MM/DD HH24:MI:SS") === "yyyy/MM/dd HH:mm:ss")
    assert(DremioDialect.translateFormat("YYYY-MM-DD\"T\"HH24:MI:SS") === "yyyy-MM-dd'T'HH:mm:ss")
  }
}
