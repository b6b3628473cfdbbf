package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._
import graft.pipeline.DremioDialect.datediffDays

/** Port of the clinic medallion pipeline (clinicdata.sql:41-382; fixture
  * spec FIXTURES.md A2): encounters + labs with seeded anomalies →
  * silver cleaning (W1 dedup, enum filter, null keys) → 90-day pre-admission
  * interval join (J4) → gold KPIs with FILTER-style conditional counts and
  * LIKE 'E11%' diabetic cohort (clinicdata.sql:326-335).
  */
object ClinicPipeline {

  final case class Encounter(encounter_id: Long, patient_id: String,
                             encounter_type: String, admit_ts: Timestamp,
                             discharge_ts: Timestamp, department: String,
                             primary_dx: String, payer: String)
  final case class LabResult(lab_id: Long, patient_id: String, test_name: String,
                             result_value: Option[Double], unit: String,
                             lab_ts: Timestamp, abnormal_flag: Boolean)

  private def ts(s: String) = Timestamp.valueOf(s)

  val validTypes = Seq("INPATIENT", "OUTPATIENT", "ER")

  /** Seeded anomalies mirror clinicdata.sql:59-73: duplicate encounter 1001,
    * NULL department, invalid UNKNOWN_TYPE, NULL patient_id. */
  val encounterSeed: Seq[Encounter] = Seq(
    Encounter(1001, "P001", "INPATIENT", ts("2025-02-10 09:00:00"), ts("2025-02-12 13:00:00"), "CARDIO", "I21.0", "MEDICARE"),
    Encounter(1001, "P001", "INPATIENT", ts("2025-02-10 09:00:00"), ts("2025-02-12 13:00:00"), "CARDIO", "I21.0", "MEDICARE"), // dup
    Encounter(1002, "P002", "OUTPATIENT", ts("2025-02-11 10:00:00"), ts("2025-02-11 11:30:00"), null, "E11.9", "AETNA"),       // NULL dept
    Encounter(1003, "P003", "ER", ts("2025-02-12 23:15:00"), ts("2025-02-13 04:00:00"), "EMERG", "S72.0", "SELF"),
    Encounter(1004, "P004", "UNKNOWN_TYPE", ts("2025-02-13 08:00:00"), ts("2025-02-13 09:00:00"), "CARDIO", "I10", "CIGNA"),   // invalid enum
    Encounter(1005, null, "INPATIENT", ts("2025-02-14 07:30:00"), ts("2025-02-18 10:00:00"), "ONCO", "C50.9", "MEDICARE"),     // NULL patient
    Encounter(1006, "P002", "INPATIENT", ts("2025-03-01 12:00:00"), ts("2025-03-05 16:00:00"), "ENDO", "E11.65", "AETNA"),
    Encounter(1007, "P005", "OUTPATIENT", ts("2025-03-02 09:00:00"), ts("2025-03-02 09:45:00"), "DERM", "L20.9", "UNITED"))

  /** Labs: duplicate 2001; NULL result; '???' test name; P001 lab outside the
    * 90-day pre-admission window; orphan patient A999 (clinicdata.sql:99-118). */
  val labSeed: Seq[LabResult] = Seq(
    LabResult(2001, "P001", "TROPONIN", Some(0.45), "ng/mL", ts("2025-02-10 08:00:00"), true),
    LabResult(2001, "P001", "TROPONIN", Some(0.45), "ng/mL", ts("2025-02-10 08:00:00"), true), // dup
    LabResult(2002, "P001", "HBA1C", Some(6.80), "%", ts("2024-10-01 08:00:00"), false),       // outside 90d window
    LabResult(2003, "P002", "HBA1C", Some(8.20), "%", ts("2025-01-20 09:00:00"), true),
    LabResult(2004, "P002", "GLUCOSE", None, "mg/dL", ts("2025-02-10 09:30:00"), false),       // NULL result
    LabResult(2005, "P003", "???", Some(1.00), "", ts("2025-02-12 22:00:00"), false),          // garbage name
    LabResult(2006, "A999", "CBC", Some(4.50), "K/uL", ts("2025-02-12 08:00:00"), false),      // orphan patient
    LabResult(2007, "P002", "HBA1C", Some(7.90), "%", ts("2025-02-20 08:00:00"), true),
    LabResult(2008, "P005", "CBC", Some(5.10), "K/uL", ts("2025-03-01 07:00:00"), false))

  def seeded(): Pipeline = new Pipeline("clinic", Seq(
    Stage("raw_encounters")((s, _) => { import s.implicits._; encounterSeed.toDF() }),
    Stage("raw_labs")((s, _) => { import s.implicits._; labSeed.toDF() }),

    // Silver encounters (clinicdata.sql:145-163): keep-latest dedup on
    // encounter_id, valid enum, non-null patient.
    Stage("silver_encounters")((_, st) =>
      dedupKeepLatest(st("raw_encounters"), Seq("encounter_id"),
        Seq(col("admit_ts").desc, col("discharge_ts").desc))
        .filter(col("encounter_type").isin(validTypes: _*))
        .filter(col("patient_id").isNotNull)),

    // Silver labs (clinicdata.sql:188-203): dedup, non-null result, real name.
    Stage("silver_labs")((_, st) =>
      dedupKeepLatest(st("raw_labs"), Seq("lab_id"), Seq(col("lab_ts").desc))
        .filter(col("result_value").isNotNull)
        .filter(col("test_name") =!= "???")),

    // J4 interval join (clinicdata.sql:293-297): labs in the 90 days before
    // admission, left join so encounters without labs survive.
    Stage("enriched_encounters")((_, st) => {
      val e = st("silver_encounters")
      val l = st("silver_labs")
      intervalJoin(e, l,
        e("patient_id") === l("patient_id"),
        l("lab_ts"), e("admit_ts") - expr("INTERVAL 90 DAYS"), e("admit_ts"),
        joinType = "left")
        .select(e("*"), l("lab_id"), l("test_name"), l("result_value"), l("abnormal_flag"))
    }),

    // Gold per-department KPIs (clinicdata.sql:312-337): LOS days (Dremio
    // DATEDIFF end-first, day grain), FILTER-clause counts, diabetic LIKE
    // cohort, guarded lab ratio.
    Stage("gold_department_kpis", Materialization.Table)((_, st) => {
      val e = st("silver_encounters")
      val perEnc = st("enriched_encounters")
        .groupBy(col("encounter_id")).agg(count(col("lab_id")).as("n_labs"),
          max(when(col("abnormal_flag"), 1).otherwise(0)).as("has_abnormal"))
      e.join(perEnc, "encounter_id")
        .groupBy(coalesce(col("department"), lit("UNASSIGNED")).as("department"))
        .agg(
          count(lit(1)).as("n_encounters"),
          avg(datediffDays(col("discharge_ts"), col("admit_ts"))).as("avg_los_days"),
          countIf(col("primary_dx").like("E11%")).as("n_diabetic"),
          sum(col("n_labs")).as("total_labs"),
          rate(col("has_abnormal") === 1).as("abnormal_rate"))
    })))
}
