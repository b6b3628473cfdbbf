package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("namespace, declared table, insert, truncate, drop lifecycle") {
    import spark.implicits._
    val wh = Files.createTempDirectory("cat").toFile.getAbsolutePath
    Catalog.createNamespace(spark, Seq("clinicdata", "raw"))
    Catalog.dropTable(spark, "clinicdata_raw.encounters")
    Catalog.createTable(spark, "clinicdata_raw.encounters",
      "encounter_id BIGINT, patient_id STRING, department STRING",
      location = Some(s"$wh/encounters"))
    Catalog.insertRows(spark, "clinicdata_raw.encounters",
      Seq((1001L, "P001", "CARDIO"), (1002L, "P002", "ENDO"))
        .toDF("encounter_id", "patient_id", "department"))
    assert(spark.table("clinicdata_raw.encounters").count() === 2)
    // M2 repeatable-run truncate
    Catalog.truncate(spark, "clinicdata_raw.encounters")
    assert(spark.table("clinicdata_raw.encounters").count() === 0)
    Catalog.dropTable(spark, "clinicdata_raw.encounters")
  }

  test("CTAS with partitioning and DISTRIBUTE BY; idempotent rebuild") {
    val orders = sf("orders").withColumn("o_year", year(col("o_orderdate")))
    Catalog.ctas(spark, "gold_orders", orders,
      partitionBy = Seq("o_year"), distributeBy = Seq(col("o_custkey")))
    val t = spark.table("gold_orders")
    assert(t.count() === orders.count())
    // partition pruning visible in the plan for a partition-key filter
    val plan = t.filter(col("o_year") === 1996).queryExecution.executedPlan.toString
    assert(t.filter(col("o_year") === 1996).count() > 0)
    // D8: rebuild over existing table succeeds (DROP IF EXISTS + CTAS)
    Catalog.ctas(spark, "gold_orders", orders.limit(10))
    assert(spark.table("gold_orders").count() === 10)
    Catalog.dropTable(spark, "gold_orders")
  }

  test("D4 hidden day partitioning: base-column predicates prune partitions") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-05-01 09:00:00"), "a"),
      (2L, java.sql.Timestamp.valueOf("2025-05-01 17:30:00"), "b"),
      (3L, java.sql.Timestamp.valueOf("2025-05-02 08:00:00"), "c"),
      (4L, java.sql.Timestamp.valueOf("2025-05-03 23:59:59"), "d"),
      (5L, java.sql.Timestamp.valueOf("2025-05-07 01:00:00"), "e"))
      .toDF("id", "admit_ts", "payload")
    Catalog.ctasDayPartitioned(spark, "clinic_encounters_p", events, "admit_ts")
    // user filters the BASE timestamp column only — like the reference's
    // readers of a PARTITION BY DAY(admit_ts) table
    val q = spark.table("clinic_encounters_p")
      .filter(col("admit_ts") >= "2025-05-02 00:00:00" &&
        col("admit_ts") < "2025-05-04 00:00:00")
    assert(q.select(col("id")).as[Long].collect().sorted === Array(3L, 4L))
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))
    val pf = scan.partitionFilters.map(_.toString).mkString(";")
    assert(pf.contains("admit_ts_day") && pf.contains(">=") && pf.contains("<="),
      s"day bounds not lifted into PartitionFilters: $pf")
    // the pruning is real: only the 2 matching day-partitions are read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).size === 2)
    // equality form prunes to a single day
    val q2 = spark.table("clinic_encounters_p")
      .filter(col("admit_ts") === "2025-05-07 01:00:00")
    assert(q2.count() === 1)
    val scan2 = q2.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan2.relation.location.listFiles(scan2.partitionFilters, Nil)
      .flatMap(_.files).size === 1)
    Catalog.dropTable(spark, "clinic_encounters_p")
  }

  test("views layer like the reference's semantic layer") {
    Catalog.createOrReplaceView(spark, "v_customers", sf("customer"))
    Catalog.createOrReplaceView(spark, "v_big_balance",
      "SELECT c_custkey, c_acctbal FROM v_customers WHERE c_acctbal > 0")
    assert(spark.table("v_big_balance").count() > 0)
  }

  test("grants are recorded as governance metadata") {
    Catalog.grant("GRANT SELECT ON FOLDER clinicdata TO USER analyst")
    assert(Catalog.recordedGrants.exists(_.contains("analyst")))
  }
}
