package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** Drives a reference-shaped script end-to-end: folder DDL, declared table,
  * literal INSERT with timestamp literals and NULLs, window-dedup silver
  * view, gold KPI view with FILTER, GRANT no-op, final SELECT. */
class SqlScriptRunnerSpec extends SparkSpec {

  test("reference-style script executes in order with dialect translation") {
    val wh = Files.createTempDirectory("script_wh").toFile.getAbsolutePath
    val script = s"""
      -- medallion bootstrap (clinicdata.sql shape)
      CREATE FOLDER IF NOT EXISTS clinic.raw;

      DROP TABLE IF EXISTS clinic.raw.encounters;

      CREATE TABLE IF NOT EXISTS clinic.raw.encounters (
        encounter_id BIGINT, patient_id STRING, department STRING,
        admit_ts TIMESTAMP
      ) USING parquet LOCATION '$wh/encounters';

      INSERT INTO clinic.raw.encounters VALUES
        (1001, 'P001', 'CARDIO', TIMESTAMP '2025-02-10 09:00:00'),
        (1001, 'P001', 'CARDIO', TIMESTAMP '2025-02-10 09:00:00'), -- duplicate
        (1002, 'P002', NULL, TIMESTAMP '2025-02-11 10:00:00'),
        (1003, 'P003', 'ENDO', TIMESTAMP '2025-02-12 11:00:00');

      GRANT SELECT ON FOLDER clinic TO USER analyst;

      CREATE OR REPLACE TEMP VIEW silver_encounters AS
        SELECT encounter_id, patient_id,
               COALESCE(department, 'UNASSIGNED') AS department, admit_ts
        FROM (SELECT *, row_number() OVER (PARTITION BY encounter_id
                       ORDER BY admit_ts DESC) AS rn
              FROM clinic.raw.encounters) t
        WHERE rn = 1;

      SELECT department, count(*) AS n,
             count(*) FILTER (WHERE patient_id LIKE 'P00%') AS n_p00
      FROM silver_encounters GROUP BY department ORDER BY department
    """
    val runner = new SqlScriptRunner(spark)
    val results = runner.run(script)
    // one row-producing statement: the final SELECT
    assert(results.size === 1)
    val rows = results.values.head.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("CARDIO", 1L), ("ENDO", 1L), ("UNASSIGNED", 1L)))
    // GRANT recorded, not executed
    assert(graft.sources.Catalog.recordedGrants.exists(_.contains("clinic")))
    // the namespace hierarchy is REAL: the dotted path resolves natively,
    // no a_b_c flattening (reference fidelity, semantics.sql:8-23)
    assert(spark.sql("SELECT count(*) FROM clinic.raw.encounters").head.getLong(0) === 4)
    assert(spark.sql("SHOW NAMESPACES IN clinic").collect().map(_.getString(0))
      .contains("raw"))
    assert(spark.sql("SHOW TABLES IN clinic.raw").collect().map(_.getString(1))
      .contains("encounters"))
    spark.sql("DROP TABLE IF EXISTS clinic.raw.encounters")
  }

  test("DELETE FROM on a nested-catalog table truncates for repeatable runs") {
    val runner = new SqlScriptRunner(spark)
    runner.run("""
      CREATE FOLDER IF NOT EXISTS logi.raw;
      DROP TABLE IF EXISTS logi.raw.deliveries;
      CREATE TABLE logi.raw.deliveries (id BIGINT, city STRING) USING parquet;
      INSERT INTO logi.raw.deliveries VALUES (1, 'Oakland'), (2, 'Fresno');
      DELETE FROM logi.raw.deliveries;
      INSERT INTO logi.raw.deliveries VALUES (3, 'Denver');
    """)
    val rows = spark.sql("SELECT id, city FROM logi.raw.deliveries").collect()
    assert(rows.length === 1 && rows(0).getLong(0) === 3L)
    spark.sql("DROP TABLE IF EXISTS logi.raw.deliveries")
  }

  test("Dremio PARTITION BY clause on CREATE TABLE is stripped and recorded") {
    val runner = new SqlScriptRunner(spark)
    runner.run("""
      CREATE FOLDER IF NOT EXISTS clin2.raw;
      DROP TABLE IF EXISTS clin2.raw.encounters;
      CREATE TABLE clin2.raw.encounters (
        encounter_id BIGINT, admit_ts TIMESTAMP
      ) PARTITION BY (DAY(admit_ts));
      INSERT INTO clin2.raw.encounters VALUES (1, TIMESTAMP '2025-02-10 09:00:00');
    """)
    assert(spark.sql("SELECT count(*) FROM clin2.raw.encounters").head.getLong(0) === 1)
    assert(graft.sources.Catalog.recordedPartitionIntents
      .exists { case (t, c) => t == "clin2.raw.encounters" && c.contains("DAY(admit_ts)") })
    spark.sql("DROP TABLE IF EXISTS clin2.raw.encounters")
  }

  test("statement splitter is quote- and comment-aware") {
    val r = new SqlScriptRunner(spark)
    val stmts = r.statements(
      "SELECT 'a;b' AS x; -- comment; with semicolon\nSELECT 2")
    assert(stmts === Seq("SELECT 'a;b' AS x", "SELECT 2"))
  }
}
