package graft.ai

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AiFunctionsSpec extends SparkSpec {

  test("ai_classify picks the keyword-matching label; falls back to last label") {
    import spark.implicits._
    // The FIXTURES.md A6 delivery-notes mix: each note must land on a fixed label.
    val labels = Seq("traffic", "weather", "access problem", "mechanical", "none")
    val notes = Seq(
      (1L, "stuck in heavy traffic on the highway for two hours"),
      (2L, "severe weather delayed the route, heavy snow"),
      (3L, "gate code missing, access problem at the dock"),
      (4L, "truck had a mechanical failure, engine would not start"),
      (5L, "smooth delivery, nothing to report"))
    val out = notes.toDF("id", "note")
      .select(col("id"), AiFunctions.aiClassify(col("note"), typedLit(labels)).as("label"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "traffic")
    assert(out(2L) === "weather")
    assert(out(3L) === "access problem")
    assert(out(4L) === "mechanical")
    assert(out(5L) === "none") // no keyword → last label fallback
  }

  test("ai_classify is deterministic (same input → same output)") {
    import spark.implicits._
    val labels = typedLit(Seq("query processing", "storage"))
    val df = Seq.fill(3)("hash join shuffle query").toDF("t")
      .select(AiFunctions.aiClassify(col("t"), labels).as("l"))
    assert(df.distinct().count() === 1)
  }

  test("ai_generate_issue extracts typed struct fields") {
    import spark.implicits._
    val df = Seq(
      "The package arrived very late and the customer is angry, wants refund",
      "minor scratch, somewhat damaged box").toDF("t")
      .select(AiFunctions.aiGenerateIssue(col("t")).as("ai"))
      .select(col("ai.primary_issue"), col("ai.severity"), col("ai.requires_apology"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "late_delivery")
    assert(rows(0).getString(1) === "high")
    assert(rows(0).getBoolean(2) === true)
    assert(rows(1).getString(0) === "damaged_goods")
    assert(rows(1).getString(1) === "low")
    assert(rows(1).getBoolean(2) === false)
  }

  test("ai_complete returns deterministic bounded text") {
    import spark.implicits._
    val df = Seq("Summarize this long operational note about the delivery").toDF("t")
      .select(AiFunctions.aiComplete(col("t")).as("c"))
    val s = df.head.getString(0)
    assert(s.startsWith("[completion]"))
  }

  test("SQL surface: registered functions callable from spark.sql") {
    AiFunctions.register(spark)
    val out = spark.sql(
      "SELECT ai_classify('engine broke down, mechanical issue', array('traffic','mechanical')) AS l")
      .head.getString(0)
    assert(out === "mechanical")
  }

  test("generic AI_GENERATE: two distinct ROW schemas in one session") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // Call site 1 — the logistics shape (logistics_AI.sql:135-140).
    val logistics = StructType(Seq(
      StructField("primary_issue", StringType),
      StructField("issue_category", StringType),
      StructField("estimated_delay_minutes", IntegerType),
      StructField("requires_apology", BooleanType)))
    val l = Seq("stuck in heavy traffic for 45 minutes, customer angry")
      .toDF("notes")
      .select(AiFunctions.aiGenerate(col("notes"), logistics).as("ai"))
      .select(col("ai.primary_issue"), col("ai.estimated_delay_minutes"),
        col("ai.requires_apology"))
      .head
    assert(l.getString(0) === "Traffic")
    assert(l.getInt(1) === 45)       // first integer literal in the text
    assert(l.getBoolean(2) === true) // "angry" negative marker
    // Call site 2 — a DIFFERENT shape in the same session (media_ai.sql:94-107).
    val media = StructType(Seq(
      StructField("headline", StringType),
      StructField("main_topic", StringType),
      StructField("entities", StringType),
      StructField("sentiment_score", DoubleType)))
    val m = Seq("Concert review: Amara Jones plays downtown, smooth great show, music all around")
      .toDF("draft")
      .select(AiFunctions.aiGenerate(col("draft"), media).as("ai"))
      .select(col("ai.main_topic"), col("ai.entities"), col("ai.sentiment_score"),
        col("ai.headline"))
      .head
    assert(m.getString(0) === "Music")
    assert(m.getString(1).contains("Amara") && m.getString(1).contains("Jones"))
    assert(m.getDouble(2) === 1.0) // only positive markers
    assert(m.getString(3).startsWith("[completion]"))
  }

  test("SqlScriptRunner rewrites Dremio WITH SCHEMA ROW(...) to the generic path") {
    import graft.pipeline.SqlScriptRunner
    val runner = new SqlScriptRunner(spark)
    spark.sql("SELECT 'severe weather, heavy snow closed the pass, 30 min late' AS driver_notes")
      .createOrReplaceTempView("delivery_notes")
    val out = runner.run("""
      SELECT
        AI_GENERATE(
          'Extract the delivery issue. NOTES: ' || driver_notes
          WITH SCHEMA ROW(
            primary_issue            VARCHAR,
            issue_category           VARCHAR,
            estimated_delay_minutes  INT,
            requires_apology         BOOLEAN
          )
        ) AS ai_struct
      FROM delivery_notes;
    """)
    val row = out(0).select(col("ai_struct.primary_issue"),
      col("ai_struct.estimated_delay_minutes"), col("ai_struct.requires_apology")).head
    assert(row.getString(0) === "Weather")
    assert(row.getInt(1) === 30)
    assert(row.getBoolean(2) === false)
    // schema really is the declared ROW, typed
    val dt = out(0).schema("ai_struct").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dt.fieldNames.toSeq ===
      Seq("primary_issue", "issue_category", "estimated_delay_minutes", "requires_apology"))
  }
}
