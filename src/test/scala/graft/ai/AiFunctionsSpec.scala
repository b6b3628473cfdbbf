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
}
