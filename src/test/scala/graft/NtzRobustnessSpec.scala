package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Structural protection against the testdata writer changing underneath the
  * engine (the round-8 incident: a pyarrow regen turned every `ts` column
  * into TIMESTAMP_NTZ and broke q36 plus four specs). The engine's contract
  * is that a corpus whose timestamps carry no timezone annotation loads as
  * session-zone TimestampType (the session is pinned UTC, so the micros are
  * identical), and every registry query keeps working on it.
  */
class NtzRobustnessSpec extends SparkSpec {

  /** sf0.001 rewritten with every timestamp column cast to TIMESTAMP_NTZ —
    * Spark writes those with isAdjustedToUTC=false, the same physical form
    * pyarrow produces. */
  private lazy val ntzDir: String = {
    val dir = TempDirs.newDir("ntz_corpus")
    Tables.all.foreach { t =>
      val df = Tables(spark, SparkSpec.sfDir, t)
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
        else col(f.name)
      }.toSeq: _*).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("NTZ-written timestamps load back as session-zone TimestampType, value-identical") {
    val orig = sf("events")
    val ntz = Tables(spark, ntzDir, "events")
    assert(ntz.schema("ts").dataType == TimestampType,
      s"expected TimestampType after load, got ${ntz.schema("ts").dataType}")
    val Array(oMin, oMax) = orig.selectExpr("min(ts)", "max(ts)").head().toSeq.toArray
    val Array(nMin, nMax) = ntz.selectExpr("min(ts)", "max(ts)").head().toSeq.toArray
    assert(oMin == nMin && oMax == nMax,
      s"ts values drifted through the NTZ roundtrip: ($oMin,$oMax) vs ($nMin,$nMax)")
  }

  test("every registry query plans green against an NTZ-written corpus; " +
      "every events-reading query also EXECUTES green") {
    // Planning catches the analysis-time NTZ type errors (the round-8 class:
    // DATATYPE_MISMATCH on an epoch cast); executing the queries that scan
    // the timestamp-bearing events table catches runtime ones.
    val failures = SparkEntry.allQueries.flatMap { q =>
      try {
        val df = q.run(spark, ntzDir)
        val readsEvents =
          df.queryExecution.executedPlan.toString.contains("events.parquet")
        if (readsEvents) df.count(): Unit
        None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q36_sessions (the round-8 casualty) executes green on NTZ events") {
    val rows = SparkEntry.queries("q36_sessions")(spark, ntzDir).collect()
    assert(rows.nonEmpty)
  }
}
