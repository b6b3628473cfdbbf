package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COPY INTO (M3) and LIST_FILES (S5) parity — fixture cloned from the
  * reference's COPY INTO EXAMPLE (example.sql:5-21, file1-5.csv shape). */
class IngestSpec extends SparkSpec {

  private def writeCsvFixture(): java.io.File = {
    val dir = Files.createTempDirectory("copy_into").toFile
    val rows = Seq(
      "file1.csv" -> Seq("id,name,amount,event_date", "1,alpha,10.5,2025-01-01", "2,beta,20.0,2025-01-02"),
      "file2.csv" -> Seq("id,name,amount,event_date", "3,gamma,30.25,2025-01-03", "4,delta,40.0,2025-01-04"),
      "file3.csv" -> Seq("id,name,amount,event_date", "5,epsilon,50.0,2025-01-05", "6,zeta,60.75,2025-01-06"),
      "file4.csv" -> Seq("id,name,amount,event_date", "7,eta,70.0,2025-01-07", "8,theta,80.0,2025-01-08"),
      "file5.csv" -> Seq("id,name,amount,event_date", "9,iota,90.0,2025-01-09", "10,kappa,100.0,2025-01-10", "11,lambda,110.0,2025-01-11"),
      "notes.txt" -> Seq("should be ignored by the regex"))
    rows.foreach { case (name, lines) =>
      Files.write(new java.io.File(dir, name).toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("copyInto loads all regex-matched CSVs header-mapped into the target table") {
    val dir = writeCsvFixture()
    val warehouse = Files.createTempDirectory("wh").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS transactions")
    spark.sql(s"""
      CREATE TABLE transactions (id INT, name STRING, amount DOUBLE, event_date DATE)
      USING parquet LOCATION '$warehouse/transactions'""")
    val loaded = Ingest.copyInto(spark, "transactions", dir.getAbsolutePath, ".*\\.csv")
    assert(loaded.count() === 11) // expected loaded count per FIXTURES.md A7
    val t = spark.table("transactions")
    assert(t.count() === 11)
    assert(t.agg(sum(col("amount"))).head.getDouble(0) === 661.5)
    // idempotent rebuild pattern: second COPY INTO appends (reference M3 is append)
    Ingest.copyInto(spark, "transactions", dir.getAbsolutePath, ".*\\.csv")
    assert(spark.table("transactions").count() === 22)
    spark.sql("DROP TABLE IF EXISTS transactions")
  }

  test("copyInto maps files with REORDERED headers by name, not position") {
    val dir = Files.createTempDirectory("copy_into_ro").toFile
    Seq(
      "a.csv" -> Seq("id,name,amount,event_date", "1,alpha,10.5,2025-01-01"),
      "b.csv" -> Seq("amount,id,event_date,name", "20.0,2,2025-01-02,beta"))
      .foreach { case (n, ls) =>
        Files.write(new java.io.File(dir, n).toPath, ls.mkString("\n").getBytes("UTF-8"))
      }
    val wh = Files.createTempDirectory("whro").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS tx_ro")
    spark.sql(s"""
      CREATE TABLE tx_ro (id INT, name STRING, amount DOUBLE, event_date DATE)
      USING parquet LOCATION '$wh/tx_ro'""")
    Ingest.copyInto(spark, "tx_ro", dir.getAbsolutePath, ".*\\.csv")
    val rows = spark.table("tx_ro").orderBy(col("id")).collect()
    assert(rows.length === 2)
    // b.csv's columns land by NAME despite its different physical order
    assert(rows(1).getInt(0) === 2)
    assert(rows(1).getString(1) === "beta")
    assert(rows(1).getDouble(2) === 20.0)
    spark.sql("DROP TABLE IF EXISTS tx_ro")
  }

  test("copyIntoStream ingests arriving files exactly once across batches") {
    val src = Files.createTempDirectory("copy_stream_src").toFile
    val ckpt = Files.createTempDirectory("copy_stream_ck").toFile.getAbsolutePath
    val warehouse = Files.createTempDirectory("copy_stream_wh").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS tx_stream")
    spark.sql(s"""
      CREATE TABLE tx_stream (id INT, name STRING, amount DOUBLE)
      USING parquet LOCATION '$warehouse/tx_stream'""")
    def drop(name: String, lines: String*): Unit =
      Files.write(new java.io.File(src, name).toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    drop("w1.csv", "id,name,amount", "1,a,10.0", "2,b,20.0")
    val q = Ingest.copyIntoStream(spark, "tx_stream", src.getAbsolutePath, ckpt)
    try {
      q.processAllAvailable()
      assert(spark.table("tx_stream").count() === 2)
      // second wave: only the NEW file is ingested (checkpointed file log)
      drop("w2.csv", "id,name,amount", "3,c,30.0")
      q.processAllAvailable()
      val rows = spark.table("tx_stream").orderBy("id").collect()
      assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
      assert(rows.map(_.getDouble(2)).sum === 60.0)
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS tx_stream")
  }

  test("listFiles yields one row per file with path/length/content") {
    val dir = writeCsvFixture()
    val files = Ingest.listFiles(spark, dir.getAbsolutePath, "*.csv")
    assert(files.count() === 5)
    val meta = Ingest.listFileMeta(spark, dir.getAbsolutePath, "*.csv")
    assert(meta.columns.toSeq === Seq("path", "length", "modificationTime"))
    // LIKE filter on path, as in ai_generate.sql:22
    assert(files.filter(col("path").like("%file1.csv")).count() === 1)
    // content is the real bytes
    val c = files.filter(col("path").like("%file1.csv"))
      .select(col("content").cast("string")).head.getString(0)
    assert(c.startsWith("id,name,amount,event_date"))
  }
}
