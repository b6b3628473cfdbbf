package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.{MaterializationSubstitution, Materializations}
import graft.sources.{Catalog, Ingest}

/** Pins the failure scenarios found in code review so they cannot regress. */
class ReviewRegressionSpec extends SparkSpec {

  test("refresh() twice with the substitution rule installed picks up new data") {
    import spark.implicits._
    val src = Files.createTempDirectory("refl_src").toFile.getAbsolutePath
    val wh = Files.createTempDirectory("refl_wh").toFile.getAbsolutePath
    Seq((1, 10.0), (2, 20.0)).toDF("k", "v").write.mode("overwrite").parquet(src)
    val m = new Materializations(spark, Some(wh))
    m.register("agg", () =>
      spark.read.parquet(src).agg(round(sum(col("v")), 2).as("total")))
    m.refresh("agg")
    MaterializationSubstitution.install(spark, m)
    try {
      assert(m.table("agg").head.getDouble(0) === 30.0)
      // source changes; the second refresh must NOT read its own stale
      // materialization through the substitution rule
      Seq((1, 10.0), (2, 20.0), (3, 70.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(src)
      m.refresh("agg")
      assert(m.table("agg").head.getDouble(0) === 100.0)
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("copyInto maps columns by header name even when file order differs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("copy_reorder").toFile
    // header order REVERSED relative to the table schema
    Files.write(new java.io.File(dir, "data.csv").toPath,
      "amount,name,id\n12.5,alpha,1\n20.0,beta,2\n".getBytes("UTF-8"))
    val wh = Files.createTempDirectory("wh2").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS reorder_t")
    spark.sql(s"CREATE TABLE reorder_t (id INT, name STRING, amount DOUBLE) USING parquet LOCATION '$wh/t'")
    Ingest.copyInto(spark, "reorder_t", dir.getAbsolutePath)
    val rows = spark.table("reorder_t").orderBy("id").collect()
    assert(rows(0).getInt(0) === 1 && rows(0).getString(1) === "alpha" && rows(0).getDouble(2) === 12.5)
    assert(rows(1).getInt(0) === 2 && rows(1).getString(1) === "beta" && rows(1).getDouble(2) === 20.0)
    // missing header column fails fast instead of silently null-filling
    val badDir = Files.createTempDirectory("copy_bad").toFile
    Files.write(new java.io.File(badDir, "data.csv").toPath,
      "id,name\n1,x\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Ingest.copyInto(spark, "reorder_t", badDir.getAbsolutePath))
    spark.sql("DROP TABLE IF EXISTS reorder_t")
  }

  test("copyInto maps EACH file by its own header when orders differ across files") {
    val dir = Files.createTempDirectory("copy_mixed").toFile
    // two files, HEADERS IN DIFFERENT ORDER — a single multi-file csv read
    // would bind the second file positionally against the first's header
    Files.write(new java.io.File(dir, "a.csv").toPath,
      "id,name,amount\n1,alpha,12.5\n".getBytes("UTF-8"))
    Files.write(new java.io.File(dir, "b.csv").toPath,
      "amount,name,id\n20.0,beta,2\n".getBytes("UTF-8"))
    val wh = Files.createTempDirectory("wh_mixed").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS mixed_t")
    spark.sql(s"CREATE TABLE mixed_t (id INT, name STRING, amount DOUBLE) USING parquet LOCATION '$wh/t'")
    Ingest.copyInto(spark, "mixed_t", dir.getAbsolutePath)
    val rows = spark.table("mixed_t").orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(0) === 1 && rows(0).getString(1) === "alpha" && rows(0).getDouble(2) === 12.5)
    assert(rows(1).getInt(0) === 2 && rows(1).getString(1) === "beta" && rows(1).getDouble(2) === 20.0)
    spark.sql("DROP TABLE IF EXISTS mixed_t")
  }

  test("self-join over a materialized definition gets unique ids per leg") {
    import spark.implicits._
    val src = Files.createTempDirectory("selfjoin_src").toFile.getAbsolutePath
    val wh = Files.createTempDirectory("selfjoin_wh").toFile.getAbsolutePath
    Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(src)
    def definition() = spark.read.parquet(src)
      .groupBy(col("k")).agg(sum(col("v")).as("total"))
    val m = new Materializations(spark, Some(wh))
    m.register("per_k", definition _)
    m.refresh("per_k")
    MaterializationSubstitution.install(spark, m)
    try {
      val a = definition().as("a")
      val b = definition().as("b")
      // both legs substitute to the SAME materialization — each must carry
      // fresh ExprIds or the join condition is ambiguous / the plan invalid.
      // (Join on the AGG OUTPUT: a key-equi condition would infer isnotnull
      // filters below the aggregates and defeat whole-subtree matching.)
      def q = a.join(b, col("a.total") * 2 === col("b.total"))
        .select(col("a.k").as("k"), col("a.total").as("t1"), col("b.total").as("t2"))
      val joined = q.orderBy("k").collect()
      assert(joined.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
        === Seq((1, 10.0, 20.0)))
      // and the materialized scan really is served on both legs: the raw
      // aggregate must be gone from the physical plan
      val phys = q.queryExecution.executedPlan.toString
      assert(!phys.contains("HashAggregate"), s"aggregate not substituted:\n$phys")
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("saltedEquiJoin rejects right/full joins that would duplicate rows") {
    import spark.implicits._
    val l = Seq((1, "a")).toDF("k", "lv")
    val r = Seq((1, "x"), (2, "y")).toDF("k", "rv")
    intercept[IllegalArgumentException](
      graft.ops.ScaleOps.saltedEquiJoin(l, r, "k", 4, "right"))
    intercept[IllegalArgumentException](
      graft.ops.ScaleOps.saltedEquiJoin(l, r, "k", 4, "full_outer"))
    // left_semi stays correct under salting: replicas exist for every salt
    val semi = graft.ops.ScaleOps.saltedEquiJoin(l, r, "k", 4, "left_semi")
    assert(semi.collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("truncate empties a PARTITIONED table even under dynamic overwrite mode") {
    import spark.implicits._
    val wh = Files.createTempDirectory("wh3").toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("DROP TABLE IF EXISTS part_t")
      spark.sql(s"CREATE TABLE part_t (id INT, p STRING) USING parquet PARTITIONED BY (p) LOCATION '$wh/t'")
      Seq((1, "a"), (2, "b")).toDF("id", "p")
        .write.mode("append").insertInto("part_t")
      assert(spark.table("part_t").count() === 2)
      Catalog.truncate(spark, "part_t")
      assert(spark.table("part_t").count() === 0)
      // the pinned mode is restored afterwards
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") === "dynamic")
      spark.sql("DROP TABLE IF EXISTS part_t")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
