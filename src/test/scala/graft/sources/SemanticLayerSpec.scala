package graft.sources

import graft.SparkSpec

/** Semantic/context layer (X4, readme.md:420-466): wikis, labels, semantic
  * search, lineage. */
class SemanticLayerSpec extends SparkSpec {

  test("wiki-documented synonyms surface datasets whose names don't match") {
    import spark.implicits._
    SemanticLayer.seedReferenceWikis()
    val dir = "/root/testdata/sf0.001"
    val names = Seq("customer", "orders", "lineitem", "region")
    val entries = SemanticLayer.entries(
      spark, names.map(n => n -> graft.Tables(spark, dir, n)))
    val hits = SemanticLayer.search(entries, "client purchase history", topK = 3)
      .collect()
    // `orders` documents "purchase history … per client" → 3 token hits;
    // `customer` documents "client master data" → 1. Neither word appears in
    // any table/column name — discovery is via the wiki alone.
    assert(hits.head.getString(0) === "orders" && hits.head.getInt(1) === 3)
    assert(hits.map(_.getString(0)).contains("customer"))
    assert(!hits.map(_.getString(0)).contains("region"))
  }

  test("trigram fuzzy score still surfaces near-miss spellings") {
    import spark.implicits._
    val entries = SemanticLayer.entries(spark,
      Seq("customer" -> Seq((1, "x")).toDF("c_custkey", "c_name"),
          "part" -> Seq((1, "x")).toDF("p_partkey", "p_name")))
    // `custmer` matches no token exactly; trigram overlap ranks customer first
    val hits = SemanticLayer.search(entries, "custmer", topK = 2).collect()
    assert(hits.nonEmpty && hits.head.getString(0) === "customer")
    assert(hits.head.getInt(1) === 0 && hits.head.getDouble(2) > 0.2)
  }

  test("entriesFromCatalog harvests temp views with their columns") {
    import spark.implicits._
    Seq((1, "a")).toDF("claim_id", "diagnosis").createOrReplaceTempView("sl_claims")
    SemanticLayer.setWiki("sl_claims", "insurance claims with diagnosis codes")
    SemanticLayer.addLabels("sl_claims", "healthcare")
    val e = SemanticLayer.entriesFromCatalog(spark)
      .filter(org.apache.spark.sql.functions.col("path") === "sl_claims")
      .collect()
    assert(e.length === 1)
    assert(e(0).getSeq[String](1).toSet === Set("claim_id", "diagnosis"))
    assert(e(0).getString(2).contains("insurance"))
    assert(e(0).getSeq[String](3) === Seq("healthcare"))
    // searchable through the harvested entry
    val hit = SemanticLayer.search(
      SemanticLayer.entriesFromCatalog(spark), "diagnosis insurance", topK = 5)
      .collect().map(_.getString(0))
    assert(hit.contains("sl_claims"))
    spark.catalog.dropTempView("sl_claims")
  }

  test("lineage reports a view's base relations") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sl_lineage").toString
    Seq((1, 10.0), (2, 5.0)).toDF("id", "amt").write.parquet(s"$dir/base")
    spark.read.parquet(s"$dir/base").createOrReplaceTempView("sl_base")
    spark.sql("CREATE OR REPLACE TEMP VIEW sl_gold AS " +
      "SELECT id, sum(amt) AS total FROM sl_base GROUP BY id")
    val edges = SemanticLayer.lineage(spark, Seq("sl_gold")).collect()
    assert(edges.length === 1 && edges(0).getString(0) === "sl_gold")
    assert(edges(0).getString(1).contains("sl_lineage"))
    spark.catalog.dropTempView("sl_gold")
    spark.catalog.dropTempView("sl_base")
  }
}
