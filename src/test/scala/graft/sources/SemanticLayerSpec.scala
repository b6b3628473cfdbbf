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

  test("embedding semantic search serves hybrid rankings from a STANDING " +
      "IvfIndex: wiki-only matches surface, and a pruned serve reads only " +
      "probed cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a synthetic catalog big enough for cell pruning to have signal: 48
    // datasets, four documentation "topics" with disjoint vocabulary
    val topics = Seq(
      ("billing invoices payments receivables ledger accounting", "fin"),
      ("clickstream sessions funnels engagement retention telemetry", "beh"),
      ("warehouse shipments logistics freight carriers customs", "log"),
      ("genomics sequencing variants proteins assays biology", "sci"))
    val dfs = (0 until 48).map { i =>
      val (wiki, tag) = topics(i % 4)
      val path = f"ds_${tag}_$i%02d"
      SemanticLayer.setWiki(path, s"$wiki domain dataset number $i")
      SemanticLayer.addLabels(path, tag)
      path -> Seq((i.toLong, s"r$i")).toDF("id", "v")
    }
    val entries = SemanticLayer.entries(spark, dfs)
    val root = java.nio.file.Files.createTempDirectory("semidx")
      .toFile.getAbsolutePath
    SemanticLayer.buildSemanticIndex(spark, entries, root, dim = 8, nCells = 8)

    // a documentation-vocabulary query: none of these words appear in any
    // dataset NAME or column — lexical still scores via wikis, and the
    // embedding side must rank the topic's datasets together
    val got = SemanticLayer.semanticSearch(spark, entries, root,
      "billing payments ledger", topK = 48, dim = 8, nprobe = 8).collect()
    assert(got.nonEmpty)
    assert(got.take(12).map(_.getString(0)).forall(_.startsWith("ds_fin")),
      s"hybrid ranking should put the billing topic first: " +
        got.map(_.getString(0)).mkString(","))
    assert(got.head.getInt(1) === 3, "lexical overlap should score 3 tokens")
    assert(got.head.getDouble(2) > 0.5, "embedding cosine should be strong")

    // the scale path: nprobe < nCells serves from a file subset
    SemanticLayer.semanticSearch(spark, entries, root,
      "billing payments ledger", topK = 5, dim = 8, nprobe = 2).collect()
    // empty k-means cells write no file, so total is the POPULATED cells
    val (kept, total) = graft.operators.IvfIndex.lastPruneStats
    assert(total >= 4L && kept <= 2L && kept < total,
      s"pruned serve should read <=2 of the populated cell files: $kept/$total")
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
