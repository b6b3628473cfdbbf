package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic corpus scaler (r5 VERDICT next-round #1): replicate a testdata
  * SF directory K× with key remapping so every scale claim — banded LSH
  * linearity, blocked cosine joins, z-order skipping, shuffle sizing — is
  * measured on a corpus 10× the driver's, not just asserted from plan shape.
  *
  * Replication semantics (what keeps the workload's CHARACTER at K×):
  *  - Join keys remap as `key * K + copy`: unique across copies, and both
  *    sides of every FK remap identically, so join selectivity and group
  *    cardinality scale exactly K× (a copy never joins another copy's rows).
  *  - region/nation copy verbatim: TPC-H dims that do not grow with SF.
  *  - documents: every 5th word in copy i>0 gets a copy-specific suffix.
  *    Within a copy pairwise similarity is preserved (near-dup seed pairs
  *    mutate identically), across copies ~3/5 of shingles die (Jaccard
  *    ≈ 0.25, far below the 0.7–0.8 thresholds) — so MinHash/SimHash work
  *    scales linearly instead of exploding with K² cross-copy "duplicates"
  *    of every document.
  *  - embeddings: copy i rotates each vector by i positions. Rotation is an
  *    orthogonal transform applied uniformly within a copy, so intra-copy
  *    cosines are EXACTLY the originals; cross-copy pairs decorrelate —
  *    same reasoning as the text salt, for the ANN/near-dup operators.
  *  - events: ids remap, timestamps keep — K× users with the original
  *    session structure each.
  */
object ScaleUp {

  /** Tables whose Long key columns remap as key*K+copy. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val verbatim = Seq("region", "nation")

  def scaleTable(df: DataFrame, name: String, k: Int): DataFrame = {
    if (verbatim.contains(name)) return df
    val keys = keyCols(name)
    var d = df.withColumn("__copy", explode(sequence(lit(0), lit(k - 1))))
    keys.foreach(c => d = d.withColumn(c, col(c) * k + col("__copy")))
    if (name == "documents")
      d = d.withColumn("text",
        when(col("__copy") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              (w, j) => when(j % 5 === 0, concat(w, lit("_c"), col("__copy"))).otherwise(w)),
            " ")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    if (name == "embeddings") {
      val n = size(col("embedding"))
      val r = col("__copy") % n
      d = d.withColumn("embedding",
        when(r === 0, col("embedding")).otherwise(
          concat(slice(col("embedding"), r + 1, n - r), slice(col("embedding"), lit(1), r))))
    }
    d.drop("__copy")
  }

  def run(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    graft.Tables.all.foreach { name =>
      val src = graft.Tables(spark, srcDir, name)
      val scaled = scaleTable(src, name, k)
      // more output files than the source so downstream scans parallelize
      // like a real K×-larger table would (one giant file would serialize)
      val parts = if (verbatim.contains(name)) 1 else math.min(32, 4 * k)
      scaled.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      val (a, b) = (spark.read.parquet(s"$outDir/$name.parquet").count(), src.count())
      val want = if (verbatim.contains(name)) b else b * k
      require(a == want, s"$name: scaled rows $a != expected $want")
      println(s"[scaleup] $name: $b -> $a rows")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale10")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("graft-scaleup")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try run(spark, srcDir, outDir, k) finally spark.stop()
  }
}
