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
  *
  * Mode `skewed` (r6 VERDICT next-round #1): uniform replication REDUCES
  * relative skew, yet a hot key is the canonical 100 TB failure mode (real
  * corpora are zipfian — the reference's own 338M-row taxi table is
  * zone-skewed, dremio.sql:1-8). After scaling, ~`HotFrac` of orders rows
  * are remapped onto ONE customer key and ~`HotFrac` of events rows onto
  * ONE user id (selection by `pmod(primary key, 100)` — deterministic, no
  * RNG), so joins on o_custkey and windows/aggs over user_id face a
  * partition holding 30% of the table. Row counts and all other columns are
  * untouched; the hot keys are existing dimension keys (min key, copy 0), so
  * FK integrity holds and the hot rows JOIN — they don't vanish into an
  * unmatched-null path.
  */
object ScaleUp {

  /** Fraction of fact rows concentrated on the hot key in `skewed` mode. */
  val HotFrac = 0.30

  /** A fact column to concentrate: rows are selected by `pmod(pk, 100)`
    * (deterministic), and the hot value is `dimTable.dimKey`'s MIN original
    * key in copy 0 — an existing key, so FK integrity holds. */
  private case class SkewTarget(fk: String, pk: String,
                                dimTable: String, dimKey: String)

  private val skewTargets: Map[String, SkewTarget] = Map(
    "orders" -> SkewTarget("o_custkey", "o_orderkey", "customer", "c_custkey"),
    "events" -> SkewTarget("user_id", "event_id", "events", "user_id"))

  /** documents (r10): ~HotFrac of docs remapped onto ONE source string —
    * the hot-domain regime (a single domain holding 30% of a web corpus is
    * routine zipf) that per-source operators (q95 gates, q97 capping) must
    * stay flat on. Selection by pmod(doc_id, 100): deterministic, no RNG. */
  def skewDocumentSource(df: DataFrame, hotSource: String): DataFrame =
    df.withColumn("source",
      when(pmod(col("doc_id"), lit(100)) < lit((HotFrac * 100).toInt),
        lit(hotSource)).otherwise(col("source")))

  /** Remap ~HotFrac of `name`'s rows onto one hot key (already-scaled frame;
    * `hotKey` must be a post-remap key value that exists on the dim side). */
  def skewTable(df: DataFrame, name: String, hotKey: Long): DataFrame =
    skewTargets.get(name) match {
      case None => df
      case Some(t) =>
        df.withColumn(t.fk,
          when(pmod(col(t.pk), lit(100)) < lit((HotFrac * 100).toInt), lit(hotKey))
            .otherwise(col(t.fk)))
    }

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

  def run(spark: SparkSession, srcDir: String, outDir: String, k: Int,
          mode: String = "uniform"): Unit = {
    require(mode == "uniform" || mode == "skewed", s"mode $mode")
    graft.Tables.all.foreach { name =>
      val src = graft.Tables(spark, srcDir, name)
      var scaled = scaleTable(src, name, k)
      if (mode == "skewed") skewTargets.get(name).foreach { t =>
        // hot key = the dim's min original key in copy 0 (remap key*k+0)
        val hot = graft.Tables(spark, srcDir, t.dimTable)
          .agg(min(col(t.dimKey))).head.getLong(0) * k
        scaled = skewTable(scaled, name, hot)
      }
      if (mode == "skewed" && name == "documents") {
        val hotSrc = src.agg(min(col("source"))).head.getString(0)
        scaled = skewDocumentSource(scaled, hotSrc)
      }
      // more output files than the source so downstream scans parallelize
      // like a real K×-larger table would (one giant file would serialize)
      val parts = if (verbatim.contains(name)) 1 else math.min(32, 4 * k)
      scaled.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      val (a, b) = (spark.read.parquet(s"$outDir/$name.parquet").count(), src.count())
      val want = if (verbatim.contains(name)) b else b * k
      require(a == want, s"$name: scaled rows $a != expected $want")
      val profiledKey =
        if (mode == "skewed" && skewTargets.contains(name)) Some(skewTargets(name).fk)
        else if (mode == "skewed" && name == "documents") Some("source")
        else None
      profiledKey match {
        case Some(fk) =>
          val top = graft.ops.ScaleOps.keySkewProfile(
            spark.read.parquet(s"$outDir/$name.parquet"), fk, 1).head
          println(s"[scaleup] $name: $b -> $a rows; hot $fk=${top.get(0)} " +
            s"share=${top.getAs[Double]("share")}")
        case None => println(s"[scaleup] $name: $b -> $a rows")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale10")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("uniform")
    val spark = SparkSession.builder()
      .appName("graft-scaleup")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try run(spark, srcDir, outDir, k, mode) finally spark.stop()
  }
}
