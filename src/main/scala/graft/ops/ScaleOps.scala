package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the 100 TB design goal: skew-salted joins and
  * bucketed co-located tables. These don't change semantics — they change
  * shuffle behavior, which is the difference between a job finishing and a
  * straggler task holding 2% of executors for hours.
  */
object ScaleOps {

  /** Fan a narrow scan out to the session's parallelism before CPU-heavy
    * map-side kernels (MinHash signatures, marker scoring, shingle
    * explodes). A small input often arrives as ONE scan task (one parquet
    * file under maxPartitionBytes — or one unsplittable row group), which
    * serializes a compute-bound kernel on a single core while the rest of
    * the session idles (opt guide §2.5 "input skew": repartition right
    * after the read). SCALE-ADAPTIVE, not a constant: when the plan already
    * carries at least `defaultParallelism` partitions — any real table at
    * cluster scale — this is the identity and costs nothing; the round-robin
    * exchange only fires for under-split inputs, where the bytes moved are
    * by construction tiny (they fit in fewer splits than the session has
    * cores). Round-robin keeps Spark's sort-before-repartition retry safety
    * and adds no key skew. */
  def fanOutForKernels(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Fire only when the reshuffle at least DOUBLES parallelism: a plan at
    // 1900 of 2048 slots must not round-robin hundreds of GB for a 7% gain
    // (review finding r20) — the under-split pathology this helper exists
    // for is 1–2 partitions vs tens of cores, far below par/2. The
    // `.rdd.getNumPartitions` probe costs one physical-planning pass of the
    // upstream (file listing is already cached on the logical relation);
    // that is microseconds-to-ms against the kernel work this gates.
    if (df.rdd.getNumPartitions * 2 > par) df else df.repartition(par)
  }

  /** Skew-salted equi join (left big/skewed, right smaller but not
    * broadcastable): the left side gets a random salt in [0, buckets), the
    * right side is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` reducers instead
    * of one. AQE's skew-join handles moderate skew automatically; explicit
    * salting is for pathological keys known in advance.
    *
    * Join type is inner/left-preserving equi join on `key` — enforced:
    * the right side is replicated once per salt, so right/full-outer would
    * emit every unmatched right row `buckets` times.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched right rows " +
        "(right side is replicated per salt); use inner/left/left_semi/left_anti")
    val salted = left.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed on the join key: subsequent joins between the
    * two tables are co-located — SortMergeJoin without an Exchange on either
    * side (verify with .explain: no "Exchange hashpartitioning" above the
    * scans). This is the DISTRIBUTE BY (retail.sql:134) idea made durable. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Key-distribution profile — the operational tool for deciding between
    * broadcast / AQE / explicit salting: top-n heaviest keys with their share
    * of all rows. ONE scan of `df`: the total comes from an unpartitioned
    * window over the (already tiny, post-aggregation) per-key counts, not a
    * second pass over the raw data. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .withColumn("share", round(col("n_rows") /
        sum(col("n_rows")).over(Window.partitionBy()), 6))
      .orderBy(col("n_rows").desc)
      .limit(topN)
  }

  // --- Z-order clustering (multi-dimensional data skipping) -----------------

  /** Z-value column interleaving the quantile-bucket ranks of `cols`
    * (numeric). Each column is bucketed into 2^bitsPerCol quantile ranges
    * (boundaries from ONE `approxQuantile` pass — a bounded driver-side
    * sketch, same class of setup cost as IVF centroids), then the bucket
    * bits are interleaved: bit b of column j lands at position b*n+j. Rows
    * close in z-value are close in EVERY clustering dimension.
    *
    * Built purely from codegen'd primitives — a `when`-chain per boundary
    * (CaseWhen, whole-stage codegen) and integer shift/mask interleaving —
    * so the z-value computation itself never leaves Tungsten. NULLs bucket
    * to 0 (cluster together at the low end, like a NULLS FIRST sort). */
  def zvalueCol(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 4): Column = {
    require(cols.nonEmpty && bitsPerCol >= 1 && bitsPerCol * cols.length <= 63,
      s"zvalueCol: need 1..63 total bits, got ${bitsPerCol * cols.length}")
    val b = 1 << bitsPerCol
    val probs = (1 until b).map(_.toDouble / b).toArray
    // date/timestamp cluster on their epoch value; everything else casts to
    // double directly (approxQuantile needs numeric input)
    def asNum(c: String): Column = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.DateType |
           _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        col(c).cast("timestamp").cast("double")
      case _ => col(c).cast("double")
    }
    val proj = df.select(cols.zipWithIndex.map { case (c, i) => asNum(c).as(s"__q$i") }: _*)
    val bounds = proj.stat.approxQuantile(
      cols.indices.map(i => s"__q$i").toArray, probs, 0.001)
    val n = cols.length
    val bucketCols = cols.zip(bounds).map { case (c, bs) =>
      // bucket = number of distinct boundaries strictly below the value
      bs.distinct.map(v => when(asNum(c) > lit(v), 1).otherwise(0))
        .reduceOption((a, x) => a + x).getOrElse(lit(0))
    }
    bucketCols.zipWithIndex.map { case (bkt, j) =>
      (0 until bitsPerCol).map { bit =>
        shiftleft(shiftright(bkt, bit).bitwiseAND(lit(1)).cast("long"), bit * n + j)
      }.reduce((a, x) => a.bitwiseOR(x))
    }.reduce((a, x) => a.bitwiseOR(x))
  }

  /** OPTIMIZE ... ZORDER BY: rewrite `df` as parquet clustered on the
    * z-order curve over `cols`. Linear sort keys skip well only on the
    * leading column; after z-ordering, per-file min/max stats are tight on
    * ALL clustering columns, so parquet row-group/file pruning works for
    * predicates on any of them — the difference between scanning 100 TB and
    * scanning the ~1/2^bits slice a 2-column predicate actually needs.
    *
    * `repartitionByRange` on the z-value gives non-overlapping z-ranges per
    * file (range exchange with sampled boundaries — no global sort), and the
    * within-partition sort keeps row groups tight inside each file. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  targetFiles: Int = 64, bitsPerCol: Int = 4): Unit = {
    val z = zvalueCol(df, cols, bitsPerCol)
    df.withColumn("__zorder", z)
      .repartitionByRange(targetFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file [min,max] of `valueCol` in ONE scan (input_file_name grouping)
    * — the stats a reader's pruning consults; used to measure skipping
    * effectiveness (files whose range overlaps a predicate). */
  def fileRangeStats(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        count(lit(1)).as("n_rows"))

  /** [[fileRangeStats]] for several columns in the SAME single scan (one
    * groupBy instead of one full read per column): per file,
    * `<c>_lo`/`<c>_hi` for each requested column plus `n_rows`. */
  def fileRangeStatsMulti(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "fileRangeStatsMulti: no columns")
    val aggs = valueCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_lo"), max(col(c)).as(s"${c}_hi"))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }
}
