package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, train/val/test splitting, and epoch shuffling for
  * training-data pipelines.
  *
  * Everything here is CONTENT-HASH based (md5 of a caller-chosen key), never
  * RNG-state based, because at 100 TB the properties that matter are:
  *  - reproducibility across runs, executors, retries and engines (a task
  *    retry must not resample; md5 is identical everywhere, so the same
  *    oracle SQL runs in DuckDB for verification);
  *  - stability under dataset growth — a row's split assignment depends only
  *    on its own key, so adding data never reshuffles existing rows across
  *    the train/test boundary (no contamination drift between snapshots);
  *  - map-side execution — assignment and sampling are pure projections (no
  *    shuffle, no driver state); only the epoch shuffle pays its inherent
  *    one range-partitioned sort.
  */
object Sampling {

  /** Deterministic bucket in [0, 100): first 8 md5 hex chars of the key as
    * an integer, mod 100. ~Uniform for any key with entropy (doc ids,
    * URLs, content hashes). */
  def splitBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Train/val/test assignment from the bucket: [0,trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val b = splitBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic ~pct% sample: keep rows whose bucket falls below `pct`.
    * Unlike df.sample(), a task retry or a re-run selects the SAME rows. */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(splitBucket(key) < pct)

  /** Reproducible global shuffle for one training epoch: total order by the
    * seeded content hash of the key. Spark executes this as one
    * range-partitioned sort (sampled range boundaries, then per-partition
    * sorts) — the scalable way to get a stable pseudo-random order; change
    * the seed to get an independent order next epoch. */
  def epochShuffle(df: DataFrame, key: Column, seed: Long): DataFrame =
    df.orderBy(md5(concat(key.cast("string"), lit(seed.toString))))

  /** Stratified deterministic sample — the corpus-REBALANCING op: keep a
    * different percentage per stratum (downweight an overrepresented crawl
    * source, keep 100% of a scarce high-quality one). `pctByStratum` maps
    * stratum value → keep-percent; unlisted strata use `defaultPct`.
    * Same content-hash bucketing as [[splitBucket]], so it is a pure
    * map-side filter (no shuffle, no RNG state), retry/growth-stable, and
    * the same row keeps its in/out fate when rates for OTHER strata change. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p => require(p >= 0 && p <= 100))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(stratum === v, lit(p)).otherwise(acc)
    }
    df.filter(splitBucket(key) < pct)
  }
}
