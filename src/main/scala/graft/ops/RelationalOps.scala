package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Reusable relational operators re-expressing the reference's SQL patterns
  * (SURVEY.md §2) as composable DataFrame transformations.
  *
  * Scale notes (100 TB design intent):
  *  - Every helper here compiles to a single declarative logical plan —
  *    Catalyst keeps predicate pushdown / column pruning / join selection.
  *  - Window-based dedup shuffles ONCE on the partition keys; at scale that
  *    shuffle is unavoidable (it defines the semantics) but is linear.
  *  - Interval joins keep the equi key in the join condition so Spark hashes
  *    on it; the range predicate is evaluated post-probe (SURVEY.md §4.3).
  */
object RelationalOps {

  /** W1 — keep-latest dedup (reference: clinicdata.sql:145-161, the most
    * repeated pattern). Deterministic: pass a total order (include a unique
    * tiebreak column). One shuffle on `keys`; prefer over dropDuplicates,
    * which is nondeterministic about which row survives.
    */
  def dedupKeepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1 variant — keep-earliest (reference: semantics.sql:139-151). */
  def dedupKeepEarliest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    dedupKeepLatest(df, keys, order) // caller passes ascending order cols

  /** J6 — anti join (reference FK-violation probe, manufacturing.sql:220-225).
    * Uses Spark's left_anti (hash-based, no null-prone post-filter). */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Semi join (EXISTS). */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** J4 — interval/range join: equi on `equiCond` + event time within
    * [lower, upper]. The equi key bounds the blowup; Spark builds the hash
    * table on the equi key and evaluates the range as a post-probe filter
    * (reference: clinicdata.sql:294-297, manufacturing.sql:195-198).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, equiCond: Column,
                   ts: Column, lower: Column, upper: Column,
                   joinType: String = "inner"): DataFrame =
    left.join(right, equiCond && ts.between(lower, upper), joinType)

  /** W2 — n-row trailing rolling aggregate over a daily-grain frame
    * (reference: retail.sql:230-240, ROWS BETWEEN 6 PRECEDING AND CURRENT ROW).
    */
  def rollingSum(df: DataFrame, value: Column, out: String,
                 partition: Seq[Column], order: Seq[Column], precedingRows: Int): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-precedingRows, Window.currentRow)
    df.withColumn(out, sum(value).over(w))
  }

  /** J5→W3 — successive-row pairing via lead() (the idiomatic rewrite of the
    * reference's rn self-join, manufacturing.sql:289-317): one window pass
    * instead of a second shuffle+join. */
  def leadCol(df: DataFrame, value: Column, out: String,
              partition: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn(out, lead(value, 1).over(Window.partitionBy(partition: _*).orderBy(order: _*)))

  /** A14 — guarded-ratio KPI: CASE WHEN denom > 0 THEN num/denom END
    * (reference: clinicdata.sql:328-335, insurance_example.sql:123-131). */
  def guardedRatio(num: Column, denom: Column): Column =
    when(denom > 0, num / denom)

  /** A4 — conditional sum: SUM(CASE WHEN cond THEN x ELSE 0 END). */
  def sumIf(cond: Column, x: Column): Column = sum(when(cond, x).otherwise(lit(0)))

  /** A5/A6 — null-skipping conditional count (= COUNT(*) FILTER (WHERE c)). */
  def countIf(cond: Column): Column = count(when(cond, lit(1)))

  /** A7 — per-group existence flag: MAX(CASE WHEN cond THEN 1 ELSE 0 END). */
  def existsFlag(cond: Column): Column = max(when(cond, lit(1)).otherwise(lit(0)))

  /** A8 — rate of a boolean condition (AVG of 0/1 flag). */
  def rate(cond: Column): Column = avg(when(cond, lit(1)).otherwise(lit(0)))

  /** A12 — LISTAGG(DISTINCT col, sep) with deterministic ordering
    * (reference: media_ai.sql:195). */
  def listaggDistinct(c: Column, sep: String): Column =
    array_join(sort_array(collect_set(c)), sep)

  /** As-of join: each left row enriched with the LATEST right row whose
    * timestamp is at or before the left row's, per key — temporal
    * nearest-predecessor matching (attribution, point-in-time feature
    * lookup, quote-to-trade alignment). Spark has no native ASOF JOIN; the
    * naive `t_r <= t_l` theta-join explodes (every left row meets every
    * earlier right row before the per-group max is taken).
    *
    * This implementation is the scalable union+window form: tag both sides,
    * union, ONE shuffle on `keys`, and carry the most recent right payload
    * forward with `last(ignoreNulls)` over rows ≤ current. Cost is
    * sort-shuffle-linear in |left| + |right| — the same order as the
    * aggregation that would follow anyway — and AQE handles key skew.
    *
    * Right rows sort before left rows at equal timestamps, so a right row
    * AT the left timestamp matches (inclusive as-of, DuckDB/kdb semantics).
    * If several right rows share (key, ts), the LAST in `tiebreak`-ascending
    * order wins; pass a unique tiebreak (or pre-dedupe) for determinism.
    *
    * Output: every left column, plus each `rightPayload` column as
    * `<prefix><name>` (null when no predecessor exists), plus
    * `<prefix><rightTs>` = the matched row's timestamp.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightPayload: Seq[String],
               prefix: String = "asof_", tiebreak: Seq[String] = Nil): DataFrame = {
    val rFields = (rightTs +: rightPayload).distinct
    val rStruct = struct(rFields.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__src"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__src"),
        lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
        rStruct.as("__r")): _*)
    val order = (col("__ts").asc +: col("__src").asc +:
      tiebreak.map(t => col("__r").getField(t).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(col("__l.*") +:
        (rightTs +: rightPayload.filterNot(_ == rightTs)).map(f =>
          col("__m").getField(f).as(prefix + f)): _*)
  }
}
