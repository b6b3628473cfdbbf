package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential query fuzzer (r5 VERDICT next-round #4): seeded random
  * filter+groupBy+agg queries — numeric/IN/LIKE-prefix predicates,
  * plain and year(date) expression group keys,
  * count(DISTINCT) measures, optional HAVING group-size gates, optional
  * top-k slices (ORDER BY measure with a full group-key tiebreak + LIMIT,
  * so the surviving row set is total-order deterministic),
  * W1-shaped row_number window dedup (keep-first per partition, primary-key
  * tiebreak — the registry's most load-bearing pattern, repeated 6× across
  * the reference pipelines), set-op cases (two predicate branches over the
  * same aggregate combined with UNION / UNION ALL / INTERSECT / EXCEPT,
  * stressing distinct-row and NULL-equality semantics),
  * 1- and 2-table relations including a LEFT OUTER join whose right-side
  * measures exercise null-group aggregation — each rendered TWICE —
  * as a DataFrame-API plan and as ANSI SQL that both Spark and DuckDB parse.
  * FuzzSpec compares the two Spark paths for ≥200 cases (parser vs API plan
  * construction); registry query q70 union-alls a case batch so the driver's
  * DuckDB run is a true cross-engine differential. This catches the class of
  * bug a fixed query registry cannot: the generator explores predicate/
  * grouping/measure combinations nobody hand-wrote.
  *
  * Oracle-parity rules baked into rendering (hard-won, see memory notes):
  * sums/min/max of 2-decimal money columns round to 2 (true values are exact
  * 2dp so the rounding is a no-op on the true value); avg rounds to 6 —
  * wide enough that terminating rationals (n = 2^a·5^b) sit strictly inside
  * a 6dp cell and non-terminating ones essentially never land within double
  * error of a boundary, so HALF_UP (Spark) vs C-round (DuckDB) agree.
  */
object Fuzz {

  sealed trait Dom
  final case class NumDom(lo: Double, hi: Double, int: Boolean) extends Dom
  final case class StrDom(values: Seq[String]) extends Dom

  final case class ColSpec(name: String, dom: Dom)

  /** A relation the generator can query: one table or a 2-table equi-join.
    * `dateCols` feed expression group keys (`year(c)`). `leftJoin` makes the
    * 2-table form a LEFT OUTER join — its filterCols must then come from the
    * LEFT table only (a right-side predicate would silently re-create inner
    * semantics), and its right-side measures exercise the null-group agg
    * rules (sum/avg of an all-null group is NULL, count skips nulls). */
  final case class Rel(tables: Seq[String], joinOn: Seq[(String, String)],
                       groupCols: Seq[String], measureCols: Seq[String],
                       filterCols: Seq[ColSpec], dateCols: Seq[String] = Nil,
                       leftJoin: Boolean = false,
                       /** primary key — the deterministic row_number tiebreak
                         * for window cases (empty = no window cases here). */
                       uniqueKey: Seq[String] = Nil)

  private val qty = ColSpec("l_quantity", NumDom(1, 50, int = true))
  private val eprice = ColSpec("l_extendedprice", NumDom(900, 100000, int = false))
  private val disc = ColSpec("l_discount", NumDom(0, 0.1, int = false))
  private val rflag = ColSpec("l_returnflag", StrDom(Seq("A", "N", "R")))
  private val lstat = ColSpec("l_linestatus", StrDom(Seq("F", "O")))
  private val ototal = ColSpec("o_totalprice", NumDom(800, 500000, int = false))
  private val ostat = ColSpec("o_orderstatus", StrDom(Seq("F", "O", "P")))
  private val oprio = ColSpec("o_orderpriority",
    StrDom(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
  private val cbal = ColSpec("c_acctbal", NumDom(-1000, 10000, int = false))
  private val cseg = ColSpec("c_mktsegment",
    StrDom(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))
  private val cnat = ColSpec("c_nationkey", NumDom(0, 24, int = true))
  private val psize = ColSpec("p_size", NumDom(1, 50, int = true))
  private val pprice = ColSpec("p_retailprice", NumDom(900, 2000, int = false))
  private val pbrand = ColSpec("p_brand",
    StrDom(for { a <- 1 to 5; b <- 1 to 5 } yield s"Brand#$a$b"))
  private val sbal = ColSpec("s_acctbal", NumDom(-1000, 10000, int = false))
  private val snat = ColSpec("s_nationkey", NumDom(0, 24, int = true))

  val rels: Seq[Rel] = Seq(
    Rel(Seq("lineitem"), Nil,
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      Seq(qty, eprice, disc, rflag, lstat), dateCols = Seq("l_shipdate"),
      uniqueKey = Seq("l_orderkey", "l_linenumber")),
    Rel(Seq("orders"), Nil,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq("o_totalprice"),
      Seq(ototal, ostat, oprio), dateCols = Seq("o_orderdate"),
      uniqueKey = Seq("o_orderkey")),
    Rel(Seq("customer"), Nil,
      Seq("c_mktsegment", "c_nationkey"),
      Seq("c_acctbal"),
      Seq(cbal, cseg, cnat), uniqueKey = Seq("c_custkey")),
    Rel(Seq("part"), Nil,
      Seq("p_brand", "p_size"),
      Seq("p_retailprice", "p_size"),
      Seq(psize, pprice, pbrand), uniqueKey = Seq("p_partkey")),
    Rel(Seq("supplier"), Nil,
      Seq("s_nationkey"),
      Seq("s_acctbal"),
      Seq(sbal, snat), uniqueKey = Seq("s_suppkey")),
    Rel(Seq("lineitem", "orders"), Seq("l_orderkey" -> "o_orderkey"),
      Seq("l_returnflag", "o_orderstatus", "o_orderpriority"),
      Seq("l_quantity", "l_extendedprice", "o_totalprice"),
      Seq(qty, disc, ototal, ostat, rflag)),
    Rel(Seq("orders", "customer"), Seq("o_custkey" -> "c_custkey"),
      Seq("o_orderpriority", "c_mktsegment", "c_nationkey"),
      Seq("o_totalprice", "c_acctbal"),
      Seq(ototal, cseg, cbal, oprio)),
    Rel(Seq("customer", "nation"), Seq("c_nationkey" -> "n_nationkey"),
      Seq("c_mktsegment", "n_name"),
      Seq("c_acctbal"),
      Seq(cbal, cseg)),
    Rel(Seq("lineitem", "part"), Seq("l_partkey" -> "p_partkey"),
      Seq("l_returnflag", "p_brand"),
      Seq("l_extendedprice", "p_retailprice"),
      Seq(qty, pbrand, psize, rflag)),
    // LEFT OUTER: ~1/3 of TPC-H customers have no orders, so the right side
    // is genuinely null for them; right-side measures hit the null-group
    // agg rules (sum/avg NULL, count skips) and count(*) still counts the
    // unmatched row. Filters stay on the LEFT table by contract.
    Rel(Seq("customer", "orders"), Seq("c_custkey" -> "o_custkey"),
      Seq("c_mktsegment", "c_nationkey"),
      Seq("o_totalprice"),
      Seq(cbal, cseg, cnat), leftJoin = true))

  sealed trait Pred { def colName: String }
  final case class Cmp(colName: String, op: String, v: Double, int: Boolean) extends Pred
  final case class Between(colName: String, lo: Double, hi: Double, int: Boolean) extends Pred
  final case class StrEq(colName: String, v: String) extends Pred
  final case class StrIn(colName: String, vs: Seq[String]) extends Pred
  /** `col LIKE 'prefix%'` — ASCII prefixes drawn from real domain values,
    * so the pattern semantics are identical across engines. */
  final case class StrLike(colName: String, prefix: String) extends Pred

  /** fn ∈ sum/avg/min/max/count/count_star. */
  final case class Agg(fn: String, colName: String, alias: String)

  /** Group key: a plain column, or year(dateCol) — the expression-group-by
    * shape (both engines return the integer year, so no float parity risk). */
  sealed trait GKey { def alias: String; def sqlExpr: String }
  final case class PlainKey(name: String) extends GKey {
    def alias: String = name; def sqlExpr: String = name
  }
  final case class YearKey(c: String) extends GKey {
    def alias: String = s"y_$c"; def sqlExpr: String = s"year($c)"
  }

  /** W1-shaped window case: keep the first row per partition by
    * `orderCol` (desc/asc) with the relation's uniqueKey as tiebreak — the
    * keep-latest/keep-earliest dedup the reference repeats across pipelines
    * (clinicdata.sql:145-161 et al.). Output: partition keys + kept measure
    * (aliased m0). Deterministic because the tiebreak is a primary key. */
  final case class WinSpec(partKeys: Seq[String], orderCol: String, desc: Boolean)

  final case class FuzzCase(id: String, rel: Rel, preds: Seq[Pred],
                            groups: Seq[GKey], aggs: Seq[Agg],
                            having: Option[Int] = None,
                            topK: Option[Int] = None,
                            window: Option[WinSpec] = None,
                            /** (set operator, second branch's predicates):
                              * branch A = `preds`, branch B = `_2`, same
                              * groups/aggs both sides. */
                            setOp: Option[(String, Seq[Pred])] = None)

  // --- generation -----------------------------------------------------------

  def gen(seed: Long, n: Int, singleAgg: Boolean = false): Seq[FuzzCase] =
    (0 until n).map { i =>
      val rng = new scala.util.Random(seed * 1000003L + i)
      val rel = rels(rng.nextInt(rels.length))
      val preds = rng.shuffle(rel.filterCols).take(rng.nextInt(3))
        .map(mkPred(rng, _)).toSeq
      val plain: Seq[GKey] =
        rng.shuffle(rel.groupCols).take(rng.nextInt(3)).map(PlainKey.apply).toSeq
      // ~1 in 3 cases over a dated relation also group by year(dateCol)
      val groups = plain ++ (if (rel.dateCols.nonEmpty && rng.nextInt(3) == 0)
        Seq(YearKey(rel.dateCols(rng.nextInt(rel.dateCols.length)))) else Nil)
      val nAgg = if (singleAgg) 1 else 1 + rng.nextInt(3)
      val aggs = (0 until nAgg).map { j =>
        val fn = Seq("sum", "avg", "min", "max", "count", "count_star",
          "count_distinct")(rng.nextInt(7))
        Agg(fn, rel.measureCols(rng.nextInt(rel.measureCols.length)), s"m$j")
      }
      // ~1 in 4 grouped cases gate on group size (HAVING count(*) >= n —
      // integer compare, no cross-engine float parity risk)
      val having = if (groups.nonEmpty && rng.nextInt(4) == 0)
        Some(2 + rng.nextInt(4)) else None
      // ~1 in 4 grouped cases take a top-k slice. LIMIT changes WHICH rows
      // survive, so the order must be total: the measure desc, then every
      // group key asc (keys are unique per group ⇒ no tie survives; string
      // keys compare binary/ASCII identically in Spark and DuckDB).
      val topK = if (groups.nonEmpty && rng.nextInt(4) == 0)
        Some(3 + rng.nextInt(5)) else None
      // case kind: ~1/5 W1 window-dedup (keyed rels only), ~1/5 set-op,
      // else the plain filter+groupBy+agg shape
      rng.nextInt(5) match {
        case 0 if rel.uniqueKey.nonEmpty =>
          val parts = rng.shuffle(rel.groupCols).take(rng.nextInt(3)).toSeq
          val ord = rel.measureCols(rng.nextInt(rel.measureCols.length))
          FuzzCase(f"f$i%03d", rel, preds, parts.map(PlainKey.apply),
            Seq(Agg("window_keep", ord, "m0")),
            window = Some(WinSpec(parts, ord, rng.nextBoolean())))
        case 1 =>
          val predsB = rng.shuffle(rel.filterCols).take(rng.nextInt(3))
            .map(mkPred(rng, _)).toSeq
          val op = Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT")(rng.nextInt(4))
          FuzzCase(f"f$i%03d", rel, preds, groups, aggs,
            setOp = Some((op, predsB)))
        case _ =>
          FuzzCase(f"f$i%03d", rel, preds, groups, aggs, having, topK)
      }
    }

  private def num2(v: Double): Double = math.rint(v * 100) / 100

  private def mkPred(rng: scala.util.Random, cs: ColSpec): Pred = cs.dom match {
    case NumDom(lo, hi, int) =>
      def draw(): Double = {
        val x = lo + rng.nextDouble() * (hi - lo)
        if (int) math.round(x).toDouble else num2(x)
      }
      rng.nextInt(5) match {
        case 4 =>
          val (a, b) = (draw(), draw())
          Between(cs.name, math.min(a, b), math.max(a, b), int)
        case k =>
          Cmp(cs.name, Seq("<", "<=", ">", ">=")(k), draw(), int)
      }
    case StrDom(vs) =>
      rng.nextInt(3) match {
        case 0 if vs.length >= 3 =>
          StrIn(cs.name, rng.shuffle(vs).take(2 + rng.nextInt(2)).sorted.toSeq)
        case 1 =>
          val v = vs(rng.nextInt(vs.length))
          StrLike(cs.name, v.take(1 + rng.nextInt(math.min(3, v.length))))
        case _ => StrEq(cs.name, vs(rng.nextInt(vs.length)))
      }
  }

  // --- DataFrame-API rendering ---------------------------------------------

  private def keyCol(k: GKey): Column = k match {
    case PlainKey(n) => col(n)
    case YearKey(c) => year(col(c)).as(s"y_$c")
  }

  def df(s: SparkSession, dir: String, c: FuzzCase): DataFrame = {
    var d = graft.Tables(s, dir, c.rel.tables.head)
    val joinType = if (c.rel.leftJoin) "left" else "inner"
    c.rel.tables.tail.zip(c.rel.joinOn).foreach { case (tb, (lk, rk)) =>
      d = d.join(graft.Tables(s, dir, tb), col(lk) === col(rk), joinType)
    }
    val filtered = c.preds.foldLeft(d)((acc, p) => acc.filter(predCol(p)))

    c.window.foreach { w =>
      val order = (if (w.desc) col(w.orderCol).desc else col(w.orderCol).asc) +:
        c.rel.uniqueKey.map(col(_).asc)
      // Global keep-first (no partition keys) must NOT render as a
      // partition-less Window — that moves the whole relation to one
      // partition. row_number()=1 over a total order is just the first row
      // of that order: orderBy().limit(1) = TakeOrderedAndProject, parallel
      // partial top-1 per partition, no single-partition shuffle.
      if (w.partKeys.isEmpty)
        return filtered.orderBy(order: _*).limit(1)
          .select(col(w.orderCol).as("m0"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(w.partKeys.map(col): _*).orderBy(order: _*)
      return filtered.withColumn("__rn", row_number().over(win))
        .filter(col("__rn") === 1)
        .select(w.partKeys.map(col) :+ col(w.orderCol).as("m0"): _*)
    }

    val aggCols = c.aggs.map(aggCol)
    def grouped(src: DataFrame): DataFrame =
      if (c.groups.isEmpty) src.agg(aggCols.head, aggCols.tail: _*)
      else src.groupBy(c.groups.map(keyCol): _*).agg(aggCols.head, aggCols.tail: _*)

    c.setOp.foreach { case (op, predsB) =>
      val a = grouped(filtered)
      val b = grouped(predsB.foldLeft(d)((acc, p) => acc.filter(predCol(p))))
      return op match {
        case "UNION ALL" => a.union(b)
        case "UNION" => a.union(b).distinct()
        case "INTERSECT" => a.intersect(b)
        case "EXCEPT" => a.except(b)
      }
    }

    val aggregated = c.having match {
      case None => grouped(filtered)
      case Some(n) =>
        filtered.groupBy(c.groups.map(keyCol): _*)
          .agg(aggCols.head, (aggCols.tail :+ count(lit(1)).as("__hc")): _*)
          .filter(col("__hc") >= n)
          .drop("__hc")
    }
    c.topK match {
      case Some(k) =>
        aggregated.orderBy(col(c.aggs.head.alias).desc +:
          c.groups.map(g => col(g.alias).asc): _*).limit(k)
      case None => aggregated
    }
  }

  private def predCol(p: Pred): Column = p match {
    case Cmp(c, "<", v, _) => col(c) < v
    case Cmp(c, "<=", v, _) => col(c) <= v
    case Cmp(c, ">", v, _) => col(c) > v
    case Cmp(c, ">=", v, _) => col(c) >= v
    case Cmp(_, op, _, _) => throw new IllegalArgumentException(op)
    case Between(c, lo, hi, _) => col(c).between(lo, hi)
    case StrEq(c, v) => col(c) === v
    case StrIn(c, vs) => col(c).isin(vs: _*)
    case StrLike(c, p) => col(c).like(s"$p%")
  }

  private def aggCol(a: Agg): Column = (a.fn match {
    case "sum" => round(sum(col(a.colName)), 2)
    case "avg" => round(avg(col(a.colName)), 6)
    case "min" => round(min(col(a.colName)), 2)
    case "max" => round(max(col(a.colName)), 2)
    case "count" => count(col(a.colName))
    case "count_star" => count(lit(1))
    case "count_distinct" => count_distinct(col(a.colName))
  }).as(a.alias)

  // --- SQL rendering (Spark SQL ∩ DuckDB) ----------------------------------

  private def numLit(v: Double, int: Boolean): String =
    if (int) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  private def predSql(p: Pred): String = p match {
    case Cmp(c, op, v, i) => s"$c $op ${numLit(v, i)}"
    case Between(c, lo, hi, i) => s"$c BETWEEN ${numLit(lo, i)} AND ${numLit(hi, i)}"
    case StrEq(c, v) => s"$c = '$v'"
    case StrIn(c, vs) => s"$c IN (${vs.map(v => s"'$v'").mkString(", ")})"
    case StrLike(c, p) => s"$c LIKE '$p%'"
  }

  private def aggSql(a: Agg): String = (a.fn match {
    case "sum" => s"round(sum(${a.colName}), 2)"
    case "avg" => s"round(avg(${a.colName}), 6)"
    case "min" => s"round(min(${a.colName}), 2)"
    case "max" => s"round(max(${a.colName}), 2)"
    case "count" => s"count(${a.colName})"
    case "count_star" => "count(*)"
    case "count_distinct" => s"count(DISTINCT ${a.colName})"
  }) + s" AS ${a.alias}"

  private def fromSql(c: FuzzCase): String = {
    val head = c.rel.tables.head
    val kw = if (c.rel.leftJoin) "LEFT JOIN" else "JOIN"
    c.rel.tables.tail.zip(c.rel.joinOn).foldLeft(head) {
      case (acc, (tb, (lk, rk))) => s"$acc $kw $tb ON $lk = $rk"
    }
  }

  def sql(c: FuzzCase): String = {
    def whereOf(ps: Seq[Pred]): String =
      if (ps.isEmpty) "" else " WHERE " + ps.map(predSql).mkString(" AND ")

    c.window.foreach { w =>
      val dirKw = if (w.desc) "DESC" else "ASC"
      // Mirror of the DataFrame render: global keep-first is ORDER BY ...
      // LIMIT 1 (same rows; scalable plan in the Spark-SQL dual path too).
      if (w.partKeys.isEmpty)
        return s"SELECT ${w.orderCol} AS m0 FROM ${fromSql(c)}" +
          s"${whereOf(c.preds)} ORDER BY ${w.orderCol} $dirKw, " +
          s"${c.rel.uniqueKey.mkString(", ")} LIMIT 1"
      val part = s"PARTITION BY ${w.partKeys.mkString(", ")} "
      val inner = (w.partKeys :+ s"${w.orderCol} AS m0").mkString(", ") +
        s", row_number() OVER (${part}ORDER BY ${w.orderCol} $dirKw, " +
        s"${c.rel.uniqueKey.mkString(", ")}) AS rn"
      val outer = (w.partKeys :+ "m0").mkString(", ")
      return s"SELECT $outer FROM (SELECT $inner FROM ${fromSql(c)}" +
        s"${whereOf(c.preds)}) w WHERE rn = 1"
    }

    val keys = c.groups.map {
      case PlainKey(n) => n
      case k @ YearKey(_) => s"${k.sqlExpr} AS ${k.alias}"
    }
    val select = (keys ++ c.aggs.map(aggSql)).mkString(", ")
    def branch(ps: Seq[Pred]): String = {
      val group =
        if (c.groups.isEmpty) "" else " GROUP BY " + c.groups.map(_.sqlExpr).mkString(", ")
      s"SELECT $select FROM ${fromSql(c)}${whereOf(ps)}$group"
    }

    c.setOp.foreach { case (op, predsB) =>
      return s"${branch(c.preds)} $op ${branch(predsB)}"
    }

    val having = c.having.map(n => s" HAVING count(*) >= $n").getOrElse("")
    val order = c.topK.map { k =>
      val tiebreak = c.groups.map(_.alias).mkString(", ")
      s" ORDER BY ${c.aggs.head.alias} DESC, $tiebreak LIMIT $k"
    }.getOrElse("")
    s"${branch(c.preds)}$having$order"
  }

  /** Normalized single-measure projection for the cross-engine union (q70):
    * (case_id, concat-of-group-keys, measure-as-double). */
  def normalizedDf(s: SparkSession, dir: String, c: FuzzCase): DataFrame = {
    val d = df(s, dir, c)
    val k = if (c.groups.isEmpty) lit("")
            else concat_ws("|", c.groups.map(g => col(g.alias).cast("string")): _*)
    d.select(lit(c.id).as("case_id"), k.as("k"),
      col(c.aggs.head.alias).cast("double").as("v"))
  }

  def normalizedSql(c: FuzzCase): String = {
    val k = if (c.groups.isEmpty) "''"
            else "concat_ws('|', " + c.groups.map(g => s"CAST(${g.alias} AS VARCHAR)").mkString(", ") + ")"
    s"SELECT '${c.id}' AS case_id, $k AS k, CAST(${c.aggs.head.alias} AS DOUBLE) AS v " +
      s"FROM (${sql(c)})"
  }

  /** Ad-hoc differential run: DataFrame-API plan vs spark.sql over the same
    * generated case — prints a summary, exits non-zero on divergence. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val seed = args.lift(1).map(_.toLong).getOrElse(20260812L)
    val n = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .appName("graft-fuzz").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      graft.Tables.registerAll(spark, dir)
      val bad = gen(seed, n).filterNot { c =>
        val a = df(spark, dir, c).collect().map(_.toString).sorted.toSeq
        val b = spark.sql(sql(c)).collect().map(_.toString).sorted.toSeq
        val ok = a == b
        if (!ok) println(s"[fuzz] DIVERGED ${c.id}: ${sql(c)}")
        ok
      }
      println(s"[fuzz] ${n - bad.length}/$n cases agree (seed=$seed)")
      if (bad.nonEmpty) sys.exit(1)
    } finally spark.stop()
  }
}
