package graft.tools

import graft.{SparkSpec, Tables}

/** Differential fuzzing, layer 1: the same generated case executed through
  * two independent Spark front-ends — the DataFrame-API plan builder and the
  * SQL parser — must agree exactly. (Layer 2, the true cross-engine check,
  * is registry query q70: the driver runs the generated SQL in DuckDB.) */
class FuzzSpec extends SparkSpec {

  test("200 seeded cases: DataFrame-API plan ≡ SQL-parsed plan, row for row") {
    Tables.registerAll(spark, graft.SparkSpec.sfDir)
    val cases = Fuzz.gen(seed = 20260812L, n = 200)
    val diverged = cases.filterNot { c =>
      val a = Fuzz.df(spark, graft.SparkSpec.sfDir, c)
        .collect().map(_.toString).sorted.toSeq
      val b = spark.sql(Fuzz.sql(c)).collect().map(_.toString).sorted.toSeq
      a == b
    }
    assert(diverged.isEmpty,
      s"diverged cases:\n${diverged.map(c => s"${c.id}: ${Fuzz.sql(c)}").mkString("\n")}")
  }

  test("generation is deterministic and covers predicates, groups, joins") {
    val a = Fuzz.gen(7L, 50)
    val b = Fuzz.gen(7L, 50)
    assert(a === b)
    assert(a.exists(_.preds.nonEmpty) && a.exists(_.preds.isEmpty))
    assert(a.exists(_.groups.nonEmpty) && a.exists(_.groups.isEmpty))
    assert(a.exists(_.rel.tables.length == 2) && a.exists(_.rel.tables.length == 1))
    assert(a.exists(_.groups.exists(_.isInstanceOf[Fuzz.YearKey])))  // expr keys
    assert(a.exists(_.having.nonEmpty) && a.exists(_.having.isEmpty)) // HAVING
    assert(a.exists(_.topK.nonEmpty) && a.exists(_.topK.isEmpty))     // ORDER BY+LIMIT
    assert(a.exists(_.aggs.exists(_.fn == "count_distinct")))         // DISTINCT aggs
    assert(a.exists(_.rel.leftJoin))                                  // LEFT OUTER join
    assert(a.exists(_.preds.exists(_.isInstanceOf[Fuzz.StrLike])))    // LIKE prefixes
    assert(a.exists(_.window.nonEmpty))                               // W1 row_number dedup
    assert(a.exists(c => c.window.exists(_.partKeys.nonEmpty)) &&
      a.exists(c => c.window.exists(_.partKeys.isEmpty)))             // global + partitioned
    val ops = a.flatMap(_.setOp.map(_._1)).toSet                      // set operators
    assert(Set("UNION ALL", "UNION", "INTERSECT", "EXCEPT").subsetOf(ops) ||
      ops.size >= 3, s"set-op coverage too thin in 50 cases: $ops")
    assert(Fuzz.gen(8L, 50) !== a) // different seed, different batch
    // singleAgg mode really is single-measure (q70's contract)
    assert(Fuzz.gen(70L, 30, singleAgg = true).forall(_.aggs.length == 1))
  }
}
