package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Bounded ANALYZED-PLAN → SQL derivation for DataFrame-defined views
  * (SURVEY §2.1 D9 / Iceberg view interchange): a catalog view created
  * from a DataFrame has no SQL text to export, but its analyzed plan
  * often IS a plain relational query — project/filter/aggregate/sort/
  * limit/distinct/union over named tables, catalog views, or
  * single-rooted file relations (spelled `parquet.`/path``, Spark's
  * public path-table syntax). This derives that SQL bottom-up from the
  * plan using Catalyst's own `Expression.sql`, then VERIFIES it: the
  * regenerated query must re-analyze to the same schema and
  * `sameResult` plan. Anything unverifiable (joins — ambiguous
  * attribute names; UDFs; multi-root relations) returns None and the
  * export keeps its loud refusal-with-remedy.
  *
  * Spark removed its general plan→SQL builder precisely because full
  * de-analysis is unreliable — hence the bounded grammar AND the
  * re-analysis equivalence check: a derived SQL is recorded only when
  * Spark itself agrees it means the same thing. */
object ViewSql {

  /** The canonical SQL of `df`'s analyzed plan, or None when the plan is
    * outside the derivable grammar or fails re-analysis verification. */
  def derive(spark: SparkSession, df: DataFrame): Option[String] = {
    val plan = df.queryExecution.analyzed
    val gen =
      try toQuery(plan)
      catch { case scala.util.control.NonFatal(_) => None }
    gen.filter { sql =>
      try {
        val re = spark.sql(sql)
        re.schema == df.schema &&
          normalize(re.queryExecution.analyzed).sameResult(normalize(plan))
      } catch { case scala.util.control.NonFatal(_) => false }
    }
  }

  /** Strip qualifiers: an analyzed attribute prints as `src`.`col`, but
    * inside the generated subquery nesting only the bare name resolves. */
  private def bare(e: Expression): Expression = e.transform {
    case a: AttributeReference => a.withQualifier(Nil)
  }

  /** `sameResult` compares file relations by FileIndex identity (no
    * structural equality), so the original and the re-analyzed
    * `parquet.`/path`` relation never match — normalize both sides to a
    * paths-only index and empty options before comparing. */
  private def normalize(p: LogicalPlan): LogicalPlan = p.transform {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        lr.copy(relation = h.copy(
          location = PathsOnlyIndex(h.location.rootPaths.map(_.toString)),
          options = Map.empty)(h.sparkSession))
      case _ => lr
    }
  }

  private case class PathsOnlyIndex(roots: Seq[String]) extends FileIndex {
    override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
      roots.map(new org.apache.hadoop.fs.Path(_))
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = Nil
    override def inputFiles: Array[String] = Array.empty
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = 0L
    override def partitionSchema: StructType = new StructType()
  }

  private def toQuery(plan: LogicalPlan): Option[String] = {
    var k = 0
    def sub(p: LogicalPlan): Option[String] =
      q(p).map { s => k += 1; s"($s) __v$k" }
    def exprs(es: Seq[Expression]): String = es.map(bare(_).sql).mkString(", ")
    def q(p: LogicalPlan): Option[String] = p match {
      case Project(list, child) =>
        sub(child).map(f => s"SELECT ${exprs(list)} FROM $f")
      case Filter(cond, child) =>
        sub(child).map(f => s"SELECT * FROM $f WHERE ${bare(cond).sql}")
      case Aggregate(group, aggs, child, _) =>
        sub(child).map { f =>
          val g = if (group.isEmpty) "" else s" GROUP BY ${exprs(group)}"
          s"SELECT ${exprs(aggs)} FROM $f$g"
        }
      case s: Sort if s.global =>
        sub(s.child).map(f =>
          s"SELECT * FROM $f ORDER BY ${exprs(s.order)}")
      case GlobalLimit(Literal(n: Int, IntegerType),
          LocalLimit(Literal(m: Int, IntegerType), child)) if n == m =>
        sub(child).map(f => s"SELECT * FROM $f LIMIT $n")
      case Distinct(child) =>
        sub(child).map(f => s"SELECT DISTINCT * FROM $f")
      case u: Union if u.children.nonEmpty =>
        val parts = u.children.map(q)
        if (parts.exists(_.isEmpty)) None
        else Some(parts.flatten.map(s => s"($s)").mkString(" UNION ALL "))
      case SubqueryAlias(_, child) => q(child)
      case v: View => Some(s"SELECT * FROM ${v.desc.identifier.quotedString}")
      case lr: LogicalRelation => relationSql(lr)
      case r: DataSourceV2Relation =>
        for (c <- r.catalog; id <- r.identifier)
          yield s"SELECT * FROM ${c.name}.$id"
      case _ => None
    }
    q(plan)
  }

  /** A v1 relation: its catalog table name, or for file relations the
    * public path-table spelling over a SINGLE root. */
  private def relationSql(lr: LogicalRelation): Option[String] =
    lr.catalogTable
      .map(t => s"SELECT * FROM ${t.identifier.quotedString}")
      .orElse(lr.relation match {
        case h: HadoopFsRelation if h.location.rootPaths.size == 1 =>
          val fmt = h.fileFormat.toString.toLowerCase match {
            case f if f.contains("parquet") => Some("parquet")
            case f if f.contains("csv") => Some("csv")
            case f if f.contains("json") => Some("json")
            case f if f.contains("orc") => Some("orc")
            case _ => None
          }
          fmt.map(f => s"SELECT * FROM $f.`${h.location.rootPaths.head}`")
        case _ => None
      })
}
