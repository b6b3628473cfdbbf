package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Hidden-partitioning pruning (SURVEY.md §2.1 D4) — the reader half of the
  * reference's `PARTITION BY DAY(ts)` Iceberg transform
  * (clinicdata.sql:41-51, finance_example.sql:25): users filter the BASE
  * timestamp column and partition pruning still happens.
  *
  * Writers (Catalog.ctasDayPartitioned) store a derived `<col>_day` DATE
  * partition column next to the timestamp `<col>`. This rule closes the read
  * gap: any Filter over a relation exposing both `X` (timestamp) and
  * `X_day` (date) gets day-granularity bounds derived from its conjuncts on
  * `X` — `ts >= L` ⇒ `ts_day >= date(L)`, `ts <= U` ⇒ `ts_day <= date(U)`,
  * `ts = v` ⇒ `ts_day = date(v)` — ANDed in. The derived predicates are a
  * day-granularity superset of the originals (original conjuncts stay), so
  * results are unchanged while FileSourceStrategy lifts the `X_day` bounds
  * into the scan's PartitionFilters and the file index skips whole
  * partitions. Timestamp→date uses the session time zone, matching what
  * `to_date` wrote on the write path.
  *
  * The rule is convention-driven (no registry): a relation that materializes
  * `X_day: date` beside `X: timestamp` opts its readers in — at 100 TB this
  * is the difference between scanning a day and scanning years.
  */
object HiddenPartitionPruning extends Rule[LogicalPlan] with PredicateHelper {

  val suffix = "_day"

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val byName = child.output.groupBy(_.name.toLowerCase).collect {
        case (n, Seq(a)) => n -> a
      }
      def dayOf(e: Expression): Option[Attribute] = e match {
        case a: Attribute if a.dataType == TimestampType ||
            a.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          byName.get(a.name.toLowerCase + suffix).filter(_.dataType == DateType)
        case _ => None
      }
      val conjuncts = splitConjunctivePredicates(cond)
      def asDate(l: Literal): Expression =
        Cast(l, DateType, Some(conf.sessionLocalTimeZone))
      val derived = conjuncts.flatMap {
        case GreaterThanOrEqual(a, l: Literal) =>
          dayOf(a).map(d => GreaterThanOrEqual(d, asDate(l)))
        case GreaterThan(a, l: Literal) =>
          dayOf(a).map(d => GreaterThanOrEqual(d, asDate(l)))
        case LessThanOrEqual(a, l: Literal) =>
          dayOf(a).map(d => LessThanOrEqual(d, asDate(l)))
        case LessThan(a, l: Literal) =>
          dayOf(a).map(d => LessThanOrEqual(d, asDate(l)))
        case EqualTo(a, l: Literal) =>
          dayOf(a).map(d => EqualTo(d, asDate(l)))
        // literal-first mirrors
        case GreaterThanOrEqual(l: Literal, a) =>
          dayOf(a).map(d => LessThanOrEqual(d, asDate(l)))
        case GreaterThan(l: Literal, a) =>
          dayOf(a).map(d => LessThanOrEqual(d, asDate(l)))
        case LessThanOrEqual(l: Literal, a) =>
          dayOf(a).map(d => GreaterThanOrEqual(d, asDate(l)))
        case LessThan(l: Literal, a) =>
          dayOf(a).map(d => GreaterThanOrEqual(d, asDate(l)))
        case EqualTo(l: Literal, a) =>
          dayOf(a).map(d => EqualTo(d, asDate(l)))
        case _ => None
      }
      // idempotence: add nothing the filter already contains (the user batch
      // runs to fixed point; without the guard bounds would stack forever)
      val fresh = derived
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), child)
  }

  /** Idempotently install into the session's optimizer. */
  def install(spark: SparkSession): Unit =
    ExtraOptimizations.mutate(spark) { existing =>
      if (existing.exists(_ eq this)) existing else existing :+ this
    }
}
