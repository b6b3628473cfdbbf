package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, DenseRank, EqualTo, Expression, Rank, RowNumber}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project, Window}
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.ops.ScaleOps

object WorkloadAdvisor {

  /** A hot-key diagnosis the advisor can act on. `kind` is `join-salt`
    * (actionable via [[WorkloadAdvisor.saltedRewrite]]: re-plan the observed
    * join with [[graft.ops.ScaleOps.saltedEquiJoin]] so the hot key's rows
    * spread over `buckets` reducers) or `window-argmax` (recommendation: a
    * rank-style window partitioned on a skewed key serializes the hot
    * partition through one task — rewrite keep-latest/top-1 shapes as a
    * `max(struct(...))` aggregation, the q91 pattern, which partial-aggregates
    * map-side). `hotShare` is the heaviest key's share of the profiled side's
    * rows; `buckets` the recommended salt count. */
  final case class SkewFinding(kind: String, fingerprint: String, key: String,
                               hotKey: String, hotShare: Double, buckets: Int,
                               seen: Long)
}

/** Autonomous reflection management (reference readme.md:381-389: the
  * enterprise engine "continuously monitors query workloads" to
  * "automatically create reflections for frequently queried views",
  * "refresh reflections based on data freshness needs", and "retire
  * reflections that are no longer useful").
  *
  * Spark-native shape: [[observe]] logs the canonical fingerprint of each
  * query's top aggregate subtree (the unit Dremio accelerates with an
  * aggregation reflection); [[autoMaterialize]] registers + refreshes a
  * materialization for every shape seen at least `minCount` times and
  * installs [[MaterializationSubstitution]], so the NEXT occurrence — or any
  * rollup/column-subset the substitution rule can derive from it — is served
  * from the materialized scan; [[retireStale]] drops reflections whose shape
  * stopped appearing. Observation is driver-side metadata only (a plan walk,
  * no data touched), so monitoring costs nothing at any data scale.
  *
  * The same monitor→act contract is applied to SKEW: [[observe]] also
  * records every single-key equi-join and every rank-style window subtree;
  * [[skewFindings]] profiles the recorded shapes' key distributions (one
  * bounded [[graft.ops.ScaleOps.keySkewProfile]] aggregation per shape — the
  * only data-touching step, and an explicit one) and diagnoses hot keys;
  * [[saltedRewrite]] acts on a join finding by re-planning it salted. At
  * 100 TB this closes the loop the reference's autonomous tier closes for
  * reflections: the engine notices the 30 %-hot-key join itself instead of a
  * human reading straggler task logs.
  */
final class WorkloadAdvisor(spark: SparkSession, mats: Materializations) {
  import WorkloadAdvisor.SkewFinding

  /** One observed aggregate shape. Keeps the first sighting's DataFrame as
    * the definition (immutable plan; `classic.Dataset.ofRows` is
    * private[sql], and the frame IS the plan). */
  private final class Shape(val definition: DataFrame) {
    var seen: Long = 0L
    var lastSeenTick: Long = 0L
    var materializedAs: Option[String] = None
  }

  private val shapes = scala.collection.mutable.LinkedHashMap.empty[String, Shape]
  private var tick = 0L

  /** One observed single-equi-key join (the unit the skew advisor can salt):
    * the child subtrees, the key attribute on each side, and the salt-safe
    * join type name. */
  private final class JoinShape(val left: LogicalPlan, val right: LogicalPlan,
                                val leftKey: AttributeReference,
                                val rightKey: AttributeReference,
                                val joinType: String) {
    var seen: Long = 0L
  }

  /** One observed rank-style window over a partition key (the serialize-one-
    * task-per-hot-key shape). */
  private final class WindowShape(val child: LogicalPlan,
                                  val partKey: AttributeReference) {
    var seen: Long = 0L
  }

  private val joinShapes =
    scala.collection.mutable.LinkedHashMap.empty[String, JoinShape]
  private val windowShapes =
    scala.collection.mutable.LinkedHashMap.empty[String, WindowShape]

  private def classic(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  /** Log the query's accelerable shape. The workload KEY is the canonical
    * topmost Aggregate subtree (the grain an aggregation reflection stores);
    * the recorded definition is the first sighting's frame. Returns `df`
    * unchanged so call sites can wrap transparently: `advisor.observe(q)`. */
  def observe(df: DataFrame): DataFrame = {
    val analyzed = classic(df).queryExecution.analyzed
    analyzed.collectFirst { case a: Aggregate => a }.foreach { agg =>
      val key = agg.canonicalized.toString
      synchronized {
        tick += 1
        val s = shapes.getOrElseUpdate(key, new Shape(df))
        s.seen += 1
        s.lastSeenTick = tick
      }
    }
    observeSkewShapes(analyzed)
    df
  }

  // --- skew monitoring (monitor → diagnose → act, ScaleOps as the actuator) --

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** (leftKey, rightKey) when the WHOLE join condition is one equi-comparison
    * between a bare column on each side — the only shape `saltedEquiJoin`
    * preserves exactly (extra conjuncts or expressions would be dropped by
    * the (key, salt) re-join). */
  private def singleEquiKey(l: LogicalPlan, r: LogicalPlan, cond: Expression)
      : Option[(AttributeReference, AttributeReference)] =
    conjuncts(cond) match {
      case Seq(EqualTo(a: AttributeReference, b: AttributeReference))
          if l.outputSet.contains(a) && r.outputSet.contains(b) => Some((a, b))
      case Seq(EqualTo(a: AttributeReference, b: AttributeReference))
          if r.outputSet.contains(a) && l.outputSet.contains(b) => Some((b, a))
      case _ => None
    }

  /** The join types `ScaleOps.saltedEquiJoin` accepts (right side is
    * replicated per salt, so right/full-outer would duplicate rows). */
  private def saltableType(jt: org.apache.spark.sql.catalyst.plans.JoinType)
      : Option[String] = jt match {
    case org.apache.spark.sql.catalyst.plans.Inner => Some("inner")
    case org.apache.spark.sql.catalyst.plans.LeftOuter => Some("left")
    case org.apache.spark.sql.catalyst.plans.LeftSemi => Some("left_semi")
    case org.apache.spark.sql.catalyst.plans.LeftAnti => Some("left_anti")
    case _ => None
  }

  private def observeSkewShapes(analyzed: LogicalPlan): Unit = analyzed.foreach {
    case j @ Join(l, r, jt, Some(cond), _) =>
      for (t <- saltableType(jt); (lk, rk) <- singleEquiKey(l, r, cond))
        synchronized {
          joinShapes.getOrElseUpdate(j.canonicalized.toString,
            new JoinShape(l, r, lk, rk, t)).seen += 1
        }
    case w: Window
        if w.windowExpressions.exists(_.exists {
          case _: RowNumber | _: Rank | _: DenseRank => true
          case _ => false
        }) =>
      w.partitionSpec.headOption.collect { case a: AttributeReference => a }
        .foreach { pk =>
          synchronized {
            windowShapes.getOrElseUpdate(w.canonicalized.toString,
              new WindowShape(w.child, pk)).seen += 1
          }
        }
    case _ =>
  }

  /** Heaviest key value and its row share on `plan`, via ONE
    * `keySkewProfile` aggregation over the projected key column. */
  private def profileKey(plan: LogicalPlan, key: AttributeReference)
      : Option[(String, Double)] = {
    val projected = Project(Seq(Alias(key, "__k")()), plan)
    ScaleOps.keySkewProfile(PlanBridge.ofRows(spark, projected), "__k", topN = 1)
      .collect().headOption
      .map(r => (String.valueOf(r.get(0)), r.getDouble(r.fieldIndex("share"))))
  }

  /** Diagnose hot keys across every skew shape seen at least `minCount`
    * times: profiles each recorded join's LEFT input (the side salting
    * spreads) and each window's child on its partition key, and reports the
    * shapes whose heaviest key holds ≥ `hotShare` of the rows. The
    * recommended `buckets` is clamped to [8, 64]: at least 8 so the hot
    * key's salt values spread over distinctly-hashed reducers even on small
    * clusters (fewer salts than partitions collide birthday-style), at most
    * 64 because the right side is replicated once per salt — a 64-way spread
    * already turns the one straggler into sub-2 % residual partitions, and
    * further replication costs more than it balances. This is the
    * data-touching step — one bounded aggregation per shape, run when asked,
    * like the reference's advisor jobs. */
  def skewFindings(hotShare: Double = 0.2, minCount: Int = 1): Seq[SkewFinding] = {
    val recorded = synchronized {
      joinShapes.toSeq.map { case (fp, s) =>
        ("join-salt", fp, s.left, s.leftKey, s.seen)
      } ++ windowShapes.toSeq.map { case (fp, s) =>
        ("window-argmax", fp, s.child, s.partKey, s.seen)
      }
    }
    val par = math.max(2, spark.sparkContext.defaultParallelism)
    recorded.filter(_._5 >= minCount).flatMap {
      case (kind, fp, plan, key, seen) =>
        profileKey(plan, key).collect {
          case (hk, share) if share >= hotShare =>
            val buckets = math.max(8, math.min(64, math.ceil(share * par).toInt))
            SkewFinding(kind, fp, key.name, hk, share, buckets, seen)
        }
    }
  }

  /** ACT on a `join-salt` finding: re-plan the observed join as
    * [[graft.ops.ScaleOps.saltedEquiJoin]] with the recommended bucket
    * count — identical rows (using-join shape: the key column appears once),
    * hot key spread over `buckets` reducers instead of serializing through
    * one. The right key is renamed to the left key's name so the
    * (key, salt) using-join resolves. */
  def saltedRewrite(f: SkewFinding): DataFrame = {
    require(f.kind == "join-salt", s"not a salt-actionable finding: ${f.kind}")
    val s = synchronized(joinShapes(f.fingerprint))
    val left = PlanBridge.ofRows(spark, s.left)
    val right0 = PlanBridge.ofRows(spark, s.right)
    val right = if (s.rightKey.name == s.leftKey.name) right0
                else right0.withColumnRenamed(s.rightKey.name, s.leftKey.name)
    ScaleOps.saltedEquiJoin(left, right, s.leftKey.name, f.buckets, s.joinType)
  }

  /** Shapes queried at least `minCount` times and not yet materialized —
    * what the autonomous engine would accelerate next. */
  def recommendations(minCount: Int = 3): Seq[(String, Long)] = synchronized {
    shapes.collect {
      case (key, s) if s.seen >= minCount && s.materializedAs.isEmpty =>
        key -> s.seen
    }.toSeq
  }

  /** Create + refresh a reflection for every recommendation, install the
    * substitution rule, and return the new reflection names. Subsequent
    * identical queries (and derivable rollups) hit the materialized scan. */
  def autoMaterialize(minCount: Int = 3): Seq[String] = {
    val created = synchronized {
      shapes.collect {
        case (key, s) if s.seen >= minCount && s.materializedAs.isEmpty =>
          val name = s"auto_rf_${math.abs(key.hashCode).toString}"
          s.materializedAs = Some(name)
          (name, s.definition)
      }.toSeq
    }
    created.foreach { case (name, definition) =>
      mats.register(name, () => definition)
      mats.refresh(name)
    }
    if (created.nonEmpty) MaterializationSubstitution.install(spark, mats)
    created.map(_._1)
  }

  /** Retire auto-created reflections whose shape hasn't been observed in the
    * last `maxIdleObservations` observe() calls; returns retired names. */
  def retireStale(maxIdleObservations: Long): Seq[String] = synchronized {
    val retired = shapes.collect {
      case (_, s) if s.materializedAs.isDefined &&
          tick - s.lastSeenTick > maxIdleObservations =>
        val name = s.materializedAs.get
        s.materializedAs = None
        name
    }.toSeq
    retired.foreach(mats.retire)
    retired
  }

  /** (fingerprint hash, times seen, materialized name) — the advisor's
    * monitoring view, the analog of the reference's reflection dashboard. */
  def workload(): Seq[(Int, Long, Option[String])] = synchronized {
    shapes.toSeq.map { case (key, s) => (key.hashCode, s.seen, s.materializedAs) }
  }
}
