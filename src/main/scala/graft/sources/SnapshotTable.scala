package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType,
  DoubleType, FloatType, IntegerType, LongType, ShortType, StringType,
  StructType, TimestampType}

object SnapshotTable {

  /** One data file of a commit manifest: path relative to the version dir,
    * footer record count, byte size, and per-column (min, max) value ranges
    * in canonical string form — the Iceberg manifest-entry stats that make
    * scan planning skip files whose ranges exclude a pushed predicate. */
  final case class ManifestFile(name: String, records: Long, bytes: Long,
      stats: Map[String, (String, String)])

  /** Raised when an optimistic commit loses its conflict check: the table
    * head moved between the operation's snapshot read and its commit attempt
    * (Iceberg's commit-conflict contract — re-read and retry the operation). */
  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  /** In-process per-root commit locks (see SnapshotTable#withRootLock). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Same-millisecond tiebreaker for ref-record sequence names. */
  private[sources] val refSeqCounter = new java.util.concurrent.atomic.AtomicLong()

  // ── pluggable claim arbiter ──────────────────────────────────────────────
  //    The ONE primitive the commit protocol still needs from its storage is
  //    an atomic "claim (root, version)" CAS. POSIX/HDFS provide it natively
  //    (create-exclusive markers); S3-class stores do NOT — a PUT silently
  //    overwrites — which is exactly why Iceberg delegates its head swap to
  //    a catalog-side CAS (REST catalog / lock table; reference spark.py:
  //    26-28, SURVEY §3.1 step 5). Registering an arbiter for a root routes
  //    claims through it: markers are still written (best-effort) so
  //    removeOrphans keeps protecting in-flight writers' dirs, but claim
  //    ATOMICITY comes from the arbiter. Everything else in the protocol —
  //    record-ledger commit points, head validation, claim release — is
  //    already storage-agnostic.

  /** The catalog-CAS seam: implement with any service that can do an
    * atomic per-(root, version) claim — a REST catalog, a database row, a
    * lock table. */
  trait ClaimArbiter {
    /** Atomically claim `version` of the table at `root`; true = owned. */
    def tryClaim(root: String, version: Long): Boolean
    /** Release a claim (after its commit is logged, or on a lost race). */
    def release(root: String, version: Long): Unit
    /** Highest currently-claimed version for `root`, -1 when none. */
    def maxClaimed(root: String): Long
    /** Enter the commit CRITICAL SECTION for `root` — the final head
      * validation + log-record write of every commit runs inside it, so a
      * read-dependent commit's validate→append tail and a concurrent
      * append's record write can never interleave ACROSS PROCESSES (the
      * optimistic window Iceberg closes with its catalog CAS: without this,
      * an append logged between another process's head check and its
      * full-copy commit would be silently erased by the restart point).
      * In-JVM the per-root lock already serializes; the default no-op is
      * correct for single-process fleets. Durable arbiters MUST implement
      * both methods, blocking in lockCommit until the section is free. */
    def lockCommit(root: String): Unit = ()
    /** Leave the commit critical section for `root`. */
    def unlockCommit(root: String): Unit = ()
    /** FENCING check, called by the log-tail write while the section is
      * held: throw if this holder's section was TAKEN OVER since
      * `lockCommit` returned (a stale-lock break by another process — the
      * GC-pause hazard: a paused-but-alive holder must not append with a
      * lock it no longer owns). Default no-op: an in-process section is
      * never broken. */
    def verifyFence(root: String): Unit = ()
    /** TOKEN-CONDITIONAL log-tail write — the catalog-CAS shape: run
      * `write` only if this holder's section epoch is still current, with
      * check and write ATOMIC against takeovers (a takeover's epoch bump
      * must either precede the check or wait for the write). The default
      * composes `verifyFence` + `write` — correct for arbiters whose
      * sections are never broken (in-process); durable arbiters with a
      * takeover path must override with a genuinely conditional form, or
      * a holder paused between the fence check and the write lands a
      * record with a section it no longer owns. */
    def conditionalTailWrite(root: String, write: () => Unit): Unit = {
      verifyFence(root); write()
    }
  }

  /** Arbiter backed by PROCESS MEMORY: atomic for every thread of ONE JVM
    * (a single-driver writer fleet — Spark executors never claim, only the
    * driver does), and the spec's stand-in for a catalog CAS service. It
    * provides NO cross-process protection — two processes each registering
    * their own instance share nothing; a multi-process fleet on an S3-class
    * store needs [[LockDirClaimArbiter]] (durable lock files on a
    * create-exclusive-capable root) or a real catalog-side CAS. */
  final class InProcessClaimArbiter extends ClaimArbiter {
    private val claims = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentSkipListSet[java.lang.Long]]()
    private def set(root: String) = claims.computeIfAbsent(root,
      _ => new java.util.concurrent.ConcurrentSkipListSet[java.lang.Long]())
    def tryClaim(root: String, version: Long): Boolean = set(root).add(version)
    def release(root: String, version: Long): Unit = set(root).remove(version)
    def maxClaimed(root: String): Long =
      // one atomic navigation call — isEmpty-then-last would be a
      // check-then-act racing a concurrent release
      Option(set(root).floor(java.lang.Long.MAX_VALUE))
        .map(_.longValue).getOrElse(-1L)
  }

  private val claimArbiters =
    new java.util.concurrent.ConcurrentHashMap[String, ClaimArbiter]()

  /** Route version claims for `root` through `arbiter` — required for
    * multi-process writers on stores whose create-exclusive is best-effort
    * (S3-class); a no-op improvement elsewhere. Cross-PROCESS fleets need a
    * durable arbiter ([[LockDirClaimArbiter]], or a catalog CAS behind this
    * trait) registered by EVERY writer process; [[InProcessClaimArbiter]]
    * only arbitrates threads of one JVM. */
  def registerClaimArbiter(root: String, arbiter: ClaimArbiter): Unit =
    claimArbiters.put(canonicalRoot(root), arbiter)

  def unregisterClaimArbiter(root: String): Unit =
    claimArbiters.remove(canonicalRoot(root))

  private[sources] def arbiterFor(root: String): Option[ClaimArbiter] =
    Option(claimArbiters.get(canonicalRoot(root)))

  /** Floor for [[SnapshotTable#removeOrphans]]'s age threshold (24 h —
    * Iceberg's remove_orphan_files refuses shorter intervals for the same
    * slow-writer reason). Overridable per call with `force = true`. */
  val MinOrphanAgeMillis: Long = 24L * 3600 * 1000

  /** Grace period the expiry marker sweep gives below-log-head markers: a
    * marker younger than this may belong to a SLOW writer still mid-commit
    * (data written, log append pending) whose dir the marker protects from
    * [[SnapshotTable#removeOrphans]]; only stale markers are swept. */
  val MarkerSweepGraceMillis: Long = 3600L * 1000

  /** Record count from one parquet FOOTER — a metadata read, no data pages
    * opened. The shared helper for every consumer that needs ONLY the
    * count (metadata tables' foreign-file fallback, the Iceberg export);
    * the commit-time manifest pass keeps its own open reader because it
    * also extracts column stats from the same footer. */
  private[sources] def footerRecordCount(p: org.apache.hadoop.fs.Path,
      hconf: org.apache.hadoop.conf.Configuration): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
    try reader.getRecordCount finally reader.close()
  }

  // ── column-stats capture (commit-time, from the footers the manifest pass
  //    already opens) ────────────────────────────────────────────────────────

  /** Per-column (min, max) over every row group of one parquet footer, in
    * canonical string form; a column is omitted when any row group lacks
    * usable stats, its physical type is unsupported (INT96 timestamps,
    * FIXED_LEN_BYTE_ARRAY decimals past precision 18, nested), or it is
    * entirely null — omission only disables pruning for that column, never
    * correctness. Decimal columns at precision ≤ 18 (INT32/INT64 physical —
    * the reference's DECIMAL(18,2)/(18,4) fact columns) record their raw
    * UNSCALED values, ordering-equivalent at the column's fixed scale. */
  private[sources] def footerColumnStats(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata)
      : Map[String, (String, String)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    // (domain min, domain max) accumulated per column; None = column disabled
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Option[(Any, Any)]]
    footer.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.foreach { cc =>
        val pathArr = cc.getPath.toArray
        if (pathArr.length == 1) {
          val name = pathArr(0)
          val pt = cc.getPrimitiveType
          val logical = pt.getLogicalTypeAnnotation
          val st = cc.getStatistics
          val allNull = st != null && st.isNumNullsSet &&
            st.getNumNulls == cc.getValueCount
          def domainValue(v: Any): Option[Any] = pt.getPrimitiveTypeName match {
            case INT32 => Some(v.asInstanceOf[Number].longValue)
            case INT64 =>
              val raw = v.asInstanceOf[Number].longValue
              logical match {
                case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  ts.getUnit match {
                    case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(raw * 1000L)
                    case LogicalTypeAnnotation.TimeUnit.MICROS => Some(raw)
                    case LogicalTypeAnnotation.TimeUnit.NANOS  => Some(raw / 1000L)
                    case _ => None
                  }
                case _ => Some(raw)
              }
            case FLOAT   => Some(v.asInstanceOf[Float])
            case DOUBLE  => Some(v.asInstanceOf[Double])
            case BOOLEAN => Some(v.asInstanceOf[Boolean])
            case BINARY
                if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
              Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
            case _ => None
          }
          val chunk: Option[Option[(Any, Any)]] =
            if (allNull) None // contributes no values; doesn't disable the column
            else if (st == null || st.isEmpty || !st.hasNonNullValue) Some(None)
            else {
              val mn = domainValue(st.genericGetMin)
              val mx = domainValue(st.genericGetMax)
              Some(for (a <- mn; b <- mx) yield (a, b))
            }
          chunk.foreach { c =>
            val merged = (acc.getOrElse(name, Some(null)), c) match {
              case (Some(null), v) => v
              case (Some((a1, b1)), Some((a2, b2))) =>
                Some((if (domainCompare(a1, a2) <= 0) a1 else a2,
                  if (domainCompare(b1, b2) >= 0) b1 else b2))
              case _ => None
            }
            acc(name) = merged
          }
        }
      }
    }
    acc.collect { case (n, Some(v)) if v != null =>
      n -> (canonical(v._1), canonical(v._2))
    }.toMap
  }

  private def canonical(v: Any): String = v.toString

  /** Ordering inside one stats domain (both sides same runtime type). */
  private def domainCompare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Float, y: Float)     => java.lang.Float.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: String, y: String)   => utf8Compare(x, y)
    case _ => throw new IllegalStateException(s"stats domain mismatch: $a vs $b")
  }

  /** Unsigned UTF-8 byte comparison — the order parquet min/max for BINARY
    * strings are computed in (Java String compareTo differs for
    * supplementary characters, so it must not be used here). */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  // ── predicate → file-range evaluation (the Iceberg
  //    InclusiveMetricsEvaluator shape: "might this file contain a matching
  //    row?" — ANY uncertainty keeps the file; pruning is only ever an
  //    optimization over the residual filter) ──────────────────────────────

  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast,
    EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan,
    LessThanOrEqual, Literal, Or}

  /** Top-level AND conjuncts of `pred`, RESOLVED against `df`'s plan: the
    * filter is run through analysis + optimization so implicit casts fold
    * into plain literals and attributes resolve — the same expression shape
    * a pushed-down scan filter has. */
  private[sources] def conjunctsOf(df: DataFrame, pred: Column): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other     => Seq(other)
    }
    df.filter(pred).queryExecution.optimizedPlan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => split(f.condition)
    }.getOrElse(Nil)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
    case a: Attribute => Some(a.name)
    // a predicate pushed through a type-WIDENING resolution cast (ALTER
    // COLUMN TYPE readers cast during resolution; Catalyst pushes the
    // filter down as `cast(col) op lit`): integral widenings share one
    // ordered stats domain, so the cast is transparent for range pruning
    case c: Cast if scala.util.Try((c.child.dataType, c.dataType) match {
      case (ByteType | ShortType | IntegerType,
            ShortType | IntegerType | LongType) => true
      case _ => false
    }).getOrElse(false) => attrName(c.child)
    case _ => None
  }

  /** [[attrName]] for the class side (transform-conjunct derivation). */
  private[sources] def attrNameOf(e: Expression): Option[String] = attrName(e)

  /** A literal's value in the DOMAIN of column type `ct` (the domain
    * [[footerColumnStats]] recorded) — None when the literal's type doesn't
    * convert exactly, which simply disables pruning on that conjunct. */
  private def literalInDomain(v: Any, ct: DataType): Option[Any] = ct match {
    case ByteType | ShortType | IntegerType | LongType => v match {
      case b: Byte => Some(b.toLong); case s: Short => Some(s.toLong)
      case i: Int => Some(i.toLong); case l: Long => Some(l)
      case _ => None
    }
    case DateType => v match { // Catalyst internal: days since epoch
      case i: Int => Some(i.toLong); case _ => None
    }
    case TimestampType => v match { // Catalyst internal: micros
      case l: Long => Some(l); case _ => None
    }
    case FloatType => v match {
      case f: Float => Some(f); case i: Int => Some(i.toFloat)
      case l: Long => Some(l.toFloat); case _ => None
    }
    case DoubleType => v match {
      case d: Double => Some(d); case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble); case _ => None
    }
    case StringType => Some(v.toString) // internal UTF8String → String
    case BooleanType => v match { case b: Boolean => Some(b); case _ => None }
    case dt: org.apache.spark.sql.types.DecimalType => v match {
      // Catalyst internal decimal literal → the stats domain (UNSCALED long
      // at the column's scale — what footerColumnStats records for the
      // INT32/INT64 physical decimals Spark writes at precision ≤ 18). A
      // literal whose scale doesn't land exactly (or whose unscaled value
      // overflows long) disables pruning on the conjunct, never correctness.
      case d: org.apache.spark.sql.types.Decimal =>
        try {
          val unscaled = d.toJavaBigDecimal.setScale(dt.scale).unscaledValue()
          if (unscaled.bitLength() < 64) Some(unscaled.longValue()) else None
        } catch { case _: ArithmeticException => None }
      case _ => None
    }
    case _ => None
  }

  /** A stored canonical stat parsed back into column type `ct`'s domain. */
  private def statInDomain(s: String, ct: DataType): Option[Any] = ct match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType => s.toLongOption
    case FloatType  => Some(s.toFloat)
    case DoubleType => Some(s.toDouble)
    case StringType => Some(s)
    case BooleanType => s.toBooleanOption
    // decimal stats are the raw UNSCALED values (ordering-equivalent at one
    // column's fixed scale; evolution only ever raises precision)
    case _: org.apache.spark.sql.types.DecimalType => s.toLongOption
    case _ => None
  }

  /** Might a file with `stats` contain a row matching every conjunct?
    * Evaluates each supported `col op literal` conjunct against the file's
    * (min, max); an unsupported shape, unknown column, or missing stat keeps
    * the file. */
  private[sources] def mayContain(schema: StructType,
      stats: Map[String, (String, String)], conjuncts: Seq[Expression]): Boolean = {
    val types = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val statsLc = stats.map { case (k, v) => k.toLowerCase -> v }
    def range(name: String): Option[(Any, Any, DataType)] =
      for {
        ct <- types.get(name.toLowerCase)
        (mnS, mxS) <- statsLc.get(name.toLowerCase)
        mn <- statInDomain(mnS, ct)
        mx <- statInDomain(mxS, ct)
      } yield (mn, mx, ct)
    def cmp = domainCompare _
    def eval(c: Expression): Boolean = c match {
      // pushed-down filters arrive as whole trees (not pre-split conjuncts)
      // on the lazy FileIndex path, and an OR of ranges — a dashboard
      // comparing two periods — prunes as the UNION of its disjuncts' kept
      // verdicts rather than keeping everything
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r)  => eval(l) || eval(r)
      case EqualTo(a, Literal(v, _)) => evalOp(a, v, "=")
      case EqualTo(Literal(v, _), a) => evalOp(a, v, "=")
      case GreaterThan(a, Literal(v, _)) => evalOp(a, v, ">")
      case GreaterThan(Literal(v, _), a) => evalOp(a, v, "<")
      case GreaterThanOrEqual(a, Literal(v, _)) => evalOp(a, v, ">=")
      case GreaterThanOrEqual(Literal(v, _), a) => evalOp(a, v, "<=")
      case LessThan(a, Literal(v, _)) => evalOp(a, v, "<")
      case LessThan(Literal(v, _), a) => evalOp(a, v, ">")
      case LessThanOrEqual(a, Literal(v, _)) => evalOp(a, v, "<=")
      case LessThanOrEqual(Literal(v, _), a) => evalOp(a, v, ">=")
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attrName(a).flatMap(range) match {
          case Some((mn, mx, ct)) =>
            vs.exists { case Literal(v, _) =>
              if (v == null) false
              else literalInDomain(v, ct).forall(d =>
                cmp(mn, d) <= 0 && cmp(d, mx) <= 0)
            }
          case None => true
        }
      case InSet(a, hset) => // the optimizer's large-IN form
        attrName(a).flatMap(range) match {
          case Some((mn, mx, ct)) =>
            hset.exists(v =>
              if (v == null) false
              else literalInDomain(v, ct).forall(d =>
                cmp(mn, d) <= 0 && cmp(d, mx) <= 0))
          case None => true
        }
      case _ => true
    }
    def evalOp(a: Expression, v: Any, op: String): Boolean =
      if (v == null) true
      else attrName(a).flatMap(range) match {
        case Some((mn, mx, ct)) => literalInDomain(v, ct) match {
          case Some(d) => op match {
            case "="  => cmp(mn, d) <= 0 && cmp(d, mx) <= 0
            case ">"  => cmp(mx, d) > 0
            case ">=" => cmp(mx, d) >= 0
            case "<"  => cmp(mn, d) < 0
            case "<=" => cmp(mn, d) <= 0
          }
          case None => true
        }
        case None => true
      }
    conjuncts.forall(eval)
  }

  /** Stats blob ↔ manifest-field encoding: `col US b64(min) US b64(max)`
    * records joined with RS, whole blob base64'd — values may contain any
    * character; the TSV line must stay clean. */
  private[sources] def encodeStats(stats: Map[String, (String, String)]): String = {
    def b64(s: String) =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    java.util.Base64.getEncoder.encodeToString(
      stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
        s"$c\u001f${b64(mn)}\u001f${b64(mx)}"
      }.mkString("\u001e").getBytes("UTF-8"))
  }

  private[sources] def decodeStats(blob: String): Map[String, (String, String)] =
    if (blob.isEmpty) Map.empty
    else {
      def un(s: String) = new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
      un(blob).split('\u001e').filter(_.nonEmpty).map { rec =>
        val p = rec.split('\u001f')
        p(0) -> (un(p(1)), un(p(2)))
      }.toMap
    }

  // ── per-root scan accounting for the LAZY pruning path (fed by
  //    [[ManifestFileIndex.listFiles]] at physical-planning time, when
  //    Spark hands the pushed-down filters to the index) ──────────────────

  private val scanStatsMap = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]]()

  /** A root string in canonical form for the scan-stats map: scheme'd roots
    * (`s3a://…`, `hdfs://…`) normalize through Hadoop's Path; bare local
    * paths through java.nio (absolute + normalized), so relative and
    * absolute spellings of one local root share a slot. */
  private[sources] def canonicalRoot(root: String): String = {
    val uri = new Path(root).toUri
    if (uri.getScheme == null)
      java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString
    else new Path(root).toString
  }

  /** Reset the (files scanned, files live) accounting for a store root. */
  def resetScanStats(root: String): Unit =
    scanStatsMap.remove(canonicalRoot(root))

  /** (files scanned, files live) accumulated by every manifest-backed scan
    * of `root` since the last [[resetScanStats]] — the observable that
    * proves file skipping fired on a PLAIN read path (SQL over a bound temp
    * view, the API `read()`, time travel): unlike
    * [[SnapshotTable#lastPruneStats]] it needs no special read API, because
    * the pruning itself doesn't either. Counts sum across every relation a
    * query plans over the root (a delta chain is base + runs), but each
    * relation contributes its LATEST listing only — Spark may re-plan one
    * scan several times (a second action, AQE re-planning), and a repeated
    * listing must not double the observable. */
  def scanStats(root: String): (Long, Long) =
    Option(scanStatsMap.get(canonicalRoot(root))) match {
      case None => (0L, 0L)
      case Some(m) =>
        import scala.jdk.CollectionConverters._
        m.values.asScala.foldLeft((0L, 0L)) { case ((k, t), (k2, t2)) =>
          (k + k2, t + t2)
        }
    }

  /** Record one [[ManifestFileIndex.listFiles]] pass. `indexId` slots the
    * counts per index INSTANCE (one per relation), so re-listing the same
    * relation overwrites rather than accumulates. The per-root slot map is
    * BOUNDED: a long-lived service plans a new relation per query, and an
    * unbounded map would leak one entry per query forever — past the cap
    * the window simply restarts (the stats are an observability aid; specs
    * reset explicitly around the scan they measure). */
  private[sources] def recordScan(root: String, indexId: Long,
      kept: Long, total: Long): Unit = {
    val slots = scanStatsMap.computeIfAbsent(canonicalRoot(root),
      _ => new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]())
    if (slots.size >= 4096) slots.clear()
    slots.put(indexId, (kept, total))
  }
}

/** Lightweight snapshot/time-travel table (SURVEY.md §2.3 S3/S4, §2.11 X2):
  * the reference exposes Iceberg snapshot metadata (`table_snapshot`,
  * `table_history`), time travel (`AT SNAPSHOT`/`VERSION AS OF`), row-level
  * DML, branches/tags, and schema evolution. The Iceberg runtime isn't
  * shipped in this environment, so this implements the same contract over
  * versioned parquet directories:
  *
  *   root/v=N/part-*.parquet        one immutable directory per commit that
  *                                  wrote data (full snapshots, APPEND DELTAS,
  *                                  merge-on-read delete-key files)
  *   root/_graft_meta.jsonl         append-only commit log (version, ts, op, rows)
  *   root/_graft_manifest/v=N.tsv   per-version manifest: the version's schema
  *                                  plus per-file (records, bytes) read from
  *                                  parquet footers ONCE at commit time — the
  *                                  Iceberg-manifests contract (metadata scans
  *                                  never re-open data files; commit-time stats
  *                                  cost O(new files), not O(table))
  *
  * Commit kinds (the `op` column of the log):
  *  - full-data ops (`overwrite`, `compact`, `update`, `cow-delete`, `merge`,
  *    or any caller-supplied label): the `v=N` dir holds the whole table —
  *    copy-on-write commits, for mutations that touch a large table fraction;
  *  - `append`: the dir holds ONLY the delta (O(delta), the Iceberg
  *    `writeTo(...).append()` cost model — reference spark.py:88-89); readers
  *    resolve a union of the base and every live delta, `compact()` folds;
  *  - `mor-delete`: the dir holds only the deleted KEYS (equality-delete
  *    file); readers fold it as a broadcast anti-join;
  *  - `alias:<dirVersion>:<label>`: METADATA-ONLY commit whose data dir is
  *    another version's (publish/rollback to a single-dir target);
  *  - `asof:<version>:<label>`: METADATA-ONLY commit whose content is another
  *    version's RESOLVED content (publish/rollback to a delta-chain or
  *    mor-delete target — still a pointer move, never a copy);
  *  - `evolve:<payload>`: METADATA-ONLY schema evolution (ADD/DROP/RENAME
  *    COLUMN — Iceberg evolves schemas without rewriting data; readers apply
  *    the change during resolution);
  *  - `branch:<name>:overwrite` / `branch:<name>:append:<parent>`: commits on
  *    a side branch — same version sequence and layout, NOT main's lineage.
  *
  * Readers pin a version (time travel) or read latest; `history()` surfaces
  * the commit log as a DataFrame; `expireSnapshots` mirrors Iceberg's
  * expire_snapshots maintenance procedure with reachability-based retention.
  * Commits use OPTIMISTIC CONCURRENCY (Iceberg's atomic-swap contract):
  * versions are claimed via create-exclusive markers so concurrent writers
  * always land distinct versions, and read-dependent mutations raise
  * [[SnapshotTable.CommitConflictException]] when the head moved under them
  * (re-read and retry). Plain appends commute and never conflict.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  private type Meta = (Long, Long, String, Long)

  private val MetaFile = "_graft_meta.jsonl"

  // ── metadata IO seam ─────────────────────────────────────────────────────
  //    Every commit-log / refs / manifest / spec-file read and write goes
  //    through these helpers: `file:` (and bare) roots keep java.nio — its
  //    O_EXCL create and cheap appends are exactly right locally — while
  //    scheme'd roots (`hdfs:`, `s3a:`, test schemes) route through Hadoop's
  //    FileSystem, the same discipline the commit-marker CAS already follows.
  //    Without this the store could not operate at all on the object-store
  //    roots its 100 TB deployment story assumes (reference spark.py:52-59,
  //    readme.md:393-401: tables live on object storage).

  private def hPath(rel: String) = new Path(root, rel)

  /** The root as a java.nio-usable local path: a `file:`-SCHEME'd root is
    * still local (`rootIsLocal`), but `Paths.get("file:///x")` would
    * resolve the whole URI as a RELATIVE name and write under a literal
    * `./file:` dir — strip to the URI path first. */
  private lazy val localRootPath: String = {
    val u = new Path(root).toUri
    if (u.getScheme == null) root else u.getPath
  }

  private def nPath(rel: String) = Paths.get(localRootPath, rel)

  private def metaExists(rel: String): Boolean =
    if (rootIsLocal) Files.exists(nPath(rel)) else rootFs.exists(hPath(rel))

  private def metaReadString(rel: String): String =
    if (rootIsLocal) Files.readString(nPath(rel))
    else {
      val in = rootFs.open(hPath(rel))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }

  /** Non-empty lines of a metadata file (the log readers' shape). */
  private def metaReadLines(rel: String): Seq[String] =
    metaReadString(rel).split('\n').toSeq.filter(_.nonEmpty)

  private def metaWriteString(rel: String, content: String): Unit =
    if (rootIsLocal) {
      Files.createDirectories(nPath(rel).getParent)
      Files.writeString(nPath(rel), content,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    } else {
      val out = rootFs.create(hPath(rel), true) // creates parent dirs
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

  /** Test seam: invoked inside the no-append read-modify-write fallback,
    * between the cache read and the cache rewrite — lets specs inject a
    * cross-process writer into the exact window where an interleaved RMW
    * drops the other writer's cache line (which the record ledger must
    * survive). Production: no-op. */
  private[sources] var beforeCacheRmwWrite: String => Unit = _ => ()

  /** Create-or-append. HDFS (and local) append natively; filesystems
    * without append (object stores) fall back to read-modify-write. On
    * scheme'd roots the files written through here are CACHES of the
    * per-entry record ledgers (`_graft_log/`, `_graft_reflog/` — see the
    * commit-record note above [[readMeta]]), so a cross-process RMW
    * interleave can at worst stale the cache, never lose a committed
    * entry; readers reconcile against the records. The RMW still verifies
    * its own line landed and retries a bounded number of times, narrowing
    * even the cache-staleness window. */
  private def metaAppendString(rel: String, content: String): Unit =
    if (rootIsLocal) {
      Files.createDirectories(nPath(rel).getParent)
      Files.writeString(nPath(rel), content,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    } else {
      // create-exclusive first write; a concurrent creator (cross-process)
      // throwing FileAlreadyExistsException just means the file now exists —
      // fall through to the append/RMW path instead of failing the commit
      val created =
        if (rootFs.exists(hPath(rel))) false
        else
          try {
            val out = rootFs.create(hPath(rel), false)
            try out.write(content.getBytes("UTF-8")) finally out.close()
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: java.io.IOException if rootFs.exists(hPath(rel)) => false
          }
      if (!created)
        try {
          val out = rootFs.append(hPath(rel))
          try out.write(content.getBytes("UTF-8")) finally out.close()
        } catch {
          case _: UnsupportedOperationException =>
            // no-append store: read-modify-write, then re-read and verify
            // OUR line survived (a concurrent RMW landing after ours would
            // have dropped it); bounded retries — on exhaustion the cache
            // is stale but the record ledger still holds the entry
            var attempts = 0
            var landed = false
            while (!landed && attempts < 5) {
              attempts += 1
              val base = metaReadString(rel)
              // a retry may find its line already restored by a third
              // writer's rewrite — appending again would DUPLICATE it
              if (base.contains(content)) landed = true
              else {
                beforeCacheRmwWrite(rel)
                metaWriteString(rel, base + content)
                landed = metaReadString(rel).contains(content)
              }
            }
        }
    }

  private def metaDelete(rel: String): Unit =
    if (rootIsLocal) Files.deleteIfExists(nPath(rel))
    else rootFs.delete(hPath(rel), false)

  /** Op marker for merge-on-read equality-delete commits: the version dir
    * holds only the deleted KEYS, not a full data copy (see [[deleteWhereMor]]). */
  private val MorDeleteOp = "mor-delete"

  /** Op marker for merge-on-read POSITION-delete commits (Iceberg v2's
    * second delete-file kind): the version dir holds `(graft__file,
    * graft__pos)` rows naming exact row positions in exact data files.
    * Unlike equality deletes this needs NO key column at all — it is the
    * delete form that works on tables with duplicate rows, where an
    * equality delete would remove every copy (see [[deleteWherePos]]). */
  private val PosDeleteOp = "pos-delete"

  /** A position-delete commit, plain or TAGGED (`pos-delete@<tag>`) — the
    * tag is an idempotence marker for mirrored foreign snapshots, exactly
    * the streamed-append recipe: a replay sees its tag in the commit log
    * and skips. All readers treat tagged forms identically. */
  private[graft] def isPosDelete(op: String): Boolean =
    op == PosDeleteOp || op.startsWith(PosDeleteOp + "@")

  /** Hidden columns carrying each row's physical provenance during a
    * pos-delete-aware resolution: the parquet file's qualified path and the
    * row's index within it (Spark's `_metadata` contract — stable for a
    * given immutable file). Never user-visible. */
  private[sources] val FileCol = "graft__file"
  private[sources] val PosCol = "graft__pos"

  /** Op marker for O(delta) append commits: the version dir holds only the
    * appended rows; readers union it onto the chain (see [[commit]]). A
    * streaming append carries its micro-batch id as `append@<batchId>` —
    * the SAME commit-log line is the exactly-once dedup record, so there is
    * no second ledger write for a crash to fall between (see
    * [[graft.streaming.SnapshotStream]]). */
  private val DeltaAppendOp = "append"

  /** Is this op an O(delta) append (plain or batch-stamped)? */
  private[sources] def isDeltaAppend(op: String): Boolean =
    op == DeltaAppendOp || op.startsWith(DeltaAppendOp + "@")

  /** The batch-stamped append op for streaming micro-batch `batchId` — the
    * format is owned here; [[graft.streaming.SnapshotStream]] must not
    * spell it by hand. */
  private[graft] def streamAppendOp(batchId: Long): String =
    s"$DeltaAppendOp@$batchId"

  /** The micro-batch id a batch-stamped append op carries, if any (a
    * malformed suffix is not a streamed batch, not an error). */
  private[graft] def streamBatchId(op: String): Option[Long] =
    if (!op.startsWith(DeltaAppendOp + "@")) None
    else op.stripPrefix(DeltaAppendOp + "@").toLongOption

  /** Op marker for merge-on-read UPDATE commits: the version dir holds the
    * REPLACEMENT rows (the updated copies) and a hidden `_graft_deletes/`
    * subdir holds their keys as an equality-delete file — one commit, two
    * Iceberg v2 file kinds. Readers anti-join the keys then union the
    * replacements, so updating 1k docs in a 100 TB corpus writes kilobytes
    * (see [[updateMor]]). */
  private val MorUpdateOp = "mor-update"

  /** Op marker for merge-on-read MERGE commits (Iceberg's
    * write.merge.mode=merge-on-read): the version dir holds the updated
    * copies of clause-claimed matched rows PLUS the not-matched inserts, and
    * `_graft_deletes/` holds every clause-claimed matched key — one commit,
    * O(source), never O(table) (see [[mergeIntoMor]]). Readers fold it like
    * a mor-update except the dir unions even when no key matched (an
    * insert-only merge still appends). */
  private val MorMergeOp = "mor-merge"

  private def morUpdateDeletesDir(v: Long) = s"$root/v=$v/_graft_deletes"

  /** Is this a mor UPDATE/MERGE commit — (claimed keys, replacement rows)?
    * The shape `IcebergExport.syncStore` mirrors as an equality-delete
    * file + an append snapshot. */
  private[graft] def isMorUpdateLike(op: String): Boolean =
    op == MorUpdateOp || op == MorMergeOp

  /** The claimed-keys frame of a mor UPDATE/MERGE commit; None when the
    * commit claimed none (an insert-only merge). */
  private[graft] def morClaimedKeys(v: Long): Option[DataFrame] =
    if (morKeysExist(v)) Some(spark.read.parquet(morUpdateDeletesDir(v)))
    else None

  /** Does version `v` carry a non-empty equality-delete key file? */
  private def morKeysExist(v: Long): Boolean =
    if (rootIsLocal) {
      val delDir = new java.io.File(
        new Path(morUpdateDeletesDir(v)).toUri.getPath)
      delDir.isDirectory && delDir.listFiles().exists(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    } else {
      val delDir = new Path(morUpdateDeletesDir(v))
      rootFs.exists(delDir) && rootFs.listStatus(delDir).exists(s =>
        s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
    }

  /** Op prefix for commits made on a side branch: `branch:<name>:overwrite`
    * or `branch:<name>:append:<parentVersion>`. Branch commits share the
    * global version sequence and directory layout but are NOT part of main's
    * lineage — main-head resolution and base walks skip them. */
  private val BranchOpPrefix = "branch:"

  /** Op prefix for METADATA-ONLY commits (`alias:<dirVersion>:<label>`):
    * the commit is on main's lineage but its data dir is another version's.
    * This is what makes publish/rollback O(metadata) — at 100 TB neither
    * may copy the table (Iceberg's fast-forward and rollback are pointer
    * moves). */
  private val AliasOpPrefix = "alias:"

  /** Op prefix for METADATA-ONLY commits whose content is another version's
    * RESOLVED content (`asof:<version>:<label>`): the pointer-move form of
    * publish/rollback when the target is a delta chain or a mor-delete
    * reconstruction — no single dir holds it, so the log records the
    * version to resolve instead of a dir. */
  private val AsOfOpPrefix = "asof:"

  /** Op prefix for METADATA-ONLY schema evolution commits
    * (`evolve:<base64 payload>`; payload = unit-separated
    * `add<US>name<US>typeDdl` | `drop<US>name` | `rename<US>old<US>new`).
    * Iceberg evolves schemas without touching data files; readers apply the
    * change during chain resolution, so old snapshots keep their original
    * schema and new reads see the evolved one. */
  private val EvolveOpPrefix = "evolve:"

  private val RefsFile = "_graft_refs.jsonl"

  // ── hidden partitioning (Iceberg partition specs; reference
  //    clinicdata.sql:51, finance_example.sql:25, insurance_example.sql:23 —
  //    every workshop table is partitioned). A store-level spec of identity
  //    columns and/or `days(ts)` transforms lays every version dir out as
  //    `v=N/<col>=…/part-*.parquet`; the day transform derives a HIDDEN
  //    `__graft_day` date column (readers never see it — Iceberg's hidden
  //    partitioning contract), manifests record partition values as per-file
  //    stats so [[readWhere]] prunes partition files, and Spark's own
  //    partition discovery gives PartitionFilters pruning on plain reads. ──

  private val PartitionSpecFile = "_graft_partition"

  /** The hidden day-transform column name (never user-visible). NOTE: must
    * not start with `_` — hive/Spark listing treats `_`-prefixed paths as
    * hidden, and the partition dirs carry this name. */
  private[sources] val DayCol = "graft__day"

  /** Hidden columns of the coarser time transforms (Iceberg's full standard
    * set: `months(ts)`/`years(ts)` for archive tables whose day grain would
    * make too many partitions, `hours(ts)` for high-rate streams). Derived
    * as `yyyy-MM` / `yyyy` / `yyyy-MM-dd-HH` strings; like the day column,
    * manifests pin each file's SOURCE timestamp to the period's range, so
    * predicates stay on the timestamp itself (hidden partitioning). */
  private[sources] val MonthCol = "graft__month"
  private[sources] val YearCol = "graft__year"
  private[sources] val HourCol = "graft__hour"

  /** Every hidden column a partition transform can derive (the read-path
    * drop list — users never see them). */
  private[sources] def hiddenPartitionCols: Seq[String] =
    Seq(DayCol, MonthCol, YearCol, HourCol, BucketCol, TruncCol)

  /** Hidden partition columns plus the pos-delete provenance pair — the
    * full set a resolved read strips before handing rows to the user. */
  private[sources] def hiddenReadCols: Seq[String] =
    hiddenPartitionCols ++ Seq(FileCol, PosCol)

  /** Hidden column of the `bucket(N, col)` transform (Iceberg's
    * high-cardinality layout: murmur3 hash mod N). */
  private[sources] val BucketCol = "graft__bucket"

  /** Hidden column of the `truncate(W, col)` transform (width-W value
    * truncation: ints floor to multiples of W, strings to W-char prefixes —
    * an ORDER-PRESERVING clustering, so per-file footer ranges stay tight
    * and range predicates prune without any transform-aware logic). */
  private[sources] val TruncCol = "graft__trunc"

  /** The store's declared partition spec, e.g.
    * Seq("region", "days(ts)", "bucket(8, doc_id)") — split on TOP-LEVEL
    * commas only (transform arguments contain commas). */
  def partitionSpec: Seq[String] =
    if (!metaExists(PartitionSpecFile)) Nil
    else splitSpecEntries(metaReadString(PartitionSpecFile))

  /** Split a comma-joined spec string on TOP-LEVEL commas only (transform
    * arguments contain commas: `bucket(8, doc_id)`). */
  private def splitSpecEntries(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 =>
        if (sb.toString.trim.nonEmpty) out += sb.toString.trim
        sb.clear()
      case c => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  private def daysOf(entry: String): Option[String] =
    "(?i)^days?\\((\\w+)\\)$".r.findFirstMatchIn(entry.trim).map(_.group(1))

  private def monthsOf(entry: String): Option[String] =
    "(?i)^months?\\((\\w+)\\)$".r.findFirstMatchIn(entry.trim).map(_.group(1))

  private def yearsOf(entry: String): Option[String] =
    "(?i)^years?\\((\\w+)\\)$".r.findFirstMatchIn(entry.trim).map(_.group(1))

  private def hoursOf(entry: String): Option[String] =
    "(?i)^hours?\\((\\w+)\\)$".r.findFirstMatchIn(entry.trim).map(_.group(1))

  private[sources] def bucketOf(entry: String): Option[(Int, String)] =
    "(?i)^bucket\\((\\d+)\\s*,\\s*(\\w+)\\)$".r.findFirstMatchIn(entry.trim)
      .map(m => (m.group(1).toInt, m.group(2)))

  private[sources] def truncOf(entry: String): Option[(Int, String)] =
    "(?i)^truncate\\((\\d+)\\s*,\\s*(\\w+)\\)$".r.findFirstMatchIn(entry.trim)
      .map(m => (m.group(1).toInt, m.group(2)))

  /** The Iceberg-shaped bucket value of `v` (type `dt`): murmur3 (Spark's
    * `hash`, seed 42 — EXACTLY the write path's expression) mod N, positive.
    * Driver-side evaluation of the same Catalyst expression the layout was
    * written with, so read-side derivation can never drift from the files. */
  private def bucketValueOf(v: Any, dt: DataType, n: Int): Option[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    scala.util.Try(
      Pmod(new Murmur3Hash(Seq(Literal.create(v, dt))), Literal(n)).eval(null))
      .toOption.collect { case i: Int => i }
  }

  /** (physical partition columns, hidden transform columns derived) for the
    * recorded spec: `days(ts)` → `graft__day`, `bucket(N, c)` →
    * `graft__bucket`, `truncate(W, c)` → `graft__trunc`, identity entries
    * pass through. Entries whose source column is absent from the frame are
    * skipped conservatively (schema-evolution windows). */
  private def applyPartitionSpec(df: DataFrame): (DataFrame, Seq[String]) = {
    val spec = partitionSpec
    if (spec.isEmpty) (df, Nil)
    else {
      def field(c: String) = df.schema.fields.find(_.name.equalsIgnoreCase(c))
      def ok(src: String) = field(src).isDefined
      var out = df
      def derive(hidden: String, src: String, e: Column): Some[String] = {
        out = out.withColumn(hidden, e); Some(hidden)
      }
      val cols = spec.flatMap { e =>
        val isTransform = daysOf(e).orElse(monthsOf(e)).orElse(yearsOf(e))
          .orElse(hoursOf(e)).orElse(bucketOf(e).map(_._2))
          .orElse(truncOf(e).map(_._2)).isDefined
        daysOf(e).filter(ok).flatMap(src =>
            derive(DayCol, src, to_date(col(src))))
          .orElse(monthsOf(e).filter(ok).flatMap(src =>
            derive(MonthCol, src, date_format(col(src), "yyyy-MM"))))
          .orElse(yearsOf(e).filter(ok).flatMap(src =>
            derive(YearCol, src, date_format(col(src), "yyyy"))))
          .orElse(hoursOf(e).filter(ok).flatMap(src =>
            derive(HourCol, src, date_format(col(src), "yyyy-MM-dd-HH"))))
          .orElse(bucketOf(e).filter(p => ok(p._2)).flatMap { case (n, src) =>
            derive(BucketCol, src, pmod(hash(col(src)), lit(n))) })
          .orElse(truncOf(e).filter(p => ok(p._2)).flatMap { case (w, src) =>
            derive(TruncCol, src, field(src).get.dataType match {
              case StringType => substring(col(src), 1, w)
              case dt => (floor(col(src).cast("double") / w) * w).cast(dt)
            }) })
          .orElse(if (!isTransform && field(e.trim).isDefined) Some(e.trim) else None)
      }
      (out, cols)
    }
  }

  /** Transform-derived pruning conjuncts: a key-equality (or IN) predicate
    * on a bucket transform's source column derives the matching equality on
    * the hidden bucket column, whose per-file partition-path pin then
    * excludes every other bucket — the point lookup that makes
    * `bucket(N, key)` the 100 TB high-cardinality layout (footer min/max of
    * a hashed key spans everything; only the transform can prune). Only
    * derives when the literal's type equals the source column's declared
    * type (the hash is type-sensitive); derived conjuncts are ADDED, never
    * replace the originals. */
  private def transformConjuncts(schema: StructType,
      conj: Seq[Expression], windowVersions: Seq[Long]): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      EqualTo, In, InSet, Literal}
    import org.apache.spark.sql.types.IntegerType
    partitionSpec.flatMap(bucketOf).headOption match {
      case None => conj
      case Some((n, src)) =>
        val srcType = schema.fields.find(_.name.equalsIgnoreCase(src)).map(_.dataType)
        def bucketAttr = AttributeReference(BucketCol, IntegerType)()
        def derive(a: Expression, v: Any, dt: DataType): Option[Expression] =
          if (v == null || !SnapshotTable.attrNameOf(a).exists(_.equalsIgnoreCase(src)) ||
              !srcType.contains(dt)) None
          else bucketValueOf(v, dt, n).map(bv =>
            EqualTo(bucketAttr, Literal(bv, IntegerType)))
        val derived = conj.flatMap {
          case EqualTo(a, Literal(v, dt)) => derive(a, v, dt)
          case EqualTo(Literal(v, dt), a) => derive(a, v, dt)
          case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
            val bvs = vs.collect { case Literal(v, dt) => derive(a, v, dt) }
            if (bvs.exists(_.isEmpty)) None
            else Some(bvs.flatten.reduce[Expression](
              org.apache.spark.sql.catalyst.expressions.Or(_, _)))
          case InSet(a, hset) if hset.nonEmpty && srcType.isDefined =>
            val bvs = hset.toSeq.map(v => derive(a, v, srcType.get))
            if (bvs.exists(_.isEmpty)) None
            else Some(bvs.flatten.reduce[Expression](
              org.apache.spark.sql.catalyst.expressions.Or(_, _)))
          case _ => None
        }
        if (derived.isEmpty || !bucketDerivationSound(n, src, windowVersions)) conj
        else conj ++ derived
    }
  }

  /** Is deriving `graft__bucket` conjuncts from the CURRENT spec's
    * `bucket(n, src)` sound for every file this store can resolve? Files
    * written under a DIFFERENT bucket entry (partition-spec evolution that
    * changed N or the source column) carry bucket partition-path pins
    * computed with the old hash-mod — a current-spec conjunct would wrongly
    * prune them. Iceberg tracks a spec id per data file for exactly this
    * reason; here each manifest records the spec its files were written
    * under ([[manifestSpec]]), and derivation is allowed only when every
    * live version's bucket-pinned files match the current entry. Legacy
    * manifests (no recorded spec) are trusted only when their files carry
    * no bucket dirs at all — a file without a bucket pin can never be
    * wrongly pruned by a bucket conjunct.
    *
    * Checked over the RESOLVED WINDOW's data-dir versions only (the dirs
    * this read can actually prune), not the whole commit log: a long-lived
    * table's dead history must not cost O(total versions) manifest reads
    * per pruned query — planning stays O(chain). */
  private def bucketDerivationSound(n: Int, src: String,
      windowVersions: Seq[Long]): Boolean =
    windowVersions.forall { v =>
      readManifest(v) match {
        case None => true // no manifest → no stats → never pruned
        case Some((_, files)) =>
          !files.exists(_.name.contains(BucketCol + "=")) ||
            manifestSpec(v).exists(_.flatMap(bucketOf).exists {
              case (bn, bs) => bn == n && bs.equalsIgnoreCase(src)
            })
      }
    }

  // ── write sort order (Iceberg `ALTER TABLE … WRITE ORDERED BY`) ────────

  private val SortOrderFile = "_graft_sortorder"

  /** The store's declared write sort order: data commits are RANGE-
    * repartitioned on these columns and sorted within each output file, so
    * per-file manifest (min, max) ranges become tight and DISJOINT — the
    * clustering that makes [[readWhere]]'s file skipping effective. At
    * 100 TB this is the difference between a selective predicate reading a
    * handful of files and reading the table; `compact()` after setting an
    * order is Iceberg's rewrite_data_files sort strategy (sorted rewrite).
    * Like Iceberg's sort order, this shapes FUTURE writes only — existing
    * files keep their layout and their recorded stats. */
  def sortOrder: Seq[String] = {
    if (!metaExists(SortOrderFile)) Nil
    else splitSpecEntries(metaReadString(SortOrderFile).split('|').head)
  }

  /** Range-partition count pinned with the sort order (0 = Spark's
    * spark.sql.shuffle.partitions decides, the scale default). */
  def sortOrderFiles: Int =
    if (!metaExists(SortOrderFile)) 0
    else metaReadString(SortOrderFile).split('|') match {
      case Array(_, n) => scala.util.Try(n.trim.toInt).getOrElse(0)
      case _           => 0
    }

  /** A `zorder(c1, c2, …)` sort-order entry's columns (Iceberg's
    * rewrite_data_files `strategy => 'zorder'` clustering: per-file min/max
    * stay tight on EVERY clustering column, so predicates on any of them
    * prune — a linear sort key only skips well on its leading column). */
  private[sources] def zorderOf(entry: String): Option[Seq[String]] =
    "(?i)^zorder\\(([\\w\\s,]+)\\)$".r.findFirstMatchIn(entry.trim)
      .map(_.group(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq)

  /** Declare the write sort order: plain columns (range clustering) or ONE
    * `zorder(c1, c2, …)` entry (z-curve clustering over several columns).
    * `files > 0` pins the range-partition count (deterministic file
    * layout — small tables, spec pins); 0 lets
    * `spark.sql.shuffle.partitions` decide, which is what a 100 TB table
    * wants (one range per shuffle partition, AQE coalescing applies). */
  def setSortOrder(cols: Seq[String], files: Int = 0): Unit = {
    require(cols.nonEmpty, "WRITE ORDERED BY needs at least one column")
    cols.flatMap(zorderOf).foreach(zc =>
      require(zc.nonEmpty && cols.size == 1,
        "zorder(…) must be the sort order's only entry and name ≥1 column"))
    metaWriteString(SortOrderFile,
      cols.mkString(",") + (if (files > 0) s"|$files" else ""))
  }

  /** `ALTER TABLE … WRITE UNORDERED` — future writes keep the incoming
    * frame's layout again. */
  def clearSortOrder(): Unit = metaDelete(SortOrderFile)

  /** Range-partition count override for ONE commit ([[compact]]'s bin-pack
    * target when the declared order doesn't pin its own count). Mutated and
    * cleared only under [[withRootLock]]. */
  private var pendingRangeFiles: Option[Int] = None

  private def rangeFileCount: Int =
    if (sortOrderFiles > 0) sortOrderFiles else pendingRangeFiles.getOrElse(0)

  /** The declared sort order applied to a commit frame: range-repartition
    * (disjoint per-file ranges) then sort within each file — for a
    * `zorder(…)` order, on the interleaved z-value over the named columns
    * ([[graft.ops.ScaleOps.zvalueCol]]), so every clustering column's
    * per-file range stays tight. Skipped conservatively when any sort
    * column is absent from the frame (schema evolution windows). */
  private def applySortOrder(df: DataFrame): DataFrame = {
    val so = sortOrder
    if (so.isEmpty) df
    else {
      val n = rangeFileCount
      def cluster(keys: Seq[Column]): DataFrame = {
        val ranged =
          if (n > 0) df.repartitionByRange(n, keys: _*)
          else df.repartitionByRange(keys: _*)
        ranged.sortWithinPartitions(keys: _*)
      }
      so.flatMap(zorderOf).headOption match {
        case Some(zcols) =>
          if (!zcols.forall(df.columns.contains) || df.isEmpty) df
          else {
            // zvalueCol's quantile pass is one bounded extra scan of the
            // COMMIT frame — the same setup cost Iceberg's zorder rewrite
            // pays; never O(table) beyond the data being written
            val z = graft.ops.ScaleOps.zvalueCol(df, zcols)
            val zname = "graft__zvalue"
            val withZ = df.withColumn(zname, z)
            val ranged =
              if (n > 0) withZ.repartitionByRange(n, col(zname))
              else withZ.repartitionByRange(col(zname))
            ranged.sortWithinPartitions(col(zname)).drop(zname)
          }
        case None =>
          if (!so.forall(df.columns.contains)) df else cluster(so.map(col))
      }
    }
  }

  /** Data-dir write with the store's partition spec and write sort order
    * applied (every data commit of a partitioned store lays out hive dirs;
    * key files don't). */
  private def writeDataDir(df: DataFrame, v: Long): Long = {
    val (derived, pcols) = applyPartitionSpec(df)
    writeVersionDir(applySortOrder(derived), v, pcols, partitionSpec)
  }

  /** Per-file stats carried by the file's PARTITION PATH: each `k=v` dir
    * segment pins column k to the single value v (min = max), in the same
    * canonical domain [[SnapshotTable.footerColumnStats]] uses; the hidden
    * day column additionally pins its SOURCE timestamp to the day's micros
    * range, so a timestamp predicate prunes day-partitioned files even when
    * the footer carries no usable timestamp stats. Unparseable values just
    * contribute nothing (pruning stays conservative). */
  private def partitionPathStats(rel: String,
      schema: StructType): Map[String, (String, String)] = {
    // hidden time-transform column → its source column, per the CURRENT
    // spec (this runs at COMMIT time, so "current" is the spec the file was
    // just written under — the recorded stats stay correct across later
    // spec evolution)
    val spec = partitionSpec
    val timeSrc: Map[String, String] =
      (spec.flatMap(daysOf).headOption.map(DayCol -> _) ++
        spec.flatMap(monthsOf).headOption.map(MonthCol -> _) ++
        spec.flatMap(yearsOf).headOption.map(YearCol -> _) ++
        spec.flatMap(hoursOf).headOption.map(HourCol -> _)).toMap
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    def micros(t: java.time.LocalDateTime): Long =
      t.atZone(zone).toInstant.toEpochMilli * 1000L
    rel.split('/').dropRight(1).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) Nil
      else {
        val k = seg.substring(0, i)
        val raw = java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8")
        if (raw == "__HIVE_DEFAULT_PARTITION__") Nil // null partition value
        else if (timeSrc.contains(k)) {
          // the dir value's [start, end) period, as LocalDateTimes in the
          // SESSION time zone (the derivation ran there)
          val period = scala.util.Try(k match {
            case DayCol =>
              val d = java.time.LocalDate.parse(raw)
              (d.atStartOfDay, d.plusDays(1).atStartOfDay)
            case MonthCol =>
              val m = java.time.YearMonth.parse(raw)
              (m.atDay(1).atStartOfDay, m.plusMonths(1).atDay(1).atStartOfDay)
            case YearCol =>
              val y = java.time.Year.parse(raw)
              (y.atDay(1).atStartOfDay, y.plusYears(1).atDay(1).atStartOfDay)
            case HourCol =>
              val s = java.time.LocalDate.parse(raw.substring(0, 10))
                .atTime(raw.substring(11).toInt, 0)
              (s, s.plusHours(1))
          }).toOption
          // hidden-col self-pin (day keeps its epochDay domain for manifest
          // back-compat; the string transforms pin their own dir value)
          val selfPin =
            if (k == DayCol) period.map { case (s, _) =>
              DayCol -> (s.toLocalDate.toEpochDay.toString,
                s.toLocalDate.toEpochDay.toString)
            } else Some(k -> (raw, raw))
          val srcRange = for {
            (s, e) <- period
            src <- timeSrc.get(k)
            f <- schema.fields.find(_.name.equalsIgnoreCase(src))
            pin <- f.dataType match {
              case TimestampType =>
                Some((micros(s).toString, (micros(e) - 1).toString))
              case DateType =>
                Some((s.toLocalDate.toEpochDay.toString,
                  e.toLocalDate.minusDays(1).toEpochDay.toString))
              case _ => None
            }
          } yield f.name -> pin
          selfPin.toSeq ++ srcRange.toSeq
        } else schema.fields.find(_.name.equalsIgnoreCase(k)).flatMap { f =>
          val canon = scala.util.Try(f.dataType match {
            case StringType => Some(raw)
            case ByteType | ShortType | IntegerType | LongType =>
              Some(raw.toLong.toString)
            case DateType =>
              Some(java.time.LocalDate.parse(raw).toEpochDay.toString)
            case TimestampType => // identity-partitioned timestamps prune too
              org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
                org.apache.spark.unsafe.types.UTF8String.fromString(raw), zone)
                .map(_.toString)
            case FloatType => Some(raw.toFloat.toString)
            case DoubleType => Some(raw.toDouble.toString)
            case BooleanType => Some(raw.toBoolean.toString)
            case _ => None
          }).toOption.flatten
          canon.map(c => f.name -> (c, c))
        }.toSeq
      }
    }.toMap
  }

  private val ManifestDir = "_graft_manifest"
  private def manifestRel(v: Long) = s"$ManifestDir/v=$v.tsv"

  // ── commit log / refs log ──────────────────────────────────────────────

  /** Named refs (Iceberg branches/tags): append-only `name,kind,version`
    * log, last line per name wins; a `dropped` line is a tombstone — the
    * name is free for re-creation and its pins are released. */
  // Refs pin retention (expiry's reachability reads them), so on scheme'd
  // roots they get the same create-only-object treatment as the commit
  // ledger: each ref WRITE is its own immutable record
  // `_graft_reflog/r-<b64url(name)>.<seq>.rec` (never mutated in place — an
  // in-place overwrite would open a truncation window where a concurrent
  // expiry reads an empty record and loses the ref's retention pin); per
  // name the HIGHEST sequence wins, `dropped` is a tombstone, and each
  // write opportunistically GC's the name's superseded records. Writers to
  // different names never touch the same object; concurrent writers to the
  // SAME name race highest-seq-wins, which is the append log's
  // last-line-wins semantics. Legacy appended lines still read (records
  // overlay them per name).
  private val RefRecordsDir = "_graft_reflog"
  private def refRecordPrefix(name: String) = "r-" +
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(name.getBytes("UTF-8"))
  private def refRecordRel(name: String, seq: String) =
    s"$RefRecordsDir/${refRecordPrefix(name)}.$seq.rec"

  /** Test seam: invoked between readRefs' record LIST and its per-record
    * GETs — lets specs inject a concurrent [[writeRef]] (whose opportunistic
    * GC deletes every record the LIST returned) into the exact window the
    * re-list recovery protects. Production: no-op. */
    private[sources] var afterRefsList: () => Unit = () => ()

  private def readRefs(): Map[String, (String, Long)] = {
    def parse(line: String): (String, (String, Long)) = {
      val m = line.split(",", 3)
      m(0) -> (m(1), m(2).toLong)
    }
    val legacy =
      if (!metaExists(RefsFile)) Nil else metaReadLines(RefsFile).map(parse)
    // One LIST + per-name GETs. Returns (resolved entries, true when some
    // listed name yielded NO readable record — the LIST-then-GET race with
    // a concurrent writeRef whose opportunistic GC deleted every record the
    // list returned; the caller re-lists once and the fresh list contains
    // the writer's newer record). Without the retry a ref would transiently
    // VANISH from readRefs, and an expiry in that window would lose the
    // branch/tag's retention pin — the loss class the create-only record
    // design exists to prevent.
    def listOnce(): (Seq[(String, (String, Long))], Boolean) = {
      val dir = hPath(RefRecordsDir)
      if (!rootFs.exists(dir)) (Nil, false)
      else {
        val listed = rootFs.listStatus(dir).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith("r-") && n.endsWith(".rec"))
        afterRefsList()
        var vanished = false
        val entries = listed
          .groupBy(_.split('.').head) // records of one name share a prefix
          .toSeq.sortBy(_._1)
          .flatMap { case (_, names) =>
            // highest sequence wins; a mid-write record (no terminating
            // newline yet) is skipped and its predecessor still serves.
            // Sequence'd records outrank any legacy no-seq record.
            val (seqd, legacyRec) = names.partition(_.count(_ == '.') >= 2)
            val best = (seqd.sorted.reverse ++ legacyRec).iterator.flatMap { n =>
              scala.util.Try {
                val raw = metaReadString(s"$RefRecordsDir/$n")
                require(raw.endsWith("\n"), s"mid-write record $n")
                parse(raw.split('\n').head)
              }.toOption
            }.nextOption()
            if (best.isEmpty) vanished = true
            best
          }
        (entries, vanished)
      }
    }
    val records =
      if (rootIsLocal) Nil
      else {
        val (first, vanished) = listOnce()
        if (!vanished) first else listOnce()._1
      }
    // records after legacy: on a scheme'd root every NEW write is a record,
    // so a record is always the name's latest state
    (legacy ++ records).toMap.filter(_._2._1 != "dropped")
  }

  private def writeRef(name: String, kind: String, v: Long): Unit = {
    // the refs log is line/comma-delimited and branch names ride inside
    // colon-delimited op markers — a name containing any of those would
    // corrupt every later read of the whole log, so reject at write time
    require(name.nonEmpty && !name.exists(c => c == ',' || c == ':' || c == '\n' || c == '\r'),
      s"invalid ref name '$name': must be non-empty, no ',' ':' or line breaks")
    if (rootIsLocal) metaAppendString(RefsFile, s"$name,$kind,$v\n")
    else {
      val seq = "%020d-%06d".format(System.currentTimeMillis(),
        SnapshotTable.refSeqCounter.getAndIncrement() % 1000000)
      metaWriteString(refRecordRel(name, seq), s"$name,$kind,$v\n")
      // opportunistic GC of this name's superseded records — readers pick
      // the highest seq, so deleting lower ones is always safe
      val dir = hPath(RefRecordsDir)
      val mine = s"${refRecordPrefix(name)}.$seq.rec"
      if (rootFs.exists(dir))
        rootFs.listStatus(dir).map(_.getPath.getName)
          .filter(n => n.startsWith(refRecordPrefix(name) + ".") &&
            n.endsWith(".rec") && n < mine)
          .foreach(n => metaDelete(s"$RefRecordsDir/$n"))
    }
  }

  private def isBranchOp(op: String): Boolean = op.startsWith(BranchOpPrefix)

  /** Branch op → (name, subOp, parentVersion for delta appends). */
  private def branchOpParts(op: String): (String, String, Option[Long]) = {
    val p = op.split(":")
    (p(1), p(2), if (p.length > 3) Some(p(3).toLong) else None)
  }

  /** The version whose `v=N` dir holds this entry's data (itself, unless
    * the entry is an alias commit). Only meaningful for entries that have a
    * single data dir (full-data and alias ops). */
  private def dataDirVersion(m: Meta): Long =
    if (m._3.startsWith(AliasOpPrefix)) m._3.split(":", 3)(1).toLong else m._1

  private def asOfTarget(op: String): Long = op.split(":", 3)(1).toLong

  private def encodeEvolve(parts: Seq[String]): String =
    EvolveOpPrefix + java.util.Base64.getEncoder.encodeToString(
      parts.mkString("\u001f").getBytes("UTF-8"))

  private def decodeEvolve(op: String): Seq[String] =
    new String(java.util.Base64.getDecoder.decode(op.stripPrefix(EvolveOpPrefix)),
      "UTF-8").split('\u001f').toSeq

  /** A main-lineage entry that is a RESTART POINT for chain resolution: its
    * content does not depend on earlier entries' dirs (full-data dir, alias
    * to a dir, or an asof pointer that resolution follows). Appends,
    * mor-deletes, and evolve commits are NOT restart points — they fold onto
    * the chain before them. */
  private def isRestart(op: String): Boolean =
    op != MorDeleteOp && !isPosDelete(op) && !isDeltaAppend(op) &&
      op != MorUpdateOp && op != MorMergeOp &&
      !op.startsWith(EvolveOpPrefix) && !isBranchOp(op)

  /** Main's head: the latest commit that is on main's lineage (branch
    * commits share the version sequence but not the lineage). */
  private def mainHead(meta: Seq[Meta]): Option[Long] =
    meta.filterNot(m => isBranchOp(m._3)).lastOption.map(_._1)

  private def nextVersion(meta: Seq[Meta]): Long =
    meta.lastOption.map(_._1 + 1).getOrElse(0L)

  // ── commit-record ledger (scheme'd roots only) ─────────────────────────
  //    On object-store roots the shared log FILE cannot be the correctness
  //    anchor: stores without native append fall back to read-modify-write
  //    in [[metaAppendString]], and two cross-PROCESS writers can interleave
  //    that RMW and silently drop an already-committed line. So on non-local
  //    roots the COMMIT POINT is instead the creation of a per-version
  //    record file `_graft_log/v=N.rec` holding exactly the log line: the
  //    name is unique per claimed version (the marker CAS hands out distinct
  //    numbers), so no two writers ever touch the same record and nothing
  //    can be lost to an overwrite. The shared log file is then a derivable
  //    CACHE — [[readMeta]] reconciles it against the records (one LIST per
  //    read; missing lines are re-read from their records), and expiry's
  //    full rewrite heals it. This is Iceberg's shape: immutable per-commit
  //    metadata + a swap/record that is the only mutable step (spark.py:
  //    26-28, SURVEY §3.1 step 5). `file:`/bare roots keep the plain
  //    appended log — local appends are serialized by the root lock and
  //    cheap, and the record ledger would only add IO.
  private val LogRecordsDir = "_graft_log"
  private def logRecordRel(v: Long) = s"$LogRecordsDir/v=$v.rec"

  private def parseMetaLine(line: String): Meta = {
    val m = line.split(",", 4)
    (m(0).toLong, m(1).toLong, m(2), m(3).toLong)
  }

  /** Versions with a commit record on disk (scheme'd roots). One LIST. */
  private def listLogRecordVersions(): Seq[Long] = {
    val dir = hPath(LogRecordsDir)
    if (!rootFs.exists(dir)) Nil
    else rootFs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v=") && n.endsWith(".rec"))
      .flatMap(_.stripPrefix("v=").stripSuffix(".rec").toLongOption)
  }

  /** Reconciliation memo for scheme'd roots, keyed by the cache file's
    * (modificationTime, length): EVERY cache mutation — including the RMW
    * rewrites that can lose lines — changes the file, so the memo can
    * never hide a lost line; the one staleness it admits is a crashed
    * writer's record-only commit staying invisible TO THIS INSTANCE until
    * any later cache write (fresh instances — recovery reads, new
    * readers — always reconcile anew). What it buys: an offset poll or
    * repeat commit-path read costs ONE status RPC instead of a cache GET +
    * a `_graft_log` LIST per call — the remote metadata hot path. */
  @volatile private var metaMemo: Option[(Long, Long, Seq[Meta])] = None

  /** `fresh = true` bypasses [[metaMemo]] and reconciles anew — REQUIRED on
    * the commit/claim validation path: the memo's (mtime, length) key can
    * ALIAS on object stores with coarse mtime granularity (S3: 1 s) when two
    * interleaved RMW cache rewrites land equal-length content within one
    * tick, and a claim re-validation served from that stale memo could
    * re-claim — and clobber — an already-committed version whose marker
    * self-GC'd. Reads that only serve data keep the memo (their staleness
    * window is the documented crashed-writer one); the correctness decisions
    * (claim re-validation, final head check) pay one fresh LIST instead. */
  private def readMeta(fresh: Boolean = false): Seq[Meta] = {
    if (!rootIsLocal) {
      val status =
        try Some(rootFs.getFileStatus(hPath(MetaFile)))
        catch { case _: java.io.FileNotFoundException => None }
      return readMetaRemote(status, fresh)
    }
    val cached =
      if (!metaExists(MetaFile)) Nil
      else metaReadLines(MetaFile).map(parseMetaLine)
    // defensive: interleaved RMW repairs could land one version's line
    // twice in the cache — a duplicate entry would double that delta in
    // chain resolution, so keep the first occurrence per version
    cached.distinctBy(_._1).sortBy(_._1)
  }

  private def readMetaRemote(
      status: Option[org.apache.hadoop.fs.FileStatus],
      fresh: Boolean = false): Seq[Meta] = {
    val key = status.map(s => (s.getModificationTime, s.getLen))
    if (!fresh) metaMemo.foreach { case (m, l, res) =>
      if (key.contains((m, l))) return res
    }
    val cached =
      if (status.isEmpty) Nil
      else metaReadLines(MetaFile).map(parseMetaLine)
    val all = {
        // reconcile: any committed record the cache is missing (a lost RMW
        // append, or a writer that died between its record write and its
        // cache append) is read back from its own file. A record is only
        // accepted with its terminating newline — on stores where
        // create+write+close is not atomic (HDFS-shape) a reader can see a
        // PREFIX of a mid-write record, and a prefix truncated inside the
        // final number would otherwise parse as a wrong row count; the
        // newline is the record's last byte, so requiring it rejects every
        // truncation. A record that does not parse is likewise mid-write —
        // its commit point has not landed yet.
        val inCache = cached.map(_._1).toSet
        cached ++ listLogRecordVersions().filterNot(inCache).flatMap { v =>
          scala.util.Try {
            val raw = metaReadString(logRecordRel(v))
            require(raw.endsWith("\n"), s"mid-write record v=$v")
            parseMetaLine(raw.split('\n').head)
          }.toOption
        }
      }
    // defensive: interleaved RMW repairs could land one version's line
    // twice in the cache — a duplicate entry would double that delta in
    // chain resolution, so keep the first occurrence per version
    val res = all.distinctBy(_._1).sortBy(_._1)
    key.foreach { case (m, l) => metaMemo = Some((m, l, res)) }
    res
  }

  // ── cross-process commit critical section ────────────────────────────────
  //    With a registered arbiter, the validate→log tail of every commit runs
  //    inside the arbiter's commit mutex: [[validateHeadOrRelease]] acquires
  //    before its fresh head read, plain (validation-free) commits acquire
  //    at [[appendMeta]], and the section releases once the log record is
  //    durable. Data writes stay OUTSIDE the section — at 100 TB the heavy
  //    parquet writes of concurrent commits proceed in parallel and only the
  //    short metadata tail serializes, the same split Iceberg gets from its
  //    catalog-side CAS. The flag is per-instance but every path here runs
  //    under [[withRootLock]]'s monitor, so a single thread owns it.
  private var commitMutexHeld = false

  private def acquireCommitMutex(): Unit =
    if (!commitMutexHeld)
      SnapshotTable.arbiterFor(root).foreach { a =>
        a.lockCommit(SnapshotTable.canonicalRoot(root))
        commitMutexHeld = true
      }

  private def releaseCommitMutex(): Unit =
    if (commitMutexHeld) {
      commitMutexHeld = false
      SnapshotTable.arbiterFor(root)
        .foreach(_.unlockCommit(SnapshotTable.canonicalRoot(root)))
    }

  /** Test seam: runs inside the commit section just before the fence
    * check + log-tail write (models a GC pause at the worst point). */
  private[sources] var beforeLogTail: () => Unit = () => ()

  /** Test seam: runs AFTER the early fence check passes, just before the
    * token-conditional tail write (models a GC pause in the residual
    * window the r18 fence left open — the conditional write closes it). */
  private[sources] var afterFenceBeforeTail: () => Unit = () => ()

  private def appendMeta(version: Long, op: String, rows: Long): Unit = {
    acquireCommitMutex()
    try {
      beforeLogTail()
      // fencing, early reject: a holder whose commit.lock was taken over
      // (stale-break by another process after a long pause) must NOT
      // write the tail
      SnapshotTable.arbiterFor(root)
        .foreach(_.verifyFence(SnapshotTable.canonicalRoot(root)))
      afterFenceBeforeTail()
      val line = s"$version,${System.currentTimeMillis()},$op,$rows\n"
      // the tail write itself is TOKEN-CONDITIONAL on the arbiter seam:
      // epoch check + write are atomic against takeovers, so a pause
      // between the fence check above and here cannot land the record
      def writeTail(): Unit = {
        // scheme'd roots: the record file IS the commit point (see the
        // ledger note above); the shared log below is only a cache of it
        if (!rootIsLocal) metaWriteString(logRecordRel(version), line)
        metaAppendString(MetaFile, line)
      }
      SnapshotTable.arbiterFor(root) match {
        case Some(a) => a.conditionalTailWrite(
          SnapshotTable.canonicalRoot(root), () => writeTail())
        case None => writeTail()
      }
      // self-GC: once the version is LOGGED the marker has done its job —
      // `claimVersion` re-validates against the log after every create, so a
      // racer that re-creates this number can never keep it. Without this a
      // long-lived table accrues one empty file per version forever and every
      // commit pays an O(total-versions) marker listing (on an object store,
      // the classic metadata bottleneck).
      deleteMarker(version)
    } finally releaseCommitMutex()
  }

  // ── optimistic concurrency (Iceberg's atomic-swap commit: SURVEY §3.1
  //    step 5, reference spark.py:88-89 → REST-catalog CAS). A version is
  //    CLAIMED by atomically creating `_graft_commits/v=N` (create-exclusive
  //    — POSIX atomic); losing the race re-reads and retries with the next
  //    number, so two concurrent writers always land DISTINCT versions and
  //    neither overwrites the other's files or log entry. Operations that
  //    derived their data from a snapshot read (cow DELETE/UPDATE/MERGE,
  //    compaction, mor key selection) additionally validate that main's head
  //    is still the snapshot they read — a moved head means the computed
  //    result is stale, and the commit raises [[SnapshotTable.CommitConflictException]]
  //    for the caller to re-read and retry, exactly Iceberg's
  //    conflict-detection contract. Plain appends never conflict (they
  //    commute), also matching Iceberg. ──────────────────────────────────

  // Marker IO goes through Hadoop's FileSystem so the CAS discipline holds
  // on `hdfs:`/`s3a:` roots, not just the local FS (the DedupStream
  // discipline). Local roots keep java.nio's O_EXCL create — RawLocalFS's
  // create(overwrite=false) is check-then-act, strictly weaker; HDFS's is
  // atomic server-side; S3A is best-effort (a real deployment closes that
  // window with a catalog-side CAS, as validateHeadOrRelease documents).
  private lazy val rootFs: org.apache.hadoop.fs.FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private lazy val rootIsLocal: Boolean = {
    val scheme = new Path(root).toUri.getScheme
    scheme == null || scheme == "file"
  }

  private def commitMarkersDir = new Path(root, "_graft_commits")
  private def markerPath(v: Long) = new Path(commitMarkersDir, s"v=$v")

  /** Create-exclusive on the marker: true = this writer owns version `v`.
    * With a registered [[SnapshotTable.ClaimArbiter]] the CAS is the
    * arbiter's (the catalog-CAS seam for stores whose create-exclusive is
    * best-effort); the marker file is still written, best-effort, so
    * [[removeOrphans]] keeps protecting this in-flight writer's dir. */
  private def tryClaimMarker(v: Long): Boolean =
    SnapshotTable.arbiterFor(root) match {
      case Some(arb) =>
        if (!arb.tryClaim(SnapshotTable.canonicalRoot(root), v)) false
        else {
          try {
            rootFs.mkdirs(commitMarkersDir)
            rootFs.create(markerPath(v), true).close()
          } catch { case scala.util.control.NonFatal(_) => () }
          true
        }
      case None => tryClaimMarkerFs(v)
    }

  private def tryClaimMarkerFs(v: Long): Boolean =
    if (rootIsLocal) {
      try {
        Files.createDirectories(Paths.get(localRootPath, "_graft_commits"))
        Files.createFile(Paths.get(localRootPath, "_graft_commits", s"v=$v")); true
      }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { rootFs.create(markerPath(v), false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if rootFs.exists(markerPath(v)) => false
      }
    }

  private def deleteMarker(v: Long): Unit = {
    SnapshotTable.arbiterFor(root)
      .foreach(_.release(SnapshotTable.canonicalRoot(root), v))
    rootFs.delete(markerPath(v), false)
  }

  /** Highest marker currently on disk (or held by the arbiter, when one is
    * registered). Markers self-GC once logged ([[appendMeta]]), so this
    * lists O(in-flight claims), not O(versions). */
  private def maxClaimed(): Long = {
    val fsMax =
      if (!rootFs.exists(commitMarkersDir)) -1L
      else rootFs.listStatus(commitMarkersDir).iterator
        .flatMap(s => s.getPath.getName.stripPrefix("v=").toLongOption)
        .foldLeft(-1L)(math.max)
    math.max(fsMax, SnapshotTable.arbiterFor(root)
      .map(_.maxClaimed(SnapshotTable.canonicalRoot(root))).getOrElse(-1L))
  }

  /** Atomically claim the next free version number. Never returns a version
    * another writer holds; a lost race simply moves to the next number.
    * After winning a create, the claim is RE-VALIDATED against the log:
    * markers self-GC once their version is logged, so a racer whose meta
    * read predated that append could re-create a spent number — the
    * re-validation releases it and moves past the log instead. */
  /** Test seam: invoked right after a marker create SUCCEEDS, before the
    * claim's log re-validation — lets specs inject a cross-process writer
    * landing (log append + marker self-GC) into the exact window the
    * re-validation protects. Production: no-op. */
  private[sources] var afterMarkerClaim: Long => Unit = _ => ()

  private def claimVersion(meta: Seq[Meta]): Long = {
    rootFs.mkdirs(commitMarkersDir)
    var next = math.max(nextVersion(meta), maxClaimed() + 1)
    var claimed = false
    while (!claimed) {
      if (!tryClaimMarker(next)) next += 1
      else {
        afterMarkerClaim(next)
        val logged = nextVersion(readMeta(fresh = true))
        if (next < logged) { deleteMarker(next); next = math.max(logged, maxClaimed() + 1) }
        else claimed = true
      }
    }
    next
  }

  /** Per-root in-process lock: commits from concurrent threads of one JVM
    * serialize their claim→write→log section (cross-process writers are
    * ordered by the marker CAS alone). Keyed by the SAME canonical form the
    * scan-stats map uses — java.nio canonicalization garbles scheme'd roots
    * (`s3a://b/x` → `<cwd>/s3a:/b/x`), so two spellings of one remote root
    * would take different locks. */
  private def withRootLock[T](body: => T): T =
    SnapshotTable.rootLocks
      .computeIfAbsent(SnapshotTable.canonicalRoot(root), _ => new Object)
      // safety net: an op failing between its mutex acquire and appendMeta's
      // release (a data-write error mid-tail) must not leak the cross-process
      // commit section; release is a no-op when not held
      .synchronized(try body finally releaseCommitMutex())

  private def headConflict(expected: Option[Long], now: Option[Long]): Nothing =
    throw new SnapshotTable.CommitConflictException(
      s"commit conflict at $root: expected main head $expected but found " +
        s"$now — the table changed since this operation read it; re-read and retry")

  /** Test seam: invoked immediately before a read-dependent commit's FINAL
    * head validation (after its data is written, before the log append) —
    * lets specs inject a cross-process writer into the exact window the
    * re-check protects. Production: no-op. */
  private[sources] var beforeFinalHeadCheck: () => Unit = () => ()

  /** Undo an optimistic claim that lost its conflict check: delete everything
    * written under the claimed version (data dir with any `_graft_deletes`
    * key file inside it, manifest sidecar, cached manifest) and then the
    * claim marker itself, so a lost race leaves NO orphaned files. Releasing
    * the marker is safe: by the time a conflict is raised the winning writer
    * has already logged its entry, so `claimVersion`'s
    * `max(nextVersion, maxClaimed + 1)` floor has moved past every live
    * version and a re-claim of this number can only happen after this
    * cleanup completed (marker deletion is last). */
  private def releaseClaim(v: Long): Unit = {
    rootFs.delete(new Path(root, s"v=$v"), true)
    metaDelete(manifestRel(v))
    manifestCache.synchronized { manifestCache.remove(v) }
    manifestSpecCache.synchronized { manifestSpecCache.remove(v) }
    deleteMarker(v)
  }

  /** Final conflict validation of a read-dependent commit: re-reads the log
    * AFTER the data write (covering cross-process writers that landed during
    * the write window — in-JVM writers are serialized by [[withRootLock]])
    * and releases the claim before raising, so a conflict leaves no orphans.
    * NOTE: the validation and the log append are two steps, not a CAS —
    * within one JVM the root lock makes check+append atomic, and ACROSS
    * processes a registered arbiter's commit mutex does
    * ([[SnapshotTable.ClaimArbiter.lockCommit]], entered here before the
    * fresh read and released by [[appendMeta]]; [[LockDirClaimArbiter]] is
    * the durable implementation). Without an arbiter, cross-process callers
    * get Iceberg's optimistic window, which a real deployment closes with a
    * catalog-side CAS. */
  private def validateHeadOrRelease(expected: Option[Long], next: Long): Unit = {
    beforeFinalHeadCheck()
    // enter the cross-process commit section BEFORE the fresh read: no
    // record can land between this check and our own appendMeta (which
    // releases the section) — see the ClaimArbiter.lockCommit contract
    acquireCommitMutex()
    val now = mainHead(readMeta(fresh = true))
    if (now != expected) {
      releaseCommitMutex(); releaseClaim(next); headConflict(expected, now)
    }
  }

  // ── data-dir write path (manifest-producing) ───────────────────────────

  /** Write `df` as version `v`'s data dir and its manifest sidecar, reading
    * per-file record counts AND per-column (min, max) ranges from parquet
    * FOOTERS (driver-side, O(files just written) — the commit-time stats
    * pass Iceberg does when it writes manifests; the ranges are what
    * [[readWhere]] prunes files with). Returns the row count, so commits
    * never re-scan the data they just wrote. `partitionBy` lays the dir out
    * as `<col>=…/part-*.parquet` hive partitions (manifest names stay
    * relative, so stats and metadata scans see through the partition dirs). */
  private def writeVersionDir(df: DataFrame, v: Long,
      partitionBy: Seq[String] = Nil, spec: Seq[String] = Nil): Long = {
    val dir = s"$root/v=$v"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val base = new Path(dir)
    val fs = base.getFileSystem(hconf)
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, Path, Long)]
    val basePrefix = base.toUri.getPath.stripSuffix("/") + "/"
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        // manual prefix-strip: URI.relativize treats a no-trailing-slash base
        // as a file and mangles nested (partition-dir) children
        val rel = st.getPath.toUri.getPath.stripPrefix(basePrefix)
        if (rel.split('/').forall(s => !s.startsWith("_") && !s.startsWith(".")))
          found += ((rel, st.getPath, st.getLen))
      }
    }
    val stats = found.sortBy(_._1).toSeq.map { case (rel, path, len) =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, hconf))
      try {
        // footer stats win; partition-path values fill in the columns hive
        // layout removed from the files (identity partition cols), plus a
        // day-range for the hidden transform's source timestamp when its
        // own footer stats are unavailable
        val footerSt = SnapshotTable.footerColumnStats(reader.getFooter)
        SnapshotTable.ManifestFile(rel, reader.getRecordCount, len,
          partitionPathStats(rel, df.schema) ++ footerSt)
      } finally reader.close()
    }
    val header = "#schema\t" + java.util.Base64.getEncoder.encodeToString(
      df.schema.json.getBytes("UTF-8"))
    // the spec in force when these files were WRITTEN rides the manifest
    // (Iceberg's spec-id-per-file): transform-derived pruning conjuncts are
    // only sound against files whose recorded spec matches the derivation
    val specLine =
      if (spec.isEmpty) Nil
      else Seq("#spec\t" + java.util.Base64.getEncoder.encodeToString(
        spec.mkString(",").getBytes("UTF-8")))
    val body = stats.map(f =>
      s"${f.name}\t${f.records}\t${f.bytes}\t${SnapshotTable.encodeStats(f.stats)}")
    metaWriteString(manifestRel(v),
      ((header +: specLine) ++ body).mkString("", "\n", "\n"))
    stats.map(_.records).sum
  }

  /** Per-instance manifest cache: a version's manifest is immutable once
    * written (expiry deletes it, but then the version is unreadable anyway),
    * and resolution probes it from both the base-selection scan and the
    * delta-batching pass — a 500-delta chain must not re-open 1000 files.
    * Synchronized: concurrent committers share the instance. */
  private val manifestCache =
    scala.collection.mutable.HashMap.empty[Long, Option[(StructType, Seq[SnapshotTable.ManifestFile])]]

  /** Partition spec recorded in each version's manifest (`#spec` header):
    * Some(spec) when recorded, None for legacy manifests — filled as a side
    * effect of [[readManifest]]. */
  private val manifestSpecCache =
    scala.collection.mutable.HashMap.empty[Long, Option[Seq[String]]]

  /** The partition spec version `v`'s files were WRITTEN under, when its
    * manifest recorded one (r14+ manifests of partitioned stores). */
  private[sources] def manifestSpec(v: Long): Option[Seq[String]] = {
    readManifest(v) // populates both caches
    manifestSpecCache.synchronized(manifestSpecCache.get(v)).flatten
  }

  /** The manifest written with version `v`'s data dir, if present:
    * (schema, per-file name/records/bytes/column-ranges). */
  private[sources] def readManifest(v: Long): Option[(StructType, Seq[SnapshotTable.ManifestFile])] =
    manifestCache.synchronized {
      manifestCache.getOrElseUpdate(v, readManifestUncached(v))
    }

  private def readManifestUncached(v: Long): Option[(StructType, Seq[SnapshotTable.ManifestFile])] =
    if (!metaExists(manifestRel(v))) None
    else {
      val lines = metaReadLines(manifestRel(v))
      val schema = lines.headOption.filter(_.startsWith("#schema\t")).map { h =>
        DataType.fromJson(new String(java.util.Base64.getDecoder.decode(
          h.split("\t", 2)(1)), "UTF-8")).asInstanceOf[StructType]
      }
      val spec = lines.find(_.startsWith("#spec\t")).map { l =>
        splitSpecEntries(new String(
          java.util.Base64.getDecoder.decode(l.split("\t", 2)(1)), "UTF-8"))
      }
      manifestSpecCache.synchronized { manifestSpecCache.put(v, spec) }
      schema.map { sch =>
        (sch, lines.drop(1).filterNot(_.startsWith("#")).map { l =>
          // pre-r12 manifests have 3 fields (no stats) — still readable,
          // they just never prune
          val p = l.split("\t", 4)
          SnapshotTable.ManifestFile(p(0), p(1).toLong, p(2).toLong,
            if (p.length > 3) SnapshotTable.decodeStats(p(3)) else Map.empty)
        }.toSeq)
      }
    }

  /** Version `v`'s own data dir as a DataFrame. An EMPTY commit (zero data
    * files — e.g. a truncate) reads back as an empty frame with the schema
    * the manifest recorded, where a bare parquet read would fail. A dir
    * with a manifest plans over [[ManifestFileIndex]], so pushed-down
    * predicates skip files at physical-planning time on EVERY read path. */
  private def readVersionDir(v: Long): DataFrame =
    readManifest(v) match {
      case Some((schema, files)) if files.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some((schema, _)) =>
        manifestRelation(Seq(v)).getOrElse(
          inSchemaOrder(schema, spark.read.parquet(s"$root/v=$v")))
      case _ => spark.read.parquet(s"$root/v=$v")
    }

  /** A hive partition-dir value string in Catalyst INTERNAL form for the
    * declared column type — None for types the layout never produces (the
    * caller then falls back to Spark's own partition discovery). */
  private def partitionValueInternal(raw: String,
      dt: DataType): Option[Any] = dt match {
    case StringType  => Some(org.apache.spark.unsafe.types.UTF8String.fromString(raw))
    case IntegerType => raw.toIntOption
    case LongType    => raw.toLongOption
    case ShortType   => raw.toShortOption
    case ByteType    => raw.toByteOption
    case BooleanType => raw.toBooleanOption
    case DoubleType  => raw.toDoubleOption
    case FloatType   => raw.toFloatOption
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(raw).toEpochDay.toInt).toOption
    case TimestampType =>
      // hive layout writes timestamp partition values in the session zone
      org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw),
        java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
    case _ => None
  }

  /** The given version dirs as ONE manifest-backed parquet relation: a
    * [[ManifestFileIndex]] over every manifest-listed file (qualified path,
    * byte size, column ranges, parsed partition values) under a
    * HadoopFsRelation, so Spark's `FileSourceStrategy` consults the
    * manifests — never the filesystem — and pushed-down filters prune files
    * before the scan plans. This is what makes file skipping happen on the
    * PLAIN read paths (reference clinicdata.sql:38-39: a day query reads
    * one partition no matter who asks), where [[readWhere]] serves callers
    * that want the eagerly-measured variant.
    *
    * None (→ caller falls back to `spark.read.parquet`) when any dir lacks
    * a manifest, schemas differ across dirs, or the partition layout is
    * inconsistent / carries a value the declared type cannot parse — the
    * fallback only costs the pruning, never correctness. */
  private def manifestRelation(versions: Seq[Long]): Option[DataFrame] = {
    val manifests = versions.flatMap(v => readManifest(v).map(v -> _))
    if (manifests.size != versions.size) return None
    val schema = manifests.head._2._1
    if (manifests.exists(_._2._1.json != schema.json)) return None
    val files = manifests.flatMap { case (v, (_, fs)) => fs.map(v -> _) }
    if (files.isEmpty) return None
    def dirPairs(name: String): Seq[(String, String)] =
      name.split('/').dropRight(1).toSeq.map { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) ("", seg)
        else (seg.substring(0, i),
          java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8"))
      }
    val partKeys = dirPairs(files.head._2.name).map(_._1)
    if (partKeys.exists(_.isEmpty)) return None
    if (files.exists(f => dirPairs(f._2.name).map(_._1) != partKeys)) return None
    val partFieldOpts = partKeys.map(k =>
      schema.fields.find(_.name.equalsIgnoreCase(k)))
    if (partFieldOpts.exists(_.isEmpty)) return None
    val partitionSchema = StructType(
      partFieldOpts.flatten.map(_.copy(nullable = true)))
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partKeys.exists(_.equalsIgnoreCase(f.name))).map(_.copy(nullable = true)))
    if (dataSchema.isEmpty) return None
    val hconf = spark.sparkContext.hadoopConfiguration
    val fsys = new Path(root).getFileSystem(hconf)
    val entryOpts: Seq[Option[ManifestFileEntry]] = files.map { case (v, f) =>
      val pairs = dirPairs(f.name)
      val valueOpts = pairs.zip(partitionSchema.fields).map { case ((_, raw), fld) =>
        if (raw == "__HIVE_DEFAULT_PARTITION__") Some(null)
        else partitionValueInternal(raw, fld.dataType)
      }
      if (valueOpts.exists(_.isEmpty)) None
      else Some(ManifestFileEntry(
        fsys.makeQualified(new Path(s"$root/v=$v/${f.name}")), f.bytes, f.stats,
        pairs.map(p => s"${p._1}=${p._2}").mkString("/"),
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(valueOpts.map(_.get))))
    }
    if (entryOpts.exists(_.isEmpty)) return None
    val index = new ManifestFileIndex(spark, root, schema, partitionSchema,
      entryOpts.flatten, conj => transformConjuncts(schema, conj, versions))
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, partitionSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty)(spark)
    // restore the DECLARED column order: a hive layout physically moves
    // partition columns to the end, but readers must see the schema as
    // committed (Iceberg preserves column order under any partition spec)
    Some(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(rel)
      .select(schema.fields.map(f => col(f.name)).toSeq: _*))
  }

  // ── resolution ─────────────────────────────────────────────────────────

  /** Head of MAIN (side-branch commits are not main's lineage). */
  def currentVersion: Option[Long] = mainHead(readMeta())

  /** Cheap driver-side identity of the commit-log head:
    * (version, committed_at_ms) of the LAST log line, None for an empty
    * log. Unlike a bare version number this survives deleting and
    * recreating a store at the same path (the version counter restarts
    * but the commit timestamp differs), so it is the correct key for
    * cross-serve memoization (IvfIndex, r21 review finding). */
  private[graft] def headIdentity: Option[(Long, Long)] =
    readMeta().lastOption.map(m => (m._1, m._2))

  // ── streaming-read support (graft.streaming.SnapshotSource) ────────────

  /** Every commit-log entry as `(version, op)`, oldest first — the
    * streaming READ path's planning input. One driver-side read of the
    * commit log: O(commits), never O(data). */
  private[graft] def commitOps(): Seq[(Long, String)] =
    readMeta().map(m => (m._1, m._3))

  /** How one commit-log entry affects an incremental APPEND consumer
    * (Iceberg's Spark streaming-read taxonomy):
    *  - `"append"`: a delta-append commit — its own dir IS the batch payload
    *  - `"noop"`: logically invisible to an append stream — `compact`
    *    rewrites existing rows without changing them, `evolve:` is
    *    metadata-only, `branch:` commits live on another lineage
    *  - `"mutation"`: anything that changes or replaces existing rows
    *    (overwrite, truncate, row-level DML, rollback, WAP publish) — an
    *    append stream must fail loudly or be told to skip these. */
  private[graft] def streamOpKind(op: String): String =
    if (isDeltaAppend(op)) "append"
    else if (op == "compact" || op.startsWith(EvolveOpPrefix) || isBranchOp(op)) "noop"
    else "mutation"

  /** Version `v`'s own delta dir, manifest-backed and schema-ordered — the
    * payload of one streamed append batch. Version dirs are immutable, so
    * a checkpoint replay of the same version range rebuilds byte-identical
    * batches (until `expireSnapshots` retires them, which breaks replay the
    * same way it breaks time travel — loudly). */
  private[graft] def appendDelta(v: Long): DataFrame = readVersionDir(v)

  /** Columns an evolve commit introduces under a NEW name (ADD's column,
    * RENAME's target) — what a running stream's pinned schema cannot carry
    * until restart; the streaming source's schema-drift detector. Empty for
    * every other op (widen keeps its name: the conform try_cast guard owns
    * that case). */
  private[graft] def evolveNewColumns(op: String): Seq[String] =
    if (!op.startsWith(EvolveOpPrefix)) Nil
    else decodeEvolve(op) match {
      case Seq("add", name, _)  => Seq(name)
      case Seq("rename", _, to) => Seq(to)
      case _                    => Nil
    }

  /** Is this a schema-evolution commit at all? */
  private[graft] def isEvolveOp(op: String): Boolean =
    op.startsWith(EvolveOpPrefix)

  /** Is this evolve commit a RENAME? */
  private[graft] def evolveIsRename(op: String): Boolean =
    op.startsWith(EvolveOpPrefix) &&
      decodeEvolve(op).headOption.contains("rename")

  /** The (old, new) names of a RENAME evolve commit — what
    * `IcebergExport.syncStore` mirrors metadata-only (the field id
    * carries under the new name). */
  private[graft] def evolveRenamePair(op: String): Option[(String, String)] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("rename", o, n) => Some((o, n))
      case _                   => None
    }

  /** The commit-log op string a `renameColumn(o, n)` records — the replay
    * marker `IcebergExport.syncFromTable`'s staged-rename mirror checks
    * (a pure swap leaves the NAME SET unchanged, so completion is only
    * visible in the op history). */
  private[graft] def renameOpString(o: String, n: String): String =
    encodeEvolve(Seq("rename", o, n))

  /** The new spec of a PARTITION evolve commit (store grammar entries;
    * empty = partitioning dropped) — what `IcebergExport.syncStore`
    * mirrors as a chain spec evolution. */
  private[graft] def evolvePartitionSpec(op: String): Option[Seq[String]] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("partition", csv) =>
        // entries themselves contain commas ("bucket(2, id)") — split on
        // top-level commas only
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        var depth = 0
        csv.foreach {
          case ',' if depth == 0 => out += cur.toString; cur.clear()
          case c =>
            if (c == '(') depth += 1
            if (c == ')') depth -= 1
            cur += c
        }
        out += cur.toString
        Some(out.toSeq.map(_.trim).filter(_.nonEmpty))
      case Seq("partition") => Some(Nil)
      case _ => None
    }

  /** The (column, target type) a WIDENING evolve commit promotes, if any —
    * the adopt-on-evolve rollover boundary check for type widening. */
  private[graft] def evolveWidenedColumn(op: String): Option[(String, DataType)] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("widen", name, ddl) => Some(name -> DataType.fromDDL(ddl))
      case _                       => None
    }

  /** The (parent, child) of a NESTED-ADD evolve commit — a rollover
    * boundary like a top-level ADD: a pinned schema whose struct lacks the
    * subfield restarts to adopt it. */
  private[graft] def evolveNestedAdd(op: String): Option[(String, String)] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("addnested", p, c, _) => Some((p, c))
      case _                         => None
    }

  /** The (parent, path, newName) of a NESTED-RENAME evolve commit — what
    * `IcebergExport.syncStore` mirrors as a chain nested rename (dotted
    * renames map), field id carried. */
  private[graft] def evolveNestedRenamePair(op: String)
      : Option[(String, String, String)] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("renamenested", p, path, to) => Some((p, path, to))
      case _                                => None
    }

  /** The (parent, path) a nested MUTATION evolve commit (rename/drop/widen
    * inside a struct) touches — the streaming source's rollover-boundary
    * and drift probe for struct drift a pinned schema cannot carry. */
  private[graft] def evolveNestedMutation(op: String)
      : Option[(String, String, String)] =
    if (!op.startsWith(EvolveOpPrefix)) None
    else decodeEvolve(op) match {
      case Seq("renamenested", p, path, _) => Some((p, path, "rename"))
      case Seq("dropnested", p, path)      => Some((p, path, "drop"))
      case Seq("widennested", p, path, _)  => Some((p, path, "widen"))
      case _                               => None
    }

  /** Is this op on MAIN's lineage (a valid time-travel anchor)? Branch
    * commits share the version counter but not the lineage. */
  private[graft] def isMainLineageOp(op: String): Boolean = !isBranchOp(op)

  /** Commit a new snapshot. `op = "append"` is O(DELTA): only `df` is
    * written (a new delta dir + manifest); readers union live deltas onto
    * the base and `compact()` folds them — the Iceberg append cost model
    * (reference spark.py:88-89). Any other op is copy-on-write: `df` IS the
    * new full snapshot. Appends support SCHEMA EVOLUTION (the Iceberg
    * behavior this mirrors): new columns may appear and old columns may be
    * absent — resolution unions by name with missing columns null-filled,
    * and the resolved snapshot carries the widened schema. Row counts come
    * from the commit-time manifest (parquet footers), never a re-scan. */
  def commit(df: DataFrame, op: String = "overwrite"): Long =
    commit(df, op, expectedHead = None)

  /** [[commit]] with optimistic conflict detection: when `expectedHead` is
    * given, the commit claims its version atomically and then verifies
    * main's head is still exactly that value — raising
    * [[SnapshotTable.CommitConflictException]] (and releasing the claim) if
    * another writer moved it. Pass the head the operation's data was READ
    * from; ops whose result doesn't depend on prior state pass None. */
  def commit(df: DataFrame, op: String, expectedHead: Option[Option[Long]]): Long =
    withRootLock {
      val meta = readMeta()
      expectedHead.foreach { exp =>
        val now = mainHead(meta)
        if (now != exp) headConflict(exp, now)
      }
      val next = claimVersion(meta)
      val prev = mainHead(meta)
      val written = writeDataDir(df, next)
      // re-verify AFTER the (long) data write: a cross-process writer that
      // committed during the write window must conflict here, not land a
      // stale result as head (see validateHeadOrRelease's contract note)
      expectedHead.foreach(exp => validateHeadOrRelease(exp, next))
      val rows =
        if (isDeltaAppend(op))
          prev.map(tableRowsAsOf(meta, _)).getOrElse(0L) + written
        else written
      appendMeta(next, op, rows)
      next
    }

  /** Declare the store's partition spec (identity columns and/or one
    * `days(ts)` transform — the D4/D5 forms the catalog tables support) and
    * commit `df` under it. The spec persists: every later commit (appends,
    * mor replacement files, streaming micro-batches, compaction) lays its
    * data out in the same hive partition dirs, so partition pruning holds
    * across the whole chain. Readers never see the hidden day column
    * (Iceberg's hidden-partitioning contract — predicates stay on the
    * timestamp itself). */
  def commitPartitioned(df: DataFrame, spec: Seq[String],
      op: String = "overwrite",
      expectedHead: Option[Option[Long]] = None): Long = {
    require(spec.nonEmpty, "commitPartitioned needs at least one spec entry")
    spec.foreach(e => validateSpecEntry(df.schema, e))
    metaWriteString(PartitionSpecFile, spec.mkString(","))
    commit(df, op, expectedHead)
  }

  /** Table row count as of main version `v`, from the commit log alone:
    * every op records its resulting total except mor-delete (which records
    * its delete-key count; keys are unique per row by the mode's contract,
    * so the total is the previous total minus the keys). */
  private def tableRowsAsOf(meta: Seq[Meta], v: Long): Long = {
    val entry = meta.find(_._1 == v).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$v at $root"))
    if (entry._3 == MorDeleteOp || isPosDelete(entry._3)) {
      // both delete-file kinds log their delete count; each delete row
      // removes exactly one table row ((file, pos) is unique per row; mor
      // keys are unique by the mode's contract)
      val prev = meta.filter(m => m._1 < v && !isBranchOp(m._3)).lastOption
        .getOrElse(throw new IllegalStateException(
          s"delete-file commit v=$v has no preceding main snapshot at $root"))
      tableRowsAsOf(meta, prev._1) - entry._4
    } else entry._4
  }

  /** Read latest, or `VERSION AS OF` when a version is given.
    *
    * Resolution walks back to the nearest RESTART POINT (full-data dir,
    * alias, or asof pointer), then folds every later main-lineage entry in
    * commit order: append deltas union on (by name, null-filling — schema
    * evolution), mor-delete key files apply as broadcast anti-joins (the
    * delete sets are small by the mode's own selection criterion, so the
    * plan is a map-only scan over the base with no data-side shuffle), and
    * evolve entries apply their schema change. */
  def read(versionAsOf: Option[Long] = None): DataFrame = {
    val meta = readMeta()
    val v = versionAsOf.orElse(mainHead(meta))
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    resolveVersion(meta, v, None).drop(hiddenReadCols: _*)
  }

  /** Pruned read: like [[read]] with `.filter(pred)`, but MANIFEST COLUMN
    * STATS skip whole data files whose (min, max) ranges exclude the
    * predicate BEFORE the scan plans — Iceberg's core scan optimization. At
    * 100 TB a selective predicate over a sorted/clustered store reads the
    * few files that can match instead of listing-and-scanning every live
    * file. Pruning is inclusive (any uncertainty keeps the file) and the
    * residual filter always applies, so results are identical to
    * `read().filter(pred)`; [[lastPruneStats]] reports (kept, total) data
    * files for plan audits. */
  def readWhere(pred: Column, versionAsOf: Option[Long] = None): DataFrame = {
    val meta = readMeta()
    val v = versionAsOf.orElse(mainHead(meta))
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    val resolved = resolveVersion(meta, v, None)
    val conj0 = SnapshotTable.conjunctsOf(resolved, pred)
    // derivation soundness is checked against the dirs THIS read resolves
    // (O(chain)), never the full commit log (O(history))
    val conj = transformConjuncts(resolved.schema, conj0,
      dataDirsOf(meta, v).map(dirVersionOf))
    pruneKept = 0L; pruneTotal = 0L
    resolveVersion(meta, v, Some(conj)).filter(pred).drop(hiddenReadCols: _*)
  }

  /** (data files scanned, data files live) of the most recent [[readWhere]]
    * on this instance — the file-skipping measure specs and plan audits
    * require() on. */
  def lastPruneStats: (Long, Long) = (pruneKept, pruneTotal)

  private var pruneKept = 0L
  private var pruneTotal = 0L

  /** Version `v`'s own data dir, file-pruned by `conj` when its manifest
    * carries column stats. Reads through hive-partition subdirs (basePath)
    * so partition columns survive a partial file list. */
  /** A frame's columns reordered to the manifest-declared schema order (a
    * hive-partitioned read appends partition columns at the end; readers
    * must see the committed order). Only reorders — never adds, drops, or
    * retypes; a frame missing declared columns passes through untouched. */
  private def inSchemaOrder(schema: StructType, df: DataFrame): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val wanted = schema.fields.map(_.name)
    if (wanted.forall(c => have(c.toLowerCase)) && have.size == wanted.length &&
        df.columns.toSeq != wanted.toSeq)
      df.select(wanted.map(col).toSeq: _*)
    else df
  }

  private def readVersionDirPruned(v: Long, prune: Option[Seq[Expression]]): DataFrame =
    prune match {
      case Some(cs) => readManifest(v) match {
        case Some((schema, files)) if files.nonEmpty =>
          val kept = files.filter(f => SnapshotTable.mayContain(schema, f.stats, cs))
          pruneKept += kept.size; pruneTotal += files.size
          if (kept.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          else if (kept.size == files.size) readVersionDir(v)
          else if (kept.exists(_.name.contains('/')))
            inSchemaOrder(schema, spark.read.option("basePath", s"$root/v=$v")
              .parquet(kept.map(f => s"$root/v=$v/${f.name}"): _*))
          else spark.read.parquet(kept.map(f => s"$root/v=$v/${f.name}"): _*)
        case Some((schema, _)) =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        case None => readVersionDir(v)
      }
      case None => readVersionDir(v)
    }

  /** Does applying this evolve op make earlier files' column stats
    * untrustworthy for pruning by post-evolution names? A rename (or a drop,
    * which frees the name for a later add) can alias an OLD column's stats
    * to a NEW column; widening changes the value domain. Adds are safe. */
  private def evolveBlocksPruning(op: String): Boolean =
    op.startsWith(EvolveOpPrefix) && (decodeEvolve(op).headOption match {
      case Some("rename") | Some("drop") | Some("widen") => true
      // adds are safe; a partition-spec change never renames a column and
      // every file's stats were recorded from the layout it was actually
      // written under, so STATS pruning across the spec boundary stays
      // sound. Spec-DERIVED conjuncts (hidden-bucket equality) are the one
      // exception — they are gated per-file by the manifest-recorded spec
      // in bucketDerivationSound, not here
      case _ => false
    })

  /** Provenance annotation for pos-delete-aware resolution: each row of a
    * file-backed frame gains its parquet file path and in-file row index
    * from Spark's `_metadata` column. Frames with no file source (empty
    * commits) null-fill — a null never equi-joins, so such rows are simply
    * immune to position deletes, which is exactly right (they came from no
    * file a delete file could name). */
  private def withPosCols(df: DataFrame): DataFrame =
    if (df.columns.contains(FileCol)) df
    else scala.util.Try(df.select(col("*"),
        col("_metadata.file_path").as(FileCol),
        col("_metadata.row_index").as(PosCol))).getOrElse(
      df.withColumn(FileCol, lit(null).cast(StringType))
        .withColumn(PosCol, lit(null).cast(LongType)))

  private def resolveVersion(meta: Seq[Meta], v: Long,
      prune: Option[Seq[Expression]], withPos: Boolean = false): DataFrame = {
    val entry = meta.find(_._1 == v).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$v at $root"))
    if (isBranchOp(entry._3)) {
      val (_, subOp, parent) = branchOpParts(entry._3)
      if (subOp == DeltaAppendOp)
        resolveVersion(meta, parent.get, prune)
          .unionByName(readVersionDirPruned(v, prune), allowMissingColumns = true)
      else readVersionDirPruned(v, prune)
    } else {
      // branch commits share the version sequence but not main's lineage:
      // when resolving a main version they are invisible (a branch commit
      // must never be picked as a base, nor folded as a delta/delete file)
      val upTo = meta.filter(m => m._1 <= v && !isBranchOp(m._3))
      // a manifest-less append dir predates the O(delta) layout (the old
      // commit() wrote base+delta as a full copy): it is its own base, never
      // a delta to union — resolving it as a delta would duplicate rows
      val baseIdx = upTo.lastIndexWhere(m => isRestart(m._3) ||
        (isDeltaAppend(m._3) && readManifest(m._1).isEmpty))
      val (start, tail) =
        if (baseIdx < 0) (None, upTo) else (Some(upTo(baseIdx)), upTo.drop(baseIdx + 1))
      // a rename/drop/widen evolve inside this window makes pre-evolve file
      // stats unreliable under post-evolve names — disable pruning for the
      // whole window (conservative; correctness beats a skipped file)
      val p = if (tail.exists(m => evolveBlocksPruning(m._3))) None else prune
      // pos-deletes in the window need every DATA frame annotated with its
      // rows' (file, pos) provenance from the base onward, so the delete
      // files can anti-join
      val posNeeded = withPos || tail.exists(m => isPosDelete(m._3))
      def posWrap(df: DataFrame): DataFrame =
        if (posNeeded) withPosCols(df) else df
      val base: Option[DataFrame] = start.map { m =>
        if (m._3.startsWith(AsOfOpPrefix))
          resolveVersion(meta, asOfTarget(m._3), p, posNeeded)
        else posWrap(readVersionDirPruned(dataDirVersion(m), p))
      }
      batchDeltaRuns(tail).foldLeft(base) {
        case (acc, Right(run)) =>
          // one multi-dir parquet relation for the whole same-schema run: a
          // long ingest chain plans as ONE scan node, not an N-way union —
          // Iceberg likewise plans one scan over all live data files
          val df = p match {
            case Some(cs) =>
              val perDir = run.map { m =>
                // run members always carry a manifest (batchDeltaRuns contract)
                val (schema, files) = readManifest(m._1).get
                val kept = files.filter(f => SnapshotTable.mayContain(schema, f.stats, cs))
                pruneKept += kept.size; pruneTotal += files.size
                (m._1, schema, kept, files.size)
              }
              val nested = perDir.exists(_._3.exists(_.name.contains('/')))
              if (perDir.forall(d => d._3.size == d._4))
                inSchemaOrder(perDir.head._2,
                  spark.read.parquet(run.map(m => s"$root/v=${m._1}"): _*))
              else if (perDir.forall(_._3.isEmpty))
                spark.createDataFrame(spark.sparkContext.emptyRDD[Row], perDir.head._2)
              else if (!nested)
                spark.read.parquet(perDir.flatMap { case (ver, _, kept, _) =>
                  kept.map(f => s"$root/v=$ver/${f.name}") }: _*)
              else perDir.filter(_._3.nonEmpty).map { case (ver, sch, kept, total) =>
                // posWrap BEFORE the union: `_metadata` only resolves on a
                // file-source relation — wrapping the reduced Union would
                // silently null-fill and make these rows immune to
                // position deletes
                posWrap(if (kept.size == total) readVersionDir(ver)
                else inSchemaOrder(sch, spark.read.option("basePath", s"$root/v=$ver")
                  .parquet(kept.map(f => s"$root/v=$ver/${f.name}"): _*)))
              }.reduce(_.unionByName(_, allowMissingColumns = true))
            case None => manifestRelation(run.map(_._1)).getOrElse {
              val raw = spark.read.parquet(run.map(m => s"$root/v=${m._1}"): _*)
              readManifest(run.head._1).map(m => inSchemaOrder(m._1, raw))
                .getOrElse(raw)
            }
          }
          Some(acc.map(_.unionByName(posWrap(df), allowMissingColumns = true))
            .getOrElse(posWrap(df)))
        case (acc, Left(m)) => Some(applyChainOp(acc, m, p, posNeeded))
      }.orElse {
        // chain of NOTHING but zero-row deltas (batchDeltaRuns drops them):
        // an empty frame with the latest delta's manifest schema
        tail.reverseIterator.collectFirst {
          case m if isDeltaAppend(m._3) && readManifest(m._1).isDefined =>
            posWrap(readVersionDir(m._1))
        }
      }.getOrElse(throw new IllegalStateException(
        s"no data at or before v=$v at $root"))
    }
  }

  /** Group CONSECUTIVE append-delta entries whose manifests carry the SAME
    * schema into runs (Right); everything else stays a single step (Left).
    * Empty deltas (a zero-row append) are dropped outright — they contribute
    * no rows and an all-empty multi-dir read could not infer a schema. */
  private def batchDeltaRuns(tail: Seq[Meta]): Seq[Either[Meta, Seq[Meta]]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[Meta, Seq[Meta]]]
    val run = scala.collection.mutable.ArrayBuffer.empty[(Meta, String)]
    def flush(): Unit = if (run.nonEmpty) {
      out += (if (run.length == 1) Left(run.head._1) else Right(run.map(_._1).toSeq))
      run.clear()
    }
    tail.foreach { m =>
      val manifest = if (isDeltaAppend(m._3)) readManifest(m._1) else None
      manifest match {
        case Some((schema, files)) =>
          if (files.isEmpty) () // zero-row delta: a no-op in the union
          else {
            val json = schema.json
            if (run.nonEmpty && run.head._2 != json) flush()
            run += ((m, json))
          }
        case None => flush(); out += Left(m)
      }
    }
    flush()
    out.toSeq
  }

  private def applyChainOp(acc: Option[DataFrame], m: Meta,
      prune: Option[Seq[Expression]], posNeeded: Boolean = false): DataFrame = {
    def posWrap(df: DataFrame): DataFrame =
      if (posNeeded) withPosCols(df) else df
    m._3 match {
    case op if isDeltaAppend(op) =>
      val delta = posWrap(readVersionDirPruned(m._1, prune))
      acc.map(_.unionByName(delta, allowMissingColumns = true)).getOrElse(delta)
    case MorDeleteOp =>
      // delete-KEY files are never pruned: they remove base rows regardless
      // of the read predicate (only data-contributing dirs may be skipped)
      val del = readVersionDir(m._1)
      // the delete file's COLUMNS are the equality-delete key (one or many —
      // Iceberg equality deletes are multi-column); NULL-SAFE equality, the
      // way IcebergExport.readTable applies equality-delete files — a
      // foreign delete file may carry NULL key values and must delete
      // null-keyed rows here too, or the mirror drifts from the chain
      val df = acc.getOrElse(throw new IllegalStateException(
        s"mor-delete v=${m._1} has no base snapshot at $root"))
      df.join(broadcast(del),
        del.columns.map(c => df(c) <=> del(c)).reduce(_ && _), "left_anti")
    case op2 if isPosDelete(op2) =>
      // the delete file's columns ARE the provenance pair (graft__file,
      // graft__pos); the base carries them because posNeeded covered this
      // window — one broadcast anti-join, exactly the equality-delete plan
      val del = readVersionDir(m._1)
      val df = acc.getOrElse(throw new IllegalStateException(
        s"pos-delete v=${m._1} has no base snapshot at $root"))
      df.join(broadcast(del), del.columns.toSeq, "left_anti")
    case MorUpdateOp =>
      val df = acc.getOrElse(throw new IllegalStateException(
        s"mor-update v=${m._1} has no base snapshot at $root"))
      val repl = posWrap(readVersionDirPruned(m._1, prune))
      if (!morKeysExist(m._1)) df // predicate matched nothing: a no-op commit
      else {
        val keys = spark.read.parquet(morUpdateDeletesDir(m._1))
        // anti-join on EVERY key column (the delete file carries the whole
        // composite key, like the mor-delete path) — joining on a prefix
        // would drop base rows that share only the first key component
        df.join(broadcast(keys), keys.columns.toSeq, "left_anti")
          .unionByName(repl, allowMissingColumns = true)
      }
    case MorMergeOp =>
      val df = acc.getOrElse(throw new IllegalStateException(
        s"mor-merge v=${m._1} has no base snapshot at $root"))
      val repl = posWrap(readVersionDirPruned(m._1, prune))
      val afterDel =
        if (!morKeysExist(m._1)) df // insert-only merge: nothing matched
        else {
          val keys = spark.read.parquet(morUpdateDeletesDir(m._1))
          df.join(broadcast(keys), keys.columns.toSeq, "left_anti")
        }
      // unlike mor-update, the dir unions even with no keys (inserts)
      afterDel.unionByName(repl, allowMissingColumns = true)
    case op if op.startsWith(EvolveOpPrefix) =>
      applyEvolve(acc.getOrElse(throw new IllegalStateException(
        s"schema evolution v=${m._1} has no base snapshot at $root")), op)
    case other =>
      throw new IllegalStateException(s"unexpected chain op $other at v=${m._1}")
  }
  }

  /** One schema-evolution commit applied to a frame (shared by chain
    * resolution and the CDC before-image alignment). */
  private def applyEvolve(df: DataFrame, op: String): DataFrame =
    decodeEvolve(op) match {
      case Seq("add", name, ddl) =>
        // idempotent for the CDC-alignment path: a frame that already carries
        // the column must not have it nulled out
        if (df.columns.contains(name)) df
        else df.withColumn(name, lit(null).cast(DataType.fromDDL(ddl)))
      case Seq("drop", name)     => df.drop(name)
      case Seq("rename", a, b)   => df.withColumnRenamed(a, b)
      case Seq("widen", name, ddl) =>
        // type widening is metadata-only: readers cast during resolution
        // (idempotent — casting an already-widened column is a no-op)
        df.withColumn(name, col(name).cast(DataType.fromDDL(ddl)))
      case Seq("addnested", parent, child, ddl) =>
        // nested ADD: history rows read the subfield as NULL; withField
        // keeps a NULL struct NULL (idempotent for CDC alignment — a
        // frame already carrying the subfield keeps its values). `child`
        // may be a dotted path into nested structs.
        val cur = df.schema.fields.find(_.name.equalsIgnoreCase(parent))
        def walk(dt: DataType, segs: Seq[String]): Boolean = dt match {
          case s: org.apache.spark.sql.types.StructType =>
            s.fields.find(_.name.equalsIgnoreCase(segs.head)) match {
              case Some(f) if segs.size == 1 => true
              case Some(f) => walk(f.dataType, segs.tail)
              case None => false
            }
          case _ => false
        }
        val has = cur.exists(f => walk(f.dataType, child.split('.').toSeq))
        if (has || cur.isEmpty) df
        else df.withColumn(cur.get.name, col(cur.get.name)
          .withField(child, lit(null).cast(DataType.fromDDL(ddl))))
      case Seq("renamenested", parent, path, to) =>
        // nested RENAME: position-preserving struct rebuild (withField +
        // dropFields would move the subfield to the end, and the mirror
        // compare against a foreign chain — whose renames keep position —
        // must see identical shapes). Idempotent: a frame already renamed
        // (or never carrying the source path) passes through.
        df.schema.fields.find(_.name.equalsIgnoreCase(parent)) match {
          case Some(pf) if nestedPathType(pf.dataType, path).isDefined =>
            df.withColumn(pf.name, renameNestedExpr(col(pf.name),
              pf.dataType.asInstanceOf[StructType], path.split('.').toSeq, to))
          case _ => df
        }
      case Seq("dropnested", parent, path) =>
        // nested DROP: dropFields keeps sibling order and NULL structs NULL;
        // idempotent (a frame without the path passes through)
        df.schema.fields.find(_.name.equalsIgnoreCase(parent)) match {
          case Some(pf) if nestedPathType(pf.dataType, path).isDefined =>
            df.withColumn(pf.name, col(pf.name).dropFields(path))
          case _ => df
        }
      case Seq("widennested", parent, path, ddl) =>
        // nested type widening: withField replaces IN PLACE; casting an
        // already-widened subfield is a no-op, so replay is idempotent
        df.schema.fields.find(_.name.equalsIgnoreCase(parent)) match {
          case Some(pf) if nestedPathType(pf.dataType, path).isDefined =>
            val sub = path.split('.').foldLeft(col(pf.name))(_.getField(_))
            df.withColumn(pf.name, col(pf.name)
              .withField(path, sub.cast(DataType.fromDDL(ddl))))
          case _ => df
        }
      case Seq("partition", _*) =>
        // partition-spec evolution is LAYOUT-only: the frame a reader sees
        // is unchanged (files written before keep their dirs, files after
        // use the new spec) — the op rides the log purely so history and
        // time travel record when the spec moved
        df
      case other => throw new IllegalStateException(s"bad evolve op: $other")
    }

  /** The type at a dotted subfield path (None when any segment is missing
    * or not a struct) — the replay/idempotence probe for nested evolve ops. */
  private def nestedPathType(dt: DataType, path: String): Option[DataType] = {
    def walk(t: DataType, segs: Seq[String]): Option[DataType] = t match {
      case s: StructType =>
        s.fields.find(_.name.equalsIgnoreCase(segs.head)).flatMap(f =>
          if (segs.size == 1) Some(f.dataType) else walk(f.dataType, segs.tail))
      case _ => None
    }
    walk(dt, path.split('.').toSeq)
  }

  /** Position-preserving nested rename as a struct-rebuild expression; a
    * NULL struct stays NULL at every level. */
  private def renameNestedExpr(c: Column, s: StructType, segs: Seq[String],
      to: String): Column = {
    def renameInType(t: StructType, sg: Seq[String]): StructType =
      StructType(t.fields.map { f =>
        val renamed =
          if (f.name.equalsIgnoreCase(sg.head)) {
            if (sg.size == 1) f.copy(name = to)
            else f.copy(dataType = renameInType(
              f.dataType.asInstanceOf[StructType], sg.tail))
          } else f
        // nullable cast target: casting an expression to a NOT NULL struct
        // type is an analysis error
        renamed.copy(nullable = true)
      })
    val parts = s.fields.toSeq.map { f =>
      if (f.name.equalsIgnoreCase(segs.head)) {
        if (segs.size == 1) c.getField(f.name).as(to)
        else renameNestedExpr(c.getField(f.name),
          f.dataType.asInstanceOf[StructType], segs.tail, to).as(f.name)
      } else c.getField(f.name).as(f.name)
    }
    when(c.isNull, lit(null).cast(renameInType(s, segs)))
      .otherwise(struct(parts: _*))
  }

  /** The main-lineage version a snapshot's resolution chain is rooted in:
    * branch commits root at the main version their parent walk reaches. */
  private def mainLineageAnchor(meta: Seq[Meta], v: Long): Long =
    meta.find(_._1 == v) match {
      case Some(entry) if isBranchOp(entry._3) =>
        val (_, subOp, parent) = branchOpParts(entry._3)
        if (subOp == DeltaAppendOp) mainLineageAnchor(meta, parent.get)
        else -1L // a full branch dir has no main root; the schema-reflection
                 // guard in changes() decides which evolves apply
      case _ => v
    }

  /** `TIMESTAMP AS OF`: latest MAIN snapshot committed at or before
    * tsMillis (side-branch commits are not main's timeline). */
  def readAsOfTimestamp(tsMillis: Long): DataFrame = {
    val v = readMeta().filterNot(m => isBranchOp(m._3)).filter(_._2 <= tsMillis)
      .lastOption
      .getOrElse(throw new IllegalStateException(s"no snapshot at or before $tsMillis"))
    read(Some(v._1))
  }

  /** S3/S4 — snapshot/history metadata as a DataFrame. `row_count` is each
    * op's own record: resulting table rows for data ops, delete-key count
    * for mor-deletes. */
  def history(): DataFrame = {
    import spark.implicits._
    readMeta().toDF("version", "committed_at_ms", "operation", "row_count")
      .withColumn("committed_at", timestamp_millis(col("committed_at_ms")))
  }

  // ── retention / maintenance ────────────────────────────────────────────

  /** Every version whose log entry and/or data dir version `v`'s RESOLVED
    * content reads: the retention unit (Iceberg expires nothing a live
    * snapshot still references). Transitive. */
  private def reachable(meta: Seq[Meta], v: Long): Set[Long] =
    meta.find(_._1 == v) match {
      case None => Set(v)
      case Some(entry) =>
        val op = entry._3
        if (isBranchOp(op)) {
          val (_, subOp, parent) = branchOpParts(op)
          if (subOp == DeltaAppendOp) Set(v) ++ reachable(meta, parent.get)
          else Set(v)
        } else if (op.startsWith(AliasOpPrefix)) Set(v, dataDirVersion(entry))
        else if (op.startsWith(AsOfOpPrefix)) Set(v) ++ reachable(meta, asOfTarget(op))
        else if (op == MorDeleteOp || isPosDelete(op) || isDeltaAppend(op) ||
            op == MorUpdateOp || op == MorMergeOp ||
            op.startsWith(EvolveOpPrefix)) {
          val prev = meta.filter(m => m._1 < v && !isBranchOp(m._3)).lastOption
          Set(v) ++ prev.map(p => reachable(meta, p._1)).getOrElse(Set.empty)
        } else Set(v)
    }

  /** Expire every version not reachable from `keepSeed`, main's head, or a
    * live ref — the shared retention core of both VACUUM forms. Reachability
    * extends each kept version to everything its resolution reads (delta
    * chains back to their base, mor-delete bases, alias/asof targets), so
    * expiry can never orphan a readable snapshot's files. Returns the
    * expired versions (dirs + manifests deleted, log entries dropped). */
  private def expireExcept(keepSeed: Set[Long]): Seq[Long] = {
    val meta = readMeta()
    val seed = keepSeed ++ mainHead(meta) ++ readRefs().values.map(_._2)
    val keep = seed.flatMap(v => reachable(meta, v))
    val expire = meta.map(_._1).filterNot(keep).sorted
    expire.foreach { v =>
      rootFs.delete(new Path(root, s"v=$v"), true)
      metaDelete(manifestRel(v))
      // drop the commit record too (scheme'd roots), or readMeta's
      // reconciliation would resurrect the expired entry from it
      metaDelete(logRecordRel(v))
    }
    val expired = expire.toSet
    val remaining = meta.filterNot(m => expired(m._1))
    val content = remaining.map { case (v, t, o, r) => s"$v,$t,$o,$r" }
      .mkString("", "\n", if (remaining.nonEmpty) "\n" else "")
    metaWriteString(MetaFile, content)
    // marker sweep for pre-self-GC stores and crashed writers: any marker
    // BELOW the log's next version is spent (its writer either logged — and
    // the re-validation in claimVersion keeps a re-created number from being
    // kept — or died after other writers moved the log past it). Markers at
    // or above the log head may be in-flight claims and are never touched;
    // below-head markers additionally get a GRACE PERIOD — a SLOW writer
    // whose claimed number the log moved past is still protected by its
    // marker against removeOrphans, so sweeping a young marker would strip
    // that protection mid-write and let a later orphan pass delete a dir
    // whose commit is about to be logged.
    if (rootFs.exists(commitMarkersDir)) {
      val floor = nextVersion(remaining)
      val graceCutoff =
        System.currentTimeMillis() - SnapshotTable.MarkerSweepGraceMillis
      rootFs.listStatus(commitMarkersDir).foreach { s =>
        s.getPath.getName.stripPrefix("v=").toLongOption
          .filter(v => v < floor && s.getModificationTime < graceCutoff)
          .foreach(deleteMarker)
      }
    }
    expire
  }

  /** X2 — expire old snapshots, keeping the most recent `keep` versions
    * (mirror of Iceberg's expire_snapshots). Retention extends to every
    * version a kept snapshot, main's head, or a live ref still reaches. */
  def expireSnapshots(keep: Int): Seq[Long] =
    expireExcept(readMeta().takeRight(keep).map(_._1).toSet)

  /** X2 — expire snapshots COMMITTED BEFORE `tsMillis` (the `VACUUM TABLE …
    * EXPIRE SNAPSHOTS OLDER_THAN` form). The expire set is selected by
    * TIMESTAMP directly — a wall-clock step backward between commits can
    * only over-retain, never expire a snapshot committed at or after the
    * cutoff — and every retention guarantee of [[expireSnapshots]] (delta
    * chains, mor bases, ref pins, alias/asof targets, main's head) applies
    * identically. */
  def expireSnapshotsOlderThan(tsMillis: Long): Seq[Long] =
    expireExcept(readMeta().filter(_._2 >= tsMillis).map(_._1).toSet)

  /** Iceberg's remove_orphan_files: delete `v=N` dirs that NO commit
    * references and NO claim marker protects, and that are older than the
    * age threshold (the slow-writer guard Iceberg's procedure also takes,
    * default 3 days). Orphans arise when a writer crashes between its data
    * write and its log append and its claim marker is later swept by
    * expiry — from then on nothing ever deletes the dir, and at 100 TB
    * crashed-ingest leftovers are real money. Never touches logged
    * versions (including expired-then-aliased targets — their log entries
    * are retained by expiry's reachability), marker-protected in-flight
    * claims, or dirs younger than the threshold.
    *
    * The threshold has a FLOOR of [[SnapshotTable.MinOrphanAgeMillis]]
    * (24 h — Iceberg's remove_orphan_files refuses short intervals the
    * same way): a marker-swept but still-in-flight slow writer's dir must
    * never qualify, or its eventual log append would point at a deleted
    * dir. Callers that genuinely need a shorter window (tests, forensic
    * cleanup of a known-dead writer) must pass `force = true`, taking on
    * the slow-writer risk explicitly. Returns removed versions. */
  def removeOrphans(olderThanMillis: Long = 3L * 24 * 3600 * 1000,
      force: Boolean = false): Seq[Long] = withRootLock {
    require(force || olderThanMillis >= SnapshotTable.MinOrphanAgeMillis,
      s"removeOrphans(olderThanMillis = $olderThanMillis): intervals under " +
        s"${SnapshotTable.MinOrphanAgeMillis / 3600000} h risk deleting a " +
        "slow in-flight writer's data dir (its claim marker may already be " +
        "swept); pass force = true to accept that explicitly")
    val meta = readMeta()
    val logged = meta.map(_._1).toSet
    val aliased = meta.map(dataDirVersion).toSet // defensive: alias targets
    val cutoff = System.currentTimeMillis() - olderThanMillis
    if (!rootFs.exists(new Path(root))) Nil
    else rootFs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap { s =>
        s.getPath.getName.stripPrefix("v=").toLongOption.filter { v =>
          !logged(v) && !aliased(v) && !rootFs.exists(markerPath(v)) &&
            s.getModificationTime < cutoff
        }.map { v =>
          rootFs.delete(s.getPath, true)
          metaDelete(manifestRel(v))
          manifestCache.synchronized { manifestCache.remove(v) }
          manifestSpecCache.synchronized { manifestSpecCache.remove(v) }
          v
        }
      }.sorted
  }

  /** Directories holding the CURRENT snapshot's DATA files (base + live
    * append deltas; merge-on-read delete-key files excluded): what
    * file-level metadata scans should list — Iceberg's files/partitions
    * tables likewise report data files, with delete files accounted
    * separately. */
  def currentDataDirs: Seq[String] = {
    val meta = readMeta()
    val v = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    dataDirsOf(meta, v)
  }

  private def dataDirsOf(meta: Seq[Meta], v: Long): Seq[String] = {
    val entry = meta.find(_._1 == v).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$v at $root"))
    if (isBranchOp(entry._3)) {
      val (_, subOp, parent) = branchOpParts(entry._3)
      if (subOp == DeltaAppendOp) dataDirsOf(meta, parent.get) :+ s"$root/v=$v"
      else Seq(s"$root/v=$v")
    } else {
      val upTo = meta.filter(m => m._1 <= v && !isBranchOp(m._3))
      val baseIdx = upTo.lastIndexWhere(m => isRestart(m._3) ||
        (isDeltaAppend(m._3) && readManifest(m._1).isEmpty)) // legacy full copy
      val (start, tail) =
        if (baseIdx < 0) (None, upTo) else (Some(upTo(baseIdx)), upTo.drop(baseIdx + 1))
      val baseDirs = start.toSeq.flatMap { m =>
        if (m._3.startsWith(AsOfOpPrefix)) dataDirsOf(meta, asOfTarget(m._3))
        else Seq(s"$root/v=${dataDirVersion(m)}")
      }
      baseDirs ++ tail.collect {
        case m if isDeltaAppend(m._3) || m._3 == MorUpdateOp ||
          m._3 == MorMergeOp => s"$root/v=${m._1}"
      }
    }
  }

  /** The FIRST current data dir (the chain's base) — kept for callers that
    * predate delta appends; metadata scans should use [[currentDataDirs]]. */
  def currentBaseDataDir: String = currentDataDirs.head

  /** Metadata-only live-layout measure for the maintenance advisor
    * ([[TableMaintenance]]): per current data dir, (version, per-file byte
    * sizes) straight from the commit manifests — ZERO data-file opens, the
    * only acceptable cost for a layout decision at 100 TB — plus the count
    * of outstanding delete-fold commits (mor/pos delete files and
    * mor-update/merge key files) every reader currently pays an anti-join
    * for. Legacy dirs without a manifest report an empty size list. */
  def layoutStats(): (Seq[(Long, Seq[Long])], Long) = {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val perDir = dataDirsOf(meta, head).map(dirVersionOf).map { v =>
      (v, readManifest(v).map(_._2.map(_.bytes)).getOrElse(Nil))
    }
    val upTo = meta.filter(m => m._1 <= head && !isBranchOp(m._3))
    val baseIdx = upTo.lastIndexWhere(m => isRestart(m._3) ||
      (isDeltaAppend(m._3) && readManifest(m._1).isEmpty))
    val tail = if (baseIdx < 0) upTo else upTo.drop(baseIdx + 1)
    val folds = tail.count(m => m._3 == MorDeleteOp || isPosDelete(m._3) ||
      m._3 == MorUpdateOp || m._3 == MorMergeOp)
    (perDir, folds.toLong)
  }

  /** The data-dir version number encoded in a current data dir path (for
    * manifest lookup by consumers that walk [[currentDataDirs]]). */
  private[sources] def dirVersionOf(dir: String): Long =
    dir.substring(dir.lastIndexOf("v=") + 2).toLong

  /** X2 — compaction (mirror of rewrite_data_files): rewrite the current
    * version's data as `targetFiles` files in a new FULL snapshot, folding
    * outstanding append deltas and merge-on-read delete files into one
    * base, exactly as Iceberg compaction does.
    *
    * SORT-ORDER AWARE: a store with a declared write order (columns or
    * `zorder(…)` — [[setSortOrder]]) is re-CLUSTERED by the rewrite
    * (Iceberg's `rewrite_data_files(strategy => 'sort'|'zorder')`), never
    * bin-packed flat — compacting a clustered store must not silently
    * destroy the manifest min/max tightness its file skipping depends on.
    * The declared order's pinned file count wins over `targetFiles` when
    * set (an explicit layout declaration beats a bin-pack estimate). */
  def compact(targetFiles: Int): Long = withRootLock {
    val head = currentVersion
    val df = read()
    // an order whose columns schema evolution dropped/renamed cannot apply
    // (applySortOrder skips it): such a rewrite must still bin-pack, or
    // compaction loses all file-count control and maintain() re-rewrites
    // a never-converging layout every tick
    val orderCols = sortOrder match {
      case Seq(z) if zorderOf(z).isDefined => zorderOf(z).get
      case cols                            => cols
    }
    if (orderCols.isEmpty || !orderCols.forall(df.columns.contains))
      commit(df.coalesce(targetFiles), op = "compact", Some(head))
    else {
      pendingRangeFiles = Some(targetFiles)
      try commit(df, op = "compact", Some(head))
      finally pendingRangeFiles = None
    }
  }

  /** Compaction with a sort/z-order spec declared in the same step
    * (Iceberg's `rewrite_data_files(strategy => 'sort', sort_order => …)`):
    * persists the order like the partition spec — so every later write AND
    * every later maintenance tick inherits the clustering — then rewrites. */
  def compactSorted(targetFiles: Int, order: Seq[String]): Long = {
    setSortOrder(order, files = targetFiles)
    compact(targetFiles)
  }

  // ── Row-level DML (Iceberg v2 semantics; reference: readme.md:361-370 the
  //    snapshot/history surface these ops write to, media_ai.sql:49 the
  //    truncate form). Two write modes, mirroring Iceberg's table-write modes:
  //    COPY-ON-WRITE rewrites survivors as a full snapshot — right when a
  //    mutation touches a large fraction of the table (the rewrite costs a
  //    compaction anyway); MERGE-ON-READ commits only the matching keys as an
  //    equality-delete file — right for small deletes over a huge table (a
  //    takedown of 1k docs from a 100 TB corpus writes kilobytes, not 100 TB),
  //    with readers paying one broadcast anti-join until compact() folds the
  //    deletes into a new base.

  /** DELETE FROM … WHERE, copy-on-write: survivors become the new snapshot.
    * SQL DELETE removes only rows where the predicate is TRUE — a NULL
    * predicate keeps the row (matching the merge-on-read form, whose
    * `filter(pred)` selects TRUE-only delete keys), hence the
    * null-safe-equality survivor filter rather than plain negation. */
  def deleteWhere(pred: Column): Long = {
    val head = currentVersion
    commit(read().filter(!(pred <=> lit(true))), op = "cow-delete", Some(head))
  }

  /** DELETE FROM … WHERE, merge-on-read: commits ONLY the distinct matching
    * `keyCol` values (an Iceberg-style equality-delete file; the file's
    * column names record the key). `rows` in the commit log is the
    * delete-key count, not a table row count. Keys must identify rows
    * uniquely for delete semantics to match the copy-on-write form. */
  def deleteWhereMor(pred: Column, keyCol: String): Long =
    deleteWhereMor(pred, Seq(keyCol))

  /** Multi-column equality-delete form (Iceberg equality deletes may span
    * several identifier fields): the delete file carries every key column
    * and readers anti-join on all of them. */
  def deleteWhereMor(pred: Column, keyCols: Seq[String]): Long = withRootLock {
    require(keyCols.nonEmpty, "deleteWhereMor needs at least one key column")
    val meta = readMeta()
    val head = mainHead(meta)
    require(head.nonEmpty, s"no snapshots at $root")
    val next = claimVersion(meta)
    val n = writeVersionDir(
      read().filter(pred).select(keyCols.map(col): _*).distinct(), next)
    validateHeadOrRelease(head, next) // keys were selected from `head`
    appendMeta(next, MorDeleteOp, n)
    next
  }

  /** Equality-delete commit from an explicit KEY FRAME (the shape an
    * Iceberg equality-delete file carries): every table row whose
    * `keyCols` tuple matches a row of `keys` is deleted merge-on-read —
    * the frame form of [[deleteWhereMor]], for callers that HAVE the keys
    * rather than a predicate (mirrored foreign delete files, CDC feeds).
    * Deleting keys with no matching rows is a no-op in effect, so replays
    * are idempotent by value. */
  def deleteKeysMor(keys: DataFrame, keyCols: Seq[String]): Long = withRootLock {
    require(keyCols.nonEmpty, "deleteKeysMor needs at least one key column")
    val meta = readMeta()
    val head = mainHead(meta)
    require(head.nonEmpty, s"no snapshots at $root")
    val distinctKeys = keys.select(keyCols.map(col): _*).distinct()
    // the logged row delta must be the MATCHED row count, not the key
    // count: tableRowsAsOf subtracts it, and foreign keys may match zero
    // rows (replays) or be absent entirely — deleteWhereMor's keys are
    // head-selected so the two coincide there, not here
    val cur = read()
    // null-safe: a foreign delete file may carry NULL key values, and the
    // resolution anti-join (applyChainOp) removes null-keyed rows for them
    val matched = cur.join(broadcast(distinctKeys),
      keyCols.map(c => cur(c) <=> distinctKeys(c)).reduce(_ && _),
      "left_semi").count()
    val next = claimVersion(meta)
    writeVersionDir(distinctKeys, next)
    validateHeadOrRelease(head, next) // matched was counted against `head`
    appendMeta(next, MorDeleteOp, matched)
    next
  }

  /** DELETE FROM … WHERE, merge-on-read with POSITION deletes (Iceberg v2's
    * second delete-file kind): commits ONLY the `(file, row position)` pairs
    * of the matching rows — no key column needed, so this is the delete
    * form for tables WITHOUT a unique key, including removing some copies
    * of duplicated rows (an equality delete would remove every copy).
    * O(matching rows) like the equality form; readers fold it as one
    * broadcast anti-join on the provenance pair until compact(). `rows` in
    * the commit log is the deleted-position count. */
  def deleteWherePos(pred: Column): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta)
    require(head.nonEmpty, s"no snapshots at $root")
    val next = claimVersion(meta)
    val positions = resolveVersion(meta, head.get, None, withPos = true)
      .filter(pred <=> lit(true))
      .select(col(FileCol), col(PosCol))
      .filter(col(FileCol).isNotNull) // rows with no file provenance can't
                                      // be named by a position-delete file
    val n = writeVersionDir(positions, next)
    validateHeadOrRelease(head, next) // positions were selected from `head`
    appendMeta(next, PosDeleteOp, n)
    next
  }

  /** Position-delete commit from a MULTISET of row VALUES: removes exactly
    * as many copies of each distinct row as `rows` carries, by naming that
    * many live `(file, pos)` pairs — identical copies are interchangeable,
    * so WHICH copies is unobservable. This is the mirror shape for a
    * foreign chain's position-delete snapshot, whose positions name chain
    * files this store cannot map (see `IcebergExport.syncFromTable`);
    * `tag` stamps the commit op `pos-delete@<tag>` so a crash replay is
    * detected in the commit log (the streamed-append recipe — position
    * deletes are NOT idempotent by value: a blind replay would delete
    * FURTHER copies). Refuses loudly when live copies run short: that is
    * mirror drift, not a no-op. O(delta) commit: one table scan with a
    * broadcast semi-join gate, the shuffle holds only matched copies. */
  def deleteRowsMultiset(rows: DataFrame, tag: Option[String] = None): Long =
    withRootLock {
    import org.apache.spark.sql.expressions.Window
    val meta = readMeta()
    val head = mainHead(meta)
    require(head.nonEmpty, s"no snapshots at $root")
    val live = resolveVersion(meta, head.get, None, withPos = true)
    val valueCols = live.columns.filterNot(hiddenReadCols.contains).toSeq
    require(rows.columns.toSeq.sorted == valueCols.sorted,
      s"deleteRowsMultiset frame columns ${rows.columns.toSeq} must match " +
        s"the table's $valueCols")
    val wanted = rows.groupBy(valueCols.map(col): _*)
      .agg(count(lit(1)).as("__del_n"))
    // null-safe equality on every column — the frame is a row multiset
    val joinCond = valueCols.map(c => live(c) <=> wanted(c)).reduce(_ && _)
    val w = Window.partitionBy(valueCols.map(live(_)): _*)
      .orderBy(col(FileCol).asc_nulls_last, col(PosCol).asc_nulls_last)
    val chosen = live.join(broadcast(wanted), joinCond, "inner")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__del_n") && col(FileCol).isNotNull)
      .select(col(FileCol), col(PosCol))
    val next = claimVersion(meta)
    val n = writeVersionDir(chosen, next)
    val asked = rows.count()
    if (n != asked) {
      releaseClaim(next)
      throw new IllegalStateException(
        s"deleteRowsMultiset: $asked copies requested but only $n live " +
          s"copies found at $root — the store has drifted from the source")
    }
    validateHeadOrRelease(head, next) // copies were chosen from `head`
    appendMeta(next, tag.fold(PosDeleteOp)(t => s"$PosDeleteOp@$t"), n)
    next
  }

  /** UPDATE … SET col = expr, … WHERE pred (copy-on-write): each assignment
    * applies only where `pred` holds; all other rows pass through. */
  def update(pred: Column, set: Map[String, Column]): Long = {
    val head = currentVersion
    val updated = set.foldLeft(read()) { case (df, (c, expr)) =>
      df.withColumn(c, when(pred, expr).otherwise(col(c)))
    }
    commit(updated, op = "update", Some(head))
  }

  /** UPDATE … SET …, merge-on-read (Iceberg's write.update.mode =
    * merge-on-read): ONE commit whose data files are the UPDATED copies of
    * the matching rows and whose hidden `_graft_deletes/` file holds their
    * keys — O(changed rows), never O(table). The redaction/takedown shape:
    * re-writing 1k docs of a 100 TB corpus costs kilobytes, with readers
    * paying one broadcast anti-join + union until compact() folds it.
    * `keyCol` must identify rows uniquely (the equality-delete contract). */
  def updateMor(pred: Column, set: Map[String, Column], keyCol: String): Long =
    updateMor(pred, set, Seq(keyCol))

  /** Composite-key form of the merge-on-read UPDATE (identifier fields may
    * span several columns, like multi-column equality deletes). */
  def updateMor(pred: Column, set: Map[String, Column], keyCols: Seq[String]): Long = withRootLock {
    require(keyCols.nonEmpty, "updateMor needs at least one key column")
    val meta = readMeta()
    require(mainHead(meta).nonEmpty, s"no snapshots at $root")
    // the delete keys are captured from the REPLACEMENT rows, which is only
    // sound when no key column is reassigned (updating an identifier would
    // delete the NEW key and leave the old row live) — Iceberg likewise
    // refuses to update identifier fields in merge-on-read mode. Spark
    // resolves columns case-insensitively, so the guard must too.
    val clash = set.keys.find(c => keyCols.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"merge-on-read UPDATE cannot reassign the key column ${clash.getOrElse("")}; " +
        "use the copy-on-write mode (or DELETE + INSERT) to change identifiers")
    val next = claimVersion(meta)
    val updated = set.foldLeft(read().filter(pred <=> lit(true))) {
      case (df, (c, e)) => df.withColumn(c, e)
    }
    writeDataDir(updated, next)
    // the delete keys come from the just-written REPLACEMENT files — a
    // delta-sized read, not a second predicate pass over the table
    val written = readVersionDir(next)
    if (!written.isEmpty)
      written.select(keyCols.map(col): _*).distinct()
        .write.mode("overwrite").parquet(morUpdateDeletesDir(next))
    validateHeadOrRelease(mainHead(meta), next)
    appendMeta(next, MorUpdateOp, tableRowsAsOf(meta, mainHead(meta).get))
    next
  }

  /** Iceberg MERGE requires each target row to match at most one source row;
    * a duplicated source key would silently double-insert (or make the
    * matched update non-deterministic), so it is rejected up front. */
  private def requireUniqueKeys(source: DataFrame, keyCol: String): Unit = {
    // NULL keys never match a target row (they simply insert), so compare
    // the NON-NULL key count to the distinct count — only a genuinely
    // duplicated key is a multiple-match hazard
    val r = source.agg(count(col(keyCol)).cast("long").as("n"),
      count_distinct(col(keyCol)).cast("long").as("d")).head()
    require(r.getLong(0) == r.getLong(1),
      s"MERGE source has non-unique $keyCol values (${r.getLong(0)} non-null " +
        s"keys, ${r.getLong(1)} distinct): Iceberg MERGE fails on " +
        "multiple matches for a target row — dedup the source first")
  }

  /** MERGE INTO (upsert) keyed on `keyCol`: WHEN MATCHED THEN UPDATE SET * /
    * WHEN NOT MATCHED THEN INSERT *. Source rows replace matching target
    * rows wholesale and are appended when unmatched. The anti-join's build
    * side is the source's key projection — for the typical small-delta
    * merge, AQE broadcasts it and the target is never shuffled. */
  def merge(source: DataFrame, keyCol: String): Long = {
    val head = currentVersion
    requireUniqueKeys(source, keyCol)
    val merged = read().join(source.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(source, allowMissingColumns = true)
    commit(merged, op = "merge", Some(head))
  }

  /** General MERGE INTO with column-level clauses, keyed on `keyCol`
    * (Iceberg/Spark MERGE semantics — first matching clause wins, rows no
    * clause claims pass through / are not inserted):
    *
    *  - `matched`: `(condition, Some(assignments))` = WHEN MATCHED [AND cond]
    *    THEN UPDATE SET col = expr, …; `(condition, None)` = … THEN DELETE.
    *  - `notMatched`: `(condition, Some(values))` = WHEN NOT MATCHED [AND
    *    cond] THEN INSERT (col, …) VALUES (expr, …); `(condition, None)` =
    *    … THEN INSERT * (source columns matched to target columns by name).
    *
    * Clause conditions and expressions see the TARGET row's columns by their
    * plain names and the SOURCE row's columns as `__src_<name>`.
    *
    * Plan shape at 100 TB: the target joins the (small) source with a
    * left-outer equi-join AQE broadcasts, matched source keys are found with
    * a map-only broadcast-semi pass over the target's key column, and the
    * insert set is the source minus those keys (broadcast anti) — the
    * table-sized side is scanned twice but never shuffled. */
  def mergeInto(source: DataFrame, keyCol: String,
                matched: Seq[(Option[Column], Option[Map[String, Column]])],
                notMatched: Seq[(Option[Column], Option[Map[String, Column]])]): Long = {
    val head = currentVersion
    requireUniqueKeys(source, keyCol)
    commit(mergedFrame(source, keyCol, matched, notMatched), op = "merge", Some(head))
  }

  /** The merged result [[mergeInto]] commits, exposed so plan audits can pin
    * the no-target-shuffle shape without writing a snapshot. */
  private[graft] def mergedFrame(source: DataFrame, keyCol: String,
      matched: Seq[(Option[Column], Option[Map[String, Column]])],
      notMatched: Seq[(Option[Column], Option[Map[String, Column]])]): DataFrame = {
    val target = read()
    val src = source.select(source.columns.toSeq.map(c => col(c).as(s"__src_$c")): _*)
    val joined = target.join(src, col(keyCol) === col(s"__src_$keyCol"), "left_outer")
    val isMatched = col(s"__src_$keyCol").isNotNull
    // first-match-wins clause index; -1 = no clause applies → row unchanged
    val clauseIdx = matched.zipWithIndex.foldLeft(when(!isMatched, lit(-1))) {
      case (acc, ((cond, _), i)) =>
        acc.when(cond.getOrElse(lit(true)) <=> lit(true), lit(i))
    }.otherwise(lit(-1))
    val withIdx = joined.withColumn("__mclause", clauseIdx)
    val deleteIdx = matched.zipWithIndex.collect { case ((_, None), i) => i }
    val kept =
      if (deleteIdx.isEmpty) withIdx
      else withIdx.filter(!col("__mclause").isin(deleteIdx: _*))
    val outCols = target.columns.toSeq.map { c =>
      val upd = matched.zipWithIndex.collect {
        case ((_, Some(set)), i) if set.contains(c) => (i, set(c))
      }
      upd.foldLeft(col(c): Column) { case (acc, (i, e)) =>
        when(col("__mclause") === i, e).otherwise(acc)
      }.as(c)
    }
    val updatedTarget = kept.select(outCols: _*)
    // insert set: source rows with no target match — never shuffles the target
    val srcKeys = source.select(col(keyCol)).distinct()
    val matchedKeys = target.select(col(keyCol))
      .join(broadcast(srcKeys), Seq(keyCol), "left_semi").distinct()
    val unmatchedSrc = src.join(broadcast(matchedKeys),
      col(s"__src_$keyCol") === col(keyCol), "left_anti")
    val insIdx = notMatched.zipWithIndex.foldLeft(when(lit(false), lit(-1))) {
      case (acc, ((cond, _), i)) =>
        acc.when(cond.getOrElse(lit(true)) <=> lit(true), lit(i))
    }.otherwise(lit(-1))
    val insWithIdx = unmatchedSrc.withColumn("__iclause", insIdx)
      .filter(col("__iclause") >= 0)
    val tSchema = target.schema
    val insertRows = notMatched.zipWithIndex.map { case ((_, values), i) =>
      val sel = tSchema.fields.toSeq.map { f =>
        val e = values match {
          case Some(m) => m.getOrElse(f.name, lit(null))
          case None =>
            if (source.columns.contains(f.name)) col(s"__src_${f.name}") else lit(null)
        }
        e.cast(f.dataType).as(f.name)
      }
      insWithIdx.filter(col("__iclause") === i).select(sel: _*)
    }.reduceOption(_ unionByName _)
    insertRows.map(updatedTarget.unionByName(_)).getOrElse(updatedTarget)
  }

  /** MERGE INTO, MERGE-ON-READ (Iceberg's write.merge.mode=merge-on-read):
    * the same clause semantics as [[mergeInto]], but ONE commit holding only
    *  - the UPDATED COPIES of clause-claimed matched rows plus the
    *    not-matched INSERT rows as data files, and
    *  - every clause-claimed matched key (updates AND deletes) as an
    *    equality-delete file in `_graft_deletes/`
    * — O(source), never O(table): a small-delta upsert into a 100 TB table
    * writes kilobytes where [[mergeInto]]'s copy-on-write form rewrites the
    * table. Readers fold it as base ▷ broadcast anti-join ▷ union until
    * compact(). Matched rows no clause claims stay in the base untouched.
    *
    * Plan shape: the matched subset comes from one broadcast-semi pass over
    * the target and the insert set from one broadcast-anti pass — the
    * table-sized side is scanned, never shuffled, and nothing table-sized
    * is written. */
  def mergeIntoMor(source: DataFrame, keyCol: String,
      matched: Seq[(Option[Column], Option[Map[String, Column]])],
      notMatched: Seq[(Option[Column], Option[Map[String, Column]])]): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    requireUniqueKeys(source, keyCol)
    val target = resolveVersion(meta, head, None)
    val tSchema = target.schema
    val src = source.select(source.columns.toSeq.map(c => col(c).as(s"__src_$c")): _*)
    // matched target rows only — delta-sized via a broadcast semi-join
    val srcKeys = source.select(col(keyCol)).distinct()
    val matchedTarget = target.join(broadcast(srcKeys), Seq(keyCol), "left_semi")
    val joined = matchedTarget.join(broadcast(src),
      col(keyCol) === col(s"__src_$keyCol"), "inner")
    // first-match-wins clause index; -1 = unclaimed → stays in the base
    val clauseIdx = matched.zipWithIndex.foldLeft(when(lit(false), lit(-1))) {
      case (acc, ((cond, _), i)) =>
        acc.when(cond.getOrElse(lit(true)) <=> lit(true), lit(i))
    }.otherwise(lit(-1))
    val claimed = joined.withColumn("__mclause", clauseIdx)
      .filter(col("__mclause") >= 0)
    val deleteIdx = matched.zipWithIndex.collect { case ((_, None), i) => i }
    val updates =
      if (deleteIdx.isEmpty) claimed
      else claimed.filter(!col("__mclause").isin(deleteIdx: _*))
    val outCols = tSchema.fields.toSeq.map { f =>
      val upd = matched.zipWithIndex.collect {
        case ((_, Some(set)), i) if set.contains(f.name) => (i, set(f.name))
      }
      upd.foldLeft(col(f.name): Column) { case (acc, (i, e)) =>
        when(col("__mclause") === i, e).otherwise(acc)
      }.cast(f.dataType).as(f.name) // replacements must union onto the base
    }
    val replacements = updates.select(outCols: _*)
    // insert set: source rows matching no target key (broadcast anti)
    val matchedKeys = matchedTarget.select(col(keyCol)).distinct()
    val unmatchedSrc = src.join(broadcast(matchedKeys),
      col(s"__src_$keyCol") === col(keyCol), "left_anti")
    val insIdx = notMatched.zipWithIndex.foldLeft(when(lit(false), lit(-1))) {
      case (acc, ((cond, _), i)) =>
        acc.when(cond.getOrElse(lit(true)) <=> lit(true), lit(i))
    }.otherwise(lit(-1))
    val insWithIdx = unmatchedSrc.withColumn("__iclause", insIdx)
      .filter(col("__iclause") >= 0)
    val insertRows = notMatched.zipWithIndex.map { case ((_, values), i) =>
      val sel = tSchema.fields.toSeq.map { f =>
        val e = values match {
          case Some(m) => m.getOrElse(f.name, lit(null))
          case None =>
            if (source.columns.contains(f.name)) col(s"__src_${f.name}") else lit(null)
        }
        e.cast(f.dataType).as(f.name)
      }
      insWithIdx.filter(col("__iclause") === i).select(sel: _*)
    }.reduceOption(_ unionByName _)
    val data = insertRows.map(replacements.unionByName(_)).getOrElse(replacements)
    // ONE commit: data files (updated copies + inserts) + claimed keys
    val next = claimVersion(meta)
    val written = writeDataDir(data, next)
    val keys = claimed.select(col(keyCol)).distinct()
    val keysN = keys.count()
    if (keysN > 0)
      keys.write.mode("overwrite").parquet(morUpdateDeletesDir(next))
    // rows the read-path anti-join will actually remove: every TARGET row
    // whose key is claimed. With duplicate-keyed base rows (appends can
    // create them; nothing enforces target-key uniqueness) this exceeds the
    // distinct-key count, and the logged total must record what readers see
    // — later appends derive their cumulative counts from it.
    val removedN =
      if (keysN == 0) 0L
      else matchedTarget.join(broadcast(keys), Seq(keyCol), "left_semi").count()
    validateHeadOrRelease(Some(head), next)
    appendMeta(next, MorMergeOp, tableRowsAsOf(meta, head) - removedN + written)
    next
  }

  // ── schema evolution (Iceberg ALTER TABLE … ADD/DROP/RENAME COLUMN) ────
  //    METADATA-ONLY: no data file is touched at any size — readers apply
  //    the change during resolution, old versions keep their original schema.

  /** ALTER TABLE … ADD COLUMN name type — existing rows read back NULL. */
  def addColumn(name: String, typeDdl: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    require(!resolveVersion(meta, head, None).columns.contains(name),
      s"column $name already exists")
    DataType.fromDDL(typeDdl) // validate the type spelling at DDL time
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("add", name, typeDdl)), tableRowsAsOf(meta, head))
    next
  }

  /** ALTER TABLE … ADD COLUMN parent.child type — a NESTED add (Iceberg
    * permits struct-internal adds with fresh field ids): metadata-only
    * like every evolve commit; rows from before the change read the new
    * subfield as NULL, time travel before it keeps the narrow struct. The
    * field appends at the END of its struct (the one position the
    * streaming conform path can reconcile without a reorder). `child` may
    * be a DOTTED path into nested structs ("inner.y" adds y inside
    * parent.inner). */
  def addNestedColumn(parent: String, child: String, typeDdl: String): Long =
    withRootLock {
      val meta = readMeta()
      val head = mainHead(meta).getOrElse(
        throw new IllegalStateException(s"no snapshots at $root"))
      val schema = resolveVersion(meta, head, None).schema
      val pf = schema.fields.find(_.name.equalsIgnoreCase(parent)).getOrElse(
        throw new IllegalArgumentException(s"no column $parent"))
      def asStruct(dt: DataType, at: String) = dt match {
        case s: org.apache.spark.sql.types.StructType => s
        case o => throw new IllegalArgumentException(
          s"$at is ${o.simpleString}, not a struct")
      }
      // walk the dotted path: every intermediate segment must be an
      // existing struct subfield, the LAST segment must be absent
      val segs = child.split('.').toSeq
      val holder = segs.dropRight(1).foldLeft(
        (asStruct(pf.dataType, parent), parent)) { case ((s, at), seg) =>
        val f = s.fields.find(_.name.equalsIgnoreCase(seg)).getOrElse(
          throw new IllegalArgumentException(s"no field $at.$seg"))
        (asStruct(f.dataType, s"$at.$seg"), s"$at.$seg")
      }
      require(!holder._1.fieldNames.exists(_.equalsIgnoreCase(segs.last)),
        s"field ${holder._2}.${segs.last} already exists")
      DataType.fromDDL(typeDdl) // validate the type spelling at DDL time
      val next = claimVersion(meta)
      appendMeta(next, encodeEvolve(Seq("addnested", pf.name, child, typeDdl)),
        tableRowsAsOf(meta, head))
      next
    }

  /** ALTER TABLE … DROP COLUMN name — hidden from head reads; versions
    * before the drop still carry it (time travel keeps old schemas). */
  def dropColumn(name: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val cols = resolveVersion(meta, head, None).columns
    require(cols.contains(name), s"no column $name to drop")
    require(cols.length > 1, s"cannot drop the only column $name")
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("drop", name)), tableRowsAsOf(meta, head))
    next
  }

  /** ALTER TABLE … RENAME COLUMN old TO new. */
  def renameColumn(oldName: String, newName: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val cols = resolveVersion(meta, head, None).columns
    require(cols.contains(oldName), s"no column $oldName to rename")
    require(!cols.contains(newName), s"column $newName already exists")
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("rename", oldName, newName)),
      tableRowsAsOf(meta, head))
    next
  }

  /** Walk a dotted subfield path under column `parent` of `schema`:
    * returns (holder struct, holder path label, resolved last segment,
    * schema-cased parent name, fully CANONICAL path) — every intermediate
    * segment must be an existing struct subfield and the LAST segment must
    * exist too (callers renaming/dropping/promoting an existing subfield).
    * Case-insensitive like the rest of the surface; the canonical path
    * carries the SCHEMA's case for every segment (not just the last), so
    * the recorded evolve op replays — and mirrors through the
    * case-SENSITIVE chain evolution — under the true names. */
  private def resolveNestedPath(schema: StructType, parent: String,
      path: String): (org.apache.spark.sql.types.StructType, String,
        org.apache.spark.sql.types.StructField, String, String) = {
    val pf = schema.fields.find(_.name.equalsIgnoreCase(parent)).getOrElse(
      throw new IllegalArgumentException(s"no column $parent"))
    def asStruct(dt: DataType, at: String) = dt match {
      case s: org.apache.spark.sql.types.StructType => s
      case o => throw new IllegalArgumentException(
        s"$at is ${o.simpleString}, not a struct")
    }
    val segs = path.split('.').toSeq
    val (holder, at, canonSegs) = segs.dropRight(1).foldLeft(
      (asStruct(pf.dataType, parent), parent, Vector.empty[String])) {
      case ((s, a, cs), seg) =>
        val f = s.fields.find(_.name.equalsIgnoreCase(seg)).getOrElse(
          throw new IllegalArgumentException(s"no field $a.$seg"))
        (asStruct(f.dataType, s"$a.${f.name}"), s"$a.${f.name}", cs :+ f.name)
    }
    val last = holder.fields.find(_.name.equalsIgnoreCase(segs.last)).getOrElse(
      throw new IllegalArgumentException(s"no field $at.${segs.last}"))
    (holder, at, last, pf.name, (canonSegs :+ last.name).mkString("."))
  }

  /** ALTER TABLE … RENAME COLUMN parent.path TO newName — a NESTED rename
    * (Iceberg renames subfields by field id): metadata-only, position and
    * values kept, time travel before the change keeps the old name. `path`
    * may be dotted into nested structs. */
  def renameNestedColumn(parent: String, path: String, newName: String): Long =
    withRootLock {
      val meta = readMeta()
      val head = mainHead(meta).getOrElse(
        throw new IllegalStateException(s"no snapshots at $root"))
      val schema = resolveVersion(meta, head, None).schema
      val (holder, at, _, pname, canonical) =
        resolveNestedPath(schema, parent, path)
      require(!newName.contains('.'),
        s"rename target $newName must be a bare field name")
      require(!holder.fieldNames.exists(_.equalsIgnoreCase(newName)),
        s"field $at.$newName already exists")
      val next = claimVersion(meta)
      appendMeta(next,
        encodeEvolve(Seq("renamenested", pname, canonical, newName)),
        tableRowsAsOf(meta, head))
      next
    }

  /** ALTER TABLE … DROP COLUMN parent.path — a NESTED drop: hidden from
    * head reads, metadata-only; versions before the drop still carry the
    * subfield. */
  def dropNestedColumn(parent: String, path: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val schema = resolveVersion(meta, head, None).schema
    val (holder, at, last, pname, canonical) =
      resolveNestedPath(schema, parent, path)
    require(holder.fields.length > 1,
      s"cannot drop the only field $at.${last.name} of its struct")
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("dropnested", pname, canonical)),
      tableRowsAsOf(meta, head))
    next
  }

  /** ALTER TABLE … ALTER COLUMN parent.path TYPE type — NESTED type
    * widening, the same legal promotions as [[alterColumnType]], metadata
    * only. */
  def alterNestedColumnType(parent: String, path: String,
      typeDdl: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val schema = resolveVersion(meta, head, None).schema
    val (_, at, last, pname, canonical) =
      resolveNestedPath(schema, parent, path)
    val to = DataType.fromDDL(typeDdl)
    require(legalWidening(last.dataType, to),
      s"ALTER COLUMN $at.${last.name} TYPE $typeDdl: " +
        s"${last.dataType.simpleString} → ${to.simpleString} is not a legal " +
        "widening (int→long, float→double, decimal precision increase only)")
    val next = claimVersion(meta)
    appendMeta(next,
      encodeEvolve(Seq("widennested", pname, canonical, typeDdl)),
      tableRowsAsOf(meta, head))
    next
  }

  /** Iceberg's legal primitive promotions (shared by the top-level and
    * nested widen DDLs). */
  private def legalWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType)            => true
      case (IntegerType, LongType)                        => true
      case (FloatType, DoubleType)                        => true
      case (a: org.apache.spark.sql.types.DecimalType,
            b: org.apache.spark.sql.types.DecimalType) =>
        b.scale == a.scale && b.precision > a.precision
      case _ => false
    }

  /** ALTER TABLE … ALTER COLUMN name TYPE type — TYPE WIDENING, Iceberg's
    * legal promotions only: int→long (and byte/short upward), float→double,
    * decimal precision increase at the same scale. METADATA-ONLY like every
    * evolve commit: readers cast during resolution, no data file is touched
    * at any table size, and time travel before the change returns the
    * narrow type. Narrowing (or any other conversion) errors at DDL time —
    * it could corrupt values, which Iceberg likewise refuses. */
  def alterColumnType(name: String, typeDdl: String): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val schema = resolveVersion(meta, head, None).schema
    val field = schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"no column $name to alter"))
    val to = DataType.fromDDL(typeDdl)
    require(legalWidening(field.dataType, to),
      s"ALTER COLUMN $name TYPE $typeDdl: " +
      s"${field.dataType.simpleString} → ${to.simpleString} is not a legal " +
      "widening (int→long, float→double, decimal precision increase only)")
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("widen", field.name, typeDdl)),
      tableRowsAsOf(meta, head))
    next
  }

  /** PARTITION SPEC EVOLUTION (Iceberg `ALTER TABLE … ADD/DROP PARTITION
    * FIELD`): re-declare the store's partition spec WITHOUT rewriting any
    * data — Iceberg's signature capability. The change is a metadata-only
    * evolve commit; files written before it keep their old layout and their
    * manifest stats (recorded from the layout in force when they were
    * written), files written after it use the new spec, and reads/pruning
    * merge the mixed layouts per file. Time travel before the change sees
    * the table exactly as it was. An empty `newSpec` drops partitioning. */
  /** One partition-spec entry validated against a schema: identity columns
    * must exist; `days()` needs a timestamp/date source; `bucket(N, c)`
    * needs N > 0; `truncate(W, c)` needs W > 0 and an integral or string
    * source (the width-truncation domains). */
  private def validateSpecEntry(schema: StructType, e: String): Unit = {
    val src = daysOf(e).orElse(monthsOf(e)).orElse(yearsOf(e)).orElse(hoursOf(e))
      .orElse(bucketOf(e).map(_._2)).orElse(truncOf(e).map(_._2))
      .getOrElse(e.trim)
    val f = schema.fields.find(_.name.equalsIgnoreCase(src))
    require(f.isDefined, s"partition spec entry '$e' names no column $src")
    if (daysOf(e).isDefined || monthsOf(e).isDefined || yearsOf(e).isDefined)
      require(f.get.dataType == TimestampType || f.get.dataType == DateType,
        s"${e.trim} needs a timestamp/date column, got ${f.get.dataType.simpleString}")
    if (hoursOf(e).isDefined)
      require(f.get.dataType == TimestampType,
        s"hours($src) needs a timestamp column, got ${f.get.dataType.simpleString}")
    bucketOf(e).foreach { case (n, _) =>
      require(n > 0, s"bucket($n, $src): bucket count must be positive") }
    truncOf(e).foreach { case (w, _) =>
      require(w > 0, s"truncate($w, $src): width must be positive")
      require(f.get.dataType == StringType ||
        Seq(ByteType, ShortType, IntegerType, LongType).contains(f.get.dataType),
        s"truncate($w, $src) needs an integral or string column, got " +
          f.get.dataType.simpleString)
    }
  }

  def evolvePartition(newSpec: Seq[String]): Long = withRootLock {
    val meta = readMeta()
    val head = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val schema = resolveVersion(meta, head, None).schema
    newSpec.foreach(e => validateSpecEntry(schema, e))
    require(newSpec.flatMap(daysOf).size <= 1,
      "at most one days() transform per spec")
    require(newSpec.flatMap(monthsOf).size <= 1,
      "at most one months() transform per spec")
    require(newSpec.flatMap(yearsOf).size <= 1,
      "at most one years() transform per spec")
    require(newSpec.flatMap(hoursOf).size <= 1,
      "at most one hours() transform per spec")
    require(newSpec.flatMap(e => bucketOf(e).toSeq).size <= 1,
      "at most one bucket() transform per spec")
    require(newSpec.flatMap(e => truncOf(e).toSeq).size <= 1,
      "at most one truncate() transform per spec")
    require(newSpec.map(_.trim.toLowerCase).distinct.size == newSpec.size,
      s"duplicate partition fields in ${newSpec.mkString(", ")}")
    val next = claimVersion(meta)
    appendMeta(next, encodeEvolve(Seq("partition", newSpec.mkString(","))),
      tableRowsAsOf(meta, head))
    if (newSpec.isEmpty) metaDelete(PartitionSpecFile)
    else metaWriteString(PartitionSpecFile, newSpec.mkString(","))
    next
  }

  /** `ALTER TABLE … ADD PARTITION FIELD f | days(ts)`. */
  def addPartitionField(entry: String): Long = {
    require(!partitionSpec.exists(_.equalsIgnoreCase(entry.trim)),
      s"partition field $entry already in spec")
    evolvePartition(partitionSpec :+ entry.trim)
  }

  /** `ALTER TABLE … DROP PARTITION FIELD f | days(ts)`. */
  def dropPartitionField(entry: String): Long = {
    require(partitionSpec.exists(_.equalsIgnoreCase(entry.trim)),
      s"partition field $entry not in spec ${partitionSpec.mkString(", ")}")
    evolvePartition(partitionSpec.filterNot(_.equalsIgnoreCase(entry.trim)))
  }

  /** Roll back to a previous version's content, as a NEW snapshot (mirror of
    * Iceberg's rollback_to_snapshot: history is preserved, the table head
    * moves). ALWAYS METADATA-ONLY: a single-dir target becomes an alias
    * commit; a delta-chain or mor-delete target becomes an asof pointer —
    * neither copies data. */
  def rollback(toVersion: Long): Long = withRootLock {
    val meta = readMeta()
    val entry = meta.find(_._1 == toVersion).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$toVersion at $root"))
    val next = claimVersion(meta)
    if (!isBranchOp(entry._3) && isRestart(entry._3) && !entry._3.startsWith(AsOfOpPrefix))
      appendMeta(next,
        s"$AliasOpPrefix${dataDirVersion(entry)}:rollback-to-$toVersion", entry._4)
    else
      appendMeta(next, s"$AsOfOpPrefix$toVersion:rollback-to-$toVersion",
        tableRowsAsOf(meta, toVersion))
    next
  }

  /** Both snapshots aligned for diffing: the before-image re-expressed
    * through every evolve commit the after schema actually reflects
    * (Iceberg identifies columns by FIELD ID, so a rename is the SAME
    * column and a drop removes it — without this, an untouched row would
    * diff as changed just because a column moved names), then both sides
    * null-filled to the union schema (an untouched row then compares
    * identically and emits nothing — Iceberg's changelog likewise). */
  private def alignedSnapshots(fromV: Long, toV: Long): (DataFrame, DataFrame) = {
    val meta = readMeta()
    val after0 = read(Some(toV))
    val afterCols = after0.columns.map(_.toLowerCase).toSet
    // candidate evolves: everything between the two endpoints' MAIN anchors
    // (a branch endpoint roots where its parent walk reaches). Each one is
    // applied to the before-image only when the AFTER schema actually
    // reflects it — branch dirs written from arbitrary frames may predate or
    // postdate any given evolve, and the after schema is the ground truth
    // the changelog must align to.
    val fromAnchor = mainLineageAnchor(meta, fromV)
    val toAnchor = math.max(mainLineageAnchor(meta, toV), toV)
    val evolves = meta.filter(m => m._1 > fromAnchor && m._1 <= toAnchor &&
      !isBranchOp(m._3) && m._3.startsWith(EvolveOpPrefix))
    val before0 = evolves.foldLeft(read(Some(fromV))) { (df, m) =>
      val reflected = decodeEvolve(m._3) match {
        case Seq("add", name, _)  => afterCols.contains(name.toLowerCase)
        case Seq("drop", name)    => !afterCols.contains(name.toLowerCase)
        case Seq("rename", a, b)  =>
          afterCols.contains(b.toLowerCase) && !afterCols.contains(a.toLowerCase)
        case Seq("widen", name, ddl) =>
          after0.schema.fields.exists(f => f.name.equalsIgnoreCase(name) &&
            f.dataType == DataType.fromDDL(ddl))
        // partition-spec evolution changes file LAYOUT only — it has no
        // frame effect, so the before-image never needs it applied
        case Seq("partition", _*) => false
        case _ => false
      }
      if (reflected) applyEvolve(df, m._3) else df
    }
    def align(df: DataFrame, other: DataFrame): DataFrame =
      other.schema.fields.foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
      }
    (align(before0, after0), align(after0, before0))
  }

  /** KEYLESS changelog: the MULTISET diff between two snapshots — `insert`
    * and `delete` rows only, one per copy, with duplicate multiplicity
    * honored exactly. This is the changelog form for tables WITHOUT a
    * unique key (the same domain position deletes serve, [[deleteWherePos]]):
    * update pairing needs a row identity, so content that changed appears
    * as its old copies deleted and new copies inserted. One shuffle: both
    * sides union with ±1 weights, group by the full row, and the signed
    * count's sign and magnitude say which side gained how many copies. */
  def changes(fromV: Long, toV: Long): DataFrame = {
    val (before, after) = alignedSnapshots(fromV, toV)
    diffMultiset(before, after)
  }

  /** The keyless multiset-diff core, shared by the full-snapshot changelog
    * ([[changes]]) and the commit-derived O(delta) path
    * ([[changesFromCommit]] — there `before`/`after` are just the AFFECTED
    * row subsets, and the identical algebra yields the identical rows). */
  private def diffMultiset(before: DataFrame, after: DataFrame): DataFrame = {
    val dataCols = after.columns.toSeq
    val u = before.withColumn("__w", lit(-1L))
      .unionByName(after.withColumn("__w", lit(1L)))
    val delta = u.groupBy(dataCols.map(col): _*)
      .agg(sum(col("__w")).as("__d")).filter(col("__d") =!= 0)
    // copies regenerate via a TWO-LEVEL explode: a naive sequence(1, n)
    // builds one n-element array per distinct row, and a low-cardinality
    // table can put millions of copies behind one value — chunking bounds
    // every materialized array at 10k elements no matter the multiplicity
    val chunk = 10000L
    val n = abs(col("__d"))
    delta.withColumn("_change_type",
        when(col("__d") > 0, lit("insert")).otherwise(lit("delete")))
      .withColumn("__chunk",
        explode(sequence(lit(0L), floor((n - 1L) / chunk).cast("long"))))
      .withColumn("__copy",
        explode(sequence(lit(1L), least(lit(chunk), n - col("__chunk") * chunk))))
      .drop("__d", "__chunk", "__copy")
  }

  /** CDC changelog between two snapshots, keyed on `keyCol` (assumed unique
    * per snapshot — a primary key): every output row is a row of `fromV` or
    * `toV` plus a `_change_type` column in {insert, delete, update_preimage,
    * update_postimage} (the Iceberg create_changelog_view contract). Updates
    * are detected by comparing a fingerprint over the non-key columns, so a
    * key present on both sides with identical content emits nothing. */
  def changes(fromV: Long, toV: Long, keyCol: String): DataFrame =
    changes(fromV, toV, Seq(keyCol))

  /** [[changes]] with a COMPOSITE key: the row identity is the tuple of
    * `keyCols` (Iceberg's multi-column identifier-field-ids, assumed unique
    * per snapshot), so tables whose natural key spans columns — (tenant,
    * doc), (exchange, symbol, day) — get the same changelog contract with
    * no surrogate column. */
  def changes(fromV: Long, toV: Long, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "changes() needs at least one key column")
    val (before, after) = alignedSnapshots(fromV, toV)
    diffKeyed(before, after, keyCols)
  }

  /** The keyed diff core, shared by the full-snapshot changelog and the
    * commit-derived O(delta) path (see [[diffMultiset]]'s note). */
  private def diffKeyed(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame): DataFrame = {
      val others = df.columns.filterNot(keyCols.contains).sorted
      df.withColumn("__fp", md5(concat_ws("\u0001",
        others.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)))
    }
    val b = fp(before)
    val a = fp(after)
    val keyFpCols = keyCols :+ "__fp"
    val aKeyFp = a.select(keyFpCols.map(col): _*)
    val bKeyFp = b.select(keyFpCols.map(col): _*)
    val aKeys = a.select(keyCols.map(col): _*)
    val bKeys = b.select(keyCols.map(col): _*)
    // rows of `before` that changed or vanished: content (key,fp) absent in
    // `after`; key still present → update_preimage, key gone → delete.
    val pre = b.join(aKeyFp, keyFpCols, "left_anti")
    val preTagged = pre.join(aKeys, keyCols, "left_semi")
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(pre.join(aKeys, keyCols, "left_anti")
        .withColumn("_change_type", lit("delete")))
    // rows of `after` that are new or rewritten: mirrored construction.
    val post = a.join(bKeyFp, keyFpCols, "left_anti")
    val postTagged = post.join(bKeys, keyCols, "left_semi")
      .withColumn("_change_type", lit("update_postimage"))
      .unionByName(post.join(bKeys, keyCols, "left_anti")
        .withColumn("_change_type", lit("insert")))
    // allowMissingColumns: commit() supports schema evolution on append, so
    // fromV and toV may legally differ in schema — the changelog carries the
    // union schema with absent-side columns null-filled.
    preTagged.unionByName(postTagged, allowMissingColumns = true).drop("__fp")
  }

  /** Claimed-key sets at or below this size inline as IN conjuncts so the
    * pre-image read PRUNES via manifest stats (bucket layouts prune to the
    * claimed buckets); larger sets fall back to the unpruned one-pass scan. */
  private val MaxInlineCdcKeys = 1000L

  /** CDC rows produced BY commit `v` (against the preceding main snapshot),
    * derived from the commit's OWN files when the op is merge-on-read —
    * equality delete, position delete, mor UPDATE, mor MERGE:
    *
    *  - pre-images are the previous snapshot's rows semi-joined to the
    *    commit's claimed keys (or `(file, pos)` pairs), with the scan PRUNED
    *    by inlined key conjuncts when the claimed set is small — on a
    *    bucketed/clustered store that touches the matching files only, and
    *    [[lastPruneStats]] records (kept, total) for audits;
    *  - post-images come straight from the commit's replacement dir
    *    (O(delta) by the mor cost model);
    *  - the same [[diffKeyed]]/[[diffMultiset]] algebra then runs over the
    *    two AFFECTED subsets, so the output is row-identical to
    *    [[changes]](prev, v[, keyCols]) — which diffs two FULL snapshots
    *    (union + full-row shuffle, or two whole-table joins): one mor UPDATE
    *    on a 100 TB table must not make its CDC batch scan the table twice.
    *    Iceberg's changelog scan derives changes from the commit's files for
    *    exactly this reason.
    *
    * None when the op has no delta representation (cow commits, rollbacks,
    * publishes, appends — appends shortcut in the stream already): callers
    * fall back to the full-snapshot diff. */
  private[graft] def changesFromCommit(v: Long, keyCols: Seq[String]): Option[DataFrame] = {
    val meta = readMeta()
    val entry = meta.find(_._1 == v).getOrElse(return None)
    val op = entry._3
    if (op != MorDeleteOp && !isPosDelete(op) &&
        op != MorUpdateOp && op != MorMergeOp) return None
    val prev = meta.filter(m => m._1 < v && !isBranchOp(m._3)).lastOption
      .getOrElse(return None)._1
    val keyFrame = op match {
      case o if o == MorDeleteOp || isPosDelete(o) => readVersionDir(v)
      case _ =>
        if (morKeysExist(v)) spark.read.parquet(morUpdateDeletesDir(v))
        else readVersionDir(v).limit(0) // no claimed keys (e.g. insert-only merge)
    }
    val joinCols = keyFrame.columns.toSeq
    val resolvedPrev =
      resolveVersion(meta, prev, None, withPos = isPosDelete(op))
    // (kept, total) must describe THIS derivation: the unpruned fallbacks
    // report (0, 0) — "no pruning ran" — never a previous operation's stats
    pruneKept = 0L; pruneTotal = 0L
    // inline the claimed keys as IN conjuncts when the set is small: the
    // commit log records the delete count for delete files; mor update/merge
    // key files are delta-sized, and take(bound + 1) answers the size check
    // and the collect in ONE bounded driver job
    val keyRows: Array[Row] = op match {
      case o if isPosDelete(o) => Array.empty // (file, pos) pairs derive no ranges
      case MorDeleteOp =>
        if (entry._4 > 0 && entry._4 <= MaxInlineCdcKeys) keyFrame.collect()
        else Array.empty
      case _ =>
        val taken = keyFrame.take(MaxInlineCdcKeys.toInt + 1)
        if (taken.nonEmpty && taken.length <= MaxInlineCdcKeys) taken
        else Array.empty
    }
    val perColValues = joinCols.indices.map(i =>
      keyRows.map(_.get(i)).filter(_ != null).distinct.toSeq)
    val perColHasNull = joinCols.indices.map(i =>
      keyRows.exists(_.get(i) == null))
    val base =
      if (keyRows.nonEmpty && perColValues.forall(_.nonEmpty)) {
        // the update/merge semi-joins never match NULL keys, so their
        // non-null value prune is exact; equality DELETES apply null-safely
        // (a foreign delete file may carry NULL key values), so columns
        // whose key set holds a null get an IS NULL disjunct — weaker
        // pruning, never a skipped matching file
        val pred = joinCols.indices.map { i =>
          val in = col(joinCols(i)).isin(perColValues(i): _*)
          if (op == MorDeleteOp && perColHasNull(i))
            in || col(joinCols(i)).isNull
          else in
        }.reduce(_ && _)
        val conj0 = SnapshotTable.conjunctsOf(resolvedPrev, pred)
        val conj = transformConjuncts(resolvedPrev.schema, conj0,
          dataDirsOf(meta, prev).map(dirVersionOf))
        resolveVersion(meta, prev, Some(conj))
      } else resolvedPrev
    // equality deletes match null-safely (mirrors applyChainOp's
    // resolution anti-join exactly — the CDC pre-images must name the
    // SAME rows the resolution removes, null-keyed ones included)
    val preSub = (op match {
      case MorDeleteOp => base.join(broadcast(keyFrame),
        joinCols.map(c => base(c) <=> keyFrame(c)).reduce(_ && _),
        "left_semi")
      case _ => base.join(broadcast(keyFrame), joinCols, "left_semi")
    }).drop(hiddenReadCols: _*)
    val postSub = (op match {
      case o if o == MorDeleteOp || isPosDelete(o) => resolvedPrev.limit(0) // deletes only
      case _                         => readVersionDir(v)
    }).drop(hiddenReadCols: _*)
    Some(
      if (keyCols.nonEmpty) diffKeyed(preSub, postSub, keyCols)
      else diffMultiset(preSub, postSub))
  }

  /** The changelog of ONE commit: [[changesFromCommit]]'s O(delta) path when
    * the commit supports it, else the full [[changes]] diff against the
    * preceding main snapshot — the per-commit unit the streaming CDC mode
    * emits, exposed for batch callers and audits. Empty `keyCols` = the
    * keyless multiset changelog. */
  def changesForCommit(v: Long, keyCols: Seq[String] = Nil): DataFrame =
    changesFromCommit(v, keyCols).getOrElse {
      val meta = readMeta()
      val prev = meta.filter(m => m._1 < v && !isBranchOp(m._3)).lastOption
        .getOrElse(throw new IllegalStateException(
          s"commit v=$v has no preceding main snapshot at $root"))._1
      if (keyCols.nonEmpty) changes(prev, v, keyCols) else changes(prev, v)
    }

  // ── Branches and tags (Iceberg refs; the write-audit-publish workflow:
  //    stage candidate data on a branch, validate it there, publish to main
  //    in one step — main readers never observe unvalidated data). Branch
  //    commits share the global version sequence and directory layout but
  //    not main's lineage; tags are immutable named pins.

  /** Create a branch at `at` (default: main's head). Branches may move
    * (commitToBranch / fastForward); re-creating one re-points it. */
  def createBranch(name: String, at: Option[Long] = None): Long = {
    // re-pointing a BRANCH is allowed; silently converting an existing TAG
    // into a movable branch would break the tags-never-move contract
    require(readRefs().get(name).forall(_._1 == "branch"),
      s"ref $name already exists as a tag at $root")
    val v = at.orElse(currentVersion)
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    require(readMeta().exists(_._1 == v), s"no snapshot v=$v at $root")
    writeRef(name, "branch", v)
    v
  }

  /** Create an immutable tag at `at` (default: main's head). Re-creating an
    * existing tag errors — tags never move (the Iceberg contract). */
  def createTag(name: String, at: Option[Long] = None): Long = {
    require(!readRefs().contains(name), s"ref $name already exists at $root")
    val v = at.orElse(currentVersion)
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    require(readMeta().exists(_._1 == v), s"no snapshot v=$v at $root")
    writeRef(name, "tag", v)
    v
  }

  /** The version a branch currently points at. */
  def branchHead(name: String): Option[Long] =
    readRefs().get(name).collect { case ("branch", v) => v }

  /** The version a named ref (branch or tag) points at; `main` resolves to
    * main's head — the resolution `table_changes('t', 'main', 'stage')`
    * style calls use. */
  def refVersion(name: String): Option[Long] =
    if (name.equalsIgnoreCase("main")) currentVersion
    else readRefs().get(name).map(_._2)

  /** Commit to a side branch against the BRANCH's head; main's lineage and
    * head are untouched. `op = "append"` is O(DELTA), like main appends: the
    * dir holds only `df`, and the branch entry records its parent so readers
    * resolve the chain. `op = "overwrite"` writes the branch's new full
    * content (the branch-side copy-on-write form). */
  def commitToBranch(branch: String, df: DataFrame, op: String = "overwrite"): Long = withRootLock {
    require(op == "overwrite" || op == DeltaAppendOp,
      s"commitToBranch op must be overwrite|append, got $op")
    val head = branchHead(branch).getOrElse(
      throw new IllegalStateException(s"no branch $branch at $root"))
    val meta = readMeta()
    val next = claimVersion(meta)
    val written = writeDataDir(df, next)
    if (op == DeltaAppendOp)
      appendMeta(next, s"$BranchOpPrefix$branch:$DeltaAppendOp:$head",
        tableRowsAsOf(meta, head) + written)
    else
      appendMeta(next, s"$BranchOpPrefix$branch:$op", written)
    writeRef(branch, "branch", next)
    next
  }

  /** Read a branch's current content. */
  def readBranch(name: String): DataFrame = {
    val head = branchHead(name).getOrElse(
      throw new IllegalStateException(s"no branch $name at $root"))
    read(Some(head))
  }

  /** Read a tag's pinned content. */
  def readTag(name: String): DataFrame = readRefs().get(name) match {
    case Some(("tag", v)) => read(Some(v))
    case _ => throw new IllegalStateException(s"no tag $name at $root")
  }

  /** All named refs, as a DataFrame (mirror of Iceberg's refs metadata
    * table). */
  def refs(): DataFrame = {
    import spark.implicits._
    readRefs().toSeq.map { case (n, (k, v)) => (n, k, v) }
      .sortBy(_._1).toDF("ref_name", "ref_kind", "version")
  }

  /** Drop a branch or tag (mirror of Iceberg's DROP BRANCH / DROP TAG).
    * Appends a tombstone — the log stays append-only — after which the name
    * may be re-created and the versions it pinned become expirable. */
  def dropRef(name: String, expectKind: Option[String] = None): Unit = {
    val kind = readRefs().get(name).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"no ref $name at $root"))
    expectKind.foreach(k => require(k == kind,
      s"$name is a $kind, not a $k — use DROP ${kind.toUpperCase}"))
    writeRef(name, "dropped", -1L)
  }

  /** PUBLISH a branch to main (Iceberg fast-forward): main's head moves to
    * the branch's content as a NEW main-lineage commit. The
    * write-audit-publish step — until this runs, nothing committed on the
    * branch is visible to a main reader. ALWAYS METADATA-ONLY: a full-data
    * branch head publishes as an alias to its dir; a delta-chain branch head
    * publishes as an asof pointer resolution follows — neither copies. */
  def fastForward(fromBranch: String): Long = withRootLock {
    val head = branchHead(fromBranch).getOrElse(
      throw new IllegalStateException(s"no branch $fromBranch at $root"))
    val meta = readMeta()
    val entry = meta.find(_._1 == head).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$head at $root"))
    val next = claimVersion(meta)
    val isSingleDir = isBranchOp(entry._3) &&
      branchOpParts(entry._3)._2 != DeltaAppendOp
    if (isSingleDir)
      appendMeta(next,
        s"$AliasOpPrefix${dataDirVersion(entry)}:publish-$fromBranch", entry._4)
    else
      // the head may be a delta chain or a mor commit whose own log entry
      // records a delta/key count, not the table total — resolve the real
      // total like rollback() does, or later appends inherit a wrong base
      appendMeta(next, s"$AsOfOpPrefix$head:publish-$fromBranch",
        tableRowsAsOf(meta, head))
    next
  }
}
