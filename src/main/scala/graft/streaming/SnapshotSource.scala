package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, struct, when}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.SnapshotTable

/** Incremental streaming READ of the versioned snapshot store — the other
  * half of [[SnapshotStream]]'s exactly-once streaming WRITE, completing the
  * reference's continuous-pipeline loop (readme.md:393-401 table lifecycle;
  * spark.py:88-89 append cost model): a downstream job tails a table other
  * jobs append to, seeing each append commit exactly once, in commit order.
  *
  * Semantics mirror Iceberg's Spark structured-streaming read:
  *  - OFFSETS ARE TABLE VERSIONS. A micro-batch `(start, end]` is the union
  *    of the delta-append commits in that version range — each version dir
  *    is immutable, so checkpoint replay rebuilds byte-identical batches.
  *  - Only APPEND commits stream. `compact` (same rows, rewritten files),
  *    `evolve:` (metadata-only) and `branch:` (other lineage) commits are
  *    silently skipped; any commit that CHANGES rows (overwrite, truncate,
  *    row-level DML, rollback, WAP publish) fails the stream loudly unless
  *    `skip-mutations=true` opts into skipping it — Iceberg's
  *    `streaming-skip-overwrite-snapshots` / `streaming-skip-delete-
  *    snapshots` contract.
  *  - `start-version` (default -1) bounds history: only appends with
  *    version > start-version stream. Backfill of a seed overwrite is the
  *    caller's batch read (time travel), as in Iceberg.
  *
  * At 100 TB: planning a micro-batch touches only the commit log (one small
  * driver-side file) and the delta manifests in range — never the table's
  * data or its full file listing. Batches stay DECLARATIVE (the store's
  * manifest-backed relation with `isStreaming` flipped, exactly
  * FileStreamSource's recipe), so filters and projections in the streaming
  * query still push into the parquet scan of each delta.
  */
final class SnapshotSource(
    spark: SparkSession, root: String,
    userSchema: Option[StructType],
    options: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val st = new SnapshotTable(spark, root)

  /** Only appends with version > this stream (default -1: all of them). */
  private val startVersion =
    options.getOrElse("start-version", "-1").trim.toLong

  /** `"append-only"` (default): appends stream as rows, mutations fail or
    * skip. `"cdc"`: EVERY main-lineage commit streams as change rows
    * (`_change_type` ∈ {insert, delete, update_preimage, update_postimage}
    * + `_commit_version`) — the Delta CDF / Iceberg changelog shape, built
    * on the store's own [[SnapshotTable.changes]] diff: keyed (update
    * pairing) when `key-column` is given, keyless multiset otherwise. */
  private val mode = options.getOrElse("mode", "append-only").trim
  require(mode == "append-only" || mode == "cdc",
    s"unknown snapshot-stream mode '$mode' (append-only | cdc)")

  /** CDC row identity — comma-separated for a composite key. ABSENT means
    * the KEYLESS changelog: multiset insert/delete diffs (duplicate copies
    * honored, no update pairing) — the form for tables without a unique
    * key, matching [[SnapshotTable.deleteWherePos]]'s domain. */
  private val keyColumns: Seq[String] =
    options.get("key-column").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** `true`: skip row-changing commits instead of failing the stream. */
  private val skipMutations =
    options.getOrElse("skip-mutations", "false").trim.toBoolean

  /** `true`: an evolve commit that ADDS columns the pinned stream schema
    * lacks becomes a ROLLOVER BOUNDARY instead of a wait-for-operator page:
    * offsets never advance past it, so a `Trigger.AvailableNow` run drains
    * exactly up to the boundary and ends gracefully, and a restart from the
    * SAME checkpoint re-pins the store's evolved schema and continues from
    * the boundary — the added column is adopted with no rows lost or
    * duplicated, turning "restart the stream" into an orchestrated
    * rollover (run-until-terminate, then run again). Default false: the v1
    * contract — the stream keeps running, new columns wait, drift events
    * flag it ([[SnapshotSource.schemaDriftEvents]]). */
  private val adoptOnEvolve =
    options.getOrElse("adopt-schema-on-evolve", "false").trim.toBoolean

  /** Rate limit: at most this many VERSIONS advance per micro-batch (the
    * Iceberg `streaming-max-files-per-micro-batch` role — a backfill of a
    * long-lived table must arrive as many bounded batches, not one giant
    * union). Counted in versions because a version dir is one append's
    * files — the natural admission unit here. */
  private val maxVersionsPerBatch =
    options.get("max-versions-per-batch").map(_.trim.toInt)
  require(maxVersionsPerBatch.forall(_ > 0),
    s"max-versions-per-batch must be positive, got " +
      s"${maxVersionsPerBatch.get} — 0 would stall the stream silently")

  /** The DATA schema (no CDC tag columns) every batch conforms to. */
  private val baseSchema: StructType =
    SnapshotSource.dataSchema(spark, root, userSchema)

  override val schema: StructType =
    SnapshotSource.streamSchema(baseSchema, mode)

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset       => l.offset
      case s: SerializedOffset => LongOffset(s).offset
      case other               => other.json.trim.toLong
    }

  /** Trigger.AvailableNow's drain target: the head at trigger start. The
    * source implements [[SupportsTriggerAvailableNow]] itself (instead of
    * taking Spark's wrapper) because the wrapper snapshots ONE offset call
    * as the target — which under `max-versions-per-batch` is just the
    * first capped batch, so a paced backfill would stop after one batch.
    * Here each batch stays capped while the run keeps triggering until
    * this mark is reached. */
  @volatile private var availableNowMark: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    // a store EMPTY at trigger start pins the mark at start-version (not
    // "no clip"): AvailableNow promises a fixed endpoint, so commits that
    // arrive mid-run must wait for the next run, never extend this one
    availableNowMark =
      Some(st.commitOps().lastOption.map(_._1).getOrElse(startVersion))

  /** Next offset from `base`: head of the commit log (branch commits
    * advance the version counter too; `getBatch` classifies them as noop),
    * clipped to the AvailableNow mark, capped to `max-versions-per-batch`
    * above the committed position. */
  private def nextOffset(base: Long): Option[Long] = {
    val ops = st.commitOps()
    val head = ops.lastOption.map(_._1)
      .map(h => availableNowMark.fold(h)(math.min(h, _)))
      .map(h => rolloverBoundary(ops).fold(h)(math.min(h, _)))
    val capped = (head, maxVersionsPerBatch) match {
      case (Some(h), Some(n)) => Some(math.min(h, base + n))
      case _                  => head
    }
    // a committed position AT the rollover boundary filters everything out:
    // this run is drained — the restart (with the evolved schema re-pinned
    // at source construction) takes over from exactly here
    capped.filter(_ > base)
  }

  /** This RUN's resume position: the committed offset observed when the
    * run started (set once — by the first `latestOffset` base, or by the
    * first `getBatch`'s END when the run opens with a WAL replay, since
    * that batch is already durable and will commit). The rollover boundary
    * anchors here, NOT at start-version: evolve commits at or below the
    * resume position are history this run must step over (a restarted run
    * whose pinned schema still cannot carry them keeps the v1
    * conform-and-flag behavior), while the first adoptable evolve ABOVE it
    * permanently caps this instance — whose pinned schema predates it. */
  @volatile private var resumeBase: Option[Long] = None

  private def noteResumeBase(v: Long): Unit =
    if (resumeBase.isEmpty) resumeBase = Some(v)

  /** Memoized per commit-log head (history below the head is immutable —
    * recomputing the boundary and the store's current schema on every
    * offset poll would put a metadata resolution in each trigger). */
  @volatile private var boundaryCache: Option[(Long, Long, Option[Long])] = None

  /** The first commit this SOURCE INSTANCE must not stream past under
    * `adopt-schema-on-evolve`: an evolve ABOVE the run's resume position
    * whose added columns are outside the pinned schema but (still) inside
    * the store's CURRENT schema — so a restart genuinely adopts them. An
    * added-then-DROPPED column is deliberately NOT a boundary (restarting
    * would not help; those deltas keep the v1 conform-and-flag behavior),
    * or the rollover would wedge forever on history it can never adopt. */
  private def rolloverBoundary(ops: Seq[(Long, String)]): Option[Long] =
    if (!adoptOnEvolve) None
    else {
      val anchor = math.max(startVersion, resumeBase.getOrElse(startVersion))
      val headNow = ops.lastOption.map(_._1).getOrElse(-1L)
      boundaryCache match {
        case Some((h, a, b)) if h == headNow && a == anchor => b
        case _ =>
          lazy val currentTypes = st.read().schema.fields
            .map(f => f.name.toLowerCase -> f.dataType).toMap
          lazy val currentNames = currentTypes.keySet
          val b = ops.find { case (v, op) =>
            v > anchor && (
              st.evolveNewColumns(op).exists(c =>
                !baseNames(c.toLowerCase) && currentNames(c.toLowerCase)) ||
              // a WIDENING evolve is a boundary too: the pinned schema's
              // conform-and-try_cast path would FAIL the batch on values
              // beyond the narrow type, while a restart re-pins the
              // widened schema and the values flow. A widened-then-DROPPED
              // column is STILL a boundary (unlike add-then-drop): the
              // restart's re-pinned schema simply lacks the column, so its
              // deltas conform by dropping — without the boundary the old
              // pinned type would fail the batch on out-of-range values.
              st.evolveWidenedColumn(op).exists { case (c, to) =>
                val lc = c.toLowerCase
                baseTypes.get(lc).exists(have => have != to &&
                  currentTypes.get(lc).forall(_ != have))
              } ||
              // a NESTED RENAME/DROP/WIDEN (r20) is a boundary whenever the
              // parent struct's CURRENT type still differs from the pinned
              // one — the pinned shape cannot carry the mutated struct, and
              // a restart re-pins it (mutated-then-reverted parents are
              // deliberately not boundaries: nothing left to adopt). A
              // mutated-then-DROPPED (or renamed) parent is STILL a
              // boundary, like the top-level widen rule: the restart's
              // re-pinned schema lacks the column, so a nested-widened
              // delta conforms by dropping instead of failing the batch
              // on out-of-range values.
              st.evolveNestedMutation(op).exists { case (p, _, _) =>
                baseTypes.get(p.toLowerCase).exists(bt =>
                  currentTypes.get(p.toLowerCase).forall(_ != bt))
              } ||
              // a NESTED ADD is a boundary like a top-level add: the
              // pinned struct type cannot carry the subfield, and after
              // restart the re-pinned schema has it (unless the store has
              // since dropped/re-typed the parent — then not adoptable)
              st.evolveNestedAdd(op).exists { case (p, c) =>
                // the child may be a DOTTED path into nested structs —
                // walk segments, like the replay walker
                def hasChild(dt: Option[org.apache.spark.sql.types.DataType]) = {
                  def walk(t: org.apache.spark.sql.types.DataType,
                      segs: Seq[String]): Boolean = t match {
                    case s: org.apache.spark.sql.types.StructType =>
                      s.fields.find(_.name.equalsIgnoreCase(segs.head)) match {
                        case Some(_) if segs.size == 1 => true
                        case Some(f) => walk(f.dataType, segs.tail)
                        case None => false
                      }
                    case _ => false
                  }
                  dt.exists(walk(_, c.split('.').toSeq))
                }
                !hasChild(baseTypes.get(p.toLowerCase)) &&
                  hasChild(currentTypes.get(p.toLowerCase))
              })
          }.map(_._1)
          boundaryCache = Some((headNow, anchor, b))
          b
      }
    }

  /** The admission-control seam ([[SupportsTriggerAvailableNow]] extends
    * it): the execution hands the COMMITTED position in, so rate-limited
    * progress is correct across restarts with no source-side state. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val base = Option(start).map(versionOf).getOrElse(startVersion)
    noteResumeBase(math.max(base, startVersion))
    nextOffset(math.max(base, startVersion)).map(LongOffset(_)).orNull
  }

  /** The plain v1 seam (kept for completeness; the execution prefers
    * [[latestOffset]] on admission-controlled sources). Unrated: it has no
    * view of the committed position. */
  override def getOffset: Option[Offset] = {
    val ops = st.commitOps()
    ops.lastOption.map(_._1)
      .map(h => availableNowMark.fold(h)(math.min(h, _)))
      .map(h => rolloverBoundary(ops).fold(h)(math.min(h, _)))
      .filter(_ > startVersion).map(LongOffset(_))
  }

  /** Lower-cased pinned data-schema names (drift detection). */
  private val baseNames = baseSchema.fields.map(_.name.toLowerCase).toSet
  private val baseTypes =
    baseSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // the floor honors start-version even when `start` is a CHECKPOINTED
    // offset: a stream wedged on a mutation commit whose offset is already
    // in the WAL must be recoverable by restarting with a later
    // start-version (the remedy the mutation error advertises) — without
    // the floor the replayed batch would contain the mutation forever
    val lo = math.max(start.map(versionOf).getOrElse(startVersion), startVersion)
    val hi = versionOf(end)
    // a run that opens with a WAL replay sets its resume position to the
    // replayed batch's END: the batch is already durable and will commit,
    // so boundaries inside it are history this run steps over
    noteResumeBase(hi)
    val ops = st.commitOps()
    val entries = ops.filter { case (v, _) => v > lo && v <= hi }
    // schema drift observability: an evolve commit in range that introduces
    // a column the pinned stream schema can't carry is NOT an error (the v1
    // contract: new columns wait for a stream restart) — but it must never
    // pass silently, or an operator only learns their feed is missing a
    // column when a downstream consumer does
    entries.foreach { case (v, op) =>
      st.evolveNewColumns(op).filterNot(c => baseNames(c.toLowerCase))
        .foreach { c =>
          SnapshotSource.recordDrift(root, baseSchema.json, v,
            s"store $root evolved mid-stream at commit v=$v: column '$c' is " +
              "not in this stream's pinned schema and will not stream — " +
              "restart the stream to adopt the evolved schema")
        }
      st.evolveWidenedColumn(op)
        .filter { case (c, to) => baseTypes.get(c.toLowerCase).exists(_ != to) }
        .foreach { case (c, to) =>
          SnapshotSource.recordDrift(root, baseSchema.json, v,
            s"store $root widened column '$c' to ${to.simpleString} " +
              s"mid-stream at commit v=$v: this stream's pinned schema " +
              "keeps the narrow type and out-of-range values would fail — " +
              "restart the stream to adopt the widened schema")
        }
      st.evolveNestedMutation(op)
        .filter { case (p, _, _) => baseTypes.contains(p.toLowerCase) }
        .foreach { case (p, path, what) =>
          val verb = what match {
            case "rename" => "renamed"; case "drop" => "dropped"
            case _ => "widened"
          }
          SnapshotSource.recordDrift(root, baseSchema.json, v,
            s"store $root $verb nested field '$p.$path' mid-stream at " +
              s"commit v=$v: this stream's pinned schema keeps the old " +
              "struct shape (the drifted subfield null-fills or casts " +
              "back) — restart the stream to adopt the evolved schema")
        }
    }
    val frames =
      if (mode == "cdc") cdcFrames(entries, ops) else appendFrames(entries)
    if (frames.isEmpty) PlanBridge.emptyStreaming(spark, schema)
    // cdc diffs contain anti/semi joins — they must enter the streaming
    // plan as an opaque leaf (batch-planned), not leaf-flipped relations
    // the incremental planner would treat as stream-stream joins
    else if (mode == "cdc")
      PlanBridge.asStreamingOpaque(frames.reduce(_ unionByName _))
    else PlanBridge.asStreaming(frames.reduce(_ unionByName _))
  }

  private def appendFrames(entries: Seq[(Long, String)]): Seq[DataFrame] = {
    if (!skipMutations)
      entries.find { case (_, op) => st.streamOpKind(op) == "mutation" }
        .foreach { case (v, op) =>
          throw new IllegalStateException(
            s"snapshot stream over $root hit a non-append commit v=$v " +
              s"op='$op': an append stream cannot represent row changes — " +
              "resume past it with .option(\"start-version\", ...), opt " +
              "into skipping with .option(\"skip-mutations\", \"true\"), " +
              "or stream changes with .option(\"mode\", \"cdc\")")
        }
    entries.collect {
      case (v, op) if st.streamOpKind(op) == "append" => conformAppend(v)
    }
  }

  /** One append delta conformed to the pinned schema, surfacing any
    * dropped-extra-column drift (shared by BOTH stream modes — a cdc
    * stream's appends drop evolved columns exactly like append-only's). */
  private def conformAppend(v: Long): DataFrame = {
    val delta = st.appendDelta(v)
    // a delta carrying columns the pinned schema omits (append-time schema
    // evolution) conforms by DROPPING them — surface that
    delta.columns
      .filterNot(c => baseNames(c.toLowerCase) || c.startsWith("graft__"))
      .foreach { c =>
        SnapshotSource.recordDrift(root, baseSchema.json, v,
          s"append v=$v at $root carries column '$c' absent from this " +
            "stream's pinned schema; its data is dropped from the " +
            "stream — restart the stream to adopt the evolved schema")
      }
    conform(delta)
  }

  /** One change frame per payload commit in range — the Delta CDF shape.
    * Appends shortcut to their own delta dir tagged `insert` (O(delta);
    * diffing two 100 TB snapshots per append would be absurd — sound
    * because keyed CDC's contract is unique keys, so an appended row is
    * always a fresh key). Everything else diffs against the PREVIOUS
    * main-lineage snapshot via the store's keyed [[SnapshotTable.changes]]
    * (rollbacks, publishes and row-level DML all emit their net row
    * changes); the first main commit has no predecessor and streams whole
    * as `insert`. `compact`/`evolve:` emit nothing (rows unchanged —
    * Iceberg's changelog likewise) and branch commits are off-lineage. */
  private def cdcFrames(entries: Seq[(Long, String)],
      allOps: Seq[(Long, String)]): Seq[DataFrame] = {
    val mainVersions =
      allOps.filter(e => st.isMainLineageOp(e._2)).map(_._1)
    entries.collect {
      case (v, op) if st.isMainLineageOp(op) && st.streamOpKind(op) != "noop" =>
        val tagged =
          if (st.streamOpKind(op) == "append")
            conformAppend(v).withColumn("_change_type", lit("insert"))
          else mainVersions.filter(_ < v).lastOption match {
            case Some(prev) =>
              // merge-on-read commits derive their change rows from the
              // commit's OWN delete/replacement files (O(delta), pruned
              // pre-image read) instead of diffing two full snapshots —
              // cow commits keep the full-diff fallback
              conform(
                st.changesFromCommit(v, keyColumns).getOrElse(
                  if (keyColumns.nonEmpty) st.changes(prev, v, keyColumns)
                  else st.changes(prev, v)),
                keep = Seq("_change_type"))
            case None =>
              conform(st.read(Some(v)))
                .withColumn("_change_type", lit("insert"))
          }
        tagged.withColumn("_commit_version", lit(v))
    }
  }

  /** A delta aligned to the STREAM's fixed data schema: appends may evolve
    * the store's schema mid-stream (columns added, widened, or absent —
    * the M4 contract), but a streaming query's schema is pinned at start,
    * so missing columns null-fill, widened ones cast back, new ones wait
    * for a stream restart. Also drops hidden partition columns
    * (graft__day …) a partitioned delta dir carries physically.
    *
    * A column whose incoming type differs from the pinned one (widened
    * mid-stream) casts back through `try_cast` with a NULL-on-non-null
    * guard: an out-of-range value (a long past the pinned int range) must
    * neither silently wrap (non-ANSI cast) nor die with a bare cast error
    * (ANSI) — it fails the batch with the actual remedy: restart the
    * stream to adopt the evolved schema. */
  /** Is `to` the same struct as `from` plus APPENDED subfields (recursively)
    * — the one struct drift [[conform]] reconciles losslessly (a nested ADD:
    * missing subfields null-fill; nothing reorders or narrows)? */
  private def structAddOnly(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = (from, to) match {
    case (a: org.apache.spark.sql.types.StructType,
          b: org.apache.spark.sql.types.StructType) =>
      a.fields.length <= b.fields.length &&
        a.fields.zip(b.fields).forall { case (af, bf) =>
          af.name.equalsIgnoreCase(bf.name) &&
            (af.dataType == bf.dataType || structAddOnly(af.dataType, bf.dataType))
        }
    case _ => false
  }

  /** Null-fill the subfields `to` appends beyond `from` (struct add-only
    * drift); a NULL struct stays NULL (withField semantics). */
  private def fillNested(c: Column,
      from: org.apache.spark.sql.types.StructType,
      to: org.apache.spark.sql.types.StructType): Column = {
    val widened = from.fields.zip(to.fields).foldLeft(c) {
      case (acc, (af, bf)) if af.dataType != bf.dataType =>
        (af.dataType, bf.dataType) match {
          case (fs: org.apache.spark.sql.types.StructType,
                ts: org.apache.spark.sql.types.StructType) =>
            acc.withField(bf.name, fillNested(c.getField(af.name), fs, ts))
          case _ => acc
        }
      case (acc, _) => acc
    }
    to.fields.drop(from.fields.length).foldLeft(widened)((acc, tf) =>
      acc.withField(tf.name, lit(null).cast(tf.dataType)))
  }

  /** Lossless-or-fail cast back to the pinned type: try_cast(null) catches
    * overflow/unparseable, the round-trip equality catches lossy-but-valid
    * casts (1.7 → int 1) — every legal widening round-trips exactly for
    * values that genuinely fit. Null-safe: if the REVERSE cast itself
    * nulls out, `=!=` would read SQL NULL as "not lossy" — <=> keeps the
    * guard firing on that edge. */
  private def guardedConform(cv: Column,
      inDt: org.apache.spark.sql.types.DataType,
      outDt: org.apache.spark.sql.types.DataType, label: String): Column = {
    val back = cv.try_cast(outDt)
    val lossy = back.isNull || !(back.try_cast(inDt) <=> cv)
    when(cv.isNotNull && lossy,
      raise_error(concat(
        lit(s"snapshot stream over $root: value "), cv.cast("string"),
        lit(s" of column $label does not fit the stream's pinned type " +
          s"${outDt.simpleString} (the store widened the column " +
          "mid-stream) — restart the stream to adopt the evolved schema")))
        .cast(outDt))
      .otherwise(back)
  }

  /** General struct drift reconcile BY NAME (r20 — nested rename/drop/
    * promote can leave a delta's struct shape off the pinned one in ways
    * a positional cast would mis-map or refuse): pinned subfields take the
    * incoming same-named value (recursing through structs, leaf type
    * changes through the lossy guard), missing ones null-fill, extras
    * drop; a NULL struct stays NULL. */
  private def structReconcile(c: Column,
      from: org.apache.spark.sql.types.StructType,
      to: org.apache.spark.sql.types.StructType, label: String): Column = {
    // nullable cast targets: casting an expression to a NOT NULL struct
    // type is an analysis error, and null-fill is nullable by nature
    def nn(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        StructType(s.fields.map(f =>
          f.copy(dataType = nn(f.dataType), nullable = true)))
      case o => o
    }
    val fromByName = from.fields.map(f => f.name.toLowerCase -> f).toMap
    val parts = to.fields.toSeq.map { tf =>
      fromByName.get(tf.name.toLowerCase) match {
        case Some(ff) if ff.dataType == tf.dataType =>
          c.getField(ff.name).as(tf.name)
        case Some(ff) => (ff.dataType, tf.dataType) match {
          case (fs: org.apache.spark.sql.types.StructType,
                ts: org.apache.spark.sql.types.StructType) =>
            structReconcile(c.getField(ff.name), fs, ts,
              s"$label.${tf.name}").as(tf.name)
          case _ =>
            guardedConform(c.getField(ff.name), ff.dataType, tf.dataType,
              s"$label.${tf.name}").as(tf.name)
        }
        case None => lit(null).cast(nn(tf.dataType)).as(tf.name)
      }
    }
    when(c.isNull, lit(null).cast(nn(to))).otherwise(struct(parts: _*))
  }

  private def conform(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    val inType = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    df.select(baseSchema.fields.toSeq.map { f =>
      have.get(f.name.toLowerCase) match {
        case Some(c) if inType(f.name.toLowerCase) == f.dataType =>
          col(c).as(f.name)
        case Some(c) if structAddOnly(inType(f.name.toLowerCase), f.dataType) =>
          // nested ADD drift (a struct delta from before the add): null-fill
          // the appended subfields — lossless by construction, so the
          // try_cast round-trip guard below does not apply
          fillNested(col(c),
            inType(f.name.toLowerCase)
              .asInstanceOf[org.apache.spark.sql.types.StructType],
            f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType])
            .as(f.name)
        case Some(c)
            if inType(f.name.toLowerCase)
              .isInstanceOf[org.apache.spark.sql.types.StructType] &&
              f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          // any OTHER struct drift (nested rename/drop/promote, r20):
          // reconcile by name — a positional struct cast would mis-map
          // renamed subfields or fail analysis on count changes
          structReconcile(col(c),
            inType(f.name.toLowerCase)
              .asInstanceOf[org.apache.spark.sql.types.StructType],
            f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType], c)
            .as(f.name)
        case Some(c) =>
          guardedConform(col(c), inType(f.name.toLowerCase), f.dataType, c)
            .as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    } ++ keep.map(col): _*)
  }

  override def stop(): Unit = ()
}

object SnapshotSource {

  /** Schema-drift events recorded by running streams, keyed by (store
    * root, pinned stream schema): two concurrent streams over one root
    * with DIFFERENT pinned schemas must not conflate or suppress each
    * other's events. Per key the set is deduplicated `(commit version,
    * message)` pairs (checkpoint replays of a range re-observe the same
    * drift; the signal must not double) and CAPPED — a long-lived process
    * watching a fast-evolving store must not grow the registry without
    * bound. All mutation and read paths synchronize on the registry itself
    * (drift is rare — contention is nil), so a record can never land in a
    * just-cleared set and vanish. Each event is also logged at WARN when
    * first recorded. */
  private val drift = scala.collection.mutable.LinkedHashMap
    .empty[(String, String), scala.collection.mutable.LinkedHashSet[(Long, String)]]
  private val MaxEventsPerStream = 1000
  private val MaxTrackedStreams = 256

  /** The observable schema-drift signal for a store's streams: every
    * mid-stream evolution whose data a stream cannot carry (new/renamed
    * columns waiting for a restart, extra delta columns dropped by
    * conform), with the restart remedy in the message. Monitoring hooks
    * poll this the way they poll StreamingQuery progress. The root-level
    * form unions every pinned schema's events over that root; pass the
    * stream's pinned schema for the per-stream view. */
  def schemaDriftEvents(root: String): Seq[(Long, String)] =
    drift.synchronized {
      drift.toSeq.collect { case ((r, _), s) if r == root => s.toSeq }
        .flatten.distinct
    }

  def schemaDriftEvents(root: String, pinned: StructType): Seq[(Long, String)] =
    drift.synchronized {
      drift.get((root, pinned.json)).map(_.toSeq).getOrElse(Nil)
    }

  def clearSchemaDriftEvents(root: String): Unit =
    drift.synchronized { drift.filterInPlace { case ((r, _), _) => r != root } }

  private[streaming] def recordDrift(root: String, pinnedJson: String,
      v: Long, msg: String): Unit = {
    val fresh = drift.synchronized {
      if (!drift.contains((root, pinnedJson)))
        while (drift.size >= MaxTrackedStreams)
          drift.remove(drift.head._1) // evict the longest-idle stream key
      // true LRU: LinkedHashMap orders by INSERTION, so refresh this key's
      // recency by re-inserting — otherwise the cap would evict the
      // oldest-registered (possibly busiest) stream, not the longest-idle
      val s = drift.remove((root, pinnedJson)).getOrElse(
        scala.collection.mutable.LinkedHashSet.empty[(Long, String)])
      drift.put((root, pinnedJson), s)
      if (s.contains((v, msg))) false
      else {
        while (s.size >= MaxEventsPerStream) s.remove(s.head) // ring: oldest out
        s.add((v, msg))
      }
    }
    if (fresh)
      org.slf4j.LoggerFactory.getLogger(classOf[SnapshotSource]).warn(msg)
  }

  /** The store's CURRENT resolved schema (evolution applied) — what a
    * stream started now will carry for its whole run. */
  def storeSchema(spark: SparkSession, root: String): StructType = {
    val st = new SnapshotTable(spark, root)
    st.currentVersion match {
      case Some(_) => st.read().schema
      case None => throw new IllegalArgumentException(
        s"empty snapshot store at $root: pass .schema(...) to stream a " +
          "store that has no commits yet")
    }
  }

  /** The DATA schema (user-given minus any CDC tag columns, else the
    * store's). */
  private[streaming] def dataSchema(spark: SparkSession, root: String,
      userSchema: Option[StructType]): StructType =
    userSchema.map(s => StructType(s.fields.filterNot(f =>
        f.name == "_change_type" || f.name == "_commit_version")))
      .getOrElse(storeSchema(spark, root))

  /** The stream's full schema for `mode` — cdc appends the tag columns. */
  private[streaming] def streamSchema(base: StructType, mode: String): StructType =
    if (mode == "cdc")
      StructType(base.fields
        :+ org.apache.spark.sql.types.StructField("_change_type",
             org.apache.spark.sql.types.StringType)
        :+ org.apache.spark.sql.types.StructField("_commit_version",
             org.apache.spark.sql.types.LongType))
    else base
}

/** `spark.readStream.format("graft-snapshot").load(root)` — the v1
  * [[StreamSourceProvider]] door to [[SnapshotSource]] (registered in
  * META-INF/services for the short name). */
final class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot stream needs the store root: .load(<root>) or " +
        ".option(\"path\", <root>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), SnapshotSource.streamSchema(
      SnapshotSource.dataSchema(sqlContext.sparkSession, rootOf(parameters), schema),
      parameters.getOrElse("mode", "append-only").trim))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(sqlContext.sparkSession, rootOf(parameters), schema,
      parameters)
}
