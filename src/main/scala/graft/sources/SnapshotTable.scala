package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lightweight snapshot/time-travel table (SURVEY.md §2.3 S3/S4, §2.11 X2):
  * the reference exposes Iceberg snapshot metadata (`table_snapshot`,
  * `table_history`) and time travel (`AT SNAPSHOT`/`VERSION AS OF`). The
  * Iceberg runtime isn't shipped in this environment, so this implements the
  * same contract over versioned parquet directories:
  *
  *   root/v=N/part-*.parquet     one immutable directory per committed version
  *   root/_graft_meta.jsonl      append-only commit log (version, ts, op, rows)
  *
  * Readers pin a version (time travel) or read latest; `history()` surfaces
  * the commit log as a DataFrame; `expireSnapshots` mirrors Iceberg's
  * expire_snapshots maintenance procedure. Commits are last-writer-wins on
  * the driver — single-writer semantics, like the workshop's single pipeline
  * process; a real multi-writer deployment would use Iceberg's atomic swap.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  private def metaPath = Paths.get(root, "_graft_meta.jsonl")

  /** Op marker for merge-on-read equality-delete commits: the version dir
    * holds only the deleted KEYS, not a full data copy (see [[deleteWhereMor]]). */
  private val MorDeleteOp = "mor-delete"

  /** Op prefix for commits made on a side branch: `branch:<name>:<op>`.
    * Branch commits share the global version sequence and directory layout
    * but are NOT part of main's lineage — main-head resolution and the
    * mor-delete base walk skip them (see [[read]]). */
  private val BranchOpPrefix = "branch:"

  private def refsPath = Paths.get(root, "_graft_refs.jsonl")

  /** Named refs (Iceberg branches/tags): append-only `name,kind,version`
    * log, last line per name wins; a `dropped` line is a tombstone — the
    * name is free for re-creation and its pins are released. */
  private def readRefs(): Map[String, (String, Long)] =
    if (!Files.exists(refsPath)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(refsPath).asScala.filter(_.nonEmpty).map { line =>
        val m = line.split(",", 3)
        m(0) -> (m(1), m(2).toLong)
      }.toMap.filter(_._2._1 != "dropped")
    }

  private def writeRef(name: String, kind: String, v: Long): Unit = {
    // the refs log is line/comma-delimited — a name containing either would
    // corrupt every later read of the whole log, so reject at write time
    require(name.nonEmpty && !name.exists(c => c == ',' || c == '\n' || c == '\r'),
      s"invalid ref name '$name': must be non-empty, no ',' or line breaks")
    Files.createDirectories(Paths.get(root))
    Files.writeString(refsPath, s"$name,$kind,$v\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def isBranchOp(op: String): Boolean = op.startsWith(BranchOpPrefix)

  /** Op prefix for METADATA-ONLY commits (`alias:<dirVersion>:<label>`):
    * the commit is on main's lineage but its data dir is another version's.
    * This is what makes publish/rollback O(metadata) — at 100 TB neither
    * may copy the table (Iceberg's fast-forward and rollback are pointer
    * moves). */
  private val AliasOpPrefix = "alias:"

  /** The version whose `v=N` dir holds this entry's data (itself, unless
    * the entry is an alias commit). */
  private def dataDirVersion(m: (Long, Long, String, Long)): Long =
    if (m._3.startsWith(AliasOpPrefix)) m._3.split(":", 3)(1).toLong else m._1

  /** Main's head: the latest commit that is on main's lineage (branch
    * commits share the version sequence but not the lineage). */
  private def mainHead(meta: Seq[(Long, Long, String, Long)]): Option[Long] =
    meta.filterNot(m => isBranchOp(m._3)).lastOption.map(_._1)

  private def nextVersion(meta: Seq[(Long, Long, String, Long)]): Long =
    meta.lastOption.map(_._1 + 1).getOrElse(0L)

  private def readMeta(): Seq[(Long, Long, String, Long)] =
    if (!Files.exists(metaPath)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(metaPath).asScala.toSeq.filter(_.nonEmpty).map { line =>
        val m = line.split(",", 4)
        (m(0).toLong, m(1).toLong, m(2), m(3).toLong)
      }
    }

  private def appendMeta(version: Long, op: String, rows: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    Files.writeString(metaPath,
      s"$version,${System.currentTimeMillis()},$op,$rows\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Head of MAIN (side-branch commits are not main's lineage). */
  def currentVersion: Option[Long] = mainHead(readMeta())

  /** Commit a new snapshot (append = previous data + df; overwrite = df).
    * Appends support SCHEMA EVOLUTION (the Iceberg behavior this mirrors):
    * new columns may appear and old columns may be absent — the union is by
    * name with missing columns null-filled, and the committed snapshot
    * carries the widened schema. */
  def commit(df: DataFrame, op: String = "overwrite"): Long = {
    val meta = readMeta()
    val prev = mainHead(meta)
    val next = nextVersion(meta)
    val data = (op, prev) match {
      case ("append", Some(v)) =>
        read(Some(v)).unionByName(df, allowMissingColumns = true)
      case _ => df
    }
    data.write.mode("overwrite").parquet(s"$root/v=$next")
    val rows = spark.read.parquet(s"$root/v=$next").count()
    appendMeta(next, op, rows)
    next
  }

  /** Read latest, or `VERSION AS OF` when a version is given.
    *
    * A version whose op is `mor-delete` is RECONSTRUCTED: the nearest
    * preceding full-data snapshot, minus every equality-delete file
    * committed after it (each applied as a broadcast anti-join — the delete
    * sets are small by the mode's own selection criterion, so the plan is a
    * map-only scan over the base with no data-side shuffle). */
  def read(versionAsOf: Option[Long] = None): DataFrame = {
    val meta = readMeta()
    val v = versionAsOf.orElse(mainHead(meta))
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    // branch commits share the version sequence but not main's lineage:
    // when resolving a main version they are invisible (a branch commit
    // must never be picked as a mor-delete base, nor folded as a delete
    // file); when v IS a branch commit, that full-data snapshot is its own
    // base.
    val upTo = meta.filter(m => m._1 <= v && (m._1 == v || !isBranchOp(m._3)))
    require(upTo.exists(_._1 == v), s"no snapshot v=$v at $root")
    val baseIdx = upTo.lastIndexWhere(m => m._3 != MorDeleteOp)
    require(baseIdx >= 0, s"no full-data base snapshot at or before v=$v at $root")
    val base = spark.read.parquet(s"$root/v=${dataDirVersion(upTo(baseIdx))}")
    upTo.drop(baseIdx + 1).foldLeft(base) { case (df, (dv, _, _, _)) =>
      val del = spark.read.parquet(s"$root/v=$dv")
      val key = del.columns.head // delete file's single column IS the key name
      df.join(broadcast(del), Seq(key), "left_anti")
    }
  }

  /** `TIMESTAMP AS OF`: latest MAIN snapshot committed at or before
    * tsMillis (side-branch commits are not main's timeline). */
  def readAsOfTimestamp(tsMillis: Long): DataFrame = {
    val v = readMeta().filterNot(m => isBranchOp(m._3)).filter(_._2 <= tsMillis)
      .lastOption
      .getOrElse(throw new IllegalStateException(s"no snapshot at or before $tsMillis"))
    read(Some(v._1))
  }

  /** S3/S4 — snapshot/history metadata as a DataFrame. */
  def history(): DataFrame = {
    import spark.implicits._
    readMeta().toDF("version", "committed_at_ms", "operation", "row_count")
      .withColumn("committed_at", timestamp_millis(col("committed_at_ms")))
  }

  /** X2 — expire old snapshots, keeping the most recent `keep` versions
    * (mirror of Iceberg's expire_snapshots). If the oldest kept version is a
    * merge-on-read delete, retention extends back to its full-data base —
    * expiring the base would orphan the delete files (Iceberg likewise keeps
    * every file a live snapshot still references). */
  def expireSnapshots(keep: Int): Seq[Long] = {
    val meta = readMeta()
    val keptFrom = {
      val requested = math.max(meta.length - keep, 0)
      // MAIN's head always survives: a keep-window of trailing side-branch
      // commits must not expire the only readable main state
      val mainIdx = meta.lastIndexWhere(m => !isBranchOp(m._3))
      val cut = if (mainIdx >= 0) math.min(requested, mainIdx) else requested
      // the earliest kept MAIN-lineage entry decides whether retention must
      // extend back: a branch commit is its own full base (read() treats it
      // so) and must not shadow a mor-delete right after it, and a branch
      // commit is never a legal mor-delete base (read() skips it).
      val firstMain = meta.indexWhere(m => !isBranchOp(m._3), cut)
      if (firstMain < 0 || meta(firstMain)._3 != MorDeleteOp) cut
      else {
        val baseIdx = meta.lastIndexWhere(
          m => m._3 != MorDeleteOp && !isBranchOp(m._3), firstMain)
        if (baseIdx >= 0) baseIdx else cut
      }
    }
    // named refs PIN their versions: a branch head or tag stays readable
    // however old it is (Iceberg expires nothing a live ref reaches). A ref
    // at a mor-delete version also pins its base and the delete files
    // between, or the reconstruction would dangle.
    val pinned = readRefs().values.map(_._2).toSet.flatMap { (v: Long) =>
      val upTo = meta.filter(m => m._1 <= v && (m._1 == v || !isBranchOp(m._3)))
      val baseIdx = upTo.lastIndexWhere(m => m._3 != MorDeleteOp)
      if (baseIdx >= 0) upTo.drop(baseIdx).map(_._1).toSet else Set(v)
    }
    val keep2 = meta.length - keptFrom
    val expire0 = meta.dropRight(keep2).map(_._1).filterNot(pinned)
    // an alias commit (publish/rollback) surviving expiry still reads its
    // target's data dir — the target's files must survive with it.
    val survivors = meta.filterNot(m => expire0.contains(m._1))
    val aliasTargets = survivors.map(dataDirVersion).toSet
    val expire = expire0.filterNot(aliasTargets)
    expire.foreach { v =>
      val dir = Paths.get(root, s"v=$v")
      if (Files.exists(dir)) {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    val expired = expire.toSet
    val remaining = meta.filterNot(m => expired(m._1))
    val content = remaining.map { case (v, t, o, r) => s"$v,$t,$o,$r" }
      .mkString("", "\n", if (remaining.nonEmpty) "\n" else "")
    Files.writeString(metaPath, content,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    expire
  }

  /** The directory holding the CURRENT snapshot's base DATA files
    * (merge-on-read delete files excluded): what file-level metadata scans
    * should list — Iceberg's files/partitions tables likewise report data
    * files, with delete files accounted separately. */
  def currentBaseDataDir: String = {
    val meta = readMeta()
    val v = mainHead(meta).getOrElse(
      throw new IllegalStateException(s"no snapshots at $root"))
    val upTo = meta.filter(m => m._1 <= v && (m._1 == v || !isBranchOp(m._3)))
    val baseIdx = upTo.lastIndexWhere(m => m._3 != MorDeleteOp)
    require(baseIdx >= 0, s"no full-data base snapshot at or before v=$v at $root")
    s"$root/v=${dataDirVersion(upTo(baseIdx))}"
  }

  /** X2 — expire snapshots COMMITTED BEFORE `tsMillis` (the `VACUUM TABLE …
    * EXPIRE SNAPSHOTS OLDER_THAN` form): expressed as a keep-count so every
    * retention guarantee of [[expireSnapshots]] (mor bases, ref pins, alias
    * targets) applies identically. The head always survives, however old. */
  def expireSnapshotsOlderThan(tsMillis: Long): Seq[Long] = {
    val meta = readMeta()
    // keep-count includes main's head however old (expireSnapshots also
    // clamps to main's head positionally, so trailing side-branch commits
    // cannot push the only readable main state out of the window)
    val keep = math.max(meta.count(_._2 >= tsMillis), 1)
    expireSnapshots(keep)
  }

  /** X2 — compaction (mirror of rewrite_data_files bin-packing): rewrite the
    * current version's data as `targetFiles` files in a new snapshot. Also
    * folds any outstanding merge-on-read delete files into the new full base
    * (read() resolves them), exactly as Iceberg compaction does. */
  def compact(targetFiles: Int): Long =
    commit(read().coalesce(targetFiles), op = "compact")

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
  def deleteWhere(pred: Column): Long =
    commit(read().filter(!(pred <=> lit(true))), op = "cow-delete")

  /** DELETE FROM … WHERE, merge-on-read: commits ONLY the distinct matching
    * `keyCol` values (an Iceberg-style equality-delete file; the file's
    * single column name records the key). `rows` in the commit log is the
    * delete-key count, not a table row count. Keys must identify rows
    * uniquely for delete semantics to match the copy-on-write form. */
  def deleteWhereMor(pred: Column, keyCol: String): Long = {
    val meta = readMeta()
    require(mainHead(meta).nonEmpty, s"no snapshots at $root")
    val next = nextVersion(meta)
    read().filter(pred).select(keyCol).distinct()
      .write.mode("overwrite").parquet(s"$root/v=$next")
    val n = spark.read.parquet(s"$root/v=$next").count()
    appendMeta(next, MorDeleteOp, n)
    next
  }

  /** UPDATE … SET col = expr, … WHERE pred (copy-on-write): each assignment
    * applies only where `pred` holds; all other rows pass through. */
  def update(pred: Column, set: Map[String, Column]): Long = {
    val updated = set.foldLeft(read()) { case (df, (c, expr)) =>
      df.withColumn(c, when(pred, expr).otherwise(col(c)))
    }
    commit(updated, op = "update")
  }

  /** MERGE INTO (upsert) keyed on `keyCol`: WHEN MATCHED THEN UPDATE SET * /
    * WHEN NOT MATCHED THEN INSERT *. Source rows replace matching target
    * rows wholesale and are appended when unmatched. The anti-join's build
    * side is the source's key projection — for the typical small-delta
    * merge, AQE broadcasts it and the target is never shuffled. */
  def merge(source: DataFrame, keyCol: String): Long = {
    val merged = read().join(source.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(source, allowMissingColumns = true)
    commit(merged, op = "merge")
  }

  /** Roll back to a previous version's content, as a NEW snapshot (mirror of
    * Iceberg's rollback_to_snapshot: history is preserved, the table head
    * moves). METADATA-ONLY when the target is a full-data snapshot — the
    * new head points at the old version's data dir; only a mor-delete
    * target (whose content is a reconstruction) must materialize. */
  def rollback(toVersion: Long): Long = {
    val meta = readMeta()
    val entry = meta.find(_._1 == toVersion).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$toVersion at $root"))
    if (entry._3 == MorDeleteOp)
      commit(read(Some(toVersion)), op = s"rollback-to-$toVersion")
    else {
      val next = nextVersion(meta)
      appendMeta(next,
        s"$AliasOpPrefix${dataDirVersion(entry)}:rollback-to-$toVersion", entry._4)
      next
    }
  }

  /** CDC changelog between two snapshots, keyed on `keyCol` (assumed unique
    * per snapshot — a primary key): every output row is a row of `fromV` or
    * `toV` plus a `_change_type` column in {insert, delete, update_preimage,
    * update_postimage} (the Iceberg create_changelog_view contract). Updates
    * are detected by comparing a fingerprint over the non-key columns, so a
    * key present on both sides with identical content emits nothing. */
  def changes(fromV: Long, toV: Long, keyCol: String): DataFrame = {
    val before0 = read(Some(fromV))
    val after0 = read(Some(toV))
    // align both snapshots to the UNION schema before fingerprinting: after
    // schema evolution an untouched row null-fills identically on both sides
    // and emits nothing (Iceberg's changelog likewise reports only rows whose
    // content changed, not every row that predates a new column).
    def align(df: DataFrame, other: DataFrame): DataFrame =
      other.schema.fields.foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
      }
    val before = align(before0, after0)
    val after = align(after0, before0)
    def fp(df: DataFrame): DataFrame = {
      val others = df.columns.filterNot(_ == keyCol).sorted
      df.withColumn("__fp", md5(concat_ws("\u0001",
        others.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)))
    }
    val b = fp(before)
    val a = fp(after)
    val aKeyFp = a.select(col(keyCol), col("__fp"))
    val bKeyFp = b.select(col(keyCol), col("__fp"))
    val aKeys = a.select(col(keyCol))
    val bKeys = b.select(col(keyCol))
    // rows of `before` that changed or vanished: content (key,fp) absent in
    // `after`; key still present → update_preimage, key gone → delete.
    val pre = b.join(aKeyFp, Seq(keyCol, "__fp"), "left_anti")
    val preTagged = pre.join(aKeys, Seq(keyCol), "left_semi")
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(pre.join(aKeys, Seq(keyCol), "left_anti")
        .withColumn("_change_type", lit("delete")))
    // rows of `after` that are new or rewritten: mirrored construction.
    val post = a.join(bKeyFp, Seq(keyCol, "__fp"), "left_anti")
    val postTagged = post.join(bKeys, Seq(keyCol), "left_semi")
      .withColumn("_change_type", lit("update_postimage"))
      .unionByName(post.join(bKeys, Seq(keyCol), "left_anti")
        .withColumn("_change_type", lit("insert")))
    // allowMissingColumns: commit() supports schema evolution on append, so
    // fromV and toV may legally differ in schema — the changelog carries the
    // union schema with absent-side columns null-filled.
    preTagged.unionByName(postTagged, allowMissingColumns = true).drop("__fp")
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

  /** Commit to a side branch (overwrite or append against the BRANCH's
    * head); main's lineage and head are untouched. */
  def commitToBranch(branch: String, df: DataFrame, op: String = "overwrite"): Long = {
    val head = branchHead(branch).getOrElse(
      throw new IllegalStateException(s"no branch $branch at $root"))
    val data =
      if (op == "append") read(Some(head)).unionByName(df, allowMissingColumns = true)
      else df
    val meta = readMeta()
    val next = nextVersion(meta)
    data.write.mode("overwrite").parquet(s"$root/v=$next")
    val rows = spark.read.parquet(s"$root/v=$next").count()
    appendMeta(next, s"$BranchOpPrefix$branch:$op", rows)
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
    * branch is visible to a main reader. METADATA-ONLY (the new main commit
    * points at the branch head's data dir) except when the branch points at
    * a mor-delete reconstruction, which must materialize. */
  def fastForward(fromBranch: String): Long = {
    val head = branchHead(fromBranch).getOrElse(
      throw new IllegalStateException(s"no branch $fromBranch at $root"))
    val meta = readMeta()
    val entry = meta.find(_._1 == head).getOrElse(
      throw new IllegalStateException(s"no snapshot v=$head at $root"))
    if (entry._3 == MorDeleteOp)
      commit(readBranch(fromBranch), op = s"publish-$fromBranch")
    else {
      val next = nextVersion(meta)
      appendMeta(next,
        s"$AliasOpPrefix${dataDirVersion(entry)}:publish-$fromBranch", entry._4)
      next
    }
  }
}
