package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, when}

import graft.sources.Catalog

/** Executes a Dremio-style SQL script statement-by-statement (the reference's
  * pipeline lifecycle, SURVEY.md §3.2: each industry .sql file is a sequence
  * of CREATE FOLDER / CREATE TABLE / INSERT / CREATE VIEW / SELECT run in
  * order), translating the dialect gaps:
  *
  *  - `CREATE FOLDER IF NOT EXISTS a.b.c` → a REAL nested namespace: the
  *    first path segment (`a` — the reference's `dremio` root) is
  *    auto-registered as a GraftCatalog (DSv2, parquet warehouse), and the
  *    folder becomes `CREATE NAMESPACE a.b.c` on it. Tables then resolve
  *    their full dotted paths natively — `a.b.c.t` stays `a.b.c.t` through
  *    DDL, DML and queries, matching the reference hierarchy
  *    (semantics.sql:8-23) with no name mangling.
  *  - `CREATE [OR REPLACE] VIEW a.b.v` → session temp view `a_b_v`, with
  *    references in later statements rewritten. Views are the one surface
  *    kept session-scoped: Spark's v2 catalog API hosts tables, not views
  *    (a ViewCatalog SPI exists but CREATE VIEW doesn't route to it), and
  *    the reference's views are session-lifecycle pipeline steps anyway.
  *  - `DELETE FROM t` (unqualified) → v2 truncate (overwrite with the empty
  *    set), the reference's repeatable-run reset (logistics_AI.sql:60).
  *  - Row-level DML on snapshot-bound tables (`graft.snapshot.<name>`, the
  *    time-travel binding): `DELETE FROM t WHERE …` (copy-on-write, or
  *    merge-on-read when `graft.snapshot.<name>.delete_mode=mor`),
  *    `UPDATE t SET … [WHERE …]`, whole-row `MERGE INTO … SET * / INSERT *`,
  *    and `ROLLBACK TABLE t TO SNAPSHOT 'v'` — the Iceberg v2 DML surface
  *    over [[graft.sources.SnapshotTable]].
  *  - `GRANT …` → recorded as governance metadata (Catalog.grant), not
  *    executed (Spark has no ACL store).
  *  - `AI_GENERATE(… WITH SCHEMA ROW(…))` → schema-typed generic path
  *    (DremioDialect.rewriteAiGenerate); AI functions pre-registered.
  *  - `ALTER DATASET d CREATE REFLECTION r USING RAW` (readme.md:322-326,
  *    plus the public `CREATE RAW REFLECTION … USING DISPLAY (…)` /
  *    `CREATE AGGREGATE REFLECTION … USING DIMENSIONS (…) MEASURES (…)`
  *    spellings) → a refreshed [[graft.plans.Materializations]] entry with
  *    [[graft.plans.MaterializationSubstitution]] installed, so later
  *    SELECTs over the dataset are served from the materialization
  *    transparently — the Dremio acceleration contract.
  *  - `TABLE(table_snapshot('t'))` / `TABLE(table_history('t'))`
  *    (readme.md:357-369) → [[graft.sources.MetadataFunctions]] metadata
  *    scans bound as temp views in place.
  *  - Comments (`-- …`) are stripped; statements split on top-level `;`
  *    (quote-aware).
  *
  * Returns the result of every statement that produced rows (SELECTs), by
  * statement index.
  */
final class SqlScriptRunner(spark: SparkSession,
                            asUser: Option[String] = None,
                            advisor: Option[graft.plans.WorkloadAdvisor] = None) {

  /** dotted view name → flattened temp-view name, longest first at rewrite. */
  private val viewRewrites =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** flattened temp-view name → original dotted path (for grant checks). */
  private val viewPathsByFlat =
    scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]

  /** Reflections declared by this script (`ALTER DATASET … CREATE
    * REFLECTION`), refreshed eagerly and substituted into later SELECTs. */
  lazy val reflections: graft.plans.Materializations =
    new graft.plans.Materializations(spark,
      Some(graft.TempDirs.newDir("graft_reflections")))

  private var metaViewCount = 0
  private var hasReflections = false

  /** graft_* temp views created by the CURRENT statement's rewrites. Only
    * these are exempt from SELECT enforcement (their privilege was checked
    * against the original dataset at rewrite time); a user statement that
    * names a graft_* view bound by an EARLIER (possibly more privileged)
    * statement is denied, and each statement's views are dropped after it
    * executes, so no rewrite artifact outlives its statement. */
  private val stmtViews = scala.collection.mutable.Set.empty[String]

  def run(script: String): Map[Int, DataFrame] = {
    graft.ai.AiFunctions.register(spark)
    // re-ensure this runner's substitution rule before each batch: another
    // registry's install() may have run since the reflection was declared
    if (hasReflections) installSubstitution()
    statements(script).zipWithIndex.flatMap { case (stmt, i) =>
      execute(stmt).map(i -> _)
    }.toMap
  }

  /** Split on `;` outside single/double quotes; strip `--` line comments
    * and `/* … */` block comments. */
  private[pipeline] def statements(raw: String): Seq[String] = {
    val script = DremioDialect.stripBlockComments(raw)
    val noComments = script.linesIterator.map { line =>
      var inS = false; var inD = false; var cut = line.length
      var i = 0
      while (i < line.length - 1 && cut == line.length) {
        line.charAt(i) match {
          case '\'' if !inD => inS = !inS
          case '"' if !inS => inD = !inD
          case '-' if !inS && !inD && line.charAt(i + 1) == '-' => cut = i
          case _ =>
        }
        i += 1
      }
      line.substring(0, cut)
    }.mkString("\n")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inS = false; var inD = false
    var i = 0
    while (i < noComments.length) {
      noComments.charAt(i) match {
        case c @ '\\' if (inS || inD) && i + 1 < noComments.length =>
          // backslash-escaped quote inside a literal (single- OR double-
          // quoted) must not toggle state
          sb += c; sb += noComments.charAt(i + 1); i += 1
        case c @ '\'' if !inD => inS = !inS; sb += c
        case c @ '"' if !inS => inD = !inD; sb += c
        case ';' if !inS && !inD =>
          if (sb.toString.trim.nonEmpty) out += sb.toString.trim
          sb.clear()
        case c => sb += c
      }
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  /** Register a GraftCatalog for the path's first segment, once per name. */
  private def ensureCatalog(cat: String): Unit = {
    val key = s"spark.sql.catalog.$cat"
    if (spark.conf.getOption(key).isEmpty) {
      spark.conf.set(key, classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"$key.warehouse",
        graft.TempDirs.newDir(s"graft_cat_$cat"))
    }
  }

  private def execute(raw: String): Option[DataFrame] = {
    val stmt = DremioDialect.rewriteDdlTypes(
      DremioDialect.rewriteAiGenerate(
        DremioDialect.rewriteToTimestamp3(
          DremioDialect.rewriteFunctionNames(
            DremioDialect.rewriteArrayLiterals(
              DremioDialect.rewriteQuotedIdentifiers(
                rewriteViewPaths(raw)))))))
    val upper = stmt.toUpperCase.replaceAll("\\s+", " ").trim
    // DML dispatch must see only TOP-LEVEL keywords: a WHERE inside a string
    // literal must not make a truncate look row-level (or vice versa), and
    // `WHERE(pred)` — no trailing space — is legal SQL. Length-preserving
    // masking lets clause regexes match on `masked` and slice `stmt`.
    val masked = maskStringLiterals(stmt)
    val hasTopLevelWhere = "(?i)\\bWHERE\\b".r.findFirstIn(masked).isDefined
    if (upper.startsWith("CREATE FOLDER")) {
      val path = stmt.trim.split("\\s+").last.stripSuffix(";")
      ensureCatalog(path.split("\\.").head)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $path")
      None
    } else if (upper.startsWith("GRANT ")) {
      Catalog.grant(stmt)
      None
    } else if (upper.startsWith("ALTER DATASET ") && upper.contains(" REFLECTION ")) {
      asUser.foreach { u =>
        "(?is)ALTER\\s+DATASET\\s+([\\w.]+)".r.findFirstMatchIn(stmt).foreach(m =>
          requirePrivilege(u, "ALTER", Seq("ALTER REFLECTION"),
            datasetPath(m.group(1))))
      }
      createReflection(stmt)
      None
    } else if (upper.startsWith("CREATE OR REPLACE VIEW ") ||
        upper.startsWith("CREATE VIEW ")) {
      val m = "(?is)^(CREATE(?:\\s+OR\\s+REPLACE)?\\s+)VIEW\\s+([\\w.]+)(.*)$".r
      // record representations for the Iceberg view export (r20): the
      // translated Spark SQL is the canonical dialect; when the ORIGINAL
      // statement differs (Dremio spellings the dialect layer rewrote),
      // it rides along as a `dremio` representation — the spec's
      // multi-representation list, so the source engine reads its own
      // text back
      def record(viewName: String, sparkBody: String, rawStmt: String): Unit = {
        val rawBody = "(?is)^CREATE(?:\\s+OR\\s+REPLACE)?\\s+VIEW\\s+[\\w.\"]+\\s+AS\\s+(.*)$".r
          .findFirstMatchIn(rawStmt.trim).map(_.group(1).trim)
        val extra = rawBody.filter(_ != sparkBody).map("dremio" -> _).toSeq
        Catalog.recordViewRepresentations(spark, viewName,
          ("spark" -> sparkBody) +: extra)
      }
      def bodyOf(rest: String): Option[String] =
        "(?is)^\\s+AS\\s+(.*)$".r.findFirstMatchIn(rest).map(_.group(1).trim)
      stmt match {
        case m(head, name, rest) if name.contains(".") =>
          val flat = name.replace('.', '_')
          viewRewrites(name) = flat
          viewPathsByFlat(flat) = name.split("\\.").toSeq
          spark.sql(s"${head}TEMP VIEW $flat$rest")
          bodyOf(rest).foreach(record(flat, _, raw))
          None
        case m(_, name, rest) =>
          spark.sql(stmt)
          bodyOf(rest).foreach(record(name, _, raw))
          None
        case _ =>
          spark.sql(stmt); None
      }
    } else if (upper.startsWith("CREATE TABLE") &&
        ("(?i)PARTITION\\s+BY\\s*\\(".r.findFirstIn(stmt).isDefined ||
         "(?i)DISTRIBUTE\\s+BY\\s*\\(".r.findFirstIn(stmt).isDefined)) {
      // Dremio `PARTITION BY (DAY(ts))` / `(col)` on CREATE TABLE: Spark's
      // parser doesn't accept the spelling and the v2 parquet write path
      // doesn't lay out transform partitions, so the clause is recorded as
      // declared intent and the table is created unpartitioned. Day-grain
      // pruning is provided by the engine's own write path
      // (Catalog.ctasDayPartitioned + HiddenPartitionPruning).
      // `DISTRIBUTE BY (cols)` (retail.sql:134) keeps its SEMANTICS: the
      // clause becomes a REPARTITION hint on the CTAS select, clustering
      // rows on the declared key exactly as Dremio lays them out.
      // one nesting level inside the clauses covers DAY(ts)/TRUNCATE(n, col)
      val tName = "(?is)CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)".r
        .findFirstMatchIn(stmt).map(_.group(1)).getOrElse("?")
      var sql = stmt
      "(?is)PARTITION\\s+BY\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
        .findFirstMatchIn(sql).foreach { m =>
          Catalog.recordPartitionIntent(tName, m.group(1).trim)
          sql = sql.substring(0, m.start) + sql.substring(m.end)
        }
      "(?is)DISTRIBUTE\\s+BY\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
        .findFirstMatchIn(sql).foreach { m =>
          val cols = m.group(1).trim
          Catalog.recordPartitionIntent(tName, s"DISTRIBUTE BY ($cols)")
          sql = sql.substring(0, m.start) + sql.substring(m.end)
          sql = "(?is)\\bSELECT\\b".r.findFirstMatchIn(sql).map(s0 =>
            sql.substring(0, s0.end) + s" /*+ REPARTITION($cols) */" +
              sql.substring(s0.end)).getOrElse(sql)
        }
      spark.sql(sql)
      None
    } else if (upper.startsWith("OPTIMIZE TABLE ")) {
      // X2 maintenance surface: OPTIMIZE TABLE t [REWRITE DATA] — file
      // compaction (readme.md:393-401). Dremio's trailing options
      // (REWRITE DATA USING BIN_PACK, MIN/MAX_FILE_SIZE_MB…) select the
      // strategy; this engine's single strategy IS bin-pack.
      val table = stmt.trim.split("\\s+")(2).stripSuffix(";")
      asUser.foreach(u =>
        requirePrivilege(u, "ALTER", Seq("WRITE"), datasetPath(table)))
      spark.conf.getOption(s"graft.snapshot.$table") match {
        case Some(root) =>
          // snapshot-bound: bin-pack into a fresh base via the versioned
          // store's own compaction (folds outstanding delete files too);
          // the target file count comes from manifest bytes alone
          val st = new graft.sources.SnapshotTable(spark, root)
          val bytes = st.layoutStats()._1.flatMap(_._2).sum
          val tgt = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20))
          st.compact(tgt.min(Int.MaxValue).toInt)
        case None => Catalog.compactTable(spark, table)
      }
      None
    } else if (upper.startsWith("DELETE FROM ") && hasTopLevelWhere) {
      // Row-level DELETE … WHERE over a snapshot-bound table (Iceberg v2
      // DML; the truncate form below remains the catalog-table reset). The
      // write mode follows the table's declared property, like Iceberg's
      // write.delete.mode:
      //   graft.snapshot.<name>.delete_mode = cow (default) | mor | pos
      //   graft.snapshot.<name>.key         = equality-delete key (mor only)
      // `DELETE FROM t AT BRANCH b WHERE …` (Dremio's branch-targeted DML
      // spelling) applies the delete to the BRANCH's head — the
      // write-audit-publish staging write; main is untouched.
      val m = ("(?is)DELETE\\s+FROM\\s+([\\w.]+)" +
        "(?:\\s+AT\\s+BRANCH\\s+(\\w+))?\\s+WHERE\\b\\s*(.+)").r
        .findFirstMatchIn(masked).get
      val name = stmt.substring(m.start(1), m.end(1))
      val st = snapshotStore(name, "DELETE")
      val pred = expr(stmt.substring(m.start(3), m.end(3)).trim.stripSuffix(";"))
      Option(m.group(2)).map(_ => stmt.substring(m.start(2), m.end(2))) match {
        case Some(b) =>
          // branch-side copy-on-write: survivors become the branch's head
          st.commitToBranch(b,
            st.readBranch(b).filter(!(pred <=> lit(true))), "overwrite")
        case None =>
          spark.conf.getOption(s"graft.snapshot.$name.delete_mode").getOrElse("cow") match {
            case "mor" =>
              // the declared key may be a comma-separated COMPOSITE key
              // (Iceberg equality deletes span identifier fields)
              val key = spark.conf.getOption(s"graft.snapshot.$name.key").getOrElse(
                throw new IllegalArgumentException(s"DELETE (merge-on-read) on " +
                  s"$name: set graft.snapshot.$name.key to the equality-delete key"))
              st.deleteWhereMor(pred,
                key.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            case "pos" =>
              // Iceberg v2 position deletes: no key needed — the delete
              // form for tables without a unique key (duplicate rows keep
              // their unmatched copies)
              st.deleteWherePos(pred)
            case _ => st.deleteWhere(pred)
          }
      }
      None
    } else if (upper.startsWith("UPDATE ") && upper.contains(" SET ")) {
      // UPDATE t [AT BRANCH b] SET col = expr[, …] [WHERE pred] on a
      // snapshot-bound table (copy-on-write; the AT BRANCH form targets the
      // branch's head, leaving main untouched). Assignment expressions are
      // any Spark SQL scalar over the table's columns.
      // match on the masked body so a WHERE inside an assignment's string
      // literal (SET note = 'kept where found') can't split the SET clause;
      // masking is length-preserving, so offsets slice the real text
      val body = stmt.trim.stripSuffix(";")
      val m = ("(?is)UPDATE\\s+([\\w.]+)(?:\\s+AT\\s+BRANCH\\s+(\\w+))?" +
        "\\s+SET\\s+(.+?)(?:\\s+WHERE\\b\\s*(.+))?$").r
        .findFirstMatchIn(maskStringLiterals(body)).get
      val st = snapshotStore(body.substring(m.start(1), m.end(1)), "UPDATE")
      val assigns = topLevelSplit(body.substring(m.start(3), m.end(3))).map { a =>
        val eq = a.indexOf('=')
        require(eq > 0, s"UPDATE assignment not of form col = expr: $a")
        a.substring(0, eq).trim -> expr(a.substring(eq + 1).trim)
      }
      val pred = Option(m.group(4))
        .map(_ => expr(body.substring(m.start(4), m.end(4)).trim))
        .getOrElse(lit(true))
      val updName = body.substring(m.start(1), m.end(1))
      Option(m.group(2)).map(_ => body.substring(m.start(2), m.end(2))) match {
        case Some(b) =>
          val updated = assigns.foldLeft(st.readBranch(b)) { case (df, (c, e)) =>
            df.withColumn(c, when(pred, e).otherwise(col(c)))
          }
          st.commitToBranch(b, updated, "overwrite")
        case None =>
          // like DELETE, the write mode follows the table's declared
          // property (Iceberg's write.update.mode): merge-on-read commits
          // only the updated copies + their equality-delete keys — O(changed)
          spark.conf.getOption(s"graft.snapshot.$updName.update_mode")
            .getOrElse("cow") match {
            case "mor" =>
              val key = spark.conf.getOption(s"graft.snapshot.$updName.key").getOrElse(
                throw new IllegalArgumentException(s"UPDATE (merge-on-read) on " +
                  s"$updName: set graft.snapshot.$updName.key to the equality-delete key"))
              st.updateMor(pred, assigns.toMap,
                key.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            case _ => st.update(pred, assigns.toMap)
          }
      }
      None
    } else if (upper.startsWith("INSERT INTO ") && {
        "(?is)^INSERT\\s+INTO\\s+([\\w.]+)".r.findFirstMatchIn(stmt.trim)
          .exists(n => spark.conf.getOption(s"graft.snapshot.${n.group(1)}").isDefined)
      }) {
      // INSERT INTO t [AT BRANCH b] <query|VALUES …> on a SNAPSHOT-BOUND
      // table: an O(DELTA) append commit — only the new rows are written
      // (the Iceberg append cost model; reference spark.py:88-89). The AT
      // BRANCH form (Dremio's branch-targeted DML) appends to the branch's
      // head — the write-audit-publish staging write. SELECT sources align
      // BY NAME (alias your columns; missing ones null-fill — the schema-
      // evolution union semantic); VALUES align positionally to the table's
      // schema, like SQL INSERT. Catalog-table INSERTs are untouched (the
      // default spark.sql path below).
      val body = stmt.trim.stripSuffix(";")
      // `\\s*` before the body: `INSERT INTO t(a,b) VALUES …` (no space
      // before the column list) is the common SQL spelling
      val m = ("(?is)^INSERT\\s+INTO\\s+([\\w.]+)" +
        "(?:\\s+AT\\s+BRANCH\\s+(\\w+))?\\s*(\\(.*|\\S.*)$").r
        .findFirstMatchIn(maskStringLiterals(body)).get
      val name = body.substring(m.start(1), m.end(1))
      val st = snapshotStore(name, "INSERT")
      val branch = Option(m.group(2)).map(_ => body.substring(m.start(2), m.end(2)))
      val q = body.substring(m.start(3), m.end(3)).trim
      // optional explicit column list: INSERT INTO t (a, b) <query|VALUES …>
      // — the query's output maps positionally onto the listed columns
      val colsPrefix = "(?s)^\\(([\\w\\s,]+)\\)\\s*(.+)$".r
      val (explicitCols, qBody) = q match {
        case colsPrefix(cols, rest0)
            if "(?is)^(SELECT|VALUES|WITH|\\()".r.findFirstIn(rest0.trim).isDefined =>
          (Some(cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq), rest0.trim)
        case _ => (None, q)
      }
      // strip a wrapping paren only when it encloses the WHOLE body — the
      // close matching `(SELECT …` must be the final char, or forms like
      // `(SELECT …) UNION ALL (SELECT …)` would be mangled
      def fullyWrapped(t: String): Boolean = {
        if (!t.startsWith("(") || !t.endsWith(")")) return false
        var depth = 0; var i = 0; var ok = true; var inS = false
        while (i < t.length) {
          t.charAt(i) match {
            case '\\' if inS && i + 1 < t.length => i += 1
            case '\'' => inS = !inS
            case '(' if !inS => depth += 1
            case ')' if !inS => depth -= 1; if (depth == 0 && i != t.length - 1) ok = false
            case _ =>
          }
          i += 1
        }
        ok && depth == 0
      }
      val qText = if (fullyWrapped(qBody)) qBody.substring(1, qBody.length - 1) else qBody
      val df0 = sqlWithSnapshotReads(qText)
      // the table's current schema (branch head when AT BRANCH): inserted
      // values are CAST to the target column types, like SQL INSERT — an
      // integer literal landing as INT in a BIGINT table would otherwise
      // split the delta run and widen the resolved schema via unionByName
      lazy val tSchema = branch.map(st.readBranch(_)).getOrElse(st.read()).schema
      def castTo(df: DataFrame): DataFrame = {
        val types = tSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
        // ANSI store-assignment: a value the target column's type cannot
        // hold must ERROR, not silently wrap/truncate (Column.cast is
        // non-ANSI). try_cast marks lossy values null, so a null produced
        // from a non-null input is the failure signal; widening casts can
        // never lose and skip the (one-job) validation pass.
        import org.apache.spark.sql.types._
        def lossless(from: DataType, to: DataType): Boolean = (from, to) match {
          case (a, b) if a == b => true
          case (NullType, _) => true
          case (_, StringType) => true
          case (ByteType, ShortType | IntegerType | LongType |
            FloatType | DoubleType) => true
          case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
          // int→float and long→float/double can lose PRECISION but never
          // fail to store (ANSI store-assignment allows them, and try_cast
          // never yields null for them — the probe job could never fire),
          // so they skip the validation pass like true widenings
          case (IntegerType, LongType | FloatType | DoubleType) => true
          case (LongType, FloatType | DoubleType) => true
          case (LongType, _) => false
          case (FloatType, DoubleType) => true
          case (DateType, TimestampType) => true
          case _ => false
        }
        val checked = df.schema.fields.toSeq.flatMap { f =>
          types.get(f.name.toLowerCase).toSeq.collect {
            case dt if !lossless(f.dataType, dt) => (f.name, dt)
          }
        }
        if (checked.nonEmpty) {
          val bad = checked.map { case (c, dt) =>
            col(c).isNotNull && expr(s"try_cast(`$c` AS ${dt.sql})").isNull
          }.reduce(_ || _)
          require(df.filter(bad).isEmpty, s"INSERT INTO $name: a value does " +
            s"not fit its target column type (${checked.map { case (c, dt) =>
              s"$c ${dt.simpleString}" }.mkString(", ")}) — ANSI INSERT " +
            "rejects lossy store-assignment; widen the column first " +
            "(ALTER COLUMN … TYPE) or fix the value")
        }
        df.select(df.columns.toSeq.map(c =>
          types.get(c.toLowerCase).map(col(c).cast(_)).getOrElse(col(c)).as(c)): _*)
      }
      val df = explicitCols match {
        case Some(cols) =>
          require(df0.columns.length == cols.length,
            s"INSERT INTO $name (${cols.length} columns): query produced ${df0.columns.length}")
          // every listed column must exist in the table: a typo'd name would
          // otherwise silently schema-evolve the table (by-name union adds it)
          val tableCols = tSchema.fields.map(_.name.toLowerCase).toSet
          val unknown = cols.filterNot(c => tableCols.contains(c.toLowerCase))
          require(unknown.isEmpty,
            s"INSERT INTO $name: unknown column(s) ${unknown.mkString(", ")} — " +
              "use ALTER TABLE ADD COLUMN for schema evolution")
          castTo(df0.toDF(cols: _*))
        case None if qText.toUpperCase.startsWith("VALUES") =>
          val cols = tSchema.fields.map(_.name)
          require(df0.columns.length == cols.length,
            s"INSERT INTO $name VALUES: ${df0.columns.length} values for ${cols.length} columns")
          castTo(df0.toDF(cols.toSeq: _*))
        case None => df0
      }
      branch match {
        case Some(b) => st.commitToBranch(b, df, "append")
        case None    => st.commit(df, "append")
      }
      None
    } else if (upper.startsWith("MERGE INTO ")) {
      // MERGE INTO t [AS a] USING <src> [AS b] ON t.k = s.k, then any mix of
      // Iceberg/Spark MERGE clauses, first-match-wins:
      //   WHEN MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET c = e, … | DELETE
      //   WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (c, …) VALUES (e, …)
      // <src> is a (sub-select) or a table/view name; the ON clause must be
      // a single equality on the SAME column name both sides (the merge
      // key), and its qualifiers must be exactly the target and source
      // aliases (in either order) — a typo'd `ON t.id = t.id` is an error,
      // never a silent key-merge. The whole-row SET */INSERT * pair keeps
      // the cheaper anti-join+union plan (SnapshotTable.merge); any other
      // clause mix runs the general broadcast-outer-join executor
      // (SnapshotTable.mergeInto — the target side never shuffles).
      def unsupported = new IllegalArgumentException(
        "unsupported MERGE form; expected: MERGE INTO t USING src ON " +
          "t.k = s.k followed by WHEN [NOT] MATCHED [AND cond] THEN " +
          "UPDATE SET */UPDATE SET c = e, …/DELETE/INSERT */INSERT (…) VALUES (…)")
      val trimmed = stmt.trim.stripSuffix(";")
      val hm = "(?is)^MERGE\\s+INTO\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+USING\\s+".r
        .findFirstMatchIn(trimmed).getOrElse(throw unsupported)
      // the USING source: a balanced-paren (sub-select) scan — regex can't
      // bound arbitrary nesting — or a bare table/view name. Quote-aware,
      // with backslash-escaped quotes skipped.
      val rest = trimmed.substring(hm.end)
      val (srcText, afterSrc) =
        if (rest.startsWith("(")) {
          var depth = 0; var i = 0; var end = -1; var inS = false
          while (i < rest.length && end < 0) {
            rest.charAt(i) match {
              case '\\' if inS && i + 1 < rest.length => i += 1
              case '\'' => inS = !inS
              case '(' if !inS => depth += 1
              case ')' if !inS => depth -= 1; if (depth == 0) end = i
              case _ =>
            }
            i += 1
          }
          if (end <= 0) throw unsupported
          (rest.substring(0, end + 1), rest.substring(end + 1))
        } else {
          val m2 = "(?s)^([\\w.]+)".r.findFirstMatchIn(rest).getOrElse(throw unsupported)
          (m2.group(1), rest.substring(m2.end))
        }
      val am = "(?is)^\\s*(?:(?:AS\\s+)?(\\w+)\\s+)?ON\\s+".r
        .findFirstMatchIn(afterSrc).getOrElse(throw unsupported)
      val srcAlias = Option(am.group(1))
      val afterOn = afterSrc.substring(am.end)
      val maskedAfterOn = maskStringLiterals(afterOn)
      val clauseStarts = "(?is)\\bWHEN\\s+(?:NOT\\s+)?MATCHED\\b".r
        .findAllMatchIn(maskedAfterOn).map(_.start).toList
      if (clauseStarts.isEmpty) throw unsupported
      val onCond = afterOn.substring(0, clauseStarts.head).trim
      val st = snapshotStore(hm.group(1), "INSERT")
      // ON validation: same column name both sides AND the qualifiers are
      // the declared target/source names (either order)
      val targetNames = (Option(hm.group(2)).toSeq :+ hm.group(1)).map(_.toLowerCase)
      val sourceNames = (srcAlias.toSeq ++
        (if (srcText.startsWith("(")) Nil else Seq(srcText))).map(_.toLowerCase)
      require(srcAlias.nonEmpty || !srcText.startsWith("("),
        "MERGE USING (sub-select) needs an alias")
      require(targetNames.intersect(sourceNames).isEmpty,
        s"MERGE target and source aliases collide: ${targetNames.intersect(sourceNames).mkString(",")}")
      val onRe = "(?is)^\\s*([\\w.]+)\\.(\\w+)\\s*=\\s*([\\w.]+)\\.(\\w+)\\s*$".r
      val key = onRe.findFirstMatchIn(onCond) match {
        case Some(o) if o.group(2).equalsIgnoreCase(o.group(4)) =>
          val (q1, q2) = (o.group(1).toLowerCase, o.group(3).toLowerCase)
          require((targetNames.contains(q1) && sourceNames.contains(q2)) ||
            (targetNames.contains(q2) && sourceNames.contains(q1)),
            s"MERGE ON qualifiers must be the target and source aliases " +
              s"(${targetNames.head}, ${sourceNames.headOption.getOrElse("?")}): $onCond")
          o.group(2)
        case _ => throw new IllegalArgumentException(
          s"MERGE ON clause must be t.<key> = s.<key>: $onCond")
      }
      // clause expressions: target columns by plain name, source columns as
      // __src_<name> (the SnapshotTable.mergeInto convention). Rewrites run
      // OUTSIDE string literals only — a literal like 't.co/xyz' must never
      // lose its alias-shaped prefix.
      def rewriteRefs(e: String): String = mapOutsideLiterals(e) { seg =>
        var out = seg
        sourceNames.foreach(a => out = out.replaceAll(
          "(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\.(\\w+)", "__src_$1"))
        targetNames.foreach(a => out = out.replaceAll(
          "(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\.(\\w+)", "$1"))
        out
      }
      val clauseTexts = clauseStarts.zip(clauseStarts.tail :+ afterOn.length)
        .map { case (a, b) => afterOn.substring(a, b).trim }
      val cRe = ("(?is)^WHEN\\s+(NOT\\s+)?MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+" +
        "(UPDATE\\s+SET\\s+.+|DELETE\\s*|INSERT\\s+.+)$").r
      sealed trait Clause
      case class MatchedC(cond: Option[String], set: Option[String]) extends Clause
      case class NotMatchedC(cond: Option[String], insert: String) extends Clause
      val parsed: Seq[Clause] = clauseTexts.map { txt =>
        // split cond/action on the MASKED text so a literal containing
        // ' THEN ' can't cut the condition; offsets slice the raw text
        val m = cRe.findFirstMatchIn(maskStringLiterals(txt)).getOrElse(throw unsupported)
        val cond = Option(m.group(2)).map(_ => txt.substring(m.start(2), m.end(2)).trim)
        val action = txt.substring(m.start(3), m.end(3)).trim
        if (m.group(1) == null) { // WHEN MATCHED
          if (action.toUpperCase.startsWith("UPDATE"))
            MatchedC(cond, Some("(?is)^UPDATE\\s+SET\\s+".r.replaceFirstIn(action, "").trim))
          else if (action.toUpperCase.startsWith("DELETE")) MatchedC(cond, None)
          else throw unsupported
        } else {
          if (!action.toUpperCase.startsWith("INSERT")) throw unsupported
          NotMatchedC(cond, "(?is)^INSERT\\s+".r.replaceFirstIn(action, "").trim)
        }
      }
      // resolve the source only after the statement parses — a garbled MERGE
      // must fail as a MERGE-form error, not a missing-table analysis error
      val source =
        if (srcText.startsWith("("))
          sqlWithSnapshotReads(srcText.stripPrefix("(").stripSuffix(")"))
        else spark.conf.getOption(s"graft.snapshot.$srcText") match {
          // a snapshot-bound table can be a MERGE source by plain name too;
          // reading it is a SELECT like any other — a user holding only
          // WRITE on the merge TARGET must not read arbitrary bound datasets
          // by naming them as the source (mirrors rewriteSnapshotTables)
          case Some(r) if scala.util.Try(spark.table(srcText)).isFailure =>
            asUser.foreach(u =>
              requirePrivilege(u, "SELECT", Nil, datasetPath(srcText)))
            new graft.sources.SnapshotTable(spark, r).read()
          case _ => spark.table(srcText)
        }
      val wholeRow = parsed == Seq(MatchedC(None, Some("*")), NotMatchedC(None, "*")) ||
        parsed == Seq(NotMatchedC(None, "*"), MatchedC(None, Some("*")))
      // merge-on-read mode (Iceberg write.merge.mode=merge-on-read): ONE
      // O(source) commit of updated copies + equality-delete keys + inserts
      // instead of a copy-on-write table rewrite
      val morMode = spark.conf
        .getOption(s"graft.snapshot.${hm.group(1)}.merge_mode").contains("mor")
      if (wholeRow && !morMode) st.merge(source, key)
      else {
        val matched = parsed.collect { case MatchedC(cond, set) =>
          val assigns = set.map { s0 =>
            // SET * in a clause mix = assign every source column by name
            if (s0 == "*") source.columns.filterNot(_ == key).toSeq
              .map(c => c -> expr(s"__src_$c")).toMap
            else topLevelSplit(s0).map { a =>
              val eq = a.indexOf('=')
              require(eq > 0, s"MERGE assignment not of form col = expr: $a")
              rewriteRefs(a.substring(0, eq).trim) -> expr(rewriteRefs(a.substring(eq + 1).trim))
            }.toMap
          }
          (cond.map(c => expr(rewriteRefs(c))), assigns)
        }
        val notMatched = parsed.collect { case NotMatchedC(cond, ins) =>
          val values: Option[Map[String, Column]] =
            if (ins == "*") None
            else {
              val im = ("(?is)^\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*$").r
                .findFirstMatchIn(ins).getOrElse(throw unsupported)
              val cols = im.group(1).split(",").map(c => rewriteRefs(c.trim)).toSeq
              val vals = topLevelSplit(im.group(2))
              require(cols.length == vals.length,
                s"INSERT (${cols.length} columns) VALUES (${vals.length} expressions)")
              Some(cols.zip(vals.map(v => expr(rewriteRefs(v)))).toMap)
            }
          (cond.map(c => expr(rewriteRefs(c))), values)
        }
        if (morMode) st.mergeIntoMor(source, key, matched, notMatched)
        else st.mergeInto(source, key, matched, notMatched)
      }
      None
    } else if (upper.startsWith("ROLLBACK TABLE ")) {
      // Dremio's ROLLBACK TABLE t TO SNAPSHOT 'v': table head moves to the
      // old content as a NEW snapshot; history is preserved.
      val m = "(?is)ROLLBACK\\s+TABLE\\s+([\\w.]+)\\s+TO\\s+SNAPSHOT\\s+'([^']+)'".r
        .findFirstMatchIn(stmt).getOrElse(throw new IllegalArgumentException(
          "expected: ROLLBACK TABLE t TO SNAPSHOT 'v'"))
      snapshotStore(m.group(1), "ALTER").rollback(m.group(2).trim.toLong)
      None
    } else if (upper.startsWith("VACUUM TABLE ")) {
      // Dremio's snapshot-pruning maintenance SQL (readme.md:398 "metadata
      // pruning — cleaning up snapshots and manifests"; public Dremio/Iceberg
      // VACUUM syntax):
      //   VACUUM TABLE t EXPIRE SNAPSHOTS RETAIN_LAST n
      //   VACUUM TABLE t EXPIRE SNAPSHOTS OLDER_THAN 'yyyy-mm-dd hh:mm:ss'
      //   VACUUM TABLE t REMOVE ORPHAN FILES [OLDER_THAN 'ts']
      // Retention guarantees (live-ref pins, mor bases, alias targets) are
      // SnapshotTable.expireSnapshots' — VACUUM can never orphan a readable
      // snapshot's files; REMOVE ORPHAN FILES is the crashed-writer
      // cleanup (Iceberg's remove_orphan_files), age-guarded and never
      // touching logged or marker-protected versions.
      val om = ("(?is)VACUUM\\s+TABLE\\s+([\\w.]+)\\s+REMOVE\\s+ORPHAN\\s+FILES" +
        "(?:\\s+OLDER_THAN\\s+'([^']+)')?").r.findFirstMatchIn(stmt)
      om match {
        case Some(o) =>
          val st = snapshotStore(o.group(1), "ALTER")
          // Iceberg's remove_orphan_files min-age check: a cutoff inside the
          // slow-writer window is refused unless the session explicitly
          // disables the check (the same escape hatch Iceberg's Spark
          // procedure offers via a conf)
          val minAgeCheck = spark.conf
            .get("graft.snapshot.orphan.minAgeCheck", "true").toBoolean
          Option(o.group(2)) match {
            case Some(ts) => st.removeOrphans(math.max(0L,
              System.currentTimeMillis() -
                java.sql.Timestamp.valueOf(ts.trim).getTime),
              force = !minAgeCheck)
            case None => st.removeOrphans(force = !minAgeCheck)
          }
        case None =>
          val m = ("(?is)VACUUM\\s+TABLE\\s+([\\w.]+)\\s+EXPIRE\\s+SNAPSHOTS\\s+" +
            "(?:RETAIN_LAST\\s+(\\d+)|OLDER_THAN\\s+'([^']+)')").r
            .findFirstMatchIn(stmt).getOrElse(throw new IllegalArgumentException(
              "expected: VACUUM TABLE t EXPIRE SNAPSHOTS RETAIN_LAST n | " +
                "OLDER_THAN 'ts' | REMOVE ORPHAN FILES [OLDER_THAN 'ts']"))
          val st = snapshotStore(m.group(1), "ALTER")
          if (m.group(2) != null) {
            val n = m.group(2).toInt
            require(n >= 1, s"RETAIN_LAST $n: must retain at least 1 snapshot")
            st.expireSnapshots(n)
          } else st.expireSnapshotsOlderThan(
            java.sql.Timestamp.valueOf(m.group(3).trim).getTime)
      }
      None
    } else if ("(?is)^ALTER\\s+TABLE\\s+[\\w.]+\\s+((ADD|DROP|RENAME)\\s+COLUMN|ALTER\\s+COLUMN)\\b".r
        .findFirstIn(masked.trim).isDefined && {
        "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)".r.findFirstMatchIn(stmt.trim)
          .exists(n => spark.conf.getOption(s"graft.snapshot.${n.group(1)}").isDefined)
      }) {
      // Schema-evolution DDL on a snapshot-bound table (the Iceberg ALTER
      // TABLE surface — BASELINE's "reads, writes, schema evolution, and
      // time-travel" north star): METADATA-ONLY commits, no data rewritten
      // at any table size; versions before the change keep their original
      // schema (time travel returns what the table looked like).
      //   ALTER TABLE t ADD COLUMN c type
      //   ALTER TABLE t DROP COLUMN c
      //   ALTER TABLE t RENAME COLUMN a TO b
      //   ALTER TABLE t ALTER COLUMN c TYPE type   -- widening only
      // Column names may be DOTTED paths into struct columns (Iceberg's
      // nested evolution, r19 adds + r20 rename/drop/widen): `nest.b`
      // routes to the nested evolve ops.
      // Unbound tables fall through to Spark's own ALTER TABLE.
      val body = stmt.trim.stripSuffix(";")
      val pAdd = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+ADD\\s+COLUMN\\s+([\\w.]+)\\s+(.+)$".r
      val pDrop = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+DROP\\s+COLUMN\\s+([\\w.]+)\\s*$".r
      val pRen = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+RENAME\\s+COLUMN\\s+([\\w.]+)\\s+TO\\s+(\\w+)\\s*$".r
      val pWiden = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+ALTER\\s+COLUMN\\s+([\\w.]+)\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+(.+)$".r
      def split(c: String): Option[(String, String)] = {
        val i = c.indexOf('.')
        if (i < 0) None else Some((c.substring(0, i), c.substring(i + 1)))
      }
      body match {
        case pAdd(t, c, ty) => split(c) match {
          case Some((p, rest)) =>
            snapshotStore(t, "ALTER").addNestedColumn(p, rest, ty.trim)
          case None => snapshotStore(t, "ALTER").addColumn(c, ty.trim)
        }
        case pDrop(t, c) => split(c) match {
          case Some((p, rest)) =>
            snapshotStore(t, "ALTER").dropNestedColumn(p, rest)
          case None => snapshotStore(t, "ALTER").dropColumn(c)
        }
        case pRen(t, a, b) => split(a) match {
          case Some((p, rest)) =>
            snapshotStore(t, "ALTER").renameNestedColumn(p, rest, b)
          case None => snapshotStore(t, "ALTER").renameColumn(a, b)
        }
        case pWiden(t, c, ty) => split(c) match {
          case Some((p, rest)) =>
            snapshotStore(t, "ALTER").alterNestedColumnType(p, rest, ty.trim)
          case None => snapshotStore(t, "ALTER").alterColumnType(c, ty.trim)
        }
        case _ => throw new IllegalArgumentException(
          "expected: ALTER TABLE t ADD COLUMN c type | DROP COLUMN c | " +
            "RENAME COLUMN a TO b | ALTER COLUMN c TYPE type " +
            "(column may be a dotted struct path)")
      }
      None
    } else if (("(?is)^ALTER\\s+TABLE\\s+[\\w.]+\\s+" +
        "(CREATE|REPLACE|DROP|FAST\\s+FORWARD)\\s+(BRANCH|TAG)\\b").r
        .findFirstIn(masked.trim).isDefined) {
      // Branch/tag DDL on a snapshot-bound table, in Apache Iceberg's Spark
      // SQL extension syntax (public: iceberg branching DDL):
      //   ALTER TABLE t CREATE BRANCH b [AS OF VERSION v]
      //   ALTER TABLE t CREATE TAG g   [AS OF VERSION v]
      //   ALTER TABLE t REPLACE BRANCH b AS OF VERSION v
      //   ALTER TABLE t DROP BRANCH b | DROP TAG g
      //   ALTER TABLE t FAST FORWARD BRANCH b   -- publish (the
      //     fast_forward procedure, as a statement; write-audit-publish)
      val p = ("(?is)ALTER\\s+TABLE\\s+([\\w.]+)\\s+" +
        "(CREATE|REPLACE|DROP|FAST\\s+FORWARD)\\s+(BRANCH|TAG)\\s+(\\w+)" +
        "(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?").r
      val m = p.findFirstMatchIn(stmt).getOrElse(
        throw new IllegalArgumentException(
          "expected: ALTER TABLE t CREATE|REPLACE|DROP|FAST FORWARD " +
            "BRANCH|TAG name [AS OF VERSION v]"))
      val st = snapshotStore(m.group(1), "ALTER")
      val kind = m.group(3).toUpperCase
      val name = m.group(4)
      val at = Option(m.group(5)).map(_.toLong)
      m.group(2).toUpperCase.replaceAll("\\s+", " ") match {
        case "CREATE" if kind == "BRANCH" =>
          // Iceberg semantics: CREATE errors on an existing branch, REPLACE
          // errors on a missing one — a typo'd CREATE must never silently
          // re-point a branch holding staged-but-unpublished commits
          require(st.branchHead(name).isEmpty,
            s"branch $name already exists; use REPLACE BRANCH to re-point it")
          st.createBranch(name, at)
        case "REPLACE" if kind == "BRANCH" =>
          require(st.branchHead(name).isDefined,
            s"no branch $name to replace")
          st.createBranch(name, at)
        case "CREATE" => st.createTag(name, at)
        case "REPLACE" => throw new IllegalArgumentException(
          s"REPLACE TAG $name: tags never move; DROP it first")
        case "DROP"         => st.dropRef(name, Some(kind.toLowerCase))
        case "FAST FORWARD" =>
          require(kind == "BRANCH", "FAST FORWARD takes a BRANCH")
          st.fastForward(name)
      }
      None
    } else if ("(?is)^ALTER\\s+TABLE\\s+[\\w.]+\\s+WRITE\\s+(ORDERED\\s+BY|UNORDERED)\\b".r
        .findFirstIn(masked.trim).isDefined && {
        "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)".r.findFirstMatchIn(stmt.trim)
          .exists(n => spark.conf.getOption(s"graft.snapshot.${n.group(1)}").isDefined)
      }) {
      // Write sort-order DDL on a SNAPSHOT-BOUND table (Apache Iceberg's
      // public Spark SQL extension syntax; unbound tables fall through to
      // Spark, where a real Iceberg catalog handles the same statement):
      //   ALTER TABLE t WRITE ORDERED BY c1, c2 [INTO n FILES]
      //   ALTER TABLE t WRITE ORDERED BY zorder(c1, c2) [INTO n FILES]
      //   ALTER TABLE t WRITE UNORDERED
      // The order persists like the partition spec: every later data
      // commit, compaction, and autonomous maintenance tick re-clusters on
      // it (INTO n FILES pins the range-partition count — deterministic
      // small-table layouts; omit it at scale and the shuffle-partition
      // count decides).
      val body = stmt.trim.stripSuffix(";")
      val pu = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+WRITE\\s+UNORDERED\\s*$".r
      val po = ("(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+WRITE\\s+ORDERED\\s+BY\\s+" +
        "(.+?)(?:\\s+INTO\\s+(\\d+)\\s+FILES)?\\s*$").r
      body match {
        case pu(t) => snapshotStore(t, "ALTER").clearSortOrder()
        case po(t, colsRaw, files) =>
          var cols = colsRaw.trim
          // strip ONE pair of outer parens — only when they actually match
          // ("(a), (b)" must not lose its first and last paren)
          if (cols.startsWith("(") && cols.endsWith(")") && {
            var depth = 0; var matched = true
            cols.zipWithIndex.foreach { case (c, i) =>
              if (c == '(') depth += 1
              else if (c == ')') { depth -= 1
                if (depth == 0 && i < cols.length - 1) matched = false }
            }
            matched && depth == 0
          }) cols = cols.substring(1, cols.length - 1)
          // each entry is a bare column (an explicit ASC is fine) or ONE
          // zorder(cols) — direction/null modifiers are rejected rather
          // than silently persisted as a never-matching "column" that
          // would disable clustering with no error anywhere
          val entries = topLevelSplit(cols).map { e =>
            val asc = "(?is)^(\\w+)(?:\\s+ASC)?$".r
            e match {
              case asc(c) => c
              case z if "(?is)^zorder\\(.*\\)$".r.findFirstIn(z).isDefined => z
              case other => throw new IllegalArgumentException(
                s"WRITE ORDERED BY entry '$other': only ascending plain " +
                  "columns or one zorder(c1, c2, ...) entry are supported " +
                  "(DESC / NULLS FIRST|LAST orderings are not)")
            }
          }
          require(entries.nonEmpty, "WRITE ORDERED BY needs at least one column")
          val n = Option(files).map(_.toLongOption.getOrElse(Long.MaxValue))
            .getOrElse(0L)
          require(n >= 0 && n <= 100000,
            s"INTO $n FILES: pinned file counts above 100000 would plan a " +
              "degenerate range shuffle; omit the clause to let the " +
              "shuffle-partition count decide")
          val st = snapshotStore(t, "ALTER")
          // a typo'd column would persist an order that silently never
          // applies — validate every named column against the live schema
          // (an EMPTY store has no schema yet; declaring ahead of the first
          // commit is legitimate and validates on write instead)
          if (st.currentVersion.isDefined) {
            val have = st.read().columns.map(_.toLowerCase).toSet
            val named = entries.flatMap(e =>
              "(?is)^zorder\\((.*)\\)$".r.findFirstMatchIn(e)
                .map(_.group(1).split(',').map(_.trim).toSeq).getOrElse(Seq(e)))
            named.find(c => !have(c.toLowerCase)).foreach(c =>
              throw new IllegalArgumentException(
                s"WRITE ORDERED BY $c: no such column in $t"))
          }
          st.setSortOrder(entries, n.toInt)
        case _ => throw new IllegalArgumentException(
          "expected: ALTER TABLE t WRITE ORDERED BY cols | zorder(cols) " +
            "[INTO n FILES] | WRITE UNORDERED")
      }
      None
    } else if (upper.startsWith("DELETE FROM ") && !hasTopLevelWhere) {
      // repeatable-run truncate (logistics_AI.sql:60). A SNAPSHOT-BOUND
      // table truncates as an empty overwrite snapshot (history preserved;
      // the catalog drop+recreate below would miss — or desync — the
      // snapshot store); `AT BRANCH b` truncates the branch's head only.
      // Catalog tables: Spark's FileTable doesn't advertise the v2 TRUNCATE
      // capability, so truncate = drop + recreate with the saved schema —
      // same observable state for the script's managed tables.
      val tm = "(?is)DELETE\\s+FROM\\s+([\\w.]+)(?:\\s+AT\\s+BRANCH\\s+(\\w+))?".r
        .findFirstMatchIn(masked).get
      val table = stmt.substring(tm.start(1), tm.end(1))
      if (spark.conf.getOption(s"graft.snapshot.$table").isDefined) {
        val st = snapshotStore(table, "DELETE")
        Option(tm.group(2)).map(_ => stmt.substring(tm.start(2), tm.end(2))) match {
          case Some(b) => st.commitToBranch(b, st.readBranch(b).limit(0), "overwrite")
          case None    => st.deleteWhere(lit(true))
        }
      } else {
        asUser.foreach(u =>
          requirePrivilege(u, "DELETE", Seq("WRITE"), datasetPath(table)))
        val schema = spark.table(table).schema
        spark.sql(s"DROP TABLE $table")
        spark.sql(s"CREATE TABLE $table (${schema.toDDL}) USING parquet")
      }
      None
    } else {
      stmtViews.clear()
      // graft_* rewrite views are internal: a direct reference in user SQL
      // would read a snapshot bound under an earlier statement's (possibly
      // higher) privilege, bypassing the dataset check — deny it outright.
      asUser.foreach { u =>
        if ("(?i)\\bgraft_(?:tt|files|meta|snap)_\\d+\\b".r.findFirstIn(stmt).isDefined)
          throw new Catalog.AccessDeniedException(
            s"user $u may not reference internal graft_* rewrite views directly")
      }
      val rewritten = rewriteSnapshotTables(
        rewriteMetadataTables(rewriteListFiles(rewriteTimeTravel(stmt))))
      asUser.foreach(u => enforce(u, upper, rewritten))
      // Dataset construction analyzes eagerly (temp views inline into the
      // plan), so the statement's rewrite views can be dropped immediately —
      // the returned DataFrame stays valid for later actions.
      val df = spark.sql(rewritten)
      stmtViews.foreach(spark.catalog.dropTempView)
      stmtViews.clear()
      if (upper.startsWith("SELECT") || upper.startsWith("WITH")) {
        // Feed the scripted surface into the autonomous workload monitor
        // (when one is attached): aggregate shapes become reflection
        // candidates and equi-joins become skew-diagnosis candidates, the
        // same as API-path queries — the reference's monitor watches every
        // query, not just a favored entry point (readme.md:381-389). A
        // driver-side plan walk; no data is touched. COST (ADVICE r9):
        // observe() forces full optimization of every scripted SELECT at
        // script-run time (it walks queryExecution.optimizedPlan), roughly
        // doubling driver planning work on this path even when the result
        // is never consumed — accepted by design: scripted statements are
        // few and driver-side, and observing at run time (not first action)
        // is what lets a script's LAST statement benefit from shapes its
        // EARLIER statements established. Run scripts with advisor = None
        // to opt out.
        advisor.foreach(_.observe(df))
        Some(df)
      } else None
    }
  }

  /** RBAC enforcement for `asUser` mode (reference permissions.sql:1-11):
    * SELECTs need SELECT on every referenced dataset (folder grants cover
    * their subtree; PROJECT covers everything); writes need their DML
    * privilege or the folder-level WRITE. Views declared by this script are
    * checked by their original dotted path. */
  private def enforce(user: String, upper: String, sql: String): Unit = {
    def target(pattern: String): Option[Seq[String]] =
      pattern.r.findFirstMatchIn(sql).map(m => datasetPath(m.group(1)))
    if (upper.startsWith("SELECT") || upper.startsWith("WITH")) {
      // Only THIS statement's rewrite artifacts are exempt: time travel
      // checks SELECT on the ORIGINAL dataset name inside rewriteTimeTravel,
      // and LIST_FILES targets sources (no dataset path to check). Any other
      // graft_* reference was already denied pre-rewrite in execute().
      referencedRelations(sql)
        .map(ds => if (ds.length == 1) datasetPath(ds.head) else ds)
        .filterNot(ds => ds.length == 1 && stmtViews.contains(ds.head))
        .foreach(ds => requirePrivilege(user, "SELECT", Nil, ds))
    } else if (upper.startsWith("INSERT"))
      target("(?is)INSERT\\s+INTO\\s+([\\w.]+)")
        .foreach(requirePrivilege(user, "INSERT", Seq("WRITE"), _))
    else if (upper.startsWith("DROP TABLE"))
      target("(?is)DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?([\\w.]+)")
        .foreach(requirePrivilege(user, "DROP", Nil, _))
    else if (upper.startsWith("CREATE TABLE"))
      target("(?is)CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)")
        .foreach(requirePrivilege(user, "CREATE TABLE", Seq("WRITE"), _))
  }

  private def requirePrivilege(user: String, priv: String,
                               alternatives: Seq[String], ds: Seq[String]): Unit =
    if (!(Catalog.authorized(user, priv, ds) ||
        alternatives.exists(Catalog.authorized(user, _, ds))))
      throw new Catalog.AccessDeniedException(
        s"user $user lacks $priv on ${ds.mkString(".")}")

  /** A name as written in SQL → the dataset path grants refer to (flattened
    * script views map back to their dotted declaration). */
  private def datasetPath(name: String): Seq[String] =
    viewPathsByFlat.getOrElse(name, name.split("\\.").toSeq)

  /** Dataset names a statement reads, from the PARSED (unresolved) plan —
    * CTE-local names are excluded. */
  private def referencedRelations(sql: String): Seq[Seq[String]] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val cteNames = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    plan.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier
    }.distinct.filterNot(ds =>
      ds.length == 1 && cteNames.contains(ds.head.toLowerCase))
  }

  /** `ALTER DATASET d CREATE [RAW|AGGREGATE] REFLECTION r USING …` — the
    * reference's acceleration DDL (readme.md:322-326). RAW materializes the
    * dataset (optionally a `DISPLAY (…)` column subset); AGGREGATE
    * materializes a groupBy over `DIMENSIONS (…)` with the declared
    * `MEASURES (…)` (per-measure fn list; SUM+COUNT when unspecified,
    * Dremio's default measure set). Registered + refreshed eagerly, and the
    * substitution rule is installed so later SELECTs over the dataset are
    * served from the materialization without the query changing. */
  private def createReflection(stmt: String): Unit = {
    import org.apache.spark.sql.functions._
    val ddl = ("(?is)ALTER\\s+DATASET\\s+([\\w.]+)\\s+CREATE\\s+" +
      "(?:(RAW|AGGREGATE|AGGREGATION)\\s+)?REFLECTION\\s+(\\w+)\\s+USING\\s+(.*)").r
    stmt.trim.stripSuffix(";") match {
      case ddl(ds, kindOrNull, rname, usingRaw) =>
        val using = usingRaw.trim
        val kind = Option(kindOrNull).map(_.toUpperCase).getOrElse(
          if (using.toUpperCase.startsWith("RAW")) "RAW" else "AGGREGATE")
        def section(name: String): Seq[String] =
          ("(?is)" + name + "\\s*\\(([^)]*)\\)").r.findFirstMatchIn(using)
            .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)
        val define: () => DataFrame = kind match {
          case "RAW" =>
            val display = section("DISPLAY")
            () => {
              val t = spark.table(ds)
              if (display.isEmpty) t else t.select(display.map(col): _*)
            }
          case _ =>
            val dims = section("DIMENSIONS")
            require(dims.nonEmpty,
              s"AGGREGATE REFLECTION $rname needs DIMENSIONS (…)")
            val measuresClause = "(?is)MEASURES\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
              .findFirstMatchIn(using).map(_.group(1)).getOrElse("")
            val measures = "(\\w+)\\s*(?:\\(([^)]*)\\))?".r
              .findAllMatchIn(measuresClause)
              .map(m => m.group(1) -> Option(m.group(2))
                .map(_.split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSeq)
                .getOrElse(Seq("SUM", "COUNT")))
              .toSeq
            () => {
              val aggs = measures.flatMap { case (c, fns) => fns.map {
                case "SUM"   => sum(col(c)).as(s"sum_$c")
                case "COUNT" => count(col(c)).as(s"count_$c")
                case "MIN"   => min(col(c)).as(s"min_$c")
                case "MAX"   => max(col(c)).as(s"max_$c")
                case "AVG" | "MEAN" => avg(col(c)).as(s"avg_$c")
                case "APPROX_COUNT_DISTINCT" =>
                  approx_count_distinct(col(c)).as(s"acd_$c")
                case other =>
                  throw new IllegalArgumentException(s"measure function $other")
              }}
              spark.table(ds).groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
            }
        }
        reflections.register(rname, define)
        reflections.refresh(rname)
        hasReflections = true
        installSubstitution()
      case other =>
        throw new IllegalArgumentException(s"cannot parse reflection DDL: $other")
    }
  }

  private def installSubstitution(): Unit =
    graft.plans.ExtraOptimizations.mutate(spark) { existing =>
      val present = existing.exists {
        case graft.plans.MaterializationSubstitution(m) => m eq reflections
        case _ => false
      }
      if (present) existing
      else existing :+ graft.plans.MaterializationSubstitution(reflections)
    }

  /** `TABLE(LIST_FILES('@source/prefix'))` (ai_generate.sql:19-21,
    * logistics_AI.sql:349) → a temp view of one `file` struct per object —
    * `file['path']` / `file['size']` / `file['mtime']` as Dremio exposes.
    * `@name` roots resolve via `graft.source.<name>` session conf (point it
    * at any directory/bucket mount); unconfigured sources bind to an empty
    * staging dir so pipelines run with a no-files-yet source rather than
    * failing on a foreign bucket. Content bytes deliberately stay OUT of
    * the handle (metadata listing never reads payloads; a consumer fetches
    * by path). */
  private def rewriteListFiles(stmt: String): String = {
    val p = "(?is)TABLE\\s*\\(\\s*LIST_FILES\\s*\\(\\s*'([^']+)'\\s*\\)\\s*\\)".r
    p.replaceAllIn(stmt, m => {
      val ref = m.group(1)
      val (source, prefix) = ref.stripPrefix("@").split("/", 2) match {
        case Array(s, rest) => (s, rest)
        case Array(s) => (s, "")
      }
      val root = spark.conf.getOption(s"graft.source.$source").getOrElse {
        val dir = graft.TempDirs.newDir(s"graft_src_$source")
        spark.conf.set(s"graft.source.$source", dir)
        dir
      }
      val dir = new java.io.File(root, prefix)
      java.nio.file.Files.createDirectories(dir.toPath)
      val listing = graft.sources.Ingest.listFileMeta(spark, dir.getAbsolutePath)
        .select(org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("path"),
          org.apache.spark.sql.functions.col("length").as("size"),
          org.apache.spark.sql.functions.col("modificationTime").as("mtime"))
          .as("file"))
      metaViewCount += 1
      val v = s"graft_files_$metaViewCount"
      listing.createOrReplaceTempView(v)
      stmtViews += v
      java.util.regex.Matcher.quoteReplacement(v)
    })
  }

  /** Resolve a row-level-DML target to its bound snapshot store (the same
    * `graft.snapshot.<name>` binding the time-travel clauses use), checking
    * the write privilege in `asUser` mode. Row-level DML targets
    * snapshot-bound tables only — catalog parquet tables keep the truncate
    * form (Spark's FileTable has no v2 row-delete capability). */
  private def snapshotStore(name: String, priv: String): graft.sources.SnapshotTable = {
    val root = spark.conf.getOption(s"graft.snapshot.$name").getOrElse(
      throw new IllegalArgumentException(
        s"$priv on $name: no snapshot store bound (set spark conf " +
          s"graft.snapshot.$name); row-level DML targets snapshot-bound tables"))
    asUser.foreach(u => requirePrivilege(u, priv, Seq("WRITE"), datasetPath(name)))
    new graft.sources.SnapshotTable(spark, root)
  }

  /** Split a SET list on top-level commas (quote- and paren-aware, with
    * backslash-escaped quotes skipped), so an assignment expression may
    * itself contain calls, commas, and quoted strings. */
  private def topLevelSplit(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0; var inS = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c @ '\\' if inS && i + 1 < s.length =>
          sb += c; sb += s.charAt(i + 1); i += 1
        case c @ '\'' => inS = !inS; sb += c
        case c @ '(' if !inS => depth += 1; sb += c
        case c @ ')' if !inS => depth -= 1; sb += c
        case ',' if !inS && depth == 0 =>
          if (sb.toString.trim.nonEmpty) out += sb.toString.trim
          sb.clear()
        case c => sb += c
      }
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  /** `t AT SNAPSHOT 'v'` / `t AT TIMESTAMP 'ts'` / `t AT BRANCH b` — Dremio's
    * time-travel clauses over Iceberg history (readme.md:366-370 "perform
    * time travel queries"). A table opts in by binding its versioned store
    * root via the session conf `graft.snapshot.<name>` (the same pattern as
    * `graft.source.<name>` for LIST_FILES roots); the clause pins the
    * requested snapshot and binds it as a temp view in place:
    *
    *  - `AT SNAPSHOT 'N'`   → version N exactly ([[SnapshotTable.read]])
    *  - `AT TIMESTAMP 'ts'` → latest version committed at or before ts
    *    (epoch millis, or a `yyyy-MM-dd HH:mm:ss[.f…]` literal)
    *  - `AT BRANCH b`       → the branch's head ([[SnapshotTable.readBranch]];
    *    `main` is the implicit trunk); an unknown branch errors rather than
    *    silently serving `main`'s data.
    *  - `AT TAG t`          → the tag's pinned version ([[SnapshotTable.readTag]]).
    *
    * In `asUser` mode the SELECT privilege is checked against the ORIGINAL
    * dataset name here (the rewritten temp view is skipped by `enforce`). */
  private def rewriteTimeTravel(stmt: String): String = {
    val p = ("(?is)\\b([\\w.]+)\\s+AT\\s+(SNAPSHOT|TIMESTAMP|BRANCH|TAG)" +
      "\\s+(?:'([^']*)'|(\\w+))").r
    // Match against a literal-masked copy so a string like
    // 'logged at timestamp ''5''' is never mistaken for a clause; masking is
    // length-preserving, so match offsets index straight into the original.
    val ms = p.findAllMatchIn(maskStringLiterals(stmt)).toList
    if (ms.isEmpty) return stmt
    val sb = new StringBuilder
    var last = 0
    ms.foreach { m =>
      sb.append(stmt.substring(last, m.start))
      val name = stmt.substring(m.start(1), m.end(1))
      val kind = stmt.substring(m.start(2), m.end(2)).toUpperCase
      val arg =
        if (m.start(3) >= 0) stmt.substring(m.start(3), m.end(3))
        else stmt.substring(m.start(4), m.end(4))
      val root = spark.conf.getOption(s"graft.snapshot.$name").getOrElse(
        throw new IllegalArgumentException(
          s"$name AT $kind: no snapshot store bound " +
            s"(set spark conf graft.snapshot.$name to the store root)"))
      asUser.foreach(u => requirePrivilege(u, "SELECT", Nil, datasetPath(name)))
      val st = new graft.sources.SnapshotTable(spark, root)
      val df = kind match {
        case "SNAPSHOT" => st.read(versionAsOf = Some(arg.trim.toLong))
        case "TIMESTAMP" =>
          val msEpoch =
            if (arg.trim.forall(_.isDigit)) arg.trim.toLong
            else java.sql.Timestamp.valueOf(arg.trim).getTime
          st.readAsOfTimestamp(msEpoch)
        case "TAG" => st.readTag(arg.trim)
        case _ =>
          // `main` is the implicit trunk; any other name must be a real
          // branch ref — an unknown branch errors rather than silently
          // serving main's data.
          if (arg.trim.equalsIgnoreCase("main")) st.read()
          else if (st.branchHead(arg.trim).isDefined) st.readBranch(arg.trim)
          else throw new IllegalArgumentException(
            s"$name AT BRANCH ${arg.trim}: no such branch")
      }
      metaViewCount += 1
      val v = s"graft_tt_$metaViewCount"
      df.createOrReplaceTempView(v)
      stmtViews += v
      sb.append(v)
      last = m.end
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** Bind every referenced SNAPSHOT-BOUND table (`graft.snapshot.<name>`
    * session conf) that doesn't already resolve as a relation, as a
    * statement-scoped temp view of the store's CURRENT content — so a PLAIN
    * `SELECT … FROM t WHERE ts >= …` works without an AT clause, and
    * PRUNES: the bound frame plans over
    * [[graft.sources.ManifestFileIndex]], so the statement's own WHERE
    * conjuncts skip data files at physical-planning time. This is the
    * reference's central performance promise — a day query over a
    * partitioned table reads one partition NO MATTER WHO ASKS
    * (clinicdata.sql:38-39, finance_example.sql:14) — previously available
    * only to callers of the explicit `readWhere` API. Names already served
    * by a real table/temp view are left alone (callers may bind their own
    * frames); in `asUser` mode the SELECT privilege is checked against the
    * original dataset name, like the time-travel rewrite. */
  private def rewriteSnapshotTables(stmt: String): String = {
    val refs = scala.util.Try(referencedRelations(stmt)).getOrElse(Nil)
    refs.foldLeft(stmt) { (sql, parts) =>
      val dotted = parts.mkString(".")
      val bound = spark.conf.getOption(s"graft.snapshot.$dotted")
      if (bound.isEmpty || scala.util.Try(spark.table(dotted)).isSuccess) sql
      else {
        asUser.foreach(u => requirePrivilege(u, "SELECT", Nil, datasetPath(dotted)))
        val st = new graft.sources.SnapshotTable(spark, bound.get)
        if (!dotted.contains(".")) {
          // single-part names bind as a temp view UNDER THE NAME ITSELF (it
          // resolves to nothing, or we wouldn't be here): no textual rewrite
          // at all, so qualified column refs (`SELECT t.col FROM t`) keep
          // resolving — a rename-style rewrite would fix the FROM but leave
          // the qualifier dangling
          st.read().createOrReplaceTempView(dotted)
          stmtViews += dotted
          sql
        } else {
          metaViewCount += 1
          val v = s"graft_snap_$metaViewCount"
          st.read().createOrReplaceTempView(v)
          stmtViews += v
          mapOutsideLiterals(sql)(_.replaceAll(
            "(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(dotted) + "(?![\\w.])",
            java.util.regex.Matcher.quoteReplacement(v)))
        }
      }
    }
  }

  /** `spark.sql` with snapshot-bound tables auto-bound (and their
    * statement-scoped views dropped immediately — Dataset construction
    * analyzes eagerly, so the returned frame stays valid): the read side of
    * INSERT bodies and MERGE sources gets the same plain-name resolution
    * and manifest pruning as scripted SELECTs. */
  private def sqlWithSnapshotReads(q: String): DataFrame = {
    val before = stmtViews.toSet
    val df = spark.sql(rewriteSnapshotTables(q))
    (stmtViews -- before).foreach { v =>
      spark.catalog.dropTempView(v); stmtViews -= v
    }
    df
  }

  /** Apply `f` to every NON-LITERAL segment of `s`, leaving single-quoted
    * literal contents (and their backslash escapes) byte-identical — the
    * safe way to run textual rewrites over SQL fragments. */
  private def mapOutsideLiterals(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inS = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS) {
        out += c
        if (c == '\\' && i + 1 < s.length) { out += s.charAt(i + 1); i += 1 }
        else if (c == '\'') inS = false
      } else if (c == '\'') {
        out.append(f(seg.toString)); seg.clear()
        out += c; inS = true
      } else seg += c
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** Length-preserving mask of single-quoted literal CONTENTS (quote chars
    * stay, so statement structure is intact); `''` escapes toggle twice and
    * come out masked. Keeps position-based rewrites from firing on words
    * like AT/TIMESTAMP inside string data. */
  private def maskStringLiterals(s: String): String = {
    val sb = new StringBuilder(s)
    var inS = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS && c == '\\' && i + 1 < s.length) {
        // Spark's default literals support backslash escapes ('it\'s'): the
        // escaped char must not toggle quote state or survive the mask
        sb.setCharAt(i, '_'); sb.setCharAt(i + 1, '_'); i += 1
      } else if (c == '\'') inS = !inS
      else if (inS) sb.setCharAt(i, '_')
      i += 1
    }
    sb.toString
  }

  /** Bind `TABLE(table_snapshot('t'))` / `TABLE(table_history('t'))`
    * metadata scans (readme.md:357-369) as temp views in place. Also binds
    * `TABLE(table_changes('t', from, to [, 'key']))` — the CDC changelog
    * between two snapshots of a snapshot-bound table (the key defaults to
    * the table's declared `graft.snapshot.<t>.key`; 'k1,k2' keys on the
    * composite tuple; NO key anywhere → the keyless multiset changelog). */
  private def rewriteMetadataTables(stmt: String): String = {
    // from/to accept a VERSION NUMBER or a quoted REF NAME ('main', a
    // branch, a tag) — the "what would publishing this branch change?"
    // audit spelling: table_changes('t', 'main', 'staging') diffs the
    // staged branch against main BEFORE publish, pure resolution sugar
    // over the same changelog machinery.
    val pc = ("(?is)TABLE\\s*\\(\\s*table_changes\\s*\\(\\s*'([^']+)'\\s*," +
      "\\s*(?:(\\d+)|'([^']+)')\\s*,\\s*(?:(\\d+)|'([^']+)')\\s*" +
      "(?:,\\s*'([^']+)'\\s*)?\\)\\s*\\)").r
    val withChanges = pc.replaceAllIn(stmt, m => {
      val name = m.group(1)
      val root = spark.conf.getOption(s"graft.snapshot.$name").getOrElse(
        throw new IllegalArgumentException(s"table_changes('$name', …): no " +
          s"snapshot store bound (set spark conf graft.snapshot.$name)"))
      // the key may be COMPOSITE ('tenant,id') — changes() keys on the
      // tuple — or ABSENT entirely: with no key argument and no bound
      // default, the diff is the KEYLESS multiset changelog (insert/delete
      // with duplicate copies honored, no update pairing — the form for
      // tables without a unique key)
      val keyOpt = Option(m.group(6))
        .orElse(spark.conf.getOption(s"graft.snapshot.$name.key"))
      asUser.foreach(u => requirePrivilege(u, "SELECT", Nil, datasetPath(name)))
      val st = new graft.sources.SnapshotTable(spark, root)
      def refArg(num: Int, ref: Int): Long =
        if (m.group(num) != null) m.group(num).toLong
        else st.refVersion(m.group(ref).trim).getOrElse(
          throw new IllegalArgumentException(
            s"table_changes('$name', …): no ref '${m.group(ref).trim}'"))
      val df = keyOpt match {
        case Some(k) =>
          val keys = k.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          // a key was GIVEN but degenerate (',' / whitespace) — that is a
          // misconfiguration to surface with context, not a silent fall
          // back to the keyless form the caller didn't ask for
          require(keys.nonEmpty,
            s"table_changes('$name', …): key '$k' names no columns — pass " +
              "real column names, or omit the key (and unset " +
              s"graft.snapshot.$name.key) for the keyless changelog")
          st.changes(refArg(2, 3), refArg(4, 5), keys)
        case None => st.changes(refArg(2, 3), refArg(4, 5))
      }
      metaViewCount += 1
      val v = s"graft_meta_$metaViewCount"
      df.createOrReplaceTempView(v)
      stmtViews += v
      java.util.regex.Matcher.quoteReplacement(v)
    })
    val p = ("(?is)TABLE\\s*\\(\\s*(table_snapshot|table_history|table_files" +
      "|table_refs|table_partitions)\\s*\\(\\s*'([^']+)'\\s*\\)\\s*\\)").r
    p.replaceAllIn(withChanges, m => {
      // metadata still describes the dataset (partition keys, row counts,
      // branch names) — reading it requires the same SELECT the data needs
      asUser.foreach(u =>
        requirePrivilege(u, "SELECT", Nil, datasetPath(m.group(2))))
      val df = m.group(1).toLowerCase match {
        case "table_snapshot" =>
          graft.sources.MetadataFunctions.tableSnapshot(spark, m.group(2))
        case "table_files" =>
          graft.sources.MetadataFunctions.tableFiles(spark, m.group(2))
        case "table_refs" =>
          graft.sources.MetadataFunctions.tableRefs(spark, m.group(2))
        case "table_partitions" =>
          graft.sources.MetadataFunctions.tablePartitions(spark, m.group(2))
        case _ =>
          graft.sources.MetadataFunctions.tableHistory(spark, m.group(2))
      }
      metaViewCount += 1
      val v = s"graft_meta_$metaViewCount"
      df.createOrReplaceTempView(v)
      stmtViews += v
      java.util.regex.Matcher.quoteReplacement(v)
    })
  }

  /** Rewrite declared dotted VIEW names (`a.b.v` → `a_b_v`); table paths
    * pass through untouched — they resolve in the nested catalog. */
  private def rewriteViewPaths(stmt: String): String =
    viewRewrites.toSeq.sortBy(-_._1.length).foldLeft(stmt) { case (s, (dotted, flat)) =>
      s.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(dotted) + "\\b", flat)
    }
}
