package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Catalog

/** Executes a Dremio-style SQL script statement-by-statement (the reference's
  * pipeline lifecycle, SURVEY.md §3.2: each industry .sql file is a sequence
  * of CREATE FOLDER / CREATE TABLE / INSERT / CREATE VIEW / SELECT run in
  * order), translating the dialect gaps:
  *
  *  - `CREATE FOLDER IF NOT EXISTS a.b.c` → session-catalog namespace
  *    `a_b_c`; every later reference to the folder path (`a.b.c.t`) is
  *    rewritten to `a_b_c.t` (longest prefix first). With an Iceberg catalog
  *    on the classpath the rewrite is unnecessary — nested namespaces pass
  *    through — so the mapping is confined to this runner.
  *  - `GRANT …` → recorded as governance metadata (Catalog.grant), not
  *    executed (Spark has no ACL store).
  *  - AI functions (`AI_CLASSIFY` etc.) are pre-registered as `ai_classify`
  *    and name-lowered.
  *  - Comments (`-- …`) are stripped; statements split on top-level `;`
  *    (quote-aware).
  *
  * Returns the result of every statement that produced rows (SELECTs), by
  * statement index.
  */
final class SqlScriptRunner(spark: SparkSession) {

  private val folderPrefixes = scala.collection.mutable.ArrayBuffer.empty[String]

  def run(script: String): Map[Int, DataFrame] = {
    graft.ai.AiFunctions.register(spark)
    statements(script).zipWithIndex.flatMap { case (stmt, i) =>
      execute(stmt).map(i -> _)
    }.toMap
  }

  /** Split on `;` outside single/double quotes; strip `--` comments. */
  private[pipeline] def statements(script: String): Seq[String] = {
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
    noComments.foreach {
      case c @ '\'' if !inD => inS = !inS; sb += c
      case c @ '"' if !inS => inD = !inD; sb += c
      case ';' if !inS && !inD =>
        if (sb.toString.trim.nonEmpty) out += sb.toString.trim
        sb.clear()
      case c => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  private def execute(raw: String): Option[DataFrame] = {
    val stmt = DremioDialect.rewriteAiGenerate(rewriteFolderPaths(raw))
    val upper = stmt.toUpperCase.replaceAll("\\s+", " ").trim
    if (upper.startsWith("CREATE FOLDER IF NOT EXISTS") || upper.startsWith("CREATE FOLDER")) {
      val path = stmt.trim.split("\\s+").last.stripSuffix(";")
      folderPrefixes += path
      folderPrefixes.sortBy(-_.length) // longest-prefix-first rewriting
      Catalog.createNamespace(spark, path.split("\\."))
      None
    } else if (upper.startsWith("GRANT ")) {
      Catalog.grant(stmt)
      None
    } else {
      val df = spark.sql(stmt)
      if (upper.startsWith("SELECT") || upper.startsWith("WITH")) Some(df) else None
    }
  }

  /** Rewrite declared folder paths (`a.b.c.t` → `a_b_c.t`). */
  private def rewriteFolderPaths(stmt: String): String =
    folderPrefixes.sortBy(-_.length).foldLeft(stmt) { (s, prefix) =>
      s.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(prefix) + "\\.",
        prefix.replace(".", "_") + ".")
    }
}
