package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dremio→Spark dialect shims (SURVEY.md §4.2.3) — the small function-surface
  * gaps when porting the reference's SQL to Spark semantics.
  */
object DremioDialect {

  /** Translate Dremio/Oracle-style datetime format tokens to Java time
    * patterns: YYYY→yyyy, DD→dd, HH24→HH, HH12→hh, MI→mm, SS→ss, "T"→'T'
    * (reference usage: semantic_example.sql:112-124 `YYYY/MM/DD HH24:MI:SS`).
    * Order matters: multi-char tokens first. */
  def translateFormat(dremio: String): String = {
    var s = dremio
    val repl = Seq(
      "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy", "YY" -> "yy",
      "DD" -> "dd", "MI" -> "mm", "SS" -> "ss", "FFF" -> "SSS")
    repl.foreach { case (a, b) => s = s.replace(a, b) }
    // Dremio double-quotes literal text; Java patterns single-quote it.
    s.replace("\"", "'")
  }

  /** TO_TIMESTAMP(s, dremioFmt, 1): lenient 3-arg form — returns NULL on
    * parse failure instead of raising (semantic_example.sql:113-121). */
  def toTimestampLenient(c: Column, dremioFmt: String): Column =
    try_to_timestamp(c, lit(translateFormat(dremioFmt)))

  /** The reference's mixed-format timestamp sniffing CASE
    * (semantic_example.sql:110-128): four formats distinguished by
    * REGEXP_LIKE anchors, with an epoch-seconds branch. Returns NULL for
    * unrecognized garbage (the raw layer keeps it; silver filters). */
  def toTimestampMulti(c: Column): Column =
    when(c.rlike("^[0-9]{4}/[0-9]{2}/[0-9]{2} "),
      try_to_timestamp(c, lit("yyyy/MM/dd HH:mm:ss")))
      .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}T"),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
      .when(c.rlike("^[0-9]{2}-[0-9]{2}-[0-9]{4} "),
        try_to_timestamp(c, lit("dd-MM-yyyy HH:mm")))
      .when(c.rlike("^[0-9]{9,10}$"), timestamp_seconds(c.cast("long")))
      .otherwise(lit(null).cast("timestamp"))

  /** Dremio DATEDIFF(end, start) → whole days, end-first, day granularity
    * on timestamps (clinicdata.sql:267 comment documents the order). */
  def datediffDays(end: Column, start: Column): Column =
    datediff(to_date(end), to_date(start))

  /** Rewrite every `AI_GENERATE(<prompt-expr> WITH SCHEMA ROW(f T, ...))`
    * (logistics_AI.sql:126-141, media_ai.sql:94-107 — a DIFFERENT ROW per
    * call site) into Spark SQL:
    * `from_json(ai_generate_json(<prompt-expr>, '<ddl>'), '<ddl>')`.
    * Quote- and paren-aware scan, so `||`-assembled prompts containing
    * parens/quotes pass through intact. 2-arg AI_GENERATE(prompt, file)
    * calls have no WITH SCHEMA clause and are left alone. */
  def rewriteAiGenerate(stmt: String): String = rewriteAiGenerateFrom(stmt, 0)

  private def rewriteAiGenerateFrom(stmt: String, from: Int): String = {
    val marker = "(?i)AI_GENERATE\\s*\\(".r
    marker.findFirstMatchIn(stmt.substring(from)).map(m => (m.start + from)) match {
      case None => stmt
      case Some(mStart) =>
        val open = stmt.indexOf('(', mStart)
        var i = open + 1
        var depth = 1
        var inS = false
        var withSchema = -1 // position of WITH SCHEMA at depth 1
        var rowOpen = -1; var rowClose = -1
        while (i < stmt.length && depth > 0) {
          val c = stmt.charAt(i)
          if (inS) { if (c == '\'') inS = false }
          else c match {
            case '\'' => inS = true
            case '(' =>
              depth += 1
              if (withSchema >= 0 && rowOpen < 0) rowOpen = i
            case ')' =>
              depth -= 1
              if (rowOpen >= 0 && rowClose < 0 && depth == 1) rowClose = i
            case 'W' | 'w' if depth == 1 && withSchema < 0 &&
                stmt.regionMatches(true, i, "WITH", 0, 4) &&
                "(?is)^WITH\\s+SCHEMA\\s+ROW\\s*\\(".r
                  .findPrefixOf(stmt.substring(i)).isDefined =>
              withSchema = i
            case _ =>
          }
          i += 1
        }
        if (depth != 0 || withSchema < 0 || rowOpen < 0 || rowClose < 0)
          // malformed or schema-less call: skip past it, try later sites
          return if (depth == 0) rewriteAiGenerateFrom(stmt, i) else stmt
        val close = i - 1
        val promptExpr = stmt.substring(open + 1, withSchema).trim
        val rowBody = stmt.substring(rowOpen + 1, rowClose)
        // split fields on commas OUTSIDE parens (DECIMAL(10,2) stays whole)
        val fields = scala.collection.mutable.ArrayBuffer.empty[String]
        var d2 = 0; var last = 0
        rowBody.zipWithIndex.foreach {
          case ('(', _) => d2 += 1
          case (')', _) => d2 -= 1
          case (',', j) if d2 == 0 => fields += rowBody.substring(last, j); last = j + 1
          case _ =>
        }
        fields += rowBody.substring(last)
        val ddl = fields.map(_.trim).filter(_.nonEmpty).map { f =>
          // "name TYPE" → Spark DDL; VARCHAR→STRING is the only gap
          f.replaceAll("(?i)\\bVARCHAR\\b", "STRING")
        }.mkString(", ").replace("'", "''")
        val rewritten = stmt.substring(0, mStart) +
          s"from_json(ai_generate_json($promptExpr, '$ddl'), '$ddl')" +
          stmt.substring(close + 1)
        rewriteAiGenerateFrom(rewritten, mStart) // handle further call sites
    }
  }
}
