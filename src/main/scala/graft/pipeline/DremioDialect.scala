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
}
