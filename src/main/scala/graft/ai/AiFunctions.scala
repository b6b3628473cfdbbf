package graft.ai

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** The reference's AI SQL-function surface (SURVEY.md §2.10): AI_CLASSIFY,
  * AI_GENERATE (structured extraction), AI_COMPLETE — reference:
  * recipes.sql:18, logistics_AI.sql:126-239, media_ai.sql:94-177.
  *
  * Implemented as registered Scala UDFs over a pluggable backend. The default
  * backend is a deterministic heuristic stub so pipelines run offline and
  * reproducibly (the reference invokes a hosted LLM; capability parity here
  * means the call sites, types, and plumbing — prompt assembly, closed label
  * sets, struct-typed outputs, bracket field access — not model quality).
  * Swap in a real client by implementing LlmBackend.
  *
  * Scale note: each UDF is a scalar map-side function — no shuffle, no
  * driver round-trips; a real backend would batch per partition.
  */
trait LlmBackend extends Serializable {
  def complete(prompt: String): String
  def classify(prompt: String, labels: Seq[String]): String

  /** Structured generation — the WITH SCHEMA ROW(...) contract: return ONE
    * JSON object with exactly the requested fields. `fields` carries
    * (name, Spark SQL type) pairs from the caller's declared ROW schema, so
    * a backend can schema-condition its prompt (a hosted LLM would inline
    * the field list; the stub synthesizes per-type deterministic values). */
  def generateJson(prompt: String, fields: Seq[(String, String)]): String
}

/** Deterministic stub: keyword-overlap scoring for classify, template
  * summarization for complete. Same input → same output, always. */
object StubBackend extends LlmBackend {
  def classify(prompt: String, labels: Seq[String]): String = {
    if (labels == null || labels.isEmpty) return null
    val p = if (prompt == null) "" else prompt.toLowerCase
    val toks = p.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSet
    // Score = label-word overlap with the prompt; deterministic tie-break on
    // label order (mirrors "closed label set, always answers" semantics —
    // the reference's examples fall back to the last/'Unknown' label).
    val scored = labels.map { l =>
      val lw = l.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      l -> lw.count(w => toks.contains(w) || p.contains(w.toLowerCase))
    }
    val best = scored.maxBy(_._2)
    if (best._2 > 0) best._1 else labels.last
  }

  def complete(prompt: String): String = {
    if (prompt == null) return null
    val words = prompt.trim.split("\\s+")
    val head = words.take(12).mkString(" ")
    s"[completion] $head" + (if (words.length > 12) " …" else "")
  }

  /** Field-wise deterministic structured extraction. Name-aware heuristics
    * cover the reference's call-site vocabularies (logistics_AI.sql:135-140:
    * issue/category/delay/apology; media_ai.sql:94-107: headline/topic/
    * entities/sentiment); any other field falls back to a type-driven
    * deterministic value, so EVERY declared ROW schema yields a full row. */
  def generateJson(prompt: String, fields: Seq[(String, String)]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val p = if (prompt == null) "" else prompt.toLowerCase
    def jsonStr(s: String) = "\"" + esc(s) + "\""
    val negative = Seq("angry", "unacceptable", "terrible", "worst", "refund", "damage")
    val positive = Seq("smooth", "early", "all good", "nothing to report", "great")
    def value(name: String, typ: String): String = {
      val n = name.toLowerCase
      val t = typ.toLowerCase
      // booleans: negative-sentiment scan (requires_apology & friends)
      if (t.startsWith("boolean")) String.valueOf(negative.exists(p.contains))
      // integral: first integer literal in the text, else 0
      else if (t.startsWith("int") || t.startsWith("bigint") || t.startsWith("smallint"))
        "\\d+".r.findFirstIn(p).getOrElse("0")
      // fractional: sentiment score in [0,1] from marker balance
      else if (t.startsWith("double") || t.startsWith("float") || t.startsWith("decimal")) {
        val neg = negative.count(p.contains); val pos = positive.count(p.contains)
        val score = 0.5 + 0.5 * (pos - neg).toDouble / math.max(1, pos + neg)
        // Locale.ROOT: a comma-decimal default locale would emit "0,50",
        // which is malformed JSON and nulls out every from_json struct
        String.format(java.util.Locale.ROOT, "%.2f",
          java.lang.Double.valueOf(score))
      } else if (n.contains("issue") || n.contains("category")) jsonStr {
        if (p.contains("traffic")) "Traffic"
        else if (p.contains("weather") || p.contains("snow")) "Weather"
        else if (p.contains("access") || p.contains("gate")) "Access"
        else if (p.contains("mechanical") || p.contains("engine")) "Mechanical"
        else if (negative.exists(p.contains)) "Customer"
        else "None"
      } else if (n.contains("topic")) jsonStr {
        val topics = Seq("film" -> "Film", "tech" -> "Tech", "crime" -> "Crime",
          "music" -> "Music", "politic" -> "Politics", "sport" -> "Sports")
        topics.collectFirst { case (k, v) if p.contains(k) => v }.getOrElse("Other")
      } else if (n.contains("entit")) jsonStr {
        // capitalized tokens from the ORIGINAL prompt, first-seen order
        val caps = "\\b[A-Z][a-z]+\\b".r.findAllIn(Option(prompt).getOrElse(""))
          .toSeq.distinct.take(5)
        caps.mkString(", ")
      } else if (n.contains("severity")) jsonStr {
        if (p.contains("very") || p.contains("extremely") || p.contains("!")) "high"
        else if (p.contains("somewhat") || p.contains("minor")) "low"
        else "medium"
      } else jsonStr(Option(StubBackend.complete(prompt)).getOrElse(""))
    }
    fields.map { case (name, typ) => jsonStr(name) + ":" + value(name, typ) }
      .mkString("{", ",", "}")
  }
}

/** AI_GENERATE's structured output for the logistics exemplar
  * (logistics_AI.sql:135-140): a typed ROW the caller reads with
  * bracket/dot access. */
case class ExtractedIssue(
    primary_issue: String,
    severity: String,
    requires_apology: Boolean,
    summary: String)

object AiFunctions {

  def backend: LlmBackend = StubBackend

  /** U2 generic — AI_GENERATE(prompt WITH SCHEMA ROW(...)) for an ARBITRARY
    * per-call-site schema (the reference declares a different ROW per view:
    * logistics_AI.sql:135-140, media_ai.sql:94-107): backend returns JSON
    * for the declared field list, `from_json` types it. Map-side only; the
    * JSON hop keeps the backend contract engine-agnostic (what a hosted LLM
    * structured-output API returns) while Catalyst owns the typing. */
  def aiGenerate(prompt: Column, schema: org.apache.spark.sql.types.StructType): Column = {
    val fields: Seq[(String, String)] =
      schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    val gen = udf((p: String) => backend.generateJson(p, fields))
    org.apache.spark.sql.functions.from_json(gen(prompt), schema)
  }

  /** SQL-surface building block for the dialect rewrite: per-row prompt with
    * a LITERAL DDL schema string. The DDL parse is cached per distinct
    * schema (call sites pass a constant), so rows pay one map lookup. */
  private val ddlCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private def fieldsOf(ddl: String): Seq[(String, String)] =
    ddlCache.computeIfAbsent(ddl, d =>
      org.apache.spark.sql.types.StructType.fromDDL(d)
        .fields.map(f => (f.name, f.dataType.sql)).toSeq)

  val aiGenerateJson = udf((prompt: String, ddl: String) =>
    backend.generateJson(prompt, fieldsOf(ddl)))

  /** U1 — AI_CLASSIFY(prompt, ARRAY[labels]) → one label from the closed set. */
  val aiClassify = udf((prompt: String, labels: Seq[String]) =>
    backend.classify(prompt, labels))

  /** U4 — AI_COMPLETE(prompt) → free-text VARCHAR. */
  val aiComplete = udf((prompt: String) => backend.complete(prompt))

  /** U2 — AI_GENERATE(prompt WITH SCHEMA ROW(...)) → typed struct. The stub
    * extracts deterministically: issue keyword scan, severity from intensity
    * markers, apology iff negative sentiment markers appear. */
  val aiGenerateIssue = udf { prompt: String =>
    if (prompt == null) null
    else {
      val p = prompt.toLowerCase
      val issue =
        if (p.contains("late") || p.contains("delay")) "late_delivery"
        else if (p.contains("damage") || p.contains("broken")) "damaged_goods"
        else if (p.contains("missing") || p.contains("lost")) "missing_item"
        else if (p.contains("cold") || p.contains("temperature")) "temperature_breach"
        else "other"
      val severity =
        if (p.contains("very") || p.contains("extremely") || p.contains("!")) "high"
        else if (p.contains("somewhat") || p.contains("minor")) "low"
        else "medium"
      val apology = Seq("angry", "unacceptable", "terrible", "worst", "refund")
        .exists(p.contains)
      ExtractedIssue(issue, severity, apology, StubBackend.complete(prompt))
    }
  }

  /** U3 — model-qualified multimodal AI_GENERATE((prompt, file) …): takes the
    * binary content alongside the prompt (ai_generate.sql:8-18). The stub
    * folds a content checksum into the output so the binary path is exercised. */
  val aiGenerateMultimodal = udf { (prompt: String, content: Array[Byte]) =>
    val size = if (content == null) 0 else content.length
    val h = graft.util.Hashing.fnv1a64(content)
    ExtractedIssue(
      primary_issue = if (size == 0) "empty_file" else "document",
      severity = if (size > 4096) "high" else "low",
      requires_apology = false,
      summary = s"[file ${java.lang.Long.toHexString(h)} ${size}B] " +
        StubBackend.complete(prompt))
  }

  /** SQL-surface registration so `spark.sql("SELECT ai_classify(...)")` works
    * like the reference's Dremio functions. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("ai_classify", aiClassify)
    spark.udf.register("ai_complete", aiComplete)
    spark.udf.register("ai_generate_issue", aiGenerateIssue)
    spark.udf.register("ai_generate_file", aiGenerateMultimodal)
    // generic WITH SCHEMA ROW(...) path: SqlScriptRunner rewrites
    // AI_GENERATE(expr WITH SCHEMA ROW(...)) to
    // from_json(ai_generate_json(expr, '<ddl>'), '<ddl>')
    spark.udf.register("ai_generate_json", aiGenerateJson)
  }
}
