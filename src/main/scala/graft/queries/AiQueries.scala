package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ai.AiFunctions
import graft.multimodal.Multimodal

/** AI-function surface (SURVEY.md §2.10) and multimodal plumbing, exercised
  * over the documents table. Outputs are deterministic (stub backend) but not
  * ANSI-SQL-expressible → rows-only driver checks; exact values are asserted
  * in AiFunctionsSpec / MultimodalSpec.
  */
object AiQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val list: Seq[Q] = Seq(

    // U1 — AI_CLASSIFY with a closed label set, via the registered SQL
    // function exactly like the reference calls it (recipes.sql:18).
    Q("q60_ai_classify", (s, dir) => {
      AiFunctions.register(s)
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT label, count(*) AS n_docs
        FROM (SELECT ai_classify(text,
                array('query processing', 'joins and shuffles',
                      'storage and caching', 'streaming')) AS label
              FROM documents)
        GROUP BY label""")
    }, Some("""
      -- The stub classifier is deterministic keyword overlap: score(label) =
      -- number of label words appearing in lower(text) as substrings (a
      -- token match implies a substring match, so the token check folds in);
      -- first max wins, all-zero falls back to the LAST label.
      WITH s AS (SELECT lower(text) AS p FROM documents),
      sc AS (SELECT
        (CASE WHEN contains(p,'query') THEN 1 ELSE 0 END
       + CASE WHEN contains(p,'processing') THEN 1 ELSE 0 END) AS s1,
        (CASE WHEN contains(p,'joins') THEN 1 ELSE 0 END
       + CASE WHEN contains(p,'and') THEN 1 ELSE 0 END
       + CASE WHEN contains(p,'shuffles') THEN 1 ELSE 0 END) AS s2,
        (CASE WHEN contains(p,'storage') THEN 1 ELSE 0 END
       + CASE WHEN contains(p,'and') THEN 1 ELSE 0 END
       + CASE WHEN contains(p,'caching') THEN 1 ELSE 0 END) AS s3,
        CASE WHEN contains(p,'streaming') THEN 1 ELSE 0 END AS s4
       FROM s)
      SELECT CASE WHEN greatest(s1,s2,s3,s4) = 0 THEN 'streaming'
                  WHEN s1 >= s2 AND s1 >= s3 AND s1 >= s4 THEN 'query processing'
                  WHEN s2 >= s3 AND s2 >= s4 THEN 'joins and shuffles'
                  WHEN s3 >= s4 THEN 'storage and caching'
                  ELSE 'streaming' END AS label,
             count(*) AS n_docs
      FROM sc GROUP BY 1""")),

    // U2 — AI_GENERATE WITH SCHEMA ROW(...): struct-typed extraction with a
    // per-call-site schema (logistics_AI.sql:135-160) through the GENERIC
    // schema-parameterized path (AiFunctions.aiGenerate + from_json typing);
    // a second, different ROW schema runs in AiFunctionsSpec (media shape).
    Q("q61_ai_generate", (s, dir) => {
      import org.apache.spark.sql.types._
      val issueSchema = StructType(Seq(
        StructField("primary_issue", StringType),
        StructField("severity", StringType),
        StructField("requires_apology", BooleanType),
        StructField("estimated_delay_minutes", IntegerType)))
      val d = t(s, dir, "documents")
      d.withColumn("ai", AiFunctions.aiGenerate(col("text"), issueSchema))
        .select(col("doc_id"), col("ai")("primary_issue").as("primary_issue"),
          col("ai")("severity").as("severity"),
          col("ai")("requires_apology").as("requires_apology"))
        .groupBy(col("primary_issue"), col("severity"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("requires_apology"), 1).otherwise(0)).as("n_apology"))
    }, Some("""
      -- Replays StubBackend.generateJson's name-aware field heuristics
      -- (issue keyword ladder, severity intensity markers, apology =
      -- negative-marker scan) — all plain substring checks over lower(text).
      WITH s AS (SELECT lower(text) AS p FROM documents),
      e AS (SELECT
        CASE WHEN contains(p,'traffic') THEN 'Traffic'
             WHEN contains(p,'weather') OR contains(p,'snow') THEN 'Weather'
             WHEN contains(p,'access') OR contains(p,'gate') THEN 'Access'
             WHEN contains(p,'mechanical') OR contains(p,'engine') THEN 'Mechanical'
             WHEN contains(p,'angry') OR contains(p,'unacceptable') OR contains(p,'terrible')
               OR contains(p,'worst') OR contains(p,'refund') OR contains(p,'damage') THEN 'Customer'
             ELSE 'None' END AS primary_issue,
        CASE WHEN contains(p,'very') OR contains(p,'extremely') OR contains(p,'!') THEN 'high'
             WHEN contains(p,'somewhat') OR contains(p,'minor') THEN 'low'
             ELSE 'medium' END AS severity,
        CASE WHEN contains(p,'angry') OR contains(p,'unacceptable') OR contains(p,'terrible')
          OR contains(p,'worst') OR contains(p,'refund') OR contains(p,'damage')
          THEN 1 ELSE 0 END AS ap
       FROM s)
      SELECT primary_issue, severity, count(*) AS n,
             CAST(sum(ap) AS BIGINT) AS n_apology
      FROM e GROUP BY 1, 2""")),

    // U4 — AI_COMPLETE free-text (logistics_AI.sql:223-239): prompt built
    // with || concatenation like the reference's prompt assembly.
    Q("q62_ai_complete", (s, dir) => {
      // orderBy before limit: a bare limit picks engine-dependent rows, which
      // would make the cross-engine hash compare nondeterministic
      t(s, dir, "documents").orderBy(col("doc_id")).limit(100)
        .select(col("doc_id"),
          AiFunctions.aiComplete(
            concat(lit("Summarize for ops: "), col("text"))).as("summary"))
    }, Some("""
      -- StubBackend.complete = '[completion] ' + first 12 whitespace tokens
      -- (+ ' …' when more follow); the filter drops split artifacts exactly
      -- like Java split's empty-token elision.
      SELECT doc_id,
        '[completion] ' || array_to_string(list_slice(words, 1, 12), ' ') ||
          CASE WHEN len(words) > 12 THEN ' …' ELSE '' END AS summary
      FROM (
        SELECT doc_id,
          list_filter(regexp_split_to_array(trim('Summarize for ops: ' || text), '\s+'),
                      w -> w <> '') AS words
        FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100))""")),

    // U3 + multimodal plumbing — binary payload column with typed metadata:
    // decode (auto-routed: REAL javax.imageio for images, stub for a/v) →
    // resize → frame-sample → per-format stats. The payload
    // here is the document text encoded as bytes; a real corpus would carry
    // image/audio bytes through the identical plan.
    Q("q63_multimodal_decode", (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("content", encode(col("text"), "utf-8"))
        .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
        .withColumn("meta_small", Multimodal.resizeMeta(col("meta"), 640))
      d.groupBy(col("meta")("format").as("format"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("meta")("width")), 2).as("avg_w"),
          round(avg(col("meta_small")("width")), 2).as("avg_w_small"),
          round(avg(col("meta")("duration_s")), 4).as("avg_dur"))
    }, None),

    // Frame sampling: one row per 24th frame, then multimodal AI_GENERATE
    // over (prompt, content) — the ai_generate.sql:8-18 shape.
    Q("q64_multimodal_frames", (s, dir) => {
      val d = t(s, dir, "documents").limit(50)
        .withColumn("content", encode(col("text"), "utf-8"))
        .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
      Multimodal.sampleFrames(d, col("meta"), step = 24)
        .withColumn("ai", AiFunctions.aiGenerateMultimodal(
          concat(lit("Describe frame "), col("frame_idx")), col("content")))
        .select(col("doc_id"), col("frame_idx"),
          col("ai")("primary_issue").as("kind"), col("ai")("severity").as("severity"))
    }, None),

    // Embedding feature extraction from binary payloads (featuresStub stands
    // in for an image/audio encoder) feeding the vector ops.
    Q("q65_multimodal_features", (s, dir) => {
      import graft.functions.VectorFunctions._
      val d = t(s, dir, "documents")
        .withColumn("content", encode(col("text"), "utf-8"))
        .withColumn("feat", Multimodal.featuresStub(col("content")))
      d.select(col("source"), vnorm(asDouble(col("feat"))).as("n2"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), round(avg(col("n2")), 6).as("avg_feat_norm"))
    }, None)
  )
}
