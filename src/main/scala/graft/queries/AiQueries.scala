package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ai.AiFunctions
import graft.multimodal.Multimodal

/** AI-function surface (SURVEY.md §2.10) and multimodal plumbing, exercised
  * over the documents table. Outputs are deterministic (stub backend) and
  * ALL DuckDB-oracle-checked: the stub heuristics are replayed in SQL
  * (q60–q62), the multimodal fixture ties asset metadata to doc_id so the
  * decode path hash-checks (q63/q64), and the fixture PNGs' pixel values
  * are a pure function of (x, y, doc_id) so even the pixel-feature path
  * hash-checks as an in-plan contract (q65).
  */
object AiQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Multimodal asset fixture, memoized per (session, sf dir): one binary
    * payload per document — every 3rd doc a REAL PNG whose dimensions are a
    * pure function of doc_id, the rest GFTV a/v containers whose header
    * fields are too. That functional link is what upgrades q63/q64 from
    * rows-only to hash-checked: DuckDB predicts the metadata from doc_id
    * arithmetic while the engine must recover it by decoding actual bytes
    * (ImageIO for images, the header probe for a/v). Driver-side generation
    * is fixture code — production payloads arrive as parquet binary columns
    * through the identical plan. */
  private val mmAssetFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[queries] def mmAssets(s: SparkSession, dir: String): DataFrame =
    mmAssetFixtures.computeIfAbsent(s"${System.identityHashCode(s)}|$dir", _ => {
      val ids = t(s, dir, "documents").select(col("doc_id"))
        .orderBy(col("doc_id")).limit(120).collect().map(_.getLong(0)).toSeq
      val rows = ids.map { id =>
        val content =
          if (id % 3 == 0)
            Multimodal.makePng(16 + (id % 8).toInt * 16, 12 + (id % 5).toInt * 12, id)
          else
            Multimodal.makeAvPayload(
              width = 320 + (id % 4).toInt * 160,
              height = 240 + (id % 3).toInt * 120,
              nFrames = 24 + (id % 200).toInt,
              formatCode = (id % 2).toInt, // 0 = webm, 1 = wav
              pad = (id % 64).toInt)
        (id, content)
      }
      import s.implicits._
      val df = rows.toDF("doc_id", "content").repartition(4).cache()
      df.count()
      df
    })

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
    // decode (auto-routed: REAL javax.imageio for images, header probe for
    // a/v) → resize → per-format stats. ORACLE-CHECKED: the fixture ties
    // every asset's true metadata to doc_id, so DuckDB recomputes the
    // dims/durations arithmetically while the engine must recover them by
    // decoding the actual bytes — a broken decode path hash-mismatches.
    Q("q63_multimodal_decode", (s, dir) => {
      val d = mmAssets(s, dir)
        .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
        .withColumn("meta_small", Multimodal.resizeMeta(col("meta"), 64))
      d.groupBy(col("meta")("format").as("format"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("meta")("width")), 2).as("avg_w"),
          round(avg(col("meta_small")("width")), 2).as("avg_w_small"),
          round(avg(col("meta")("duration_s")), 4).as("avg_dur"))
    }, Some("""
      -- the fixture's metadata is a pure function of doc_id (every 3rd doc a
      -- real PNG, the rest GFTV containers); resize mirrors resizeMeta(64)
      WITH assets AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'png'
               WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'wav' END AS format,
          CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id % 8) * 16
               ELSE 320 + (doc_id % 4) * 160 END AS w,
          CASE WHEN doc_id % 3 = 0 THEN 12 + (doc_id % 5) * 12
               ELSE 240 + (doc_id % 3) * 120 END AS h,
          CASE WHEN doc_id % 3 = 0 THEN 0.0
               ELSE (24 + (doc_id % 200)) / 24.0 END AS dur
        FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 120))
      SELECT format, count(*) AS n,
        round(avg(w), 2) AS avg_w,
        round(avg(CAST(floor(w * least(1.0, 64.0 / greatest(w, h))) AS INTEGER)), 2)
          AS avg_w_small,
        round(avg(dur), 4) AS avg_dur
      FROM assets GROUP BY format""")),

    // Frame sampling: one row per 24th frame, then multimodal AI_GENERATE
    // over (prompt, content) — the ai_generate.sql:8-18 shape. ORACLE-CHECKED:
    // frame counts derive from the GFTV header the probe must read, and the
    // AI stub's size-keyed fields from the payload size (header + pad < 4 KiB
    // ⇒ severity 'low').
    Q("q64_multimodal_frames", (s, dir) => {
      val vids = mmAssets(s, dir).filter(col("doc_id") % 3 =!= 0)
        .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
      Multimodal.sampleFrames(vids, col("meta"), step = 24)
        .withColumn("ai", AiFunctions.aiGenerateMultimodal(
          concat(lit("Describe frame "), col("frame_idx")), col("content")))
        .select(col("doc_id"), col("frame_idx"),
          col("ai")("primary_issue").as("kind"), col("ai")("severity").as("severity"))
    }, Some("""
      WITH vids AS (
        SELECT doc_id, 24 + (doc_id % 200) AS nf
        FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 120)
        WHERE doc_id % 3 <> 0)
      SELECT doc_id,
             CAST(unnest(generate_series(0, nf - 1, 24)) AS INTEGER) AS frame_idx,
             'document' AS kind, 'low' AS severity
      FROM vids""")),

    // REAL pixel features, oracle-checked (closing the registry's last
    // rows-only gap): makePng fills each fixture PNG with a pure function of
    // (x, y, doc_id), so the 2×2-quadrant channel means that imageFeatures
    // must recover BY DECODING ACTUAL BYTES are predictable by arithmetic.
    // The plan recomputes the expected means over an exploded pixel grid and
    // compares them to the decoded features (1e-5 tolerance — float32
    // rounding is ~3e-8, the quadrant-to-quadrant signal ~6e-3); the oracle
    // pins the dimensions from doc_id arithmetic (as in q63) plus the
    // contract booleans. If the decode, the PNG round-trip, or the quadrant
    // math drifts, feats_ok flips and the driver hash-compare fails.
    Q("q65_multimodal_features", (s, dir) => {
      val pngs = mmAssets(s, dir).filter(col("doc_id") % 3 === 0)
        .withColumn("feat", Multimodal.imageFeaturesUdf(col("content")))
        .withColumn("meta", Multimodal.decodeAutoUdf(col("content")))
        .withColumn("w", col("meta")("width"))
        .withColumn("h", col("meta")("height"))
      val px = pngs.select(col("doc_id"), col("w"), col("h"), col("feat"),
          explode(sequence(lit(0), col("w") * col("h") - 1)).as("p"))
        .withColumn("x", (col("p") % col("w")).cast("int"))
        .withColumn("y", floor(col("p") / col("w")).cast("int"))
        .withColumn("v", (col("x") * 7 + col("y") * 13 + col("doc_id"))
          .bitwiseAND(lit(0xffffff)))
        .withColumn("q",
          when(col("y") >= col("h") / 2, 2).otherwise(0) +
            when(col("x") >= col("w") / 2, 1).otherwise(0))
      val perQuad = px.groupBy(col("doc_id"), col("q"))
        .agg(max(col("w")).as("w"), max(col("h")).as("h"),
          first(col("feat")).as("feat"),
          (avg(shiftright(col("v"), 16).bitwiseAND(lit(255))) / 255.0).as("pr"),
          (avg(shiftright(col("v"), 8).bitwiseAND(lit(255))) / 255.0).as("pg"),
          (avg(col("v").bitwiseAND(lit(255))) / 255.0).as("pb"))
      val tol = 1e-5
      perQuad
        .withColumn("ok",
          abs(element_at(col("feat"), col("q") * 3 + 1) - col("pr")) <= tol &&
            abs(element_at(col("feat"), col("q") * 3 + 2) - col("pg")) <= tol &&
            abs(element_at(col("feat"), col("q") * 3 + 3) - col("pb")) <= tol)
        .groupBy(col("doc_id"))
        .agg(max(col("w")).as("width"), max(col("h")).as("height"),
          bool_and(col("ok")).as("feats_ok"))
    }, Some("""
      WITH ids AS (
        SELECT doc_id
        FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 120)
        WHERE doc_id % 3 = 0)
      SELECT doc_id,
             CAST(16 + (doc_id % 8) * 16 AS INTEGER) AS width,
             CAST(12 + (doc_id % 5) * 12 AS INTEGER) AS height,
             TRUE AS feats_ok
      FROM ids"""))
  )
}
