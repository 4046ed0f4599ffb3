package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Round-6 (session 2) additions:
  *
  *  - d22: statistical-LM fluency scoring — the CCNet/Wenzek et al.
  *    perplexity-filter shape: corpus bigram conditional
  *    probabilities with add-one smoothing, per-doc mean bigram
  *    probability in fixed-point µ-units (integer floor division, so
  *    both engines agree bit-for-bit where floating log-likelihoods
  *    would not), keep = above the corpus mean. The counts tables
  *    ARE the language model — no external artifact.
  *  - p10: the curation FUNNEL capstone — Gopher rules (d20) ∧ DSIR
  *    importance (d21) ∧ duplicate-span gate (d19) composed into one
  *    plan, reporting survivors and surviving tokens per stage. The
  *    per-stage attrition table is the artifact every data-curation
  *    run ships (what fraction each gate removes).
  */
object Round6bQueries {

  private val Scale = 1000000L
  private val DsirBuckets = 64

  /** Bigram stream (a = previous word hash, b2 = current), one row
    * per adjacent pair: posexplode + lag over (doc_id, pos). The
    * window's doc_id hash partitioning is the same key as the later
    * per-doc rollup.
    */
  private def bigrams(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TF.wordHashes(col("text"))).as(Seq("pos", "wh")))
      .withColumn("a",
        lag("wh", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("a").isNotNull)
      .select(col("doc_id"), col("a"), col("wh").as("b2"))

  /** DuckDB twin of [[bigrams]]: adjacent pairs straight from the
    * word-hash list (docs with <2 words contribute no rows, matching
    * the lag filter).
    */
  private val bigramsSql: String =
    s"""w0 AS (SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents),
       |bg0 AS (SELECT doc_id,
       |          unnest(list_transform(range(2, len(wh) + 1),
       |            i -> [wh[i-1], wh[i]])) AS bg
       |        FROM w0),
       |bg AS (SELECT doc_id, bg[1] AS a, bg[2] AS b2 FROM bg0)""".stripMargin

  val all: Seq[Q] = Seq(

    // D22 — bigram-LM fluency score: P(b|a) ≈ (c2(a,b)+1) /
    // (c1(a)+V) with add-one smoothing over the corpus's own counts,
    // per-doc fluency = mean µ-scaled P over its bigrams, keep =
    // above the corpus-wide mean. At 100 TB: the count tables are
    // vocabulary-bounded keyed aggregates (map-side combined), the
    // probability join is equi-keyed on the bigram — the same
    // shuffle-bounded shape as m5's posting lists, and the model
    // "trains" in the same pass that scores.
    Q("d22_bigram_fluency",
      (s, d) => {
        val bg = bigrams(s, d).localCheckpoint(true)
        val c2 = bg.groupBy("a", "b2").agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy("a").agg(count(lit(1)).as("c1"))
        val vocab = Tables.documents(s, d)
          .select(explode(TF.wordHashes(col("text"))).as("wh"))
          .agg(countDistinct("wh").as("v"))
        val lut = c2.join(c1, "a").crossJoin(broadcast(vocab))
          .select(col("a"), col("b2"),
            expr(s"(c2 + 1L) * ${Scale}L DIV (c1 + v)").as("p_micro"))
        val scored = bg.join(lut, Seq("a", "b2")).localCheckpoint(true)
        val global = scored
          .agg(expr("sum(p_micro) DIV count(1)").as("global_micro"))
        scored.groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum("p_micro").as("psum"))
          .crossJoin(broadcast(global))
          .select(col("doc_id"), col("n_bigrams"),
            expr("psum DIV n_bigrams").as("fluency_micro"),
            (expr("psum DIV n_bigrams") > col("global_micro"))
              .cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $bigramsSql,
           |c2 AS (SELECT a, b2, count(*) AS c2 FROM bg GROUP BY a, b2),
           |c1 AS (SELECT a, count(*) AS c1 FROM bg GROUP BY a),
           |vocab AS (SELECT count(DISTINCT wh) AS v
           |          FROM (SELECT unnest(wh) AS wh FROM w0)),
           |lut AS (
           |  SELECT c2.a, c2.b2,
           |    CAST((c2 + 1) * $Scale AS BIGINT)
           |      // CAST(c1 + (SELECT v FROM vocab) AS BIGINT) AS p_micro
           |  FROM c2 JOIN c1 ON c2.a = c1.a),
           |scored AS (
           |  SELECT bg.doc_id, p_micro
           |  FROM bg JOIN lut ON bg.a = lut.a AND bg.b2 = lut.b2),
           |gl AS (SELECT CAST(sum(p_micro) AS BIGINT) // count(*)
           |          AS global_micro FROM scored)
           |SELECT doc_id,
           |  CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum(p_micro) AS BIGINT) // count(*) AS fluency_micro,
           |  CAST(CAST(sum(p_micro) AS BIGINT) // count(*)
           |       > (SELECT global_micro FROM gl) AS INT) AS keep
           |FROM scored
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // P10 — the curation funnel: stage-by-stage survival through the
    // round-6 gates (Gopher rules → DSIR importance → duplicate-span
    // cap dup_ratio < 2/3, integer-exact as 3·n_dup < 2·n_shingles).
    // One row per stage with surviving docs and tokens — the
    // attrition report of a pre-training data run. Each gate is the
    // same computation its standalone query declares (d20/d21/d19);
    // the funnel joins three per-doc flag tables on doc_id and
    // unpivots the cumulative conjunctions via stack().
    Q("p10_curation_funnel",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // gopher flag (row-local, d20 semantics)
        val g = docs.withColumn("w", TF.words(col("text")))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_words"),
            length(regexp_replace(col("text"), " ", ""))
              .cast("long").as("n_letters"),
            size(filter(col("w"), x => x.rlike("[a-zA-Z]")))
              .cast("long").as("n_alpha"),
            size(array_intersect(col("w"),
              typedLit(Seq("the", "a", "of", "and", "to"))))
              .cast("long").as("n_stop"),
            size(filter(col("w"), x =>
              x.contains("#") || x.contains("…")))
              .cast("long").as("n_symbol"))
          .select(col("doc_id"), col("n_words"),
            (col("n_words").between(50L, 100000L) &&
              (col("n_letters").cast("double") / col("n_words"))
                .between(3.0, 10.0) &&
              col("n_alpha").cast("double") / col("n_words") >= 0.8 &&
              col("n_stop") >= 2 &&
              col("n_symbol").cast("double") / col("n_words") <= 0.1)
              .cast("long").as("g"))
        // dsir flag (d21 semantics)
        val w = docs.select(col("doc_id"), col("lang"),
            explode(TF.wordHashes(col("text"))).as("wh"))
          .withColumn("b", col("wh") % lit(DsirBuckets.toLong))
        val raw = w.groupBy("b").agg(count(lit(1)).as("r"))
        val tgt = w.where(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("t"))
        val lut = raw.join(tgt, Seq("b"), "left")
          .na.fill(0L, Seq("t"))
          .select(col("b"),
            expr(s"(t + 1L) * ${Scale}L DIV (r + 1L)").as("ratio_micro"))
        val totals = raw.agg(sum("r").as("rt")).crossJoin(
          tgt.agg(sum("t").as("tt")))
          .select(expr(s"(tt + $DsirBuckets) * ${Scale}L DIV " +
            s"(rt + $DsirBuckets)").as("base_micro"))
        val i = w.join(broadcast(lut), "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nw"), sum("ratio_micro").as("score"))
          .crossJoin(broadcast(totals))
          .select(col("doc_id"),
            (expr("score DIV nw") > col("base_micro"))
              .cast("long").as("i"))
        // duplicate-span flag (d19 semantics, integer threshold)
        val sh = docs.select(col("doc_id"),
          explode(TextQueries.shingleHashes).as("sh"))
        val df = sh.groupBy("sh").agg(countDistinct("doc_id").as("df"))
        val u = sh.join(df, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"),
            (col("n_dup") * 3 < col("n_sh") * 2).cast("long").as("u"))
        g.join(i, "doc_id").join(u, "doc_id")
          .select(col("n_words"), expr(
            "stack(4, '0_all', 1L, '1_gopher', g, " +
              "'2_dsir', g * i, '3_dup_span', g * i * u) AS (stage, alive)"))
          .where(col("alive") === 1L)
          .groupBy("stage")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_words").as("n_tokens"))
          .orderBy("stage")
      },
      Some(s"""WITH g AS (
           |  SELECT doc_id, n_words,
           |    CAST(n_words BETWEEN 50 AND 100000
           |      AND CAST(n_letters AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
           |      AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
           |      AND n_stop >= 2
           |      AND CAST(n_symbol AS DOUBLE) / n_words <= 0.1
           |      AS BIGINT) AS g
           |  FROM (SELECT doc_id,
           |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           |      CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
           |      CAST(len(list_filter(string_split(text, ' '),
           |        x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
           |      CAST(len(list_filter(list_distinct(string_split(text, ' ')),
           |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS n_stop,
           |      CAST(len(list_filter(string_split(text, ' '),
           |        x -> contains(x, '#') OR contains(x, '…'))) AS BIGINT) AS n_symbol
           |    FROM documents)),
           |wd AS (
           |  SELECT doc_id, lang, wh % $DsirBuckets AS b
           |  FROM (SELECT doc_id, lang,
           |          unnest(${TF.wordHashesSql("text")}) AS wh
           |        FROM documents)),
           |raw AS (SELECT b, count(*) AS r FROM wd GROUP BY b),
           |tgt AS (SELECT b, count(*) AS t FROM wd WHERE lang = 'en' GROUP BY b),
           |lut AS (
           |  SELECT raw.b,
           |    CAST((coalesce(t, 0) + 1) * $Scale AS BIGINT)
           |      // CAST(r + 1 AS BIGINT) AS ratio_micro
           |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
           |base AS (
           |  SELECT CAST((SELECT CAST(sum(t) AS BIGINT) FROM tgt)
           |           + $DsirBuckets AS BIGINT) * $Scale
           |      // CAST((SELECT CAST(sum(r) AS BIGINT) FROM raw)
           |           + $DsirBuckets AS BIGINT) AS base_micro),
           |i AS (
           |  SELECT wd.doc_id,
           |    CAST(CAST(sum(ratio_micro) AS BIGINT) // count(*)
           |         > (SELECT base_micro FROM base) AS BIGINT) AS i
           |  FROM wd JOIN lut ON wd.b = lut.b
           |  GROUP BY wd.doc_id),
           |wh AS (SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents),
           |sh0 AS (SELECT doc_id, ${TextQueries.shingleHashesSql} AS shs FROM wh),
           |sh AS (SELECT doc_id, unnest(shs) AS sh FROM sh0),
           |dfq AS (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY sh),
           |u AS (
           |  SELECT s.doc_id,
           |    CAST(CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 3
           |         < count(*) * 2 AS BIGINT) AS u
           |  FROM sh s JOIN dfq d ON s.sh = d.sh
           |  GROUP BY s.doc_id),
           |flags AS (
           |  SELECT g.n_words, g.g, i.i, u.u
           |  FROM g JOIN i ON g.doc_id = i.doc_id
           |         JOIN u ON g.doc_id = u.doc_id),
           |stages AS (
           |  SELECT '0_all' AS stage, 1 AS alive, n_words FROM flags
           |  UNION ALL
           |  SELECT '1_gopher', g, n_words FROM flags
           |  UNION ALL
           |  SELECT '2_dsir', g * i, n_words FROM flags
           |  UNION ALL
           |  SELECT '3_dup_span', g * i * u, n_words FROM flags)
           |SELECT stage,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_words) AS BIGINT) AS n_tokens
           |FROM stages WHERE alive = 1
           |GROUP BY stage ORDER BY stage""".stripMargin))
  )
}
