package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-16 training-data-pipeline additions: Gopher-style per-document
  * quality rules (d30 — the repetition/shape gates of Rae et al. 2021
  * §A1.1, the filter battery every modern pretraining corpus passes
  * through) and a corpus lexical-diversity audit (d31 — type-token
  * ratio and hapax fraction per language, the quick-look corpus-health
  * numbers a curation run reports next to its quality-gate yields).
  *
  * Determinism: every fraction is a µ-scaled integer (×1e6, integer
  * div) — the d21/d22 fixed-point convention — so gate decisions and
  * audit numbers are bit-identical across engines, never an FP race.
  */
object Round16Queries {

  private val M = 1000000L

  val all: Seq[Q] = Seq(

    // D30 — Gopher quality rules, per document: word count, mean word
    // length, top-word dominance, and duplicate-trigram fraction, each
    // µ-scaled, with the verdict = the FIRST failing rule (the
    // reporting shape the Gopher paper's ablation tables use). Scale
    // shape: every signal is a per-row EXPRESSION over the split text
    // (array_distinct/filter/sequence — all codegen'd, no UDF), so the
    // whole gate is a map: zero shuffles before the presentation sort,
    // and at 100 TB it fuses into whatever scan feeds it. The
    // distinct×filter histogram is O(u·n) per doc with bounded doc
    // length — the price of staying shuffle-free; documents long
    // enough to break that bound get chunked upstream (d29).
    Q("d30_gopher_rules",
      (s, d) => {
        val w = split(col("text"), " ")
        val base = Tables.documents(s, d)
          .select(col("doc_id"), w.as("w"))
          .withColumn("n_words", size(col("w")).cast("long"))
        // `div` (integral divide), never `/`: Spark's `/` on BIGINTs is
        // DOUBLE division — exact at these magnitudes but a different
        // OPERATION than DuckDB's `//`; div mirrors it by construction
        val sig = base
          .withColumn("mwl_u",
            expr(s"(aggregate(w, 0L, (a, x) -> a + length(x)) * ${M}L) " +
              "div n_words"))
          .withColumn("topw_u",
            expr(s"(cast(array_max(transform(array_distinct(w), " +
              s"x -> size(filter(w, y -> y = x)))) as bigint) * ${M}L) " +
              "div n_words"))
          .withColumn("tg", when(col("n_words") >= 3,
            expr("transform(sequence(1, cast(n_words as int) - 2), " +
              "i -> concat_ws(' ', element_at(w, i), " +
              "element_at(w, i + 1), element_at(w, i + 2)))")))
          .withColumn("dup3_u", when(col("n_words") >= 3,
            expr(s"(cast(size(tg) - size(array_distinct(tg)) as bigint) " +
              s"* ${M}L) div (n_words - 2)")).otherwise(0L))
        sig.select(col("doc_id"), col("n_words"),
            col("mwl_u"), col("topw_u"), col("dup3_u"),
            when(col("n_words") < 30, "word_count")
              .when(col("mwl_u") < 4000000L || col("mwl_u") > 5000000L,
                "word_length")
              .when(col("topw_u") >= 150000L, "top_word")
              .when(col("dup3_u") >= 30000L, "dup_3gram")
              .otherwise("pass").as("verdict"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w0 AS (
           |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |sig AS (
           |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           |    list_sum(list_transform(w, x -> strlen(x))) * $M // len(w)
           |      AS mwl_u,
           |    list_max(list_transform(list_distinct(w),
           |      x -> len(list_filter(w, y -> y = x)))) * $M // len(w)
           |      AS topw_u,
           |    CASE WHEN len(w) >= 3 THEN
           |      (len(w) - 2 - len(list_distinct(list_transform(
           |        range(1, len(w) - 1),
           |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))))
           |        * $M // (len(w) - 2)
           |    ELSE 0 END AS dup3_u
           |  FROM w0)
           |SELECT doc_id, n_words, CAST(mwl_u AS BIGINT) AS mwl_u,
           |  CAST(topw_u AS BIGINT) AS topw_u,
           |  CAST(dup3_u AS BIGINT) AS dup3_u,
           |  CASE WHEN n_words < 30 THEN 'word_count'
           |       WHEN mwl_u < 4000000 OR mwl_u > 5000000 THEN 'word_length'
           |       WHEN topw_u >= 150000 THEN 'top_word'
           |       WHEN dup3_u >= 30000 THEN 'dup_3gram'
           |       ELSE 'pass' END AS verdict
           |FROM sig ORDER BY doc_id""".stripMargin)),

    // D31 — lexical-diversity audit per language: distinct word types,
    // total tokens, type-token ratio and hapax-legomenon fraction
    // (words seen exactly once), µ-scaled. The corpus-health readout a
    // curation run prints next to its d30 yields — a collapsing TTR is
    // the first symptom of template/boilerplate flooding. Scale shape:
    // explode → (lang, word) count with map-side combine → per-lang
    // rollup; two keyed shuffles of the VOCABULARY (not the corpus),
    // the same posture as d27's count tables.
    Q("d31_lexical_diversity",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        val wc = words.groupBy("lang", "word").agg(count(lit(1)).as("c"))
        wc.groupBy("lang").agg(
            count(lit(1)).as("types"),
            sum("c").as("tokens"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
          .select(col("lang"), col("types"), col("tokens"),
            expr(s"(types * ${M}L) div tokens").as("ttr_u"),
            expr(s"(hapax * ${M}L) div types").as("hapax_u"))
          .orderBy("lang")
      },
      Some(s"""WITH wc AS (
           |  SELECT lang, word, count(*) AS c FROM (
           |    SELECT lang, unnest(string_split(text, ' ')) AS word
           |    FROM documents) z
           |  GROUP BY lang, word)
           |SELECT lang, CAST(count(*) AS BIGINT) AS types,
           |  CAST(sum(c) AS BIGINT) AS tokens,
           |  CAST(count(*) AS BIGINT) * $M // CAST(sum(c) AS BIGINT) AS ttr_u,
           |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * $M
           |    // CAST(count(*) AS BIGINT) AS hapax_u
           |FROM wc GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
