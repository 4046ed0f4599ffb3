package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{DuckSql, VectorFunctions => VF}

/** Round-10 queries: hybrid-retrieval fusion — the operator that sits
  * on top of the lexical (d25 BM25) and semantic (e1 cosine) rankers
  * a curation/RAG pipeline runs side by side.
  */
object Round10Queries {

  /** RRF constant — the value from the original Cormack/Clarke/Büttcher
    * TREC work; large enough that rank 1 vs 2 doesn't dominate the sum.
    */
  private val RrfK = 60

  val all: Seq[Q] = Seq(

    // V20 — reciprocal-rank fusion of BM25 and embedding-cosine
    // retrieval: score(d) = Σ_arms 1/(60 + rank_arm(d)), the standard
    // score-free way to merge rankers whose raw scores aren't
    // comparable (BM25 is unbounded, cosine is [-1,1]). Each arm is
    // the engine's existing ranker shape — BM25 with the term filter
    // ahead of the tf shuffle, cosine as one scan +
    // TakeOrderedAndProject — cut to its top-15; the fusion itself
    // touches only those 30 rows (a full-outer join on doc_id), so at
    // 100 TB the cost IS the two arms, and the arms are the shapes
    // already proven to scale. doc_id ↔ vec_id correspondence as in
    // v17. Ranks are dense and deterministic (score desc, doc_id);
    // a doc missing from one arm contributes 0 from it, and the
    // emitted NULL rank hash-checks that the arm really missed it.
    Q("v20_rrf_fusion",
      (s, d) => {
        val lex = Round9Queries.all.find(_.name == "d25_bm25").get.run(s, d)
          .withColumn("lex_rank", row_number().over(
            Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
          .select(col("doc_id"), col("lex_rank"))
        val q = VectorQueries.qvec(s, d, 0)
        val qn = VF.normS(q)
        val sem = Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"),
            (VF.dotLit(col("embedding"), q) /
              (VF.safeNorm(col("embedding")) *
                lit(if (qn == 0.0) 1.0 else qn))).as("c"))
          .orderBy(col("c").desc, col("doc_id")).limit(15)
          .withColumn("sem_rank", row_number().over(
            Window.orderBy(col("c").desc, col("doc_id"))).cast("int"))
          .select(col("doc_id"), col("sem_rank"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
            round(
              coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)),
              6).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      },
      Some(s"""WITH dl AS (
           |  SELECT doc_id,
           |    CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
           |         AS BIGINT) AS dl
           |  FROM documents),
           |stats AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
           |tf AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |    FROM documents) u
           |  WHERE term IN (${Round9Queries.Bm25Terms.map("'" + _ + "'").mkString(", ")})
           |  GROUP BY 1, 2),
           |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           |scored AS (
           |  SELECT tf.doc_id,
           |    CAST(round(
           |      ln((s.n_docs - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0) *
           |      (tf.tf * 2.2e0) /
           |      (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / s.avgdl)), 6)
           |      AS DECIMAL(18,6)) AS tscore
           |  FROM tf JOIN df ON tf.term = df.term
           |  JOIN dl ON tf.doc_id = dl.doc_id, stats s),
           |lex AS (
           |  SELECT doc_id,
           |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
           |      AS lex_rank
           |  FROM (SELECT doc_id, CAST(sum(tscore) AS DOUBLE) AS bm25
           |        FROM scored GROUP BY 1
           |        ORDER BY bm25 DESC, doc_id LIMIT 15) lz),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |sem AS (
           |  SELECT doc_id,
           |    CAST(row_number() OVER (ORDER BY c DESC, doc_id) AS INT)
           |      AS sem_rank
           |  FROM (SELECT e.vec_id AS doc_id,
           |          (${DuckSql.dot("e.embedding", "q.qe")} /
           |           (${DuckSql.safeNorm("e.embedding")} *
           |            ${DuckSql.safeNorm("q.qe")})) AS c
           |        FROM embeddings e, q
           |        ORDER BY c DESC, doc_id LIMIT 15) sz)
           |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           |  lex_rank, sem_rank,
           |  round(coalesce(1.0e0 / (${RrfK} + lex_rank), 0.0e0) +
           |        coalesce(1.0e0 / (${RrfK} + sem_rank), 0.0e0), 6) AS rrf
           |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
           |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // E18 — IVF index-quality audit: measured 1-probe recall@10 for
    // the 10-query panel over the persisted quantized index — the m8
    // treatment (LSH audit) applied to the IVF tier, completing the
    // audit family. One batched job: the 10-query panel broadcasts
    // into a single (id, embedding, cell) scan; TopKAgg takes the
    // per-query exact top-10 and the probed-cell top-10 map-side (no
    // corpus-wide window sort), and recall is the overlap. At scale
    // the audit costs ~one corpus scan — cheap enough to run
    // per-ingest, and the number it prints is the one that tells you
    // when the coarse quantizer has drifted from the data
    // distribution. Oracle recomputes cells AND routing from the
    // injected trained centroids, so the measured recall itself is
    // hash-checked.
    Q("e18_ivf_recall_audit",
      (s, d) => {
        val idx = QuantCache.forDir(s, d)
        val sess = s
        import sess.implicits._
        val panel = (0L until 10L).map { i =>
          val q = VectorQueries.qvec(s, d, i)
          (i, q, idx.model.ivfNearestCells(q, 1).head)
        }
        val qdf = panel.toDF("qid", "qe", "qcell")
        val scored = idx.indexDf
          .select(col("id"), col("embedding"), col("cell"))
          .crossJoin(broadcast(qdf))
          .select(col("qid"), col("qcell"), col("id"), col("cell"),
            VF.l2sq(col("embedding"), col("qe")).as("dd"))
        // ONE pass: the probed top-10 is the same aggregate under a
        // FILTER (WHERE cell = qcell) clause, so both top-10s ride a
        // single scan + single shuffle (two separate groupBys would
        // re-scan the index per aggregate).
        scored.groupBy("qid", "qcell")
          .agg(graft.functions.TopKAgg(col("id"), col("dd"), 10).as("ex"),
            graft.functions.TopKAgg.filtered(s, "id", "dd", 10,
              "cell = qcell").as("pr"))
          .select(col("qid"), col("qcell").cast("int").as("probed_cell"),
            round(
              size(array_intersect(
                expr("transform(ex, x -> x._1)"),
                expr("transform(pr, x -> x._1)"))).cast("double") / 10.0,
              6).as("recall_at10"))
          .orderBy("qid")
      },
      None,
      lateOracle = QuantCache.lateOracle("e18_ivf_recall_audit"))
  )
}
