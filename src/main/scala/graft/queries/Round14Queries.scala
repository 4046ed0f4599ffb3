package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{DuckSql, TextFunctions => TF, VectorFunctions => VF, TopKAgg}
import graft.sources.ManifestScan

/** Round-14 additions: manifest file-skipping (x28 — planning-time
  * zone-map pruning over plain parquet, the Iceberg/Delta move), hard
  * negative mining for contrastive training (e22 — the DPR/SBERT
  * in-batch-negatives prep step), a Johnson-Lindenstrauss random
  * projection funnel (e23 — data-INDEPENDENT coarse ranking, the
  * untrained counterpart of e21's Matryoshka prefix), and sliding
  * token-window chunking (d29 — the RAG/packing chunker with overlap,
  * offsets, and an engine-exact per-chunk fingerprint).
  */
object Round14Queries {

  /** Deterministic ±1 JL sign for input dim `i` (0..63) and output dim
    * `j` (0..31): bit 10 of the Knuth multiplicative hash of the cell
    * index. Parity bits of (x · odd) are x's own parity — a
    * checkerboard, not a random matrix — so the sign comes from a
    * MIDDLE bit, where the multiply has genuinely mixed.
    */
  private def jlSignS(i: Int, j: Int): Double = {
    val key = (i.toLong * 32 + j + 1) * 2654435761L
    if ((key % 1048576L) / 1024L % 2L == 0L) 1.0 else -1.0
  }

  /** Driver-side JL projection mirror (same fold order as the column
    * expression and the DuckDB twin: j outer, i ascending, +0.0 init).
    */
  private[graft] def jlProjectS(x: Array[Double]): Array[Double] =
    Array.tabulate(32) { j =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += x(i) * jlSignS(i, j); i += 1 }
      acc
    }

  /** Column form of the 64→32 JL projection over `embedding` — the
    * compiled [[graft.expressions.VecJlProject]] kernel. The HOF
    * lambda it replaced (kept below for the equivalence spec) costs
    * ~1.8 s over 5k rows purely in per-element interpretation.
    */
  private[graft] val jlProjectCol = VF.jlProject(col("embedding"), 32)

  /** The transform/aggregate lambda form of the same projection:
    * value-identical by construction (same fold order, init and
    * integer sign arithmetic) — Round14Spec pins kernel ≡ lambda, so
    * the kernel swap is provably plan-invisible.
    */
  private[graft] val jlProjectHofCol =
    expr("""transform(sequence(0, 31), j -> aggregate(sequence(0, 63),
      |  CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(embedding[i] AS DOUBLE) *
      |    (CASE WHEN ((CAST(i AS BIGINT) * 32 + j + 1) * 2654435761) % 1048576
      |            DIV 1024 % 2 = 0 THEN CAST(1 AS DOUBLE)
      |          ELSE CAST(-1 AS DOUBLE) END)))""".stripMargin)

  /** DuckDB twin of the projection for a 1-based list expr `e`. */
  private def jlProjectSql(e: String): String =
    s"""list_transform(range(32), j -> list_reduce(
       |    list_prepend(CAST(0 AS DOUBLE), list_transform(range(64),
       |      i -> CAST($e[CAST(i AS INT) + 1] AS DOUBLE) *
       |        (CASE WHEN ((i * 32 + j + 1) * 2654435761) % 1048576
       |                // 1024 % 2 = 0 THEN CAST(1 AS DOUBLE)
       |              ELSE CAST(-1 AS DOUBLE) END))),
       |    (acc, v) -> acc + v))""".stripMargin

  /** x28's clustered write + manifest build (exposed so Bench can time
    * the build cost separately from the read-side payoff).
    */
  private[graft] def x28Write(s: org.apache.spark.sql.SparkSession,
      d: String, dir: String, nFiles: Int = 16): Unit = {
    Tables.events(s, d)
      .select(col("user_id"),
        expr("ts div 3600000000000").as("hour_bucket"), col("value"))
      .repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(dir)
    ManifestScan.buildManifest(s, dir, Seq("user_id", "hour_bucket"))
    ()
  }

  private[queries] val x28Ranges =
    Map("user_id" -> (100L, 199L), "hour_bucket" -> (473592L, 473712L))

  private[queries] def x28Agg(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n_events"),
      sum(col("value").cast(DecimalType(18, 6))).cast("double")
        .as("sum_value"))

  /** Manifest-pruned read over an x28 directory. */
  private[graft] def x28ReadPruned(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    x28Agg(ManifestScan.readPruned(s, dir, x28Ranges)._1)

  /** The same rectangle over the FULL directory listing (Spark's own
    * row-group pruning only) — the baseline the manifest improves on.
    */
  private[graft] def x28ReadFull(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    x28Agg(s.read.parquet(dir)
      .where(col("user_id").between(100L, 199L) &&
        col("hour_bucket").between(473592L, 473712L)))

  val all: Seq[Q] = Seq(

    // X28 — manifest-based FILE skipping: write events range-clustered
    // by user_id into 16 files, build a _manifest.json of per-file
    // zone maps from parquet FOOTERS only, then answer x21's rectangle
    // query scanning only files whose zones intersect the predicate.
    // Spark's reader prunes row groups AFTER listing and opening every
    // file; at 100 TB / millions of files the manifest prunes at
    // PLANNING time, so task count follows the SELECTIVITY, not the
    // table size. The `pruned` flag pins that skipping really happened
    // (fewer files than the manifest total, and more than zero);
    // n_events/sum_value pin that it never changed the answer — the
    // pruning contract is "provably disjoint or kept", with the full
    // predicate re-applied to survivors.
    Q("x28_manifest_skipping",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x28_m").toString
        x28Write(s, d, dir)
        val (df, kept, total) = ManifestScan.readPruned(s, dir, x28Ranges)
        x28Agg(df)
          .select(col("n_events"), round(col("sum_value"), 6).as("sum_value"),
            lit(if (kept > 0 && kept < total) 1 else 0).cast("int")
              .as("pruned"))
      },
      Some("""SELECT count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value,
          |  CAST(1 AS INT) AS pruned
          |FROM events
          |WHERE user_id BETWEEN 100 AND 199
          |  AND epoch_ns(ts) // 3600000000000 BETWEEN 473592 AND 473712"""
          .stripMargin)),

    // E22 — hard-negative mining for contrastive training (the
    // DPR/sentence-transformers prep step): for each anchor doc
    // (a 1-in-25 panel), the best SAME-language neighbor is the
    // positive and the top-3 highest-cosine OTHER-language docs are
    // the hard negatives — the pairs that actually move a contrastive
    // loss, vs random negatives that are already separated. ONE pass
    // over the corpus: anchors broadcast, both aggregates are FILTERed
    // TopKAggs in the same groupBy (map-side partial top-k, no sort
    // shuffle of the pair table). At 100 TB the anchor panel shards
    // and the pair pass swaps in e17's salted candidate join; the
    // mining criterion on top is unchanged.
    Q("e22_hard_negatives",
      (s, d) => {
        val de = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"))
          .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("lang"), col("embedding"))
        val anchors = de.where(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
            col("embedding").as("ae"))
        val pairs = de.crossJoin(broadcast(anchors))
          .where(col("doc_id") =!= col("a_id"))
          .select(col("a_id"), col("a_lang"), col("doc_id").as("c_id"),
            col("lang").as("c_lang"),
            VF.cosine(col("ae"), col("embedding")).as("cos"))
          .withColumn("neg_cos", negate(col("cos")))
        val mined = pairs.groupBy("a_id")
          .agg(
            TopKAgg.filtered(s, "c_id", "neg_cos", 1,
              "c_lang = a_lang").as("pos"),
            TopKAgg.filtered(s, "c_id", "neg_cos", 3,
              "c_lang <> a_lang").as("negs"))
        mined
          .select(col("a_id").as("anchor_id"),
            col("pos")(0)("_1").as("pos_id"),
            round(negate(col("pos")(0)("_2")), 6).as("pos_cos"),
            posexplode(col("negs")))
          .select(col("anchor_id"), col("pos_id"), col("pos_cos"),
            (col("pos") + 1).cast("long").as("neg_rank"),
            col("col")("_1").as("neg_id"),
            round(negate(col("col")("_2")), 6).as("neg_cos"))
          .orderBy("anchor_id", "neg_rank")
      },
      Some(s"""WITH de AS (
           |  SELECT doc_id, lang, embedding FROM documents d
           |  JOIN embeddings e ON d.doc_id = e.vec_id),
           |a AS (SELECT doc_id AS a_id, lang AS a_lang, embedding AS ae
           |      FROM de WHERE doc_id % 25 = 0),
           |p AS (
           |  SELECT a_id, a_lang, de.doc_id AS c_id, de.lang AS c_lang,
           |    ${DuckSql.cosine("ae", "de.embedding")} AS cos
           |  FROM a CROSS JOIN de WHERE de.doc_id <> a_id),
           |pos AS (SELECT a_id, c_id, cos, row_number() OVER (
           |          PARTITION BY a_id ORDER BY cos DESC, c_id) AS rn
           |        FROM p WHERE c_lang = a_lang),
           |neg AS (SELECT a_id, c_id, cos, row_number() OVER (
           |          PARTITION BY a_id ORDER BY cos DESC, c_id) AS rn
           |        FROM p WHERE c_lang <> a_lang)
           |SELECT pos.a_id AS anchor_id, pos.c_id AS pos_id,
           |  round(pos.cos, 6) AS pos_cos,
           |  CAST(neg.rn AS BIGINT) AS neg_rank, neg.c_id AS neg_id,
           |  round(neg.cos, 6) AS neg_cos
           |FROM pos JOIN neg ON pos.a_id = neg.a_id
           |WHERE pos.rn = 1 AND neg.rn <= 3
           |ORDER BY anchor_id, neg_rank""".stripMargin)),

    // E23 — Johnson-Lindenstrauss random-projection funnel: a seeded
    // ±1 projection folds 64 dims to 32 with NO training and NO stored
    // model (the signs are a pure function of (i, j) — any executor
    // regenerates them), the coarse pass ranks by 32-dim cosine, and
    // only the top-100 pay the full-dimension re-rank. The untrained
    // counterpart of e21's Matryoshka prefix: works on embeddings with
    // no front-loading guarantee, costs one multiply-add sweep at
    // ingest, and at 100 TB the projected column is materialized once
    // (2× fewer bytes per scan, same funnel math as the QuantIndex
    // code columns). 32 dims / pool 100 is the measured operating
    // point: at 16 dims the JL distortion (σ ≈ 1/√dims per unit
    // cosine) drowns near-random-data neighbor gaps and recall@10
    // drops under 0.3, exactly as the JL bound predicts. Signs, fold
    // order and init are pinned identically in the column expression,
    // the driver mirror, and the DuckDB twin, so the coarse ranking —
    // not just the final answer — is engine-exact.
    Q("e23_jl_funnel",
      (s, d) => {
        val q = VectorQueries.qvec(s, d, 0)
        val qp = jlProjectS(q)
        val coarse = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .withColumn("p", jlProjectCol)
          .withColumn("cp", VF.cosine(col("p"), typedLit(qp)))
          .orderBy(col("cp").desc, col("vec_id")).limit(100)
        coarse
          .withColumn("cos_full", VF.cosine(col("embedding"), typedLit(q)))
          .orderBy(col("cos_full").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), round(col("cos_full"), 6).as("cos"))
      },
      Some(s"""WITH q AS (
           |  SELECT embedding AS qe, ${jlProjectSql("embedding")} AS qp
           |  FROM embeddings WHERE vec_id = 0),
           |pr AS (
           |  SELECT e.vec_id, e.embedding,
           |    ${jlProjectSql("e.embedding")} AS p
           |  FROM embeddings e),
           |coarse AS (
           |  SELECT pr.vec_id, pr.embedding,
           |    ${DuckSql.cosine("pr.p", "q.qp")} AS cp
           |  FROM pr, q ORDER BY cp DESC, vec_id LIMIT 100)
           |SELECT c.vec_id,
           |  round(${DuckSql.cosine("c.embedding", "q.qe")}, 6) AS cos
           |FROM coarse c, q
           |ORDER BY ${DuckSql.cosine("c.embedding", "q.qe")} DESC, c.vec_id
           |LIMIT 10""".stripMargin)),

    // D29 — sliding token-window chunking (window 50, stride 40): the
    // RAG / context-packing chunker, with exact start offsets, chunk
    // lengths, and a rolling poly-hash fingerprint per chunk (the
    // d10-style key that downstream chunk-level dedup consumes).
    // Chunk COUNT per doc is closed-form — 1 + ceil((n-50)/40) as the
    // integer (n-11) div 40 — so generation is one explode of a
    // sequence, a single scan with no shuffle and no per-doc window
    // sort; fingerprints fold (acc*31 + tok) % P left-to-right over
    // the slice, identical in both engines.
    Q("d29_sliding_chunks",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), TF.wordHashes(col("text")).as("wh"))
          .where(size(col("wh")) > 0)
          .withColumn("n", size(col("wh")).cast("long"))
          .withColumn("nck",
            when(col("n") <= 50L, lit(1L))
              .otherwise(lit(1L) + expr("(n - 11) div 40")))
        base
          .select(col("doc_id"), col("wh"), col("n"),
            explode(expr("sequence(0L, nck - 1)")).as("ci"))
          .withColumn("start_tok", col("ci") * 40L)
          .withColumn("n_tok", least(lit(50L), col("n") - col("start_tok")))
          .withColumn("chunk_hash",
            expr(s"""aggregate(slice(wh, CAST(start_tok + 1 AS INT),
              |  CAST(n_tok AS INT)), CAST(0 AS BIGINT),
              |  (acc, t) -> (acc * 31 + t) % ${TF.P})""".stripMargin))
          .select(col("doc_id"), col("ci").cast("int").as("chunk_ix"),
            col("start_tok"), col("n_tok"), col("chunk_hash"))
          .orderBy("doc_id", "chunk_ix")
      },
      Some(s"""WITH w AS (
           |  SELECT doc_id, ${TF.wordHashesSql("text")} AS wh
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, wh, len(wh) AS n,
           |    CASE WHEN len(wh) <= 50 THEN 1
           |         ELSE 1 + (len(wh) - 11) // 40 END AS nck
           |  FROM w WHERE len(wh) > 0),
           |x AS (
           |  SELECT doc_id, wh, n, CAST(u.ci AS INT) AS chunk_ix,
           |    CAST(u.ci * 40 AS BIGINT) AS start_tok
           |  FROM c, unnest(range(nck)) AS u(ci))
           |SELECT doc_id, chunk_ix, start_tok,
           |  CAST(least(50, n - start_tok) AS BIGINT) AS n_tok,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      wh[CAST(start_tok + 1 AS INT) :
           |         CAST(start_tok + least(50, n - start_tok) AS INT)]),
           |    (acc, t) -> (acc * 31 + t) % ${TF.P}) AS chunk_hash
           |FROM x ORDER BY doc_id, chunk_ix""".stripMargin))
  )
}
