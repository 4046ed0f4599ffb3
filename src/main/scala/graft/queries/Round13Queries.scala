package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{DuckSql, TextFunctions => TF, VectorFunctions => VF, TopKAgg}

/** Round-13 training-data-pipeline additions: a TRAINED bag-of-words
  * classifier (d27 — the fastText-langid/quality-classifier shape, vs
  * d4's rule heuristic), CCNet-style per-language perplexity terciles
  * (d28 — head/middle/tail bucketing, the data-quality knob of the
  * CCNet/LLaMA pipelines), margin-based bitext mining (e20 — the
  * CCMatrix/LASER forward-backward neighborhood-margin criterion over
  * the embedding table), and a scalable deterministic global corpus
  * shuffle (p18 — hash-sharded training order with exact global
  * indices and NO global sort).
  *
  * All scoring stays on the µ-scaled-integer convention d21/d22
  * established (fixed-point DIV instead of log-likelihood doubles),
  * so every argmax / tercile / rank decision is bit-identical across
  * engines; e20's FP margins are folded left-to-right over
  * identically-ordered top-k arrays on both sides.
  */
object Round13Queries {

  private val Scale = 1000000L
  /** d15's Knuth multiplicative hash (Round5Queries): id reduced mod
    * 2^20 BEFORE the multiply so the product never wraps.
    */
  private val HashMod = 1L << 20
  private val MixHashSql = s"((doc_id % ${HashMod}) * 2654435761) % ${HashMod}"

  /** The e20 pipeline with a caller-chosen blocking model — shared by
    * the registered query (VectorQueries.model) and the scale smoke,
    * which scales numHashTables with the corpus to pin pair-volume /
    * shuffle linearity. `docs` needs (doc_id, lang); `embs`
    * (vec_id, embedding). See the e20 entry below for semantics.
    */
  def bitextMargin(docs: org.apache.spark.sql.DataFrame,
      embs: org.apache.spark.sql.DataFrame,
      model: graft.lsh.LshModel): org.apache.spark.sql.DataFrame = {
    val de = docs
      .join(embs, col("doc_id") === col("vec_id"))
      .withColumn("bucket", model.bucketCol(col("embedding")))
    val src = de.where(col("lang") === "en")
      .select(col("doc_id").as("x"), col("bucket").as("xbucket"),
        col("embedding").as("ex"))
      .withColumn("xsalt", explode(sequence(lit(0), lit(3))))
    val tgt = de.where(col("lang") === "fr")
      .select(col("doc_id").as("y"), col("bucket").as("ybucket"),
        col("embedding").as("ey"))
      .withColumn("ysalt", pmod(col("y"), lit(4)).cast("int"))
    // bucket equi-join, salted x4 (e17's shape): never a cartesian,
    // never materialized — fwd and bwd each recompute the join
    val pairs = tgt.join(src.hint("shuffle_hash"),
        col("xbucket") === col("ybucket") && col("xsalt") === col("ysalt"))
      .select(col("x"), col("y"),
        VF.cosine(col("ex"), col("ey")).as("cos"))
    val fwd = pairs.groupBy("x")
      .agg(TopKAgg(col("y"), negate(col("cos")), 4).as("topk"))
      .select(col("x"), col("topk"),
        (expr("aggregate(topk, 0D, (acc, e) -> acc + (-e._2))") /
          size(col("topk")).cast("double")).as("nn_x"))
    val bwd = pairs.groupBy("y")
      .agg(TopKAgg(col("x"), negate(col("cos")), 4).as("topk"))
      .select(col("y"),
        (expr("aggregate(topk, 0D, (acc, e) -> acc + (-e._2))") /
          size(col("topk")).cast("double")).as("nn_y"))
    val cand = fwd
      .select(col("x"), col("nn_x"), explode(col("topk")).as("e"))
      .select(col("x"), col("nn_x"),
        col("e._1").as("y"), negate(col("e._2")).as("cos"))
    val marg = cand.join(bwd, "y")
      .withColumn("margin",
        round(col("cos") / ((col("nn_x") + col("nn_y")) / 2), 6))
    val best = Window.partitionBy("x")
      .orderBy(col("margin").desc, col("y"))
    marg.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("x").as("doc_en"), col("y").as("doc_fr"),
        col("margin"))
      .orderBy("doc_en")
  }

  val all: Seq[Q] = Seq(

    // D27 — trained Naive-Bayes-family language classifier: the
    // fastText-classifier slot of an LLM data pipeline (langid /
    // quality gates trained on a labeled slice, applied to the rest).
    // Train on doc_id % 3 != 0 (hashed-word counts per class),
    // classify the held-out third, report prediction + correctness.
    // Scoring is the d22 integer surrogate — per-token smoothed
    // class likelihood in µ-units, summed per (doc, class); within a
    // doc every class sees the same token count, so the integer SUM
    // argmax equals the mean-likelihood argmax, and the winner is
    // engine-exact by construction (BIGINT compare + class-name
    // tiebreak), never an FP log-sum race. On this synthetic corpus
    // the five languages share one vocabulary, so accuracy is
    // near-chance — the `correct` column makes that visible; the
    // operator under test is the train/score plumbing.
    // At 100 TB: count tables are vocabulary × 5 keyed aggregates
    // (map-side combined); scoring is one equi-join of the exploded
    // held-out tokens against the count LUT (AQE broadcasts it when
    // it fits; never forced), one keyed rollup, and a 5-row-per-doc
    // argmax window — no per-class rescan of the corpus.
    Q("d27_nb_langid",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(TF.wordHashes(col("text"))).as("wh"))
        val train = toks.where(col("doc_id") % 3 =!= 0)
        val cnt = train.groupBy("lang", "wh").agg(count(lit(1)).as("c"))
          .withColumnRenamed("lang", "cls")
        val classes = train.groupBy("lang").agg(count(lit(1)).as("n_c"))
          .withColumnRenamed("lang", "cls")
        val vocab = train.agg(countDistinct("wh").as("v"))
        val perTok = toks.where(col("doc_id") % 3 === 0)
          .crossJoin(broadcast(classes))
          .join(cnt, Seq("cls", "wh"), "left")
          .na.fill(0L, Seq("c"))
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"), col("lang"), col("cls"),
            expr(s"(c + 1L) * ${Scale}L DIV (n_c + v)").as("p_micro"))
        val perClass = perTok.groupBy("doc_id", "lang", "cls")
          .agg(sum("p_micro").as("score_micro"))
        val best = Window.partitionBy("doc_id")
          .orderBy(col("score_micro").desc, col("cls"))
        perClass.withColumn("rn", row_number().over(best))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("cls").as("pred_lang"),
            col("score_micro"),
            (col("cls") === col("lang")).cast("int").as("correct"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
           |  SELECT doc_id, lang, unnest(${TF.wordHashesSql("text")}) AS wh
           |  FROM documents),
           |train AS (SELECT * FROM toks WHERE doc_id % 3 <> 0),
           |cnt AS (SELECT lang AS cls, wh, count(*) AS c
           |        FROM train GROUP BY 1, 2),
           |classes AS (SELECT lang AS cls, count(*) AS n_c
           |            FROM train GROUP BY 1),
           |pt AS (
           |  SELECT h.doc_id, h.lang, classes.cls,
           |    CAST((coalesce(c, 0) + 1) * $Scale AS BIGINT)
           |      // CAST(n_c + (SELECT count(DISTINCT wh) FROM train) AS BIGINT)
           |      AS p_micro
           |  FROM (SELECT * FROM toks WHERE doc_id % 3 = 0) h
           |  CROSS JOIN classes
           |  LEFT JOIN cnt ON cnt.cls = classes.cls AND cnt.wh = h.wh),
           |pc AS (SELECT doc_id, lang, cls,
           |         CAST(sum(p_micro) AS BIGINT) AS score_micro
           |       FROM pt GROUP BY 1, 2, 3),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           |         ORDER BY score_micro DESC, cls) AS rn FROM pc)
           |SELECT doc_id, lang, cls AS pred_lang, score_micro,
           |  CAST(cls = lang AS INT) AS correct
           |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // D28 — CCNet head/middle/tail buckets: a PER-LANGUAGE bigram LM
    // (d22's add-one-smoothed integer fluency, but conditioned on
    // lang) scores every doc, then each language's docs split into
    // quality terciles at its own exact 1/3 / 2/3 fluency quantiles —
    // CCNet's per-lang perplexity bucketing, the knob LLaMA-style
    // recipes use to keep "head" and sample "middle". The tercile
    // CUTOFFS (not ntile) are what scales: two interpolated quantiles
    // per language from a partial aggregate + a row-local CASE — no
    // per-language global sort of the corpus. Cross-engine exactness:
    // fluency is a µ-int; an interpolated cutoff either lands exactly
    // ON an integer (both engines compute it exactly — small ints are
    // FP-exact) or strictly BETWEEN two integers (where a ±1-ulp
    // engine difference cannot move any integer across it), so the
    // bucket assignment is deterministic without rounding tricks.
    Q("d28_ccnet_buckets",
      (s, d) => {
        val w0 = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            TF.wordHashes(col("text")).as("wh"))
        val bg = w0.where(size(col("wh")) >= 2)
          .select(col("doc_id"), col("lang"),
            explode(expr("transform(sequence(0, size(wh) - 2), " +
              "i -> struct(wh[i] AS a, wh[i + 1] AS b2))")).as("p"))
          .select(col("doc_id"), col("lang"),
            col("p.a").as("a"), col("p.b2").as("b2"))
          .localCheckpoint(true)
        val c2 = bg.groupBy("lang", "a", "b2").agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy("lang", "a").agg(count(lit(1)).as("c1"))
        val vl = w0.select(col("lang"), explode(col("wh")).as("wh"))
          .groupBy("lang").agg(countDistinct("wh").as("v"))
        val lut = c2.join(c1, Seq("lang", "a")).join(broadcast(vl), "lang")
          .select(col("lang"), col("a"), col("b2"),
            expr(s"(c2 + 1L) * ${Scale}L DIV (c1 + v)").as("p_micro"))
        val perDoc = bg.join(lut, Seq("lang", "a", "b2"))
          .groupBy("doc_id", "lang")
          .agg(expr("sum(p_micro) DIV count(1)").as("fluency_micro"))
          .localCheckpoint(true)
        val cuts = perDoc.groupBy("lang").agg(
          percentile(col("fluency_micro").cast("double"), lit(1.0 / 3))
            .as("cut_lo"),
          percentile(col("fluency_micro").cast("double"), lit(2.0 / 3))
            .as("cut_hi"))
        perDoc.join(broadcast(cuts), "lang")
          .select(col("doc_id"), col("lang"), col("fluency_micro"),
            when(col("fluency_micro") >= col("cut_hi"), lit("head"))
              .when(col("fluency_micro") >= col("cut_lo"), lit("middle"))
              .otherwise(lit("tail")).as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w0 AS (
           |  SELECT doc_id, lang, ${TF.wordHashesSql("text")} AS wh
           |  FROM documents),
           |bg AS (
           |  SELECT doc_id, lang, wh[i] AS a, wh[i + 1] AS b2
           |  FROM w0, unnest(range(1, len(wh))) AS u(i)
           |  WHERE len(wh) >= 2),
           |c2 AS (SELECT lang, a, b2, count(*) AS c2 FROM bg GROUP BY 1, 2, 3),
           |c1 AS (SELECT lang, a, count(*) AS c1 FROM bg GROUP BY 1, 2),
           |vl AS (SELECT lang, count(DISTINCT wh) AS v
           |       FROM (SELECT lang, unnest(wh) AS wh FROM w0) GROUP BY 1),
           |lut AS (
           |  SELECT c2.lang, c2.a, c2.b2,
           |    CAST((c2 + 1) * $Scale AS BIGINT) // CAST(c1 + v AS BIGINT)
           |      AS p_micro
           |  FROM c2 JOIN c1 ON c2.lang = c1.lang AND c2.a = c1.a
           |  JOIN vl ON vl.lang = c2.lang),
           |pd AS (
           |  SELECT bg.doc_id, bg.lang,
           |    CAST(sum(p_micro) AS BIGINT) // count(*) AS fluency_micro
           |  FROM bg JOIN lut ON bg.lang = lut.lang AND bg.a = lut.a
           |    AND bg.b2 = lut.b2
           |  GROUP BY 1, 2),
           |cuts AS (
           |  SELECT lang,
           |    quantile_cont(CAST(fluency_micro AS DOUBLE), 1.0/3) AS cut_lo,
           |    quantile_cont(CAST(fluency_micro AS DOUBLE), 2.0/3) AS cut_hi
           |  FROM pd GROUP BY 1)
           |SELECT pd.doc_id, pd.lang, fluency_micro,
           |  CASE WHEN fluency_micro >= cut_hi THEN 'head'
           |       WHEN fluency_micro >= cut_lo THEN 'middle'
           |       ELSE 'tail' END AS bucket
           |FROM pd JOIN cuts ON pd.lang = cuts.lang
           |ORDER BY doc_id""".stripMargin)),

    // E20 — margin-based bitext mining (the CCMatrix / LASER
    // criterion): for each English doc, the best French doc by
    // RATIO margin — cos(x,y) over the mean of the two 4-NN
    // neighborhood similarities — which suppresses "hub" vectors that
    // plain cosine ranks everywhere. The candidate pass is INDEX-
    // ROUTED (the r10 verdict's one remaining all-pairs plan, fixed):
    // pairs are generated by an LSH-bucket EQUI-join (e17's salted
    // kNN-join shape — the en side replicates over 4 salts, the fr
    // side salts by pmod(doc_id, 4), so the low-cardinality bucket
    // key gets 4x the join parallelism), never a crossJoin, and the
    // pair matrix is NEVER materialized: forward (en→fr) and backward
    // (fr→en) 4-NN neighborhoods are two TopKAgg passes over the
    // recomputed join (map-side partial top-k, no sort shuffle, no
    // O(pairs) checkpoint — recompute beats quadratic storage at any
    // scale). This is exactly how production CCMatrix mines: FAISS-
    // bucketed candidates, margins over the retrieved neighborhoods —
    // the neighborhoods are DEFINED by the index's candidate set, so
    // the oracle replays the same bucket formula (model.bucketSql,
    // the v5/e17 convention) and the result is engine-exact, not
    // approximately-recalled. An x (or y) with no counterpart in its
    // bucket has no neighborhood and drops out, as in any blocked
    // miner. Neighborhood means fold left-to-right over identically
    // sorted top-k arrays on both engines, so the margin doubles are
    // bit-identical, and the per-x winner is chosen on the ROUNDED
    // margin with id tiebreaks. At 100 TB: bucket count scales with
    // the corpus (numHashTables is the knob), pair volume is
    // sum_b |en_b|x|fr_b| ~ n^2/B held linear by B ~ n, and the join
    // is shuffle-partitioned on (bucket, salt) — the
    // PlanAuditSpec-pinned no-cartesian shape.
    Q("e20_bitext_margin",
      (s, d) => bitextMargin(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Tables.embeddings(s, d), VectorQueries.model),
      Some(s"""WITH de AS (
           |  SELECT doc_id, lang, embedding,
           |    ${VectorQueries.model.bucketSql("embedding")} AS bucket
           |  FROM documents d
           |  JOIN embeddings e ON d.doc_id = e.vec_id),
           |pairs AS (
           |  SELECT s.doc_id AS x, t.doc_id AS y,
           |    ${DuckSql.cosine("s.embedding", "t.embedding")} AS cos
           |  FROM de s JOIN de t ON s.bucket = t.bucket
           |  WHERE s.lang = 'en' AND t.lang = 'fr'),
           |frk AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x
           |          ORDER BY cos DESC, y) AS rk FROM pairs),
           |brk AS (SELECT x, y, cos, row_number() OVER (PARTITION BY y
           |          ORDER BY cos DESC, x) AS rk FROM pairs),
           |fnn AS (
           |  SELECT x, list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list(cos ORDER BY rk)), (a, b) -> a + b) / count(*) AS nn_x
           |  FROM frk WHERE rk <= 4 GROUP BY x),
           |bnn AS (
           |  SELECT y, list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list(cos ORDER BY rk)), (a, b) -> a + b) / count(*) AS nn_y
           |  FROM brk WHERE rk <= 4 GROUP BY y),
           |marg AS (
           |  SELECT frk.x, frk.y,
           |    round(frk.cos / ((nn_x + nn_y) / 2), 6) AS margin
           |  FROM frk JOIN fnn ON frk.x = fnn.x JOIN bnn ON frk.y = bnn.y
           |  WHERE frk.rk <= 4),
           |best AS (SELECT *, row_number() OVER (PARTITION BY x
           |           ORDER BY margin DESC, y) AS rn FROM marg)
           |SELECT x AS doc_en, y AS doc_fr, margin
           |FROM best WHERE rn = 1 ORDER BY doc_en""".stripMargin)),

    // P18 — deterministic global training-order shuffle WITHOUT a
    // global sort: the "shuffle the corpus before packing" step every
    // pretraining run needs, in the only shape that survives 100 TB.
    // Each doc hashes to one of 8 shards (d15's Knuth hash — the
    // shard count scales to cluster parallelism); ranks are
    // per-shard window sorts (each shard sorts independently — no
    // single-partition row_number over the corpus), and exact global
    // indices come from adding per-shard cumulative offsets (an
    // 8-row broadcast). The oracle proves the decomposition: offset +
    // local rank must equal the row_number of the naive global
    // (shard, h, doc_id) sort.
    Q("p18_global_shuffle_index",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"))
          .withColumn("h",
            ((col("doc_id") % lit(HashMod)) * lit(2654435761L)) % lit(HashMod))
          .withColumn("shard", (col("h") % 8).cast("int"))
        val local = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
        val ranked = base
          .withColumn("local_ix", row_number().over(local).cast("long") - 1L)
        val offW = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = base.groupBy("shard").agg(count(lit(1)).as("n"))
          .withColumn("offset", coalesce(sum("n").over(offW), lit(0L)))
          .select(col("shard"), col("offset"))
        ranked.join(broadcast(offs), "shard")
          .select(col("doc_id"), col("shard"),
            (col("offset") + col("local_ix")).as("global_ix"))
          .orderBy("global_ix")
      },
      Some(s"""WITH b AS (
           |  SELECT doc_id, $MixHashSql AS h FROM documents)
           |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
           |  CAST(row_number() OVER (ORDER BY h % 8, h, doc_id) AS BIGINT) - 1
           |    AS global_ix
           |FROM b ORDER BY global_ix""".stripMargin)),

    // E21 — Matryoshka (MRL) prefix-dimension adaptive retrieval: a
    // coarse pass ranks the corpus by cosine over the FIRST 16 of 64
    // dimensions (matryoshka-trained embeddings front-load
    // information, so the prefix is itself a valid low-rank
    // embedding), keeps the top-50, and only those 50 pay the
    // full-dimension exact re-rank — the funnel that cuts the scan's
    // byte cost 4× (in a columnar layout the prefix is materialized
    // as its own column, so the coarse pass never touches the tail
    // dims; the same idea as QuantIndex's code-column scans, with
    // rank-truncation instead of quantization error). Both passes are
    // TakeOrderedAndProject (per-partition heaps, no shuffle — the
    // ZeroShuffleSpec family shape). Deterministic: both engines fold
    // the same doubles in the same order, ties broken by vec_id.
    Q("e21_matryoshka_prefix",
      (s, d) => {
        val q = VectorQueries.qvec(s, d, 0)
        val coarse = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .withColumn("cp",
            VF.cosine(slice(col("embedding"), 1, 16), typedLit(q.take(16))))
          .orderBy(col("cp").desc, col("vec_id")).limit(50)
        coarse
          .withColumn("cos_full", VF.cosine(col("embedding"), typedLit(q)))
          .orderBy(col("cos_full").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), round(col("cos_full"), 6).as("cos"))
      },
      Some(s"""WITH q AS (
           |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |coarse AS (
           |  SELECT e.vec_id, e.embedding,
           |    ${DuckSql.cosine("e.embedding[1:16]", "q.qe[1:16]")} AS cp
           |  FROM embeddings e, q
           |  ORDER BY cp DESC, vec_id LIMIT 50)
           |SELECT c.vec_id,
           |  round(${DuckSql.cosine("c.embedding", "q.qe")}, 6) AS cos
           |FROM coarse c, q
           |ORDER BY ${DuckSql.cosine("c.embedding", "q.qe")} DESC, c.vec_id
           |LIMIT 10""".stripMargin)),

    // S25 — streaming near-dup INGEST GATE: the online form of
    // m1/m3 — new documents arriving on a stream are checked against
    // the already-ingested corpus's MinHash band index (built once,
    // checkpointed) and routed dup/unique after EXACT shingle-Jaccard
    // verification (t = 0.2 as the integer cross-multiply
    // 6·|A∩B| >= |A|+|B|, never an FP threshold). Candidates per
    // micro-batch are an equi-join of the batch's bands against the
    // corpus band table — at 100 TB that table is a PERSISTED
    // bucketed-by-band layout (the VectorStore pattern), so each
    // batch probes only matching buckets; candidate volume follows
    // the m1 S-curve, and verification touches only candidate pairs.
    // The corpus here is doc_id % 4 != 0; the stream delivers the
    // rest in two files (two micro-batches). Per-doc routing is
    // batch-invariant (each new doc is judged only against the static
    // corpus), so the oracle is the batch replay of the same bands +
    // verify, and rerouting under a different micro-batch split
    // cannot change results.
    Q("s25_stream_neardup_gate",
      (s, d) => {
        import org.apache.spark.sql.DataFrame
        val docs = Tables.documents(s, d)
        def shingled(df: DataFrame): DataFrame = df
          .withColumn("wh", TF.wordHashes(col("text")))
          .where(size(col("wh")) >= 3)
          .select(col("doc_id"),
            array_distinct(TF.shingleHashes(col("text"))).as("sh"))
        def bandsOf(df: DataFrame): DataFrame = {
          val sig = df.select(col("doc_id") +:
            (0 until 8).map(j => array_min(transform(col("sh"),
              x => TextQueries.mhHash(j, x))).as(s"mh$j")): _*)
          sig.select(col("doc_id"),
            explode(array((0 until TextQueries.Bands).map(bi =>
              struct(lit(bi).as("band_idx"),
                (col(s"mh${2 * bi}") * TF.P + col(s"mh${2 * bi + 1}"))
                  .as("bv"))): _*)).as("b"))
            .select(col("doc_id"), col("b.band_idx"), col("b.bv"))
        }
        val corpusSh = shingled(docs.where(col("doc_id") % 4 =!= 0))
          .localCheckpoint(true)
        val corpusBands = bandsOf(corpusSh)
          .select(col("doc_id").as("cid"), col("band_idx"), col("bv"))
          .localCheckpoint(true)

        val srcDir = graft.util.TempDirs.create("graft_s25_src")
        val outDir = graft.util.TempDirs.create("graft_s25_out").toString
        val ckpt = graft.util.TempDirs.create("graft_s25_ckpt").toString
        docs.where(col("doc_id") % 4 === 0)
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(srcDir.toString)
        val schema = s.read.parquet(srcDir.toString).schema
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val bsh = shingled(batch).persist()
            val cand = bandsOf(bsh)
              .select(col("doc_id").as("nid"), col("band_idx"), col("bv"))
              .join(corpusBands, Seq("band_idx", "bv"))
              .select("nid", "cid").distinct()
            val ver = cand
              .join(bsh.select(col("doc_id").as("nid"), col("sh").as("sh_n")),
                "nid")
              .join(corpusSh.select(col("doc_id").as("cid"),
                col("sh").as("sh_c")), "cid")
              .withColumn("inter",
                size(array_intersect(col("sh_n"), col("sh_c"))).cast("long"))
              .where(col("inter") * 6 >=
                (size(col("sh_n")) + size(col("sh_c"))).cast("long"))
              .groupBy("nid").agg(count(lit(1)).as("n_dups"))
            bsh.select(col("doc_id"))
              .join(ver.withColumnRenamed("nid", "doc_id"), Seq("doc_id"),
                "left")
              .na.fill(0L, Seq("n_dups"))
              .select(col("doc_id"),
                when(col("n_dups") > 0, lit("dup")).otherwise(lit("unique"))
                  .as("sink"),
                col("n_dups"))
              .write.mode("append").parquet(outDir)
            bsh.unpersist()
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.read.parquet(outDir).orderBy("doc_id")
      },
      Some({
        val mhCols = (0 until 8).map(j =>
          "list_min(list_transform(shs, x -> " +
            TextQueries.mhHashSql(j, "x") + s")) AS mh$j")
          .mkString(",\n        ")
        val bandRows = (0 until TextQueries.Bands).map(bi =>
          s"SELECT doc_id, $bi AS band_idx, " +
            s"mh${2 * bi}*${TF.P} + mh${2 * bi + 1} AS bv FROM sig")
          .mkString("\n  UNION ALL ")
        s"""WITH wh AS (
           |  SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents),
           |sh AS (SELECT doc_id, list_distinct(${TextQueries.shingleHashesSql})
           |         AS shs FROM wh WHERE len(wh) >= 3),
           |sig AS (SELECT doc_id,
           |        $mhCols
           |        FROM sh),
           |bands AS (
           |  $bandRows),
           |cand AS (
           |  SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid
           |  FROM bands n JOIN bands c
           |    ON n.band_idx = c.band_idx AND n.bv = c.bv
           |  WHERE n.doc_id % 4 = 0 AND c.doc_id % 4 <> 0),
           |ver AS (
           |  SELECT nid, CAST(count(*) AS BIGINT) AS n_dups
           |  FROM cand JOIN sh a ON a.doc_id = nid JOIN sh b ON b.doc_id = cid
           |  WHERE 6 * len(list_intersect(a.shs, b.shs))
           |          >= len(a.shs) + len(b.shs)
           |  GROUP BY 1)
           |SELECT s.doc_id,
           |  CASE WHEN coalesce(n_dups, 0) > 0 THEN 'dup' ELSE 'unique' END
           |    AS sink,
           |  CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups
           |FROM sh s LEFT JOIN ver ON s.doc_id = ver.nid
           |WHERE s.doc_id % 4 = 0
           |ORDER BY doc_id""".stripMargin
      }),
      streaming = true)
  )
}
