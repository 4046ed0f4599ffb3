package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{DuckSql, VectorFunctions => VF}

/** Round-9 queries: an LSH index-quality audit (the measurement the
  * reference's `performance_analysis.py` never takes — per-bucket
  * recall), BM25 relevance ranking (the classic retrieval scorer on
  * top of the corpus-statistics shapes p3 pioneered), BFS shortest
  * paths (frontier expansion — the graph primitive pagerank/triangle
  * counting don't cover), and distributed BPE tokenizer training (the
  * canonical subword-vocabulary algorithm of every modern LLM data
  * pipeline, with a DuckDB oracle that independently replays the whole
  * training loop — no injected literals).
  */
object Round9Queries {

  import VectorQueries.model

  /** Lowercase alpha word stream of the corpus — the shared
    * tokenization of p15/p16/p17/s24 (one definition so the BPE
    * cache's train/encode consistency cannot drift), with optional
    * extra columns carried through.
    */
  private def alphaWords(docs: DataFrame, as: String,
      carry: String*): DataFrame =
    docs
      .select(carry.map(col) :+ explode(split(col("text"), " ")).as("t"): _*)
      .select(carry.map(col) :+ lower(col("t")).as(as): _*)
      .where(col(as).rlike("^[a-z]+$"))

  // ------------------------------------------------------------- p15

  /** One greedy BPE merge of pair (l, r) over the tokenized word-type
    * table, as ONE row-local fold expression (r15 optimization; the
    * relational posexplode → three windows → re-assemble form it
    * replaces cost ~3 exchanges per merge step and is kept as the
    * spec-pinned reference, [[applyMergeRelational]]). Greedy
    * left-to-right semantics, identical by the fold invariant: scan
    * tokens left to right; a token merges with the accumulator's last
    * token when that last token is `l`, the current is `r`, and the
    * last token was not itself just produced by a merge (the `jm`
    * flag — the "token after a merged position is consumed" rule;
    * within an l == r run this alternates positions from the run head,
    * exactly the windowed form's sel rule). A merged token can never
    * re-match as a LEFT side in the same pass: it equals l + r, which
    * is strictly longer than l. Row-local ⇒ zero shuffles, zero
    * explode — at 100 TB a merge step is a projection over the type
    * table instead of 3 window exchanges of the exploded tokens.
    */
  private def applyMerge(types: DataFrame, l: String, r: String): DataFrame = {
    val lLit = lit(l); val rLit = lit(r); val lr = lit(l + r)
    types.withColumn("toks",
      aggregate(col("toks"),
        struct(array().cast("array<string>").as("arr"),
          lit(false).as("jm")),
        (acc, t) => {
          val arr = acc.getField("arr")
          val jm = acc.getField("jm")
          val canMerge = !jm && size(arr) > 0 &&
            element_at(arr, -1) === lLit && (t === rLit)
          struct(
            when(canMerge,
              concat(slice(arr, lit(1), size(arr) - 1), array(lr)))
              .otherwise(concat(arr, array(t))).as("arr"),
            canMerge.as("jm"))
        },
        acc => acc.getField("arr")))
  }

  /** The pre-r15 relational merge (posexplode → three windows →
    * re-assemble), kept as the equivalence reference for
    * Round9Spec's fold-vs-windows pin. Semantics: within each maximal
    * run of consecutive match positions (runs longer than 1 occur only
    * when l == r), alternate positions starting at the run head merge;
    * the token after a merged position is consumed.
    */
  private[graft] def applyMergeRelational(types: DataFrame, l: String,
      r: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = types
      .select(col("word"), col("n"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("word"), col("n"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))
    val w = Window.partitionBy("word").orderBy("pos")
    val runW = Window.partitionBy("word", "mt").orderBy("pos")
    val m = ex.withColumn("mt",
      when(col("tok") === l && lead(col("tok"), 1).over(w) === r, 1).otherwise(0))
    val g = m.withColumn("run",
      when(col("mt") === 1, col("pos") - row_number().over(runW)))
    val selW = Window.partitionBy("word", "run")
    val sel = g.withColumn("sel",
      when(col("mt") === 1 &&
        (col("pos") - min(col("pos")).over(selW)) % 2 === 0, 1).otherwise(0))
    sel
      .withColumn("tok2",
        when(col("sel") === 1, lit(l + r))
          .when(lag(col("sel"), 1).over(w) === 1, lit(null))
          .otherwise(col("tok")))
      .where(col("tok2").isNotNull)
      .groupBy("word", "n")
      .agg(expr("transform(array_sort(collect_list(struct(pos, tok2))), x -> x.tok2)")
        .as("toks"))
  }

  /** Spec hook for the greedy-merge kernel. */
  private[graft] def testApplyMerge(types: DataFrame, l: String, r: String): DataFrame =
    applyMerge(types, l, r)

  /** BPE training, computed once per (session, sf dir) and shared by
    * p15 (the merge table) and p16 (corpus encoding): returns the
    * learned merges and the word-type table with its final token
    * split, localCheckpoint'ed (the vocabulary is small by
    * construction, so pinning it for the session is the same
    * trade-off the m4 cluster cache makes).
    *
    * Cache key includes the session's identity hash, not just the
    * applicationId: the cached DataFrame is bound to the creating
    * SparkSession, and two sessions in one app (newSession(), tests)
    * must not share it. Accepted for the single-process harness (the
    * m4Cache trade-off): identity hashes can collide across sessions,
    * and entries keyed to dead sessions are never evicted — a weak map
    * would not help because the cached DataFrame strongly references
    * its session, so the value pins the key. A long-lived multi-tenant
    * service would key on an explicit session-close callback instead.
    * Bench note: whichever of p15/p16/s24 runs
    * first in a process pays the full 8-merge training; the committed
    * bench runs them in registry order (p15 first), so p16/s24 numbers
    * are encode-only — documented in BASELINE.md's round-9 table.
    */
  private val bpeCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[(Int, String, String, String, Long)], DataFrame)]

  private def trainedBpe(s: org.apache.spark.sql.SparkSession, d: String)
      : (Seq[(Int, String, String, String, Long)], DataFrame) =
    bpeCache.getOrElseUpdate(
      s"${s.sparkContext.applicationId}|${System.identityHashCode(s)}|$d", {
      var types = alphaWords(Tables.documents(s, d), "word")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .withColumn("toks",
          expr("transform(sequence(1, length(word), 1), i -> substring(word, i, 1))"))
        .localCheckpoint(true)
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= 8 && !exhausted) {
        // headOption: if a (tiny) corpus runs out of adjacent pairs
        // before K merges, training stops early — the oracle's replay
        // emits the same truncated merge list (its argmax CTE is empty
        // from the same step on, and ex's LEFT JOIN passes the type
        // table through unchanged, so the encode oracle stays aligned
        // too). The shipped corpora never exhaust.
        val best = types.where(size(col("toks")) > 1)
          .select(col("n"),
            explode(arrays_zip(
              expr("slice(toks, 1, size(toks) - 1)").as("l"),
              expr("slice(toks, 2, size(toks) - 1)").as("r"))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"), col("n"))
          .groupBy("l", "r").agg(sum("n").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
          .collect().headOption
        best match {
          case Some(row) =>
            val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
            merges += ((step, l, r, l + r, c))
            // checkpoint per step: the fold is an interpreted HOF, so
            // leaving steps lazy makes step m's argmax replay m−1
            // folds (measured +0.7 s over 8 steps) — materializing
            // each step keeps every fold evaluated exactly once
            types = applyMerge(types, l, r).localCheckpoint(true)
            step += 1
          case None => exhausted = true
        }
      }
      (merges.result(), types)
    })

  /** Machine-generated DuckDB replay of the full K-step BPE training:
    * each step recounts pairs, picks its own argmax (count DESC, then
    * lexicographic — the deterministic tie rule both engines share),
    * and applies the same windowed greedy merge. A fully independent
    * oracle — nothing trained in Spark is injected.
    */
  private def bpeOracleSql(k: Int): String = {
    val t0 = """t0 AS (
      |  SELECT word, n, list_transform(range(1, len(word)+1), i -> word[i]) AS toks
      |  FROM (SELECT lower(t) AS word, CAST(count(*) AS BIGINT) AS n
      |        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents) u
      |        WHERE regexp_matches(lower(t), '^[a-z]+$') GROUP BY 1))""".stripMargin
    val steps = (1 to k).map { i =>
      val p = i - 1
      s"""p$i AS (
         |  SELECT l, r, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |    SELECT n, unnest(toks[1:len(toks)-1]) AS l, unnest(toks[2:len(toks)]) AS r
         |    FROM t$p WHERE len(toks) > 1) z
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |ex$i AS (
         |  SELECT word, n, pos, tok, b.l AS bl, b.r AS br,
         |    CASE WHEN tok = b.l AND
         |      lead(tok) OVER (PARTITION BY word ORDER BY pos) = b.r
         |      THEN 1 ELSE 0 END AS mt
         |  FROM (SELECT word, n, unnest(toks) AS tok,
         |        unnest(range(1, len(toks)+1)) AS pos FROM t$p) e
         |  LEFT JOIN b$i b ON TRUE),
         |g$i AS (
         |  SELECT *, CASE WHEN mt = 1 THEN pos - row_number() OVER
         |      (PARTITION BY word, mt ORDER BY pos) ELSE NULL END AS run
         |  FROM ex$i),
         |s$i AS (
         |  SELECT *, CASE WHEN mt = 1 AND
         |      (pos - min(pos) OVER (PARTITION BY word, run)) % 2 = 0
         |    THEN 1 ELSE 0 END AS sel
         |  FROM g$i),
         |rr$i AS (
         |  SELECT word, n, pos,
         |    CASE WHEN sel = 1 THEN bl || br
         |         WHEN lag(sel) OVER (PARTITION BY word ORDER BY pos) = 1 THEN NULL
         |         ELSE tok END AS tok2
         |  FROM s$i),
         |t$i AS (
         |  SELECT word, n, list(tok2 ORDER BY pos) AS toks
         |  FROM rr$i WHERE tok2 IS NOT NULL GROUP BY word, n)""".stripMargin
    }
    val finals = (1 to k).map { i =>
      s"SELECT CAST($i AS INTEGER) AS step, l AS lhs, r AS rhs, " +
        s"l || r AS merged, cnt AS pair_n FROM b$i"
    }.mkString(" UNION ALL ")
    (Seq(t0) ++ steps).mkString("WITH ", ",\n", "\n") +
      s"SELECT * FROM ($finals) zz ORDER BY step"
  }

  /** p16's oracle: the same training replay, then the corpus encoded
    * against the final type table t_k.
    */
  private def bpeEncodeOracleSql(k: Int): String = {
    val train = bpeOracleSql(k)
    val upToWith = train.substring(0, train.lastIndexOf("\nSELECT"))
    s"""$upToWith,
       |enc AS (
       |  SELECT lang, lower(t) AS word FROM (
       |    SELECT lang, unnest(string_split(text, ' ')) AS t
       |    FROM documents) u
       |  WHERE regexp_matches(lower(t), '^[a-z]+$$')),
       |wl AS (SELECT word, CAST(len(toks) AS BIGINT) AS n_sub FROM t$k)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subtokens,
       |  round(CAST(sum(n_sub) AS DOUBLE) / count(*), 6)
       |    AS avg_tokens_per_word
       |FROM enc JOIN wl USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------------------------------------------- d25

  private[queries] val Bm25Terms = Seq("vector", "merge", "window")

  val all: Seq[Q] = Seq(

    // M8 — LSH index-quality audit: per-bucket population plus
    // measured 1-probe recall@10 (for query vecs 0–9, the fraction of
    // exact top-10 neighbors — self excluded — that share the query's
    // bucket). The reference analyzes shard-size balance only
    // (`performance_analysis.py:186-237` analyze_shard_distribution);
    // recall — whether the hash family still routes neighbors
    // together as the corpus drifts — is the metric an operator
    // actually pages on, and it never measures it.
    // Scale shape: buckets are computed ONCE (native codegen
    // expression, no shuffle) and materialized — the audit's four
    // consumers (query panel, candidate scan, join-back, sizes) then
    // read the bucketed corpus, exactly as the production audit reads
    // the already-bucketed persisted store rather than re-hashing.
    // Per-query exact top-10 via the partial-aggregated TopKAgg (e5's
    // shape — NOT a corpus-wide window sort), then a 100-row join
    // back to bucket ids that AQE broadcasts. Oracle recomputes the
    // bucket formula from the seeded projection matrix as literals.
    Q("m8_lsh_audit",
      (s, d) => {
        val b = Tables.embeddings(s, d)
          .withColumn("bucket", model.bucketCol(col("embedding")))
          .localCheckpoint(true)
        val qs = b.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("bucket").as("qbucket"),
            col("embedding").as("qe"))
        val top = b.crossJoin(broadcast(qs))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("qbucket"), col("vec_id"),
            VF.l2sq(col("embedding"), col("qe")).as("dd"))
          .groupBy("qid", "qbucket")
          .agg(graft.functions.TopKAgg(col("vec_id"), col("dd"), 10).as("topk"))
          .select(col("qid"), col("qbucket"), explode(col("topk")).as("e"))
          .select(col("qid"), col("qbucket"), col("e._1").as("nid"))
        val hits = top.join(
          b.select(col("vec_id").as("nid"), col("bucket").as("nbucket")), "nid")
        val sizes = b.groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        val rec = hits.groupBy("qbucket").agg(
          countDistinct("qid").as("nq"),
          sum(when(col("nbucket") === col("qbucket"), 1L).otherwise(0L)).as("nh"))
        sizes.join(rec, col("bucket") === col("qbucket"), "left")
          .select(col("bucket"), col("n_vecs"),
            coalesce(col("nq"), lit(0L)).as("n_queries"),
            coalesce(col("nh"), lit(0L)).as("n_hits"))
          .withColumn("recall_1probe",
            when(col("n_queries") === 0, lit(0.0))
              .otherwise(round(col("n_hits") / (col("n_queries") * lit(10.0)), 6)))
          .orderBy("bucket")
      },
      Some(s"""WITH b AS (
           |  SELECT vec_id, embedding, ${model.bucketSql("embedding")} AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id AS qid, bucket AS qbucket, embedding AS qe
           |      FROM b WHERE vec_id < 10),
           |top AS (
           |  SELECT qid, qbucket, vec_id FROM (
           |    SELECT q.qid, q.qbucket, b.vec_id,
           |      row_number() OVER (PARTITION BY q.qid
           |        ORDER BY ${DuckSql.l2sq("b.embedding", "q.qe")}, b.vec_id) AS rk
           |    FROM b, q WHERE b.vec_id <> q.qid) z
           |  WHERE rk <= 10),
           |hits AS (
           |  SELECT t.qid, t.qbucket, bb.bucket AS nbucket
           |  FROM top t JOIN b bb ON t.vec_id = bb.vec_id),
           |sizes AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
           |          FROM b GROUP BY 1),
           |rec AS (
           |  SELECT qbucket, CAST(count(DISTINCT qid) AS BIGINT) AS nq,
           |    CAST(sum(CASE WHEN nbucket = qbucket THEN 1 ELSE 0 END)
           |         AS BIGINT) AS nh
           |  FROM hits GROUP BY 1)
           |SELECT s.bucket, s.n_vecs,
           |  coalesce(r.nq, 0) AS n_queries, coalesce(r.nh, 0) AS n_hits,
           |  CASE WHEN coalesce(r.nq, 0) = 0 THEN 0.0e0
           |       ELSE round(coalesce(r.nh, 0) / (coalesce(r.nq, 0) * 10.0e0), 6)
           |  END AS recall_1probe
           |FROM sizes s LEFT JOIN rec r ON r.qbucket = s.bucket
           |ORDER BY s.bucket""".stripMargin)),

    // D25 — BM25 ranking (k1 = 1.2, b = 0.75) for a 3-term query over
    // the documents corpus. The retrieval-side twin of p3's TF-IDF:
    // idf uses the Robertson–Sparck-Jones (+1) form, the tf saturation
    // denominator carries the length normalization. Scale shape: the
    // term filter lands BEFORE the tf groupBy, so only the 3 query
    // terms' postings ever shuffle — corpus scan once, shuffle
    // O(matching docs); N/avgdl is a 1-row broadcast. Per-term scores
    // round→DECIMAL before the per-doc sum so the 3-way addition is
    // order-independent and engine-exact.
    Q("d25_bm25",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dl = docs.select(col("doc_id"),
          size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .where(col("term").isInCollection(Bm25Terms))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(df, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
          .withColumn("tscore",
            round(
              log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
                (col("tf") * 2.2) /
                (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
              6).cast(DecimalType(18, 6)))
          .groupBy("doc_id").agg(sum("tscore").as("sd"))
          .select(col("doc_id"), col("sd").cast("double").as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(15)
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
           |  WHERE term IN (${Bm25Terms.map("'" + _ + "'").mkString(", ")})
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
           |  JOIN dl ON tf.doc_id = dl.doc_id, stats s)
           |SELECT doc_id, CAST(sum(tscore) AS DOUBLE) AS bm25
           |FROM scored GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin)),

    // R80 — BFS shortest paths, 4 levels, from the lowest part key of
    // r78's 1995 co-purchase graph; output is nodes-per-distance (the
    // reachability profile). Scale shape: classic frontier expansion —
    // per level ONE equi-join of the (small) frontier to the
    // checkpointed edge list + a distinct + an anti-join against the
    // visited set; no path enumeration ever materializes (the oracle's
    // recursive CTE uses UNION, i.e. set semantics, for the same
    // reason). At 100 TB the edge list would be pre-partitioned by
    // source so every level reuses one shuffle.
    Q("r80_bfs_levels",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .where(to_date(col("l_shipdate")).between("1995-01-01", "1995-12-31"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val a = li.select(col("ok"), col("pk").as("u"))
        val bb = li.select(col("ok").as("ok2"), col("pk").as("v"))
        val eb = a.join(bb, col("ok") === col("ok2") && col("u") < col("v"))
          .select("u", "v").distinct()
        val edges = eb.union(eb.select(col("v").as("u"), col("u").as("v")))
          .localCheckpoint(true)
        var visited = edges.agg(min("u").as("node"))
          .select(col("node"), lit(0).as("dist"))
        var frontier = visited.select("node")
        for (i <- 1 to 4) {
          // Each level's frontier is consumed TWICE downstream (joined
          // to edges as the next frontier AND unioned into visited for
          // every later anti-join), so a lazy plan re-executes level j
          // ~2^(4-j) times. The frontiers are small by construction —
          // checkpoint each so every level's expansion join runs once
          // (r76 keeps its 5 linear levels lazy; BFS's doubling
          // reference pattern is the case where that trade flips).
          val nxt = frontier.join(edges, col("node") === col("u"))
            .select(col("v").as("node")).distinct()
            .join(visited.select(col("node").as("vn")),
              col("node") === col("vn"), "left_anti")
            .localCheckpoint(true)
          visited = visited.union(nxt.select(col("node"), lit(i).as("dist")))
          frontier = nxt
        }
        visited.groupBy("dist").agg(count(lit(1)).as("n_nodes")).orderBy("dist")
      },
      Some("""WITH li AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
          |  WHERE CAST(l_shipdate AS DATE)
          |    BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
          |eb AS (
          |  SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
          |edges AS (SELECT u, v FROM eb UNION ALL SELECT v, u FROM eb),
          |src AS (SELECT min(u) AS s FROM edges),
          |walk AS (
          |  WITH RECURSIVE w(node, dist) AS (
          |    SELECT s, 0 FROM src
          |    UNION
          |    SELECT e.v, w.dist + 1 FROM w JOIN edges e ON e.u = w.node
          |    WHERE w.dist < 4)
          |  SELECT node, CAST(min(dist) AS INTEGER) AS dist FROM w GROUP BY node)
          |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
          |FROM walk GROUP BY dist ORDER BY dist""".stripMargin)),

    // D26 — edit-distance similarity join with LOSSLESS length
    // blocking: pairs (doc_id < 200) with levenshtein ≤ 100 over the
    // ASCII projection of the text. The projection pins the
    // cross-engine contract: Spark's levenshtein counts code points
    // while DuckDB's counts BYTES, so on printable-ASCII input (where
    // the two coincide) the distances are identical by construction —
    // the semantics a multilingual corpus would need is a declared
    // per-engine choice, not an accident of encoding. Since edit
    // distance ≥ |len(a) − len(b)|, blocking on blk = len div 100 (of
    // the SAME projected text the distance sees) and joining each doc
    // to blocks {blk−1, blk, blk+1} provably loses no qualifying
    // pair — the classic length-filter trick that turns an O(n²)
    // similarity join into an equi-join (the exploded 3-key form
    // keeps it a HASH join — no theta/BNLJ). Spark evaluates the
    // banded threshold form (levenshtein(a, b, t) early-exits at
    // O(t·len) instead of O(len²)) — the compute bound that matters
    // when the blocks hold millions of rows.
    Q("d26_editdist_pairs_cap200",
      (s, d) => {
        val docs = Tables.documents(s, d).where(col("doc_id") < 200)
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^\\x20-\\x7e]", "").as("txt"))
          .withColumn("len", length(col("txt")).cast("long"))
          .withColumn("blk", expr("len div 100"))
          // per-doc printable-ASCII char histogram (computed once per
          // doc, pre-join): feeds the lossless bag-distance prefilter
          // below. txt is exactly the 0x20–0x7e projection, so the 95
          // buckets cover every char the distance sees.
          .withColumn("hist", expr(
            "transform(sequence(32, 126), c -> length(txt) - length(replace(txt, char(c), '')))"))
        // The probe side arrives as ONE scan partition (200 docs, one
        // file), so the broadcast join — and every banded levenshtein
        // above it — ran in a single task (plan-verified: the before
        // plan's streamed side has no exchange). Fan the cheap side
        // out to the session's parallelism so the per-pair DP work
        // uses the machine; scale-adaptive (defaultParallelism), not a
        // constant.
        val a = docs.select(col("doc_id").as("doc_a"), col("txt").as("ta"),
            col("len").as("na"), col("hist").as("ha"),
            explode(array(col("blk") - 1, col("blk"), col("blk") + 1)).as("jblk"))
          .repartition(s.sparkContext.defaultParallelism)
        val b = docs.select(col("doc_id").as("doc_b"), col("txt").as("tb"),
          col("len").as("nb"), col("hist").as("hb"), col("blk"))
        a.join(b,
            col("jblk") === col("blk") && col("doc_a") < col("doc_b") &&
              abs(col("na") - col("nb")) <= 100)
          // LOSSLESS bag-distance prefilter (the multiset lower bound
          // of edit distance): bag(a, b) = max(|A∖B|, |B∖A|) ≤ lev, so
          // bag > 100 ⟹ lev > 100 ⟹ the pair was doomed to the
          // dist = −1 filter anyway — but the bag costs O(95) integer
          // ops per pair where the banded levenshtein costs O(100·len)
          // char ops. At block sizes in the millions this decides by
          // histogram instead of running the DP matrix on every
          // blocked pair (guide §1.2 per-task work; Round9Spec pins
          // bag ≤ lev and prefilter result equality).
          .where(expr(
            """greatest(
              |  aggregate(zip_with(ha, hb, (x, y) -> greatest(x - y, 0)), 0, (acc, x) -> acc + x),
              |  aggregate(zip_with(ha, hb, (x, y) -> greatest(y - x, 0)), 0, (acc, x) -> acc + x)
              |) <= 100""".stripMargin))
          .withColumn("dist", expr("levenshtein(ta, tb, 100)"))
          .where(col("dist") =!= -1)
          .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH d AS (
          |  SELECT doc_id, txt, strlen(txt) AS len, strlen(txt) // 100 AS blk
          |  FROM (SELECT doc_id,
          |          regexp_replace(text, '[^\x20-\x7e]', '', 'g') AS txt
          |        FROM documents WHERE doc_id < 200) z)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  CAST(levenshtein(a.txt, b.txt) AS BIGINT) AS dist
          |FROM d a JOIN d b
          |  ON a.doc_id < b.doc_id AND abs(a.blk - b.blk) <= 1
          |  AND abs(a.len - b.len) <= 100
          |WHERE levenshtein(a.txt, b.txt) <= 100
          |ORDER BY doc_a, doc_b""".stripMargin)),

    // E17 — distributed kNN JOIN: both sides are TABLES (queries =
    // vec_ids 0–49, corpus = all embeddings). At sf0.01 the salted
    // query side is ~200 rows and AQE would happily broadcast it, so
    // the shuffle_hash hint pins the shuffled shape the pattern exists
    // to demonstrate (Round9Spec asserts ShuffledHashJoin in the
    // executed plan). Semantics are deterministic bucket-restricted
    // exact top-3: candidates share the query's LSH bucket, ranked by
    // exact L2. Scale shape: with numHashTables buckets the raw join
    // key is low-cardinality (the LSH skew problem), so the query
    // side replicates across 4 SALTS and the corpus side salts by
    // pmod(vec_id, 4) — join key (bucket, salt) has 4× the
    // parallelism, and TopKAgg's partial/final split merges the
    // per-salt partial top-ks without any extra pass. This is the
    // r19/r77 salting pattern applied to similarity search — the
    // 100 TB-safe form of "for each query row, find its neighbors".
    Q("e17_knn_join",
      (s, d) => {
        val b = Tables.embeddings(s, d)
          .withColumn("bucket", model.bucketCol(col("embedding")))
        val qs = b.where(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("bucket").as("qbucket"),
            col("embedding").as("qe"))
          .withColumn("qsalt", explode(sequence(lit(0), lit(3))))
        val corpus = b.withColumn("salt", pmod(col("vec_id"), lit(4)).cast("int"))
        corpus.join(qs.hint("shuffle_hash"),
            col("bucket") === col("qbucket") && col("salt") === col("qsalt") &&
              col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VF.l2sq(col("embedding"), col("qe")).as("dd"))
          .groupBy("qid")
          .agg(graft.functions.TopKAgg(col("vec_id"), col("dd"), 3).as("topk"))
          .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "e")))
          .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
            col("e._1").as("vec_id"), round(col("e._2"), 6).as("dist"))
          .orderBy("qid", "rank")
      },
      Some(s"""WITH b AS (
           |  SELECT vec_id, embedding, ${model.bucketSql("embedding")} AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id AS qid, bucket AS qbucket, embedding AS qe
           |      FROM b WHERE vec_id < 50),
           |j AS (
           |  SELECT q.qid, b.vec_id, ${DuckSql.l2sq("b.embedding", "q.qe")} AS dd
           |  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.qid),
           |top AS (
           |  SELECT qid, vec_id, dd,
           |    row_number() OVER (PARTITION BY qid ORDER BY dd, vec_id) AS rk
           |  FROM j)
           |SELECT qid, CAST(rk AS INTEGER) AS rank, vec_id, round(dd, 6) AS dist
           |FROM top WHERE rk <= 3 ORDER BY qid, rank""".stripMargin)),

    // R81 — KMV (k-minimum-values) cardinality sketch, k = 128, over
    // o_custkey: keep the 128 smallest values of a seeded
    // multiplicative hash; estimate = (k−1)·M / h_k. Unlike r7/r39's
    // HLL (engine-specific register layout ⇒ rows-only checked), KMV
    // under a FIXED hash is fully deterministic — the estimate itself
    // hash-matches an independent DuckDB replay, upgrading the sketch
    // family to the strong oracle. Scale shape: the sketch is the
    // k-smallest-of-distinct-hashes, i.e. a partial TakeOrdered per
    // partition + a k-item driver merge — mergeable across any
    // partitioning (union of sketches = sketch of union), which is
    // what makes it a sketch and not a sample. Output carries the
    // exact count beside the estimate with its relative error.
    Q("r81_kmv_distinct",
      (s, d) => {
        val M = 1L << 31
        val h = ((col("o_custkey") % M) * lit(2654435761L) + lit(40503L)) % M
        val hs = Tables.orders(s, d).select(h.as("h")).distinct()
        val sketch = hs.orderBy("h").limit(128)
          .agg(count(lit(1)).as("k"), max("h").as("hk"))
        val exact = Tables.orders(s, d)
          .agg(countDistinct("o_custkey").as("n_exact"))
        exact.crossJoin(broadcast(sketch))
          .withColumn("kmv_est", expr(s"((k - 1) * ${M}L) div hk"))
          .select(col("n_exact"), col("k"), col("kmv_est"),
            round(abs(col("kmv_est") - col("n_exact")).cast("double") /
              col("n_exact"), 6).as("rel_err"))
      },
      Some(s"""WITH hs AS (
           |  SELECT DISTINCT ((o_custkey % ${1L << 31}) * 2654435761 + 40503)
           |    % ${1L << 31} AS h
           |  FROM orders),
           |sk AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS hk
           |  FROM (SELECT h FROM hs ORDER BY h LIMIT 128) z),
           |ex AS (
           |  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           |  FROM orders)
           |SELECT ex.n_exact, sk.k, ((sk.k - 1) * ${1L << 31}) // sk.hk AS kmv_est,
           |  round(CAST(abs(((sk.k - 1) * ${1L << 31}) // sk.hk - ex.n_exact)
           |        AS DOUBLE) / ex.n_exact, 6) AS rel_err
           |FROM ex, sk""".stripMargin)),

    // R82 — VARIANT semi-structured access (Spark 4's typed
    // open-schema path, the successor to string-JSON probing):
    // parse_json once into the shredded binary VARIANT, then typed
    // extraction (variant_get with a target type) and the
    // null-not-error miss semantics (try_variant_get on an absent
    // path). At scale this is the difference between re-parsing a
    // JSON string per field access and decoding a binary-shredded
    // value — the r13 get_json_object twin kept for contrast. Oracle
    // uses DuckDB's JSON extraction over the same strings.
    Q("r82_variant_json",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"), expr("parse_json(props)").as("v"))
          // try_variant_get for k too: one malformed/non-integer row
          // degrades to NULL instead of failing the query, matching the
          // oracle's TRY_CAST(json_extract_string(...)) semantics.
          .select(col("event_type"),
            expr("try_variant_get(v, '$.k', 'bigint')").as("k"),
            expr("try_variant_get(v, '$.missing', 'bigint')").as("miss"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("k").as("sum_k"), max("k").as("max_k"),
            count(col("miss")).as("n_miss"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
          |  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
          |    AS BIGINT) AS sum_k,
          |  max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
          |    AS max_k,
          |  CAST(count(json_extract(props, '$.missing')) AS BIGINT) AS n_miss
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P15 — distributed BPE tokenizer training, 8 merges, over the
    // lowercase alpha word types of the corpus. The Sennrich shape:
    // the ONLY corpus-scale operation is the initial word count (one
    // shuffle); the training loop then runs entirely over the
    // word-TYPE table (the vocabulary — orders of magnitude smaller
    // than the corpus at any scale), each step being a pair-count
    // groupBy weighted by type frequency, a 1-row argmax collect (the
    // algorithm's inherent sync point), and a windowed greedy merge.
    // Output: the learned merge table. The oracle replays the entire
    // training independently in DuckDB — argmax, tie rule, greedy
    // merge semantics and all.
    Q("p15_bpe_train",
      (s, d) => {
        val (merges, _) = trainedBpe(s, d)
        val sess = s
        import sess.implicits._
        merges.toDF("step", "lhs", "rhs", "merged", "pair_n")
          .orderBy("step")
      },
      Some(bpeOracleSql(8))),

    // P16 — tokenizer APPLICATION at corpus scale: encode every word
    // occurrence of the corpus with p15's trained vocabulary and
    // report per-language subword statistics (the compression ratio a
    // tokenizer team watches per data source). Scale shape: the
    // vocabulary (word type → final token count) is tiny by
    // construction and BROADCASTS to the corpus-wide word stream —
    // one scan, one broadcast-hash join, one aggregation shuffle;
    // exactly how a production pipeline tokenizes 100 TB. The oracle
    // replays the training AND the encoding independently.
    Q("p16_bpe_encode",
      (s, d) => {
        val (_, types) = trainedBpe(s, d)
        val enc = alphaWords(Tables.documents(s, d), "word", "lang")
        val wl = types.select(col("word"), size(col("toks")).cast("long").as("n_sub"))
        enc.join(broadcast(wl), "word")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subtokens"))
          .withColumn("avg_tokens_per_word",
            round(col("n_subtokens").cast("double") / col("n_words"), 6))
          .orderBy("lang")
      },
      Some(bpeEncodeOracleSql(8))),

    // P17 — Zipf rank–frequency fit by closed-form OLS over SUFFICIENT
    // STATISTICS: slope/intercept/R² of ln(freq) ~ ln(rank) for the
    // top-200 corpus terms. The scale pattern is the point — the fit
    // is five map-side-combinable sums (Σx, Σy, Σxy, Σx², Σy²), the
    // only way regression happens at 100 TB (no solver, no iteration,
    // one aggregation). Determinism: each ln rounds to 6 decimals and
    // sums as DECIMAL (order-independent, engine-exact); the final
    // slope arithmetic runs on the exact sums. Rank itself is a
    // bounded top-200 TakeOrdered, not a global sort.
    Q("p17_zipf_fit",
      (s, d) => {
        val top = alphaWords(Tables.documents(s, d), "term")
          .groupBy("term").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("term")).limit(200)
        val ranked = top.select(col("term"), col("freq"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("freq").desc, col("term"))).cast("long").as("rank"))
        val xy = ranked.select(
          round(log(col("rank").cast("double")), 6).cast(DecimalType(18, 6)).as("x"),
          round(log(col("freq").cast("double")), 6).cast(DecimalType(18, 6)).as("y"))
        // Sums accumulate EXACTLY as decimals; each sufficient
        // statistic then casts to double ONCE (IEEE nearest — the
        // same value in any engine) before the closed-form combine,
        // so no decimal-precision-cap rounding ever differs.
        xy.agg(count(lit(1)).as("nl"),
            sum("x").as("sxd"), sum("y").as("syd"),
            sum(col("x") * col("y")).as("sxyd"),
            sum(col("x") * col("x")).as("sxxd"),
            sum(col("y") * col("y")).as("syyd"))
          .select(col("nl").as("n"),
            col("nl").cast("double").as("nd"),
            col("sxd").cast("double").as("sx"),
            col("syd").cast("double").as("sy"),
            col("sxyd").cast("double").as("sxy"),
            col("sxxd").cast("double").as("sxx"),
            col("syyd").cast("double").as("syy"))
          .select(col("n"),
            round((col("nd") * col("sxy") - col("sx") * col("sy")) /
              (col("nd") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            round((col("sy") -
              ((col("nd") * col("sxy") - col("sx") * col("sy")) /
                (col("nd") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
              col("nd"), 6).as("intercept"),
            round(
              pow(col("nd") * col("sxy") - col("sx") * col("sy"), 2) /
                ((col("nd") * col("sxx") - col("sx") * col("sx")) *
                  (col("nd") * col("syy") - col("sy") * col("sy"))),
              6).as("r2"))
      },
      Some("""WITH tf AS (
          |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
          |    SELECT lower(unnest(string_split(text, ' '))) AS term
          |    FROM documents) u
          |  WHERE regexp_matches(term, '^[a-z]+$')
          |  GROUP BY 1 ORDER BY freq DESC, term LIMIT 200),
          |ranked AS (
          |  SELECT term, freq,
          |    CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
          |  FROM tf),
          |xy AS (
          |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
          |         CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
          |  FROM ranked),
          |ss AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(count(*) AS DOUBLE) AS nd,
          |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
          |         CAST(sum(x * y) AS DOUBLE) AS sxy,
          |         CAST(sum(x * x) AS DOUBLE) AS sxx,
          |         CAST(sum(y * y) AS DOUBLE) AS syy
          |  FROM xy)
          |SELECT n,
          |  round((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6) AS slope,
          |  round((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd,
          |        6) AS intercept,
          |  round(pow(nd * sxy - sx * sy, 2) /
          |        ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS r2
          |FROM ss""".stripMargin)),

    // X25 — DYNAMIC PARTITION PRUNING, plan-pinned: orders staged as a
    // year-partitioned fact table, joined to a tiny year-dimension
    // filtered on a dim ATTRIBUTE (era = 'mid'). The years to scan are
    // only known at runtime — Catalyst injects the broadcast result as
    // a partition filter (dynamicpruningexpression in the scan,
    // asserted by Round9Spec), so the fact scan reads 2 of 7 year
    // directories instead of all of them. This is THE star-schema
    // optimization at 100 TB: the fact side never touches partitions
    // the dimension filter excludes, without the query author naming
    // them. Fixture staged once per (session, sf dir).
    Q("x25_dpp_join",
      (s, d) => {
        val dir = x25Stage(s, d)
        val fact = s.read.parquet(dir)
        val dim = s.range(1992, 1999)
          .select(col("id").cast("int").as("yr"),
            when(col("id").isin(1995L, 1996L), "mid").otherwise("other")
              .as("era"))
        fact.join(broadcast(dim.where(col("era") === "mid")),
            col("oyear") === col("yr"))
          .groupBy("oyear")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
          .orderBy("oyear")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS oyear,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_price
          |FROM orders
          |WHERE year(o_orderdate) IN (1995, 1996)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // X26 — NESTED-SCHEMA PRUNING, plan-pinned: documents staged with
    // a struct payload column, then aggregated by ONE struct field.
    // The parquet reader must push the projection inside the struct
    // (ReadSchema: struct<meta:struct<source>> — asserted in spec) so
    // none of the sibling fields' column chunks are read. At 100 TB
    // the metadata struct of a multimodal corpus is wide (EXIF,
    // provenance, quality signals); reading one signal must not pay
    // for the rest.
    Q("x26_nested_pruning",
      (s, d) => {
        val dir = x26Stage(s, d)
        s.read.parquet(dir)
          .groupBy(col("meta.source").as("source"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // X27 — PARQUET AGGREGATE PUSHDOWN, plan-pinned: COUNT/MIN/MAX
    // answered from parquet FOOTER STATISTICS (PushedAggregation in
    // the scan, spec-asserted) — zero data pages read. At 100 TB,
    // "how many rows / what's the value range" must cost metadata IO,
    // not a table scan. The conf is enabled on an isolated
    // newSession() so the rest of the inventory's plans are
    // untouched; pushdown legality (no filter, non-nested column) is
    // part of what the pin documents.
    Q("x27_agg_pushdown",
      (s, d) => {
        val s2 = x27Session(s)
        s2.read.parquet(s"$d/orders.parquet")
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
      },
      Some("""SELECT count(*) AS n_orders, min(o_totalprice) AS min_price,
          |  max(o_totalprice) AS max_price FROM orders""".stripMargin)),

    // S24 — streaming tokenizer encode: p16's shape under Structured
    // Streaming. The vocabulary is trained ONCE on the static corpus
    // (the frozen-model convention s13/s21/s22 established for
    // LSH/quant stores), then document files stream through a
    // stream-static broadcast join against it, aggregating per-lang
    // subword stats in complete mode. At 100 TB the static side is
    // exactly the artifact a tokenizer service would pin in executor
    // memory while the corpus flows past. Oracle: identical to p16's
    // independent training+encoding replay.
    Q("s24_stream_bpe_encode",
      (s, d) => {
        val (_, types) = trainedBpe(s, d)
        val wl = types.select(col("word"), size(col("toks")).cast("long").as("n_sub"))
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val name = StreamingQueries.freshSinkName(s, "s24_sink")
        val ckpt = graft.util.TempDirs.create("graft_s24_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s24_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/documents.parquet"),
          srcDir.resolve("documents.parquet"))
        val q = alphaWords(
            s.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
            "word", "lang")
          .join(broadcast(wl), "word")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subtokens"))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name)
          .withColumn("avg_tokens_per_word",
            round(col("n_subtokens").cast("double") / col("n_words"), 6))
          .orderBy("lang")
      },
      Some(bpeEncodeOracleSql(8)),
      streaming = true)
  )

  private val s24Id = new java.util.concurrent.atomic.AtomicInteger(0)

  private val D = DecimalType(18, 2)

  /** x25's fixture: orders partitioned by order year, staged once per
    * (session, sf dir).
    */
  private val x25Staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def x25Stage(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    x25Staged.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = graft.util.TempDirs.create("graft_x25").toString
      Tables.orders(s, d)
        .withColumn("oyear", year(col("o_orderdate")))
        .write.partitionBy("oyear").mode("overwrite").parquet(dir)
      dir
    })

  /** x27's isolated pushdown-enabled session, one per application (a
    * fresh newSession per invocation would pay SessionState
    * construction inside every benched run). Pushdown lives in the
    * DSv2 scan builder; parquet sits on the V1 list by default.
    */
  private val x27Sessions = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.SparkSession]

  private def x27Session(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    x27Sessions.getOrElseUpdate(s.sparkContext.applicationId, {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      s2.conf.set("spark.sql.sources.useV1SourceList",
        "avro,csv,json,kafka,orc,text")
      s2
    })

  /** x26's fixture: documents with a struct metadata payload, staged
    * once per (session, sf dir).
    */
  private val x26Staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def x26Stage(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    x26Staged.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = graft.util.TempDirs.create("graft_x26").toString
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .write.mode("overwrite").parquet(dir)
      dir
    })
}
