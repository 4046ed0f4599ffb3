package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Round-6 (session 3) additions:
  *
  *  - e14: RESIDUAL IVFPQ — the full FAISS IVFPQ scheme (encode the
  *    residual against the assigned coarse centroid, per-probed-cell
  *    LUTs at search). Same pruned scan and byte footprint as e9;
  *    more signal per code bit. Reference claims the FAISS index
  *    families (`Readme.md:29-35`); this is the faithful one.
  *  - r76: distributed PageRank over the customer↔supplier purchase
  *    graph — the iterate-until-fixed-iterations graph op that
  *    complements m4's connected components. Fixed-point Long
  *    arithmetic (µ-rank units, single integer floor-division per
  *    contribution) makes five iterations bit-identical on any
  *    engine — no floating sums to drift.
  *  - d23: deterministic weighted priority sampling WITHOUT
  *    replacement per language stratum — the corpus-mixing move
  *    (sample k docs per lang, long docs proportionally likelier)
  *    with a reproducible, engine-exact priority key instead of RNG.
  *  - d24: canonical-member dedup — compose m4's duplicate clusters
  *    with a quality criterion to keep the BEST doc per cluster
  *    (longest, ties to lowest id), not an arbitrary one: the step
  *    every production dedup pipeline runs between clustering and
  *    writing the kept corpus.
  */
object Round6cQueries {

  private val HashMod = 1L << 20

  /** d17's split hash (same constants), applicable to any id column. */
  private def splitOf(c: org.apache.spark.sql.Column) = {
    val h = ((c % lit(HashMod)) * lit(2654435761L) + lit(40503L)) % lit(HashMod)
    when(h < lit(HashMod * 9 / 10), "train")
      .when(h < lit(HashMod * 19 / 20), "val")
      .otherwise("test")
  }

  private def splitOfSql(e: String): String =
    s"CASE WHEN (($e % ${HashMod}) * 2654435761 + 40503) % ${HashMod}" +
      s" < ${HashMod * 9 / 10} THEN 'train'" +
      s" WHEN (($e % ${HashMod}) * 2654435761 + 40503) % ${HashMod}" +
      s" < ${HashMod * 19 / 20} THEN 'val' ELSE 'test' END"

  /** Run `f` with AQE skew-join thresholds opened up so the splitter
    * fires below its 256 MB default (at 100 TB the DEFAULTS fire —
    * 256 MB skewed partitions are the norm there), restoring every
    * conf after. The default 64 KB trips at the driver's sf0.1 bench
    * (hot partition ≈ MBs → ~80 advisory-sized slices); the spec
    * passes 1 KB to pin the split on the sf0.001 test corpus.
    */
  private[graft] def withSkewConfs[T](s: org.apache.spark.sql.SparkSession,
                                      bytes: String = "64KB")(f: => T): T = {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> bytes,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> bytes,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** The skewed fact↔dim join under the CURRENT session confs (the Q
    * wraps it in [[withSkewConfs]]; Round6Spec materializes it under
    * the same confs to pin `skew=true` in the final adaptive plan).
    * 75% of lineitem lands on skew_key 0 — the one hot reducer that
    * stalls an unaided sort-merge join.
    */
  private[graft] def skewJoinFrame(s: org.apache.spark.sql.SparkSession,
                                     d: String): org.apache.spark.sql.DataFrame = {
    val skewKey = when(pmod(col("l_orderkey"), lit(4)) =!= 0, lit(0L))
      .otherwise(col("l_orderkey")).cast("long")
    // AQE splits a skewed reduce partition along MAPPER boundaries, so
    // the fact side needs >1 map task to be splittable. The test
    // tables are one parquet row group = one mapper; at real scale the
    // scan has thousands of mappers and this repartition is a no-op
    // shape-wise (the shuffle before the join is there either way).
    val fact = Tables.lineitem(s, d)
      .select(skewKey.as("sk"), col("l_quantity"))
      .repartition(8)
    // materialize the dim before the join: its distinct-aggregate would
    // otherwise sit between the join's Sort and the shuffle stage
    // (exchange reuse), a shape the skew-split rule can't rewrite
    val dim = Tables.orders(s, d)
      .select(when(pmod(col("o_orderkey"), lit(4)) =!= 0, lit(0L))
        .otherwise(col("o_orderkey")).cast("long").as("sk"))
      .distinct()
      .select(col("sk"), pmod(col("sk"), lit(7)).cast("long").as("grp"))
      .localCheckpoint(true)
    fact.join(dim, "sk")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy("grp")
  }

  val all: Seq[Q] = Seq(

    // E14 — residual IVFPQ search. Candidates come only from the 2
    // probed cells (parquet partition pruning); the coarse pass reads
    // (id, cell, pqr) — code bytes, not vectors; each row's ADC joins
    // its residual codes to the LUT of ITS cell (3-D literal indexed
    // by the cell's position in the probe list — pure codegen'd
    // projection, no shuffle, no UDF). Exact re-rank of ≤100 ids is
    // the only float read. Oracle: injected residual codebooks +
    // SQL-recomputed cell assignment (same CTEs as e9's).
    Q("e14_ivfpq_residual",
      (s, d) => {
        val idx = QuantCache.forDir(s, d)
        val q = VectorQueries.qvec(s, d, 0L)
        val cand =
          idx.candidateIds(idx.coarseIvfPqResidual(q, nprobe = 2, n = 100))
        idx.exactDist(cand, q)
          .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
          .orderBy(col("dist"), col("vec_id")).limit(10)
      },
      None,
      lateOracle = QuantCache.lateOracle("e14_ivfpq_residual")),

    // R76 — PageRank, 5 iterations, damping 0.85, over the undirected
    // bipartite customer↔supplier graph (an edge per distinct
    // (o_custkey, l_suppkey) purchase relation; node id = 2·custkey /
    // 2·suppkey+1 keeps the key spaces disjoint). Ranks live in µ-rank
    // Longs (start 1 000 000); a node's contribution per edge is ONE
    // integer floor division (rank·85) div (100·outdeg), so the
    // per-iteration Σ is a sum of Longs — associative, engine-exact.
    // Scale shape: per iteration, one equi-join of ranks to the
    // edge list on the source key + one groupBy on the target key —
    // the canonical distributed PageRank; at 100 TB both sides would
    // be pre-partitioned by node so the join reuses the shuffle
    // across all five iterations. Edge list and degrees are computed
    // once and checkpointed, not re-derived per iteration.
    Q("r76_pagerank",
      (s, d) => {
        val eb = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("a"),
            (col("l_suppkey") * 2 + 1).cast("long").as("b"))
          .distinct()
        val edges = eb
          .union(eb.select(col("b").as("a"), col("a").as("b")))
        val deg = edges.groupBy("a").agg(count(lit(1)).as("outdeg"))
          .localCheckpoint(true)
          // localCheckpoint erases the groupBy's hash partitioning
          // from the plan, so every iteration's join RE-SHUFFLED this
          // side (before plan: 20 SortMergeJoins / 34 Exchanges).
          // One explicit repartition restores a known partitioning
          // that ALL five iterations reuse (ReusedExchange): the join
          // keys node/b alias a, so both per-iteration joins are
          // co-partitioned — the per-iteration shuffle left is the
          // contributions groupBy, which is the algorithm's inherent
          // one. This is exactly the documented 100 TB shape
          // ("pre-partitioned by node, shuffle reused across
          // iterations") made real in the plan.
          .repartition(col("a"))
        // (src, tgt, outdeg) computed ONCE; every iteration rescans
        // this checkpointed edge table instead of re-deriving it.
        // The five iterations build ONE lazy 5-level plan executed in
        // a single job at the end — no per-iteration materialization
        // (per-iteration checkpoints cost 5 extra jobs and pinned
        // blocks; a 5-deep tree over a checkpointed edge list is
        // well inside Catalyst's comfort zone).
        val edgesW = edges.join(deg, "a").localCheckpoint(true)
          .repartition(col("a")) // same: shuffle the edge list ONCE
        var ranks = deg.select(col("a").as("node"),
          lit(1000000L).as("rank_u"))
        for (_ <- 1 to 5) {
          val contrib = edgesW
            .join(ranks, col("a") === col("node"))
            .select(col("b"),
              expr("(rank_u * 85) div (100 * outdeg)").as("c"))
            .groupBy("b").agg(sum("c").as("sc"))
          ranks = deg.select(col("a").as("node"))
            .join(contrib, col("node") === col("b"), "left")
            .select(col("node"),
              (lit(150000L) + coalesce(col("sc"), lit(0L))).as("rank_u"))
        }
        ranks.select(
          when(pmod(col("node"), lit(2)) === 0, "customer")
            .otherwise("supplier").as("node_type"),
          expr("node div 2").as("node_key"),
          col("rank_u"))
          .orderBy("node_type", "node_key")
      },
      Some("""WITH eb AS (
          |  SELECT DISTINCT CAST(o_custkey*2 AS BIGINT) AS a,
          |         CAST(l_suppkey*2+1 AS BIGINT) AS b
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          |e AS (SELECT a, b FROM eb UNION ALL SELECT b, a FROM eb),
          |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS outdeg
          |        FROM e GROUP BY a),
          |r0 AS (SELECT a AS node, CAST(1000000 AS BIGINT) AS rank_u
          |       FROM deg),
          |c1 AS (SELECT e.b AS node,
          |         sum((r.rank_u * 85) // (100 * d.outdeg)) AS sc
          |       FROM e JOIN deg d ON e.a = d.a
          |       JOIN r0 r ON r.node = e.a GROUP BY e.b),
          |r1 AS (SELECT d.a AS node,
          |         CAST(150000 + coalesce(c.sc, 0) AS BIGINT) AS rank_u
          |       FROM deg d LEFT JOIN c1 c ON c.node = d.a),
          |c2 AS (SELECT e.b AS node,
          |         sum((r.rank_u * 85) // (100 * d.outdeg)) AS sc
          |       FROM e JOIN deg d ON e.a = d.a
          |       JOIN r1 r ON r.node = e.a GROUP BY e.b),
          |r2 AS (SELECT d.a AS node,
          |         CAST(150000 + coalesce(c.sc, 0) AS BIGINT) AS rank_u
          |       FROM deg d LEFT JOIN c2 c ON c.node = d.a),
          |c3 AS (SELECT e.b AS node,
          |         sum((r.rank_u * 85) // (100 * d.outdeg)) AS sc
          |       FROM e JOIN deg d ON e.a = d.a
          |       JOIN r2 r ON r.node = e.a GROUP BY e.b),
          |r3 AS (SELECT d.a AS node,
          |         CAST(150000 + coalesce(c.sc, 0) AS BIGINT) AS rank_u
          |       FROM deg d LEFT JOIN c3 c ON c.node = d.a),
          |c4 AS (SELECT e.b AS node,
          |         sum((r.rank_u * 85) // (100 * d.outdeg)) AS sc
          |       FROM e JOIN deg d ON e.a = d.a
          |       JOIN r3 r ON r.node = e.a GROUP BY e.b),
          |r4 AS (SELECT d.a AS node,
          |         CAST(150000 + coalesce(c.sc, 0) AS BIGINT) AS rank_u
          |       FROM deg d LEFT JOIN c4 c ON c.node = d.a),
          |c5 AS (SELECT e.b AS node,
          |         sum((r.rank_u * 85) // (100 * d.outdeg)) AS sc
          |       FROM e JOIN deg d ON e.a = d.a
          |       JOIN r4 r ON r.node = e.a GROUP BY e.b),
          |r5 AS (SELECT d.a AS node,
          |         CAST(150000 + coalesce(c.sc, 0) AS BIGINT) AS rank_u
          |       FROM deg d LEFT JOIN c5 c ON c.node = d.a)
          |SELECT CASE WHEN node % 2 = 0 THEN 'customer'
          |            ELSE 'supplier' END AS node_type,
          |       CAST(node // 2 AS BIGINT) AS node_key, rank_u
          |FROM r5 ORDER BY node_type, node_key""".stripMargin)),

    // D23 — weighted sampling without replacement, 50 docs per lang:
    // priority = (h(doc_id)·10⁶) div n_chars with the multiplicative
    // BIGINT hash d15/d17 use — longer docs draw smaller priorities
    // proportionally more often, the lowest 50 win. Deterministic and
    // engine-exact where an RNG-keyed sample (Efraimidis–Spirakis)
    // would not replay. Row-local hash + one per-stratum top-k — at
    // corpus scale this is a TakeOrdered per group, no global sort.
    Q("d23_weighted_sample",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            expr(s"(((doc_id % $HashMod) * 2654435761 + 7919) % $HashMod" +
              s" * 1000000) div n_chars").as("priority"))
          .withColumn("sample_rank", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("priority"), col("doc_id"))))
          .where(col("sample_rank") <= 50)
          .select(col("lang"), col("sample_rank"), col("doc_id"),
            col("n_chars"), col("priority"))
          .orderBy("lang", "sample_rank")
      },
      Some(s"""SELECT lang, sample_rank, doc_id, n_chars, priority FROM (
           |  SELECT lang, doc_id, n_chars,
           |    CAST((((doc_id % ${HashMod}) * 2654435761 + 7919)
           |      % ${HashMod} * 1000000) // n_chars AS BIGINT) AS priority,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY (((doc_id % ${HashMod}) * 2654435761 + 7919)
           |        % ${HashMod} * 1000000) // n_chars, doc_id) AS INT)
           |      AS sample_rank
           |  FROM documents)
           |WHERE sample_rank <= 50
           |ORDER BY lang, sample_rank""".stripMargin)),

    // D24 — canonical-member dedup: m4's connected-component clusters
    // joined back to the corpus, keep the longest doc per cluster
    // (ties to the lowest id). One row per cluster with the kept doc
    // and the cluster's size — the manifest a dedup pass hands to the
    // writer. Costs one extra broadcast-sized join + a per-cluster
    // window over m4's output; the clusters (not the corpus) are the
    // window's partition key.
    Q("d24_canonical_dedup",
      (s, d) => {
        val clusters = TextQueries.m4Clusters(s, d)
        clusters
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
          .withColumn("n_docs",
            count(lit(1)).over(Window.partitionBy("cluster_rep")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("cluster_rep")
              .orderBy(col("n_chars").desc, col("doc_id"))))
          .where(col("rn") === 1)
          .select(col("cluster_rep"), col("doc_id").as("canon_doc"),
            col("n_docs"), col("n_chars").as("canon_chars"))
          .orderBy("cluster_rep")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.minhashPairsCte},
           |e AS (SELECT id_a AS a, id_b AS b FROM mh_pairs
           |      UNION ALL SELECT id_b, id_a FROM mh_pairs),
           |reach(s2, t) AS (
           |  SELECT a, b FROM e
           |  UNION
           |  SELECT r.s2, e.b FROM reach r JOIN e ON r.t = e.a),
           |m AS (SELECT s2, min(t) AS mn FROM reach GROUP BY s2),
           |cl AS (SELECT d.doc_id,
           |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_rep,
           |         d.n_chars
           |       FROM documents d LEFT JOIN m ON m.s2 = d.doc_id)
           |SELECT cluster_rep, doc_id AS canon_doc, n_docs,
           |       n_chars AS canon_chars FROM (
           |  SELECT cluster_rep, doc_id, n_chars,
           |    CAST(count(*) OVER (PARTITION BY cluster_rep) AS BIGINT)
           |      AS n_docs,
           |    row_number() OVER (PARTITION BY cluster_rep
           |      ORDER BY n_chars DESC, doc_id) AS rn
           |  FROM cl)
           |WHERE rn = 1 ORDER BY cluster_rep""".stripMargin)),

    // R77 — AQE skew-join splitting: 75% of the fact rows carry one
    // hot join key, the classic stall (one reducer gets the whole hot
    // partition in a sort-merge join). With adaptive skew-join
    // handling, the runtime splits the oversized partition into
    // advisory-sized slices and replicates the matching dim rows —
    // same results, hot reducer gone. Thresholds are opened so the
    // splitter fires at test scale (defaults fire at 100-TB sizes);
    // confs restore after the join materializes under localCheckpoint
    // (the r75 pattern). Results are optimizer-invariant — the oracle
    // is the plain join.
    Q("r77_skew_join",
      (s, d) => withSkewConfs(s) { skewJoinFrame(s, d).localCheckpoint(true) },
      Some("""SELECT grp, count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_qty
          |FROM (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
          |             ELSE l_orderkey END AS sk, l_quantity
          |      FROM lineitem) f
          |JOIN (SELECT sk, CAST(sk % 7 AS BIGINT) AS grp
          |      FROM (SELECT DISTINCT CASE WHEN o_orderkey % 4 <> 0
          |                   THEN 0 ELSE o_orderkey END AS sk
          |            FROM orders))
          |USING (sk)
          |GROUP BY grp ORDER BY grp""".stripMargin)),

    // P11 — leakage-free train/val/test split: d17's hash split has
    // near-duplicate pairs straddling split boundaries (eval
    // contamination). Re-anchoring every document to ITS CLUSTER
    // REPRESENTATIVE's split (m4's connected components contain every
    // m1 near-dup pair by construction) makes the split
    // cluster-coherent: no near-dup pair can cross, provably, while
    // singleton docs (the vast majority) keep their d17 assignment.
    // Row-local hash on top of m4's output — no new shuffle beyond
    // the clustering itself.
    Q("p11_leakage_free_split",
      (s, d) => {
        val clusters = TextQueries.m4Clusters(s, d)
        clusters.select(col("doc_id"),
            splitOf(col("doc_id")).as("split"),
            splitOf(col("cluster_rep")).as("final_split"))
          .withColumn("moved",
            (col("split") =!= col("final_split")).cast("int"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.minhashPairsCte},
           |e AS (SELECT id_a AS a, id_b AS b FROM mh_pairs
           |      UNION ALL SELECT id_b, id_a FROM mh_pairs),
           |reach(s2, t) AS (
           |  SELECT a, b FROM e
           |  UNION
           |  SELECT r.s2, e.b FROM reach r JOIN e ON r.t = e.a),
           |m AS (SELECT s2, min(t) AS mn FROM reach GROUP BY s2),
           |cl AS (SELECT d.doc_id,
           |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_rep
           |       FROM documents d LEFT JOIN m ON m.s2 = d.doc_id)
           |SELECT doc_id, split, final_split,
           |  CASE WHEN split <> final_split THEN 1 ELSE 0 END AS moved
           |FROM (SELECT doc_id,
           |        ${splitOfSql("doc_id")} AS split,
           |        ${splitOfSql("cluster_rep")} AS final_split
           |      FROM cl)
           |ORDER BY doc_id""".stripMargin)),

    // X22 — schema-on-read with corrupt-record capture: the engine
    // writes a CSV where every 50th row carries an unparseable
    // numeric field, then reads it back PERMISSIVE with an explicit
    // schema + `_corrupt_record` — bad rows are QUARANTINED as data,
    // not failures (the only ingest posture that survives a 100-TB
    // crawl, where some malformed rows are a certainty). The oracle
    // recomputes the per-lang good/corrupt counts from the clean
    // table and the injection rule — a broken writer, reader, or
    // corrupt-row classification all mismatch.
    Q("x22_corrupt_records",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x22").toString
        x22Write(s, d, dir)
        x22Read(s, dir)
      },
      Some("""SELECT lang,
          |  CAST(sum(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_good,
          |  CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_corrupt,
          |  CAST(sum(CASE WHEN doc_id % 50 <> 0 THEN n_chars
          |           ELSE 0 END) AS BIGINT) AS sum_chars
          |FROM documents WHERE doc_id < 200
          |GROUP BY lang ORDER BY lang""".stripMargin)),

    // P12 — temperature-scaled source mixing (the T5/PaLM mixture
    // rule with T=2): sampling weight ∝ √n_docs flattens the source
    // distribution so small sources aren't drowned. √ of an exact
    // integer is correctly-rounded IEEE in both engines, so
    // floor(√n·10⁶) is engine-exact; expected draws per 10k examples
    // come from one integer division against the windowed total.
    Q("p12_temperature_mix",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
          .withColumn("weight_u",
            floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
          .withColumn("tot_w",
            sum("weight_u").over(
              Window.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
          .select(col("source"), col("n_docs"), col("weight_u"),
            expr("(weight_u * 10000) div tot_w").as("draws_per_10k"))
          .orderBy("source")
      },
      Some("""SELECT source, n_docs, weight_u,
          |  CAST((weight_u * 10000) //
          |    CAST(sum(weight_u) OVER () AS BIGINT) AS BIGINT)
          |    AS draws_per_10k
          |FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |        CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT)
          |          AS weight_u
          |      FROM documents GROUP BY source)
          |ORDER BY source""".stripMargin)),

    // S21 — streaming ingest into the QUANTIZED index (the FAISS
    // train-then-add lifecycle under a stream): quantizers train once
    // on the seed corpus, then each micro-batch encodes against the
    // FROZEN model inside foreachBatch (sq8/pq/pqr/sig codes + cell
    // assignment at add time) and appends into the cell partitions.
    // The final exact search probes every cell, so the result is the
    // full-corpus exact top-10 — the same oracle as s13's LSH-store
    // ingest, now for the compressed tier.
    Q("s21_stream_quant_ingest",
      (s, d) => {
        import graft.store.{QuantConfig, QuantIndex}
        val emb = s.read.parquet(s"$d/embeddings.parquet")
          .select(col("vec_id").cast("long").as("id"), col("embedding"))
        val srcDir = graft.util.TempDirs.create("graft_s21_src").toString
        emb.where(col("id") >= 100).repartition(4)
          .write.mode("overwrite").parquet(s"$srcDir/files")
        val path = graft.util.TempDirs.create("graft_s21_idx").toString + "/index"
        val idx = QuantIndex.build(s, emb.where(col("id") < 100),
          path, QuantConfig())
        val ckpt = graft.util.TempDirs.create("graft_s21_ckpt").toString
        val q = s.readStream
          .schema(emb.where(col("id") >= 100).schema)
          // 2 files per micro-batch: exercises multi-batch add (state
          // across triggers) at half the per-batch job machinery
          .option("maxFilesPerTrigger", "2")
          .parquet(s"$srcDir/files")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], bid: Long) =>
            // batchId makes the add idempotent: a replayed micro-batch
            // (crash between add and checkpoint commit) is a no-op —
            // the index sink is exactly-once, not at-least-once
            idx.add(batch, batchId = Some(bid))
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        idx.searchIvf(VectorQueries.qvec(s, d, 0), 10,
            nprobe = idx.model.cfg.ivfCells)
          .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings
          |           WHERE vec_id = 0)
          |SELECT vec_id, round(d, 6) AS dist FROM (
          |  SELECT e.vec_id AS vec_id,
          |    ${graft.functions.DuckSql.l2sq("e.embedding", "q.qe")} AS d
          |  FROM embeddings e, q)
          |ORDER BY d, vec_id LIMIT 10""".stripMargin),
      streaming = true),

    // E15 — quantization-error audit: decode every stored code back
    // to its vector approximation and report mean squared error per
    // dimension (nano-units, integer-exact mean) for each tier. The
    // number the audit exists to show: residual PQ (pqr) beats plain
    // PQ at identical bytes, and SQ8's 8-bit grid sits far below
    // both. One scan of the index computes all three tiers' sums —
    // codes and embeddings only, no shuffle beyond the 1-row agg.
    Q("e15_quant_error",
      (s, d) => quantErrorFrame(QuantCache.forDir(s, d)),
      None,
      lateOracle = QuantCache.lateOracle("e15_quant_error")),

    // P13 — distill the Gopher rule battery into a LINEAR quality
    // scorer (the fastText-style cheap filter): d20's conjunctive
    // keep is the teacher label, spark.ml logistic regression learns
    // a 5-feature halfspace, and scoring is a ROW-LOCAL codegen'd
    // projection — at 100 TB you run the rules once to train, then
    // score every document for the cost of reading it. Scoring uses
    // the extracted coefficients in an explicit left-fold expression
    // (NOT model.transform), so the DuckDB twin — coefficients
    // injected as literals over the same feature SQL as d20's proven
    // oracle — is bit-identical.
    Q("p13_quality_distill",
      (s, d) => {
        val feats = gopherFeatures(s, d).localCheckpoint(true)
        val key = s.sparkContext.applicationId + "|" + d
        val (w, b) = lrCache.getOrElseUpdate(key, {
          import org.apache.spark.ml.classification.LogisticRegression
          import org.apache.spark.ml.feature.VectorAssembler
          val asm = new VectorAssembler()
            .setInputCols(Array("f1", "f2", "f3", "f4", "f5"))
            .setOutputCol("features")
          val lr = new LogisticRegression().setMaxIter(50)
            .setRegParam(0.01).setLabelCol("label")
            .setFeaturesCol("features")
          val m = lr.fit(asm.transform(feats))
          (m.coefficients.toArray, m.intercept)
        })
        lrOracle.put(key, p13Sql(w, b))
        val margin = (0 until 5).foldLeft(lit(b)) { (acc, i) =>
          acc + lit(w(i)) * col(s"f${i + 1}")
        }
        feats.select(col("doc_id"), round(margin, 6).as("margin"),
            (margin > 0).cast("int").as("keep_pred"), col("label"))
          .orderBy("doc_id")
      },
      None,
      lateOracle = () => lrOracle.values.toSeq match {
        case Seq(one) => Some(one)
        case _        => None // >1 dir trained in-process: rows-only beats a wrong oracle
      }))

  /** (doc_id, f1..f5, label): d20's Gopher features as raw doubles
    * plus its conjunctive keep as the teacher label. Feature
    * definitions mirror d20's gate-proven Spark/SQL pair exactly.
    */
  private def gopherFeatures(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .withColumn("w", TF.words(col("text")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", ""))
          .cast("long").as("n_letters"),
        size(filter(col("w"), x => x.rlike("[a-zA-Z]")))
          .cast("long").as("n_alpha"),
        size(array_intersect(col("w"),
          typedLit(Seq("the", "a", "of", "and", "to"))))
          .cast("long").as("n_stop_distinct"),
        size(filter(col("w"), x =>
          x.contains("#") || x.contains("…")))
          .cast("long").as("n_symbol"))
      .select(col("doc_id"),
        col("n_words").cast("double").as("f1"),
        (col("n_letters").cast("double") / col("n_words")).as("f2"),
        (col("n_alpha").cast("double") / col("n_words")).as("f3"),
        col("n_stop_distinct").cast("double").as("f4"),
        (col("n_symbol").cast("double") / col("n_words")).as("f5"),
        (col("n_words").between(50L, 100000L) &&
          (col("n_letters").cast("double") / col("n_words"))
            .between(3.0, 10.0) &&
          col("n_alpha").cast("double") / col("n_words") >= 0.8 &&
          col("n_stop_distinct") >= 2 &&
          col("n_symbol").cast("double") / col("n_words") <= 0.1)
          .cast("int").as("label"))

  private val lrCache =
    scala.collection.concurrent.TrieMap.empty[String, (Array[Double], Double)]
  // Trained-literal oracle SQL keyed by the same appId|dir key as
  // lrCache, so two sf dirs in one process can't serve each other's
  // coefficients; the lateOracle only answers when the key is unique.
  private val lrOracle =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** DuckDB twin of p13 with the trained coefficients injected: the
    * same feature SQL as d20's oracle, margin as the same left-fold,
    * keep from the UNROUNDED margin.
    */
  private def p13Sql(w: Array[Double], b: Double): String = {
    def dl(x: Double): String = f"$x%.17e"
    val margin = s"${dl(b)} + ${dl(w(0))} * CAST(n_words AS DOUBLE)" +
      s" + ${dl(w(1))} * (CAST(n_letters AS DOUBLE) / n_words)" +
      s" + ${dl(w(2))} * (CAST(n_alpha AS DOUBLE) / n_words)" +
      s" + ${dl(w(3))} * CAST(n_stop_distinct AS DOUBLE)" +
      s" + ${dl(w(4))} * (CAST(n_symbol AS DOUBLE) / n_words)"
    s"""SELECT doc_id, round($margin, 6) AS margin,
       |  CAST(($margin) > 0 AS INT) AS keep_pred,
       |  CAST(n_words BETWEEN 50 AND 100000
       |    AND CAST(n_letters AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
       |    AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
       |    AND n_stop_distinct >= 2
       |    AND CAST(n_symbol AS DOUBLE) / n_words <= 0.1 AS INT) AS label
       |FROM (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter(list_distinct(string_split(text, ' ')),
       |      x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
       |      AS n_stop_distinct,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> contains(x, '#') OR contains(x, '…'))) AS BIGINT)
       |      AS n_symbol
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** x22's corrupt-CSV staging, exposed so Bench can time the fixture
    * write separately from the PERMISSIVE-parse query.
    */
  private[graft] def x22Write(s: org.apache.spark.sql.SparkSession,
      d: String, dir: String): Unit =
    Tables.documents(s, d).where(col("doc_id") < 200)
      .select(concat_ws(",", col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(50)) === 0, lit("oops"))
          .otherwise(col("n_chars").cast("string"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)

  /** x22's read phase over an already-staged corrupt CSV directory. */
  private[graft] def x22Read(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    s.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .groupBy("lang")
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
          .as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"),
        // summing the numeric column matters twice: it audits the
        // parsed values, and it forces the CSV parser to actually
        // parse n_chars — with Spark's CSV column pruning, a query
        // that never reads the bad column never SEES the corruption
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
      .orderBy("lang")

  /** The e15 reconstruction-error frame over an arbitrary
    * [[graft.store.QuantIndex]]: per-tier mean squared error per
    * dimension in integer nano-units. Factored out of the query so
    * the tier GATING is testable against a non-default build — the
    * opq row exists only when the index trained the tier (r13 ADVICE
    * #2); the four legacy tiers are required (they are what the audit
    * exists to compare).
    */
  private[graft] def quantErrorFrame(
      idx: graft.store.QuantIndex): org.apache.spark.sql.DataFrame = {
    val m = idx.model
    def errU(dec: org.apache.spark.sql.Column) =
      floor(graft.functions.VectorFunctions.l2sq(
        col("embedding").cast("array<double>"), dec)
        / lit(m.dim) * lit(1e9)).cast("long")
    // opq's error lives in the ROTATED space (R is an isometry of
    // the original, so it's the same number in exact math): rotated
    // embedding vs the coded OPQ centroids.
    val base = Seq(
      errU(m.sq8DecodeCol(col("sq8"))).as("e_sq8"),
      errU(m.int4DecodeCol(col("sq8"))).as("e_i4"),
      errU(m.pqDecodeCol(col("pq"))).as("e_pq"),
      errU(m.pqrDecodeCol(col("pqr"), col("cell"))).as("e_pqr"))
    val errCols =
      if (!m.opqEnabled) base
      else base :+ floor(graft.functions.VectorFunctions.l2sq(
        m.opqRotateCol(col("embedding")), m.opqDecodeCol(col("opq")))
        / lit(m.dim) * lit(1e9)).cast("long").as("e_opq")
    val sums = Seq(sum("e_sq8").as("s1"), sum("e_pq").as("s2"),
      sum("e_pqr").as("s3"), sum("e_i4").as("s4")) ++
      (if (m.opqEnabled) Seq(sum("e_opq").as("s5")) else Nil) :+
      count(lit(1)).as("n")
    val stack =
      if (m.opqEnabled)
        "stack(5, 'i4', s4 div n, 'opq', s5 div n, " +
          "'pq', s2 div n, 'pqr', s3 div n, 'sq8', s1 div n)"
      else
        "stack(4, 'i4', s4 div n, 'pq', s2 div n, " +
          "'pqr', s3 div n, 'sq8', s1 div n)"
    idx.indexDf
      .select(errCols: _*)
      .agg(sums.head, sums.tail: _*)
      .selectExpr(s"$stack as (tier, mean_err_u)")
      .orderBy("tier")
  }
}
