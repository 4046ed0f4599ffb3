package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (north star in BASELINE.json):
  * exact dedup, MinHash+LSH candidate pairs, SimHash, n-gram Jaccard,
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting.
  *
  * Every operator is a declarative plan over built-in functions / HOFs
  * (no UDFs): shuffles only on group/join keys, so each scales by
  * partitioning on those keys.
  */
object TextQueries {
  import TF.P

  /** MinHash parameters: 8 QUADRATIC hash functions
    * h_j(x) = (a_j·(x² mod P) + b_j·x + c_j) mod P, banded 2 rows × 4
    * bands for the LSH candidate join.
    *
    * Why quadratic with large coefficients (measured by
    * TextScaleSmokeSpec on a 500k/1M-doc corpus with planted dups):
    * the theoretical false-candidate rate for a doc pair sharing ONE
    * shingle value is the LSH S-curve at J = 1/|union| —
    * bands·J² ≈ 4/361 ≈ 1.1% here — and the measured rate should sit
    * ON it. The first-cut small affine multipliers (2,3,5,…) were
    * order-PRESERVING below P/a_j, rank-correlating the 8 rows and
    * inflating false candidates to ~1.7× the S-curve (316 vs ~190
    * predicted at 500k docs); the quadratic family measures exactly
    * at the prediction. Every product stays < 2^63 for x < P ≈ 1e9,
    * and the form replays exactly in the DuckDB oracle.
    *
    * SCALE CEILING (inherent, documented not hidden): shingle hashes
    * live in [0,P), P ≈ 1e9, so ~(10N)²/2P unrelated doc pairs share
    * a hash value by birthday collision and become candidates at the
    * 1.1% S-curve rate — a Θ(N²/P) term beside the Θ(N) true-dup
    * term. It stays below the true-dup term up to ~100M docs per
    * (lang, source) block; beyond that a production deployment widens
    * the fingerprint space (64-bit shingles), which we keep at 1e9+7
    * because the DuckDB oracle's BIGINT arithmetic must replay
    * a·x + b without overflow. Exact verification (m5/m3) filters
    * every such candidate regardless — only candidate-generation cost
    * grows, never result correctness.
    */
  val A: Seq[Long] = Seq(981540727L, 622178233L, 338102573L, 744656287L,
    462447481L, 594208951L, 889004987L, 157969343L)
  val B: Seq[Long] = Seq(710949761L, 431396449L, 928396013L, 83572201L,
    261662911L, 354394633L, 554246927L, 21939251L)
  val C: Seq[Long] = Seq(133320731L, 902399677L, 487333219L, 61853717L,
    775127429L, 244408181L, 698013233L, 346450913L)

  /** h_j over a shingle column (Spark side). */
  private[graft] def mhHash(j: Int, x: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (lit(A(j)) * ((x * x) % P) + lit(B(j)) * x + lit(C(j))) % P

  /** h_j over a DuckDB lambda variable (oracle side, same arithmetic). */
  private[graft] def mhHashSql(j: Int, x: String): String =
    s"(${A(j)}*(($x*$x) % $P) + ${B(j)}*$x + ${C(j)}) % $P"
  val Bands = 4

  /** Word-trigram shingle hashes from per-word hashes: shingle_i =
    * (((wh_i*31 + wh_{i+1}) % P)*31 + wh_{i+2}) % P. Docs with <3 words
    * fall back to their word hashes.
    */
  // Native one-pass kernel (TextShingleHashes): value-identical to the
  // HOF chain transform(sequence(...), i -> element_at(wh, i)...) over
  // a wordHashes column, but that shape paid a hidden quadratic tax —
  // CollapseProject inlines the wh projection into the interpreted
  // lambda, so wordHashes re-evaluated per element_at (3× per shingle).
  // Measured at sf0.1: shingle materialization 3.6 s → ~0.3 s.
  private[queries] def shingleHashes = TF.shingleHashes(col("text"))

  private[queries] val shingleHashesSql: String = {
    val wh = "wh"
    s"(CASE WHEN len($wh) >= 3 THEN " +
      s"list_transform(range(1, len($wh)-1), i -> " +
      s"((($wh[i]*31 + $wh[i+1]) % $P)*31 + $wh[i+2]) % $P) " +
      s"ELSE $wh END)"
  }

  /** Shared oracle CTE chain: documents → word hashes → shingles →
    * 8 minhashes → 4 band buckets → distinct candidate pairs
    * `mh_pairs(id_a, id_b)`. Used by m1 (pairs) and m4 (clusters).
    */
  /** Converged connected-component labels (doc_id, cluster_rep),
    * computed ONCE per (session, sf dir) and reused by every consumer
    * (m4 itself, d24 canonical dedup, p11 leakage-free split) — the
    * production shape: clustering is an index-like artifact you build
    * once and query many times, exactly like [[QuantCache]]'s index.
    *
    * The iterative label-propagation loop runs ~4 rounds of 6
    * shuffles each over an edge set far smaller than the corpus;
    * sizing its shuffle partitioning to the EDGE data (like the
    * streaming state stores) removes a pile of empty tasks per
    * round. Result is partition-count independent, UNORDERED (each
    * consumer orders as needed), and pinned in memory by the final
    * localCheckpoint.
    *
    * Lifetime/fault semantics: `localCheckpoint` severs lineage, so a
    * cached entry whose blocks are gone (executor loss on a real
    * cluster; simulated in `BatterySpec`) cannot recompute itself.
    * [[m4Clusters]] therefore PROBES the cached frame with a 1-row
    * read before handing it out and rebuilds on failure — consumers
    * (d24, p11) never observe a dead entry. A multi-tenant service
    * would use reliable `checkpoint` to a cluster FS instead; the
    * probe-and-rebuild keeps the single-process harness honest about
    * the same failure mode.
    */
  private[graft] val m4Cache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  private[queries] def m4Clusters(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    val key = s.sparkContext.applicationId + "|" + d
    m4Cache.get(key) match {
      case Some(cached) =>
        // Full-partition probe: checkpoint-block loss can be PARTIAL
        // (some partitions dead, others alive), and a head(1) would
        // pass on the first live partition while consumers still die
        // on the dead ones. count() touches every partition's blocks
        // (a foreachPartition with an empty body would NOT — tasks
        // succeed without ever pulling the lazy iterator); the
        // clusters frame is cluster-count-sized, so this is cheap.
        try { cached.count(); cached }
        catch {
          case scala.util.control.NonFatal(_) =>
            m4Cache.remove(key)
            m4Clusters(s, d)
        }
      case None =>
        val built = computeM4Clusters(s, d)
        m4Cache.putIfAbsent(key, built).getOrElse(built)
    }
  }

  private def computeM4Clusters(s: org.apache.spark.sql.SparkSession,
                                d: String): org.apache.spark.sql.DataFrame =
      StreamingQueries.withStateShuffle(s) {
        val pairs = all.find(_.name == "m1_minhash_pairs").get.run(s, d)
          .select("id_a", "id_b")
        val edges = pairs.union(
          pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
          .localCheckpoint(true)
        var labels = Tables.documents(s, d)
          .select(col("doc_id"), col("doc_id").as("label"))
          .localCheckpoint(true)
        var changed = 1L
        var iter = 0
        val maxIter = 25 // log2-ish bound: 2^25 ≫ any component diameter
        while (changed > 0 && iter < maxIter) {
          val nbrMin = edges
            .join(labels, edges("id_b") === labels("doc_id"))
            .groupBy(edges("id_a").as("doc_id"))
            .agg(min("label").as("nbr_min"))
          val hop = labels.as("l")
            .join(nbrMin.as("n"), Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("label"), coalesce(col("nbr_min"), col("label")))
                .as("label"))
            .localCheckpoint(true)
          // Shortcut: label := label(label). Labels are themselves
          // doc_ids in the same component, so the looked-up row always
          // exists and stays in-component; this halves chain depth.
          val ptr = hop.select(col("doc_id").as("p_id"),
            col("label").as("p_label"))
          val next = hop.join(ptr, hop("label") === ptr("p_id"), "left")
            .select(hop("doc_id"),
              least(hop("label"), coalesce(col("p_label"), hop("label")))
                .as("label"))
            .localCheckpoint(true)
          changed = next.as("a")
            .join(labels.withColumnRenamed("label", "old").as("b"), "doc_id")
            .where(col("label") =!= col("old")).count()
          labels = next
          iter += 1
        }
        if (changed > 0) throw new IllegalStateException(
          s"m4_dedup_clusters: connected components not converged " +
            s"after $maxIter rounds ($changed labels still changing)")
        labels.select(col("doc_id"), col("label").as("cluster_rep"))
      }

  private[queries] lazy val minhashPairsCte: String = {
    val mhCols = (0 until 8).map(j =>
      s"list_min(list_transform(shs, x -> ${mhHashSql(j, "x")})) AS mh$j")
      .mkString(",\n        ")
    val bandRows = (0 until Bands).map(bi =>
      s"SELECT doc_id, $bi AS band_idx, mh${2 * bi}*$P + mh${2 * bi + 1} AS bv FROM sig")
      .mkString("\n  UNION ALL ")
    s"""wh AS (SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents),
       |sh AS (SELECT doc_id, $shingleHashesSql AS shs FROM wh),
       |sig AS (SELECT doc_id,
       |        $mhCols
       |        FROM sh),
       |bands AS (
       |  $bandRows),
       |mh_pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.bv = b.bv AND a.doc_id < b.doc_id)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // D1 — exact deduplication: hash-groupBy on md5(text); one
    // representative (min doc_id) per group. Scales as a single hash
    // aggregation on the digest.
    Q("d1_dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .orderBy("h"),
      Some("""SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // D2 — token counting: whitespace tokens + a BPE-ish regex token
    // count (runs of alphanumerics, or single non-space symbols).
    Q("d2_token_count",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(TF.words(col("text"))).cast("long").as("n_ws_tokens"),
          regexp_count(col("text"),
            lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("n_re_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          |  len(string_split(text, ' ')) AS n_ws_tokens,
          |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // D3 — quality scoring: length/stopword/word-shape heuristics.
    Q("d3_quality_score",
      (s, d) => Tables.documents(s, d)
        .withColumn("w", TF.words(col("text")))
        .select(col("doc_id"), col("n_chars"),
          size(col("w")).cast("long").as("n_words"),
          size(filter(col("w"), w =>
            w.isInCollection(Seq("the", "a", "of", "and", "to"))))
            .cast("long").as("n_stop"))
        .withColumn("avg_word_len",
          round(col("n_chars").cast("double") / col("n_words"), 6))
        .withColumn("stop_ratio",
          round(col("n_stop").cast("double") / col("n_words"), 6))
        .withColumn("quality",
          when(col("n_words").between(20, 1000) &&
            col("n_stop").cast("double") / col("n_words") > 0.05, "good")
            .otherwise("low"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars, n_words, n_stop,
          |  round(CAST(n_chars AS DOUBLE) / n_words, 6) AS avg_word_len,
          |  round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio,
          |  CASE WHEN n_words BETWEEN 20 AND 1000
          |        AND CAST(n_stop AS DOUBLE) / n_words > 0.05
          |       THEN 'good' ELSE 'low' END AS quality
          |FROM (SELECT doc_id, n_chars,
          |        len(string_split(text, ' ')) AS n_words,
          |        len(list_filter(string_split(text, ' '),
          |          w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // D4 — language identification: marker-word / CJK-character counts,
    // deterministic argmax. (On the synthetic corpus most docs resolve
    // to 'en'; the operator's contract is the deterministic heuristic.)
    Q("d4_lang_id",
      (s, d) => {
        def cnt(ws: Seq[String]) =
          size(filter(col("w"), w => w.isInCollection(ws))).cast("long")
        Tables.documents(s, d)
          .withColumn("w", TF.words(col("text")))
          .select(col("doc_id"),
            cnt(Seq("the", "a", "of")).as("c_en"),
            cnt(Seq("der", "die", "und")).as("c_de"),
            cnt(Seq("el", "la", "que")).as("c_es"),
            cnt(Seq("le", "les", "est")).as("c_fr"),
            regexp_count(col("text"),
              lit("[\\x{4e00}-\\x{9fff}]")).cast("long").as("c_zh"))
          .withColumn("pred_lang",
            when(col("c_zh") > 0 && col("c_zh") >= col("c_en") &&
              col("c_zh") >= col("c_de") && col("c_zh") >= col("c_es") &&
              col("c_zh") >= col("c_fr"), "zh")
              .when(col("c_en") > 0 && col("c_en") >= col("c_de") &&
                col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
              .when(col("c_de") > 0 && col("c_de") >= col("c_es") &&
                col("c_de") >= col("c_fr"), "de")
              .when(col("c_es") > 0 && col("c_es") >= col("c_fr"), "es")
              .when(col("c_fr") > 0, "fr")
              .otherwise("unknown"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, c_en, c_de, c_es, c_fr, c_zh,
          |  CASE WHEN c_zh > 0 AND c_zh >= c_en AND c_zh >= c_de AND c_zh >= c_es AND c_zh >= c_fr THEN 'zh'
          |       WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
          |       WHEN c_de > 0 AND c_de >= c_es AND c_de >= c_fr THEN 'de'
          |       WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
          |       WHEN c_fr > 0 THEN 'fr'
          |       ELSE 'unknown' END AS pred_lang
          |FROM (SELECT doc_id,
          |        len(list_filter(string_split(text,' '), w -> w IN ('the','a','of'))) AS c_en,
          |        len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS c_de,
          |        len(list_filter(string_split(text,' '), w -> w IN ('el','la','que'))) AS c_es,
          |        len(list_filter(string_split(text,' '), w -> w IN ('le','les','est'))) AS c_fr,
          |        len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS c_zh
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // D5 — document fingerprint: rolling polynomial hash of the first
    // 256 characters (SURVEY north-star "document fingerprinting").
    Q("d5_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TF.polyHash(col("text"), 256).as("fp"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${TF.charPolyHashSql("substr(text, 1, 256)")} AS fp
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // M1 — MinHash + LSH banding: shingle → 8 minhashes → 4 bands of 2
    // → candidate pairs sharing a band bucket. The candidate join is an
    // equi-join on (band_idx, band_value): at 100 TB this is the
    // standard shuffle-bounded near-dup candidate generation.
    Q("m1_minhash_pairs",
      (s, d) => {
        val sig = Tables.documents(s, d)
          .withColumn("wh", TF.wordHashes(col("text")))
          .withColumn("shs", shingleHashes)
          .select(col("doc_id") +:
            (0 until 8).map(j =>
              array_min(transform(col("shs"),
                x => mhHash(j, x))).as(s"mh$j")): _*)
        val bands = sig.select(col("doc_id"),
          explode(array((0 until Bands).map(bi =>
            struct(lit(bi).as("band_idx"),
              (col(s"mh${2 * bi}") * P + col(s"mh${2 * bi + 1}")).as("bv"))): _*))
            .as("b"))
          .select(col("doc_id"), col("b.band_idx"), col("b.bv"))
        val l = bands.select(col("band_idx"), col("bv"), col("doc_id").as("id_a"))
        val r = bands.select(col("band_idx"), col("bv"), col("doc_id").as("id_b"))
        l.join(r, Seq("band_idx", "bv"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().orderBy("id_a", "id_b")
      },
      Some(s"""WITH $minhashPairsCte
           |SELECT id_a, id_b FROM mh_pairs ORDER BY id_a, id_b""".stripMargin)),

    // M4 — dedup clusters: connected components over the MinHash
    // candidate pairs. Each round is (a) a one-hop min-label
    // propagation (equi-join + partial-min agg) followed by (b) a
    // pointer-doubling shortcut (label := label-of-label), so the
    // label forest halves in depth every round and convergence is
    // O(log diameter) — a bare one-hop loop needs O(diameter) rounds
    // and a chain longer than the cap would silently mis-cluster.
    // The loop runs to an exact fixpoint and THROWS if the cap is hit
    // unconverged. The cluster representative is the component's min
    // doc_id — a unique fixpoint, so the result is iteration-order
    // independent. The oracle computes the same components with a
    // recursive transitive-closure CTE.
    Q("m4_dedup_clusters",
      (s, d) => m4Clusters(s, d).orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $minhashPairsCte,
           |e AS (SELECT id_a AS a, id_b AS b FROM mh_pairs
           |      UNION ALL SELECT id_b, id_a FROM mh_pairs),
           |reach(s2, t) AS (
           |  SELECT a, b FROM e
           |  UNION
           |  SELECT r.s2, e.b FROM reach r JOIN e ON r.t = e.a),
           |m AS (SELECT s2, min(t) AS mn FROM reach GROUP BY s2)
           |SELECT d.doc_id,
           |  least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_rep
           |FROM documents d LEFT JOIN m ON m.s2 = d.doc_id
           |ORDER BY d.doc_id""".stripMargin)),

    // M2 — SimHash (16-bit, word-frequency weighted): fingerprints…
    Q("m2_simhash",
      (s, d) => {
        val fp = (0 until 16).map { b =>
          val bitSum = aggregate(col("wh"), lit(0L), (acc, h) =>
            acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
          when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _)
        Tables.documents(s, d)
          .withColumn("wh", TF.wordHashes(col("text")))
          .select(col("doc_id"), fp.as("fp"))
          .orderBy("doc_id")
      },
      Some {
        val fpSql = (0 until 16).map { b =>
          s"(CASE WHEN list_sum(list_transform(wh, h -> CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        s"""SELECT doc_id, CAST($fpSql AS BIGINT) AS fp
           |FROM (SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents)
           |ORDER BY doc_id""".stripMargin
      }),

    // M2b — …and near-dup pairs at Hamming distance ≤ 2 over them.
    // Blocked join (standard simhash dedup): the fingerprint splits into
    // 3 bands (6+5+5 bits); a pair differing in ≤ 2 bits leaves at least
    // one band untouched (pigeonhole), so the equi-join on
    // (band_idx, band_value) is lossless for hd ≤ 2 and shuffles only on
    // the band key — no cartesian pair explosion at scale.
    Q("m2_simhash_pairs",
      (s, d) => {
        val fps = all.find(_.name == "m2_simhash").get.run(s, d)
        val bands = fps.select(col("doc_id"), col("fp"),
          explode(array(
            struct(lit(0).as("band_idx"),
              col("fp").bitwiseAND(lit(0x3FL)).as("bv")),
            struct(lit(1).as("band_idx"),
              shiftright(col("fp"), 6).bitwiseAND(lit(0x1FL)).as("bv")),
            struct(lit(2).as("band_idx"),
              shiftright(col("fp"), 11).bitwiseAND(lit(0x1FL)).as("bv"))))
            .as("b"))
          .select(col("doc_id"), col("fp"), col("b.band_idx"), col("b.bv"))
        val l = bands.select(col("band_idx"), col("bv"),
          col("doc_id").as("id_a"), col("fp").as("fp_a"))
        val r = bands.select(col("band_idx"), col("bv"),
          col("doc_id").as("id_b"), col("fp").as("fp_b"))
        // emit-on-first-matching-band: a pair matching several bands is
        // kept only where band_idx is its lowest match — a bitwise
        // filter instead of a distinct (one less shuffle).
        val x = col("fp_a").bitwiseXOR(col("fp_b"))
        val band0Same = x.bitwiseAND(lit(0x3FL)) === 0L
        val band1Same = shiftright(x, 6).bitwiseAND(lit(0x1FL)) === 0L
        l.join(r, Seq("band_idx", "bv"))
          .where(col("id_a") < col("id_b"))
          .where(col("band_idx") === 0 ||
            (col("band_idx") === 1 && !band0Same) ||
            (col("band_idx") === 2 && !band0Same && !band1Same))
          .select(col("id_a"), col("id_b"),
            bit_count(x).cast("long").as("hd"))
          .where(col("hd") <= 2)
          .orderBy("id_a", "id_b")
      },
      Some {
        val fpSql = (0 until 16).map { b =>
          s"(CASE WHEN list_sum(list_transform(wh, h -> CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH f AS (
           |  SELECT doc_id, CAST($fpSql AS BIGINT) AS fp
           |  FROM (SELECT doc_id, ${TF.wordHashesSql("text")} AS wh FROM documents))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hd
           |FROM f a JOIN f b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.fp, b.fp)) <= 2
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // M3 — n-gram Jaccard near-dup: word-trigram shingle sets (hashed —
    // set overlap over trigram hashes is identical on both engines, and
    // the native hash kernel keeps the row pass tight), blocked by
    // (lang, source) — the blocking keys bound the pair explosion; at
    // scale the block key is the shuffle partition key.
    Q("m3_ngram_jaccard",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .withColumn("wh", TF.wordHashes(col("text")))
          .where(size(col("wh")) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            array_distinct(shingleHashes).as("sh"))
        val l = sh.select(col("lang"), col("source"),
          col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val r = sh.select(col("lang"), col("source"),
          col("doc_id").as("id_b"), col("sh").as("sh_b"))
        l.join(r, Seq("lang", "source"))
          .where(col("id_a") < col("id_b"))
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("jac", col("inter") /
            (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
          .where(col("jac") >= 0.2)
          .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(jaccardOracle)),

    // M5 — n-gram Jaccard via INVERTED INDEX with PREFIX FILTERING
    // (PPJoin-style): the at-scale formulation of m3. Naive posting
    // lists cost Σ|posting|², quadratic in the hottest shingle; the
    // exact control is the prefix filter: order each doc's shingles by
    // GLOBAL document frequency ascending and index only the first
    // sz - ⌈t·sz⌉ + 1 (the rarest). Lemma (Chaudhuri/Xiao-Wang):
    // J(A,B) ≥ t ⇒ |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets with
    // overlap ≥ α must intersect within their (|·|-α+1)-prefixes
    // under any shared total order — so candidate generation over
    // prefixes alone LOSES NO qualifying pair, while the globally
    // hottest shingles (always last in the df order) fall out of the
    // index entirely. Candidates are verified exactly on the full
    // shingle sets, so the result is identical to m3's all-pairs form
    // (Round4Spec asserts m5 ≡ m3; the driver hashes both against the
    // same DuckDB twin). At 100 TB: df is one keyed agg, the prefix
    // trim one doc-keyed window, and the candidate join is bounded by
    // rare-shingle posting lists instead of stop-shingle blowup.
    Q("m5_jaccard_inverted",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .withColumn("wh", TF.wordHashes(col("text")))
          .where(size(col("wh")) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            array_distinct(shingleHashes).as("sh"))
          .withColumn("sz", size(col("sh")))
        val posts = sh.select(col("lang"), col("source"), col("doc_id"),
          col("sz"), explode(col("sh")).as("shingle"))
        val dfreq = posts.groupBy("lang", "source", "shingle")
          .agg(count(lit(1)).as("df"))
        // df-ascending order (shingle hash tie-break makes it total)
        val byRarity = Window.partitionBy("doc_id")
          .orderBy(col("df"), col("shingle"))
        val prefix = posts.join(dfreq, Seq("lang", "source", "shingle"))
          .withColumn("rn", row_number().over(byRarity))
          .where(col("rn") <=
            col("sz") - ceil(col("sz") * lit(0.2)).cast("int") + 1)
        // Candidate pairs by per-shingle pair expansion instead of a
        // posting self-join: one groupBy materializes each prefix
        // posting list once (a self-join would recompute the whole
        // prefix lineage for both sides), then the sorted list explodes
        // to its (id_a < id_b) combinations in-place — no join, no
        // second shuffle of the postings.
        val lists = prefix.groupBy("lang", "source", "shingle")
          .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
          .where(size(col("ids")) >= 2)
        val cand = lists.select(explode(expr(
            """flatten(transform(ids, (x, i) ->
              |  transform(slice(ids, i + 2, size(ids) - i - 1),
              |    y -> named_struct('id_a', x, 'id_b', y))))""".stripMargin))
            .as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .distinct()
        // exact verification over the full shingle sets (candidates
        // already share a (lang, source) block by construction)
        val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        cand.join(a, "id_a").join(b, "id_b")
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("jac", col("inter") /
            (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
          .where(col("jac") >= 0.2)
          .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(jaccardOracle)),

    // M7 — MinHash Jaccard ESTIMATION vs exact: for every banded
    // candidate pair, the estimator (fraction of the 8 minhash slots
    // that agree — the statistic LSH theory says is an unbiased
    // Jaccard estimate) next to the exact distinct-shingle Jaccard.
    // Because the hash family is seeded and shared with the DuckDB
    // twin, even the ESTIMATE is hash-oracle-able — the measurement
    // the reference's LSH design implies but never makes. Signatures
    // are 8 longs per doc, so the pair join carries fixed-width rows.
    Q("m7_minhash_estimate",
      (s, d) => {
        val sig = Tables.documents(s, d)
          .withColumn("wh", TF.wordHashes(col("text")))
          .withColumn("shs", shingleHashes)
          .select(Seq(col("doc_id"), array_distinct(col("shs")).as("dsh")) ++
            (0 until 8).map(j =>
              array_min(transform(col("shs"),
                x => mhHash(j, x))).as(s"mh$j")): _*)
        val pairs = all.find(_.name == "m1_minhash_pairs").get.run(s, d)
          .select("id_a", "id_b")
        val a = sig.select(Seq(col("doc_id").as("id_a"),
          col("dsh").as("dsh_a")) ++
          (0 until 8).map(j => col(s"mh$j").as(s"a$j")): _*)
        val b = sig.select(Seq(col("doc_id").as("id_b"),
          col("dsh").as("dsh_b")) ++
          (0 until 8).map(j => col(s"mh$j").as(s"b$j")): _*)
        val agree = (0 until 8).map(j =>
          when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
          .reduce(_ + _)
        val inter = size(array_intersect(col("dsh_a"), col("dsh_b"))).cast("double")
        pairs.join(a, "id_a").join(b, "id_b")
          .select(col("id_a"), col("id_b"),
            round(agree.cast("double") / 8.0, 6).as("est_jaccard"),
            round(inter /
              (size(col("dsh_a")) + size(col("dsh_b")) - inter), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $minhashPairsCte,
           |dsh AS (SELECT doc_id, list_distinct(shs) AS dsh FROM sh)
           |SELECT p.id_a, p.id_b,
           |  round((${(0 until 8).map(j =>
                  s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)").mkString(" + ")})
           |    / CAST(8.0 AS DOUBLE), 6) AS est_jaccard,
           |  round(CAST(len(list_intersect(da.dsh, db.dsh)) AS DOUBLE) /
           |    (len(da.dsh) + len(db.dsh) -
           |     CAST(len(list_intersect(da.dsh, db.dsh)) AS DOUBLE)), 6) AS jaccard
           |FROM mh_pairs p
           |JOIN sig a ON a.doc_id = p.id_a
           |JOIN sig b ON b.doc_id = p.id_b
           |JOIN dsh da ON da.doc_id = p.id_a
           |JOIN dsh db ON db.doc_id = p.id_b
           |ORDER BY 1, 2""".stripMargin))
  )

  /** Shared DuckDB twin for m3 and m5 — the two are different physical
    * strategies (blocked all-pairs vs posting-list join) for the same
    * declared result set.
    */
  private lazy val jaccardOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang, source,
       |    list_distinct($shingleHashesSql) AS sh
       |  FROM (SELECT doc_id, lang, source, ${TF.wordHashesSql("text")} AS wh FROM documents)
       |  WHERE len(wh) >= 3)
       |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) AS jac
       |  FROM s a JOIN s b
       |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
       |WHERE jac >= 0.2 ORDER BY id_a, id_b""".stripMargin
}
