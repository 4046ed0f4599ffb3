package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Round-5 training-data-pipeline additions over `documents`:
  * deterministic domain-mixture sampling (d15), quality-tiered epoch
  * upsampling (d16), and a dataset-card statistics rollup (p7).
  *
  * These are the corpus-composition operators a 100 TB pretraining
  * pipeline runs after cleaning/dedup: rebalance the language/domain
  * mix, upsample the high-quality tail, and publish the dataset card.
  * The reference has no analog (its corpus is one homogeneous vector
  * table); these generalize its A-series statistics operators
  * (`performance_analysis.py:224-235`) to the curation domain.
  *
  * All three are single-pass declarative plans: d15/d16 are row-local
  * (filter / generator inside whole-stage codegen, no shuffle at any
  * scale); p7 shuffles once on its rollup keys with partial
  * aggregation map-side.
  */
object Round5Queries {

  /** Deterministic per-doc uniform hash in [0, 2^20): a Knuth
    * multiplicative hash expressed in plain BIGINT arithmetic so the
    * DuckDB oracle computes the identical value — this is what makes
    * SAMPLING oracle-checkable (a6_sample's engine-seeded RNG can
    * only ever get a rows-only check). At scale the same trick makes
    * the sample reproducible across reruns and engines — a property
    * training-data pipelines need for auditability.
    *
    * The id is reduced mod 2^20 BEFORE the multiply, keeping the
    * product below ~2.8e15 for any BIGINT doc_id: without it,
    * doc_id >= ~3.5e9 silently wraps negative in Spark (non-ANSI
    * multiply) while DuckDB raises an overflow error — cross-engine
    * drift on exactly the corpora this operator targets. The odd
    * multiplier is a bijection on [0, 2^20), so the hash stays
    * exactly uniform over any full residue range; ids 2^20 apart
    * share a decision (documented correlation, harmless for
    * rate-based sampling).
    */
  private val HashMod = 1L << 20
  private def mixHash =
    ((col("doc_id") % lit(HashMod)) * lit(2654435761L)) % lit(HashMod)
  private val MixHashSql = s"((doc_id % ${HashMod}) * 2654435761) % ${HashMod}"

  val all: Seq[Q] = Seq(

    // D15 — domain-mixture sampling: downsample over-represented
    // languages (en to 50%, es/fr to 75%, keep de/zh whole) with the
    // deterministic doc_id hash. Row-local predicate -> pushed to the
    // scan, zero shuffle, and the kept set is stable under reruns,
    // repartitioning, and engine choice.
    Q("d15_domain_mix",
      (s, d) => {
        val thr = when(col("lang") === "en", lit(HashMod / 2))
          .when(col("lang").isin("es", "fr"), lit(HashMod * 3 / 4))
          .otherwise(lit(HashMod))
        Tables.documents(s, d)
          .where(mixHash < thr)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, source FROM documents
           |WHERE $MixHashSql <
           |  CASE WHEN lang = 'en' THEN ${HashMod / 2}
           |       WHEN lang IN ('es', 'fr') THEN ${HashMod * 3 / 4}
           |       ELSE ${HashMod} END
           |ORDER BY doc_id""".stripMargin)),

    // D16 — quality-tiered epoch upsampling: long documents are seen
    // 3 times per training epoch, medium 2, short 1 (the "repeat the
    // good data" knob every LLM data recipe exposes). The repeat
    // factor is a row-local CASE and the expansion is a generator
    // (explode of a bounded sequence) — no join, no shuffle; output
    // size is sum(n_epochs), known up front.
    Q("d16_upsample_epochs",
      (s, d) => Tables.documents(s, d)
        .withColumn("n_epochs",
          when(col("n_chars") >= 400, lit(3L))
            .when(col("n_chars") >= 200, lit(2L))
            .otherwise(lit(1L)))
        .select(col("doc_id"), col("n_epochs"),
          explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
        .orderBy("doc_id", "epoch"),
      Some("""SELECT doc_id, ne AS n_epochs,
           |  unnest(generate_series(1, ne)) AS epoch
           |FROM (SELECT doc_id,
           |        CAST(CASE WHEN n_chars >= 400 THEN 3
           |                  WHEN n_chars >= 200 THEN 2
           |                  ELSE 1 END AS BIGINT) AS ne
           |      FROM documents)
           |ORDER BY doc_id, epoch""".stripMargin)),

    // P7 — dataset card: the publishable per-(source, lang) corpus
    // statistics table with rollup subtotals and a grand total — doc
    // counts, exact char/token sums, mean length. One shuffle on the
    // grouping keys; counts and sums combine map-side, so the
    // exchange carries one row per (source, lang, grouping-set)
    // triple regardless of corpus size. Sums stay integer-exact
    // (BIGINT on both engines; DuckDB's HUGEINT sum is cast back).
    Q("p7_dataset_card",
      (s, d) => Tables.documents(s, d)
        .withColumn("n_tok", size(TF.words(col("text"))).cast("long"))
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"),
          sum(col("n_tok")).as("n_tokens"),
          round(avg(col("n_chars")), 6).as("avg_chars"))
        .orderBy(col("source"), col("lang")),
      Some("""SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           |  round(avg(n_chars), 6) AS avg_chars
           |FROM documents GROUP BY ROLLUP (source, lang)
           |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin)),

    // P8 — PMI collocation scoring: pointwise mutual information of
    // adjacent word pairs, the classic corpus-quality / phrase-mining
    // signal (word-salad text scores near 0; real text surfaces
    // collocations). Bigrams come from a GENERATOR over each doc's
    // word array (no self-join); the two marginal joins are plain
    // equi joins on the word key — shuffle-bounded by vocabulary,
    // never broadcast-forced (a 100 TB corpus vocabulary may exceed
    // broadcast limits; AQE still broadcasts when it fits). The only
    // nested loop is the 1-row token-total broadcast. Inclusion is
    // decided by an INTEGER count threshold (n_ab >= 5), never by an
    // FP comparison, so the row set is engine-exact; PMI itself is
    // the same double expression on both sides, rounded to 6dp.
    // Marginal products go through DOUBLE before multiplying — BIGINT
    // n_a * n_b overflows at corpus scale.
    Q("p8_pmi_collocations",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("w", TF.words(col("text")))
        val uni = docs.select(explode(col("w")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n_w"))
        val tot = uni.agg(sum("n_w").cast("double").as("n_tok"))
        val big = docs.where(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(w) - 2), " +
              "i -> struct(w[i] AS a, w[i + 1] AS b))")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
          .where(col("n_ab") >= 5)
        big
          .join(uni.select(col("word").as("a"), col("n_w").as("n_a")), "a")
          .join(uni.select(col("word").as("b"), col("n_w").as("n_b")), "b")
          .crossJoin(broadcast(tot))
          .select(col("a"), col("b"), col("n_ab"),
            round(log(col("n_ab") * col("n_tok") /
              (col("n_a").cast("double") * col("n_b").cast("double"))), 6)
              .as("pmi"))
          .orderBy("a", "b")
      },
      Some("""WITH w AS (
           |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           |uni AS (
           |  SELECT u.word, count(*) AS n_w
           |  FROM w, unnest(l) AS u(word) GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_w) AS DOUBLE) AS n_tok FROM uni),
           |big AS (
           |  SELECT l[i] AS a, l[i + 1] AS b, count(*) AS n_ab
           |  FROM w, unnest(range(1, len(l))) AS u(i)
           |  GROUP BY 1, 2 HAVING count(*) >= 5)
           |SELECT big.a, big.b, CAST(n_ab AS BIGINT) AS n_ab,
           |  round(ln(n_ab * n_tok /
           |    (CAST(ua.n_w AS DOUBLE) * CAST(ub.n_w AS DOUBLE))), 6) AS pmi
           |FROM big, tot
           |JOIN uni ua ON ua.word = big.a
           |JOIN uni ub ON ub.word = big.b
           |ORDER BY a, b""".stripMargin)),

    // R73 — wide→long reshaping with the native DataFrame `unpivot`
    // (Spark 4 melt): four measure columns become (metric, value)
    // rows. Catalyst plans this as an Expand projection in the scan
    // stage — 4× the rows but ZERO shuffle, the shape that survives
    // any scale (vs the naive 4-way self-union that scans the table
    // four times). Oracle is the equivalent UNION ALL.
    Q("r73_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity").cast("double").as("qty"),
            col("l_extendedprice").cast("double").as("price"),
            col("l_discount").cast("double").as("discount"),
            col("l_tax").cast("double").as("tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""SELECT l_orderkey, l_linenumber, metric,
           |  CAST(value AS DOUBLE) AS value
           |FROM (
           |  SELECT l_orderkey, l_linenumber, 'qty' AS metric,
           |         l_quantity AS value FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
           |  FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
           |  FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
           |WHERE l_orderkey < 100
           |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // D17 — deterministic train/val/test split (90/5/5): the same
    // BIGINT-hash trick as d15 but with an additive salt, so split
    // assignment is INDEPENDENT of the mix-sampling decision (a doc
    // downsampled by d15 is not biased toward any split). Row-local,
    // shuffle-free, reproducible across engines and reruns — the
    // properties an auditable corpus split needs. The oracle checks
    // every row's assignment, not just the proportions.
    Q("d17_train_split",
      (s, d) => {
        val h = ((col("doc_id") % lit(HashMod)) * lit(2654435761L) +
          lit(40503L)) % lit(HashMod)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            when(h < lit(HashMod * 9 / 10), "train")
              .when(h < lit(HashMod * 19 / 20), "val")
              .otherwise("test").as("split"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang,
           |  CASE WHEN ((doc_id % ${HashMod}) * 2654435761 + 40503)
           |         % ${HashMod} < ${HashMod * 9 / 10} THEN 'train'
           |       WHEN ((doc_id % ${HashMod}) * 2654435761 + 40503)
           |         % ${HashMod} < ${HashMod * 19 / 20} THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // X18 — REAL image decode (javax.imageio, pure JDK, headless):
    // closes the S5 decode gap that x7/x16 stub. Each row encodes a
    // deterministic 8×8 grayscale PNG (pixel (x,y) = (doc_id·31 +
    // 8x + y) mod 256), then DECODES the actual PNG bytes back and
    // reports decoded dimensions + pixel sum/min/max. The oracle
    // computes the same statistics in closed form from the generation
    // rule — so a broken encoder, decoder, or raster traversal all
    // hash-mismatch. The decode runs in a typed mapPartitions (the
    // documented multimodal tier: binary column in, typed features
    // out, one codec instance per partition, embarrassingly parallel
    // at any scale). Only the NEURAL featurizer stays out of scope
    // (no model weights in-container); the codec path is real.
    Q("x18_image_decode",
      (s, d) => {
        import s.implicits._
        val stats = Tables.documents(s, d).where(col("doc_id") < 100)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val img = new java.awt.image.BufferedImage(
                8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              var x = 0
              while (x < 8) {
                var y = 0
                while (y < 8) {
                  img.getRaster.setSample(x, y, 0,
                    ((id * 31 + x * 8 + y) % 256).toInt)
                  y += 1
                }
                x += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              val png = bos.toByteArray // real PNG bytes on the wire
              val back = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(png))
              var sum = 0L; var mn = 255L; var mx = 0L
              var i = 0
              while (i < back.getWidth) {
                var j = 0
                while (j < back.getHeight) {
                  val v = back.getRaster.getSample(i, j, 0).toLong
                  sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                  j += 1
                }
                i += 1
              }
              (id, back.getWidth.toLong, back.getHeight.toLong, sum, mn, mx)
            }
          }
          .toDF("doc_id", "width", "height", "px_sum", "px_min", "px_max")
        stats.orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(8 AS BIGINT) AS width,
           |  CAST(8 AS BIGINT) AS height,
           |  CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS px_sum,
           |  CAST(min((doc_id * 31 + i) % 256) AS BIGINT) AS px_min,
           |  CAST(max((doc_id * 31 + i) % 256) AS BIGINT) AS px_max
           |FROM documents, (SELECT unnest(range(0, 64)) AS i) g
           |WHERE doc_id < 100
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
