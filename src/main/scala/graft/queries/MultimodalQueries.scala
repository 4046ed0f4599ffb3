package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * processed per-partition in batches — the shape a real image/audio
  * decode stage takes on Spark (scan → mapPartitions over binary →
  * typed metadata columns), with the actual codec STUBBED as a
  * deterministic function of the payload bytes (no image/audio
  * libraries in this environment; see `FakeDecode`).
  *
  * The Spark side really materializes the binary column and walks the
  * bytes in a typed `mapPartitions`; the oracle recomputes the same
  * metadata arithmetically from the byte length, which keeps the stub
  * verifiable end-to-end.
  */
object MultimodalQueries {

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class Meta(doc_id: Long, n_bytes: Long, fake_w: Long,
      fake_h: Long, n_frames: Long)

  /** Deterministic stand-in for an image/video decode: metadata derived
    * only from payload length. A real deployment swaps this body for an
    * actual codec; the Spark plumbing (binary column, per-partition
    * batching, typed output schema) stays unchanged.
    */
  object FakeDecode {
    def apply(b: Blob): Meta = {
      val n = b.payload.length.toLong
      Meta(b.doc_id, n, 16 + (n * 7919) % 1920, 16 + (n * 104729) % 1080,
        1 + n % 30)
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Long, feat: Long)

  val all: Seq[Q] = Seq(
    // X1 — binary payload (utf-8 encoded text standing in for an image
    // blob) → per-partition "decode" → typed metadata.
    Q("x1_multimodal_meta",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
          .as[Blob]
          .mapPartitions(_.map(FakeDecode(_)))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, strlen(text) AS n_bytes,
          |  16 + (strlen(text) * 7919) % 1920 AS fake_w,
          |  16 + (strlen(text) * 104729) % 1080 AS fake_h,
          |  1 + strlen(text) % 30 AS n_frames
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // X5 — frame sampling: the batch video-decode shape. Each payload
    // "decodes" to n_frames frames; every 5th is kept and featurized
    // (stubbed as arithmetic on payload length + frame index). The
    // typed flatMap is exactly where a real codec would emit frames —
    // one row per sampled frame, partition-parallel, no driver state.
    Q("x5_frame_sample",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
          .as[Blob]
          .flatMap { b =>
            val n = b.payload.length.toLong
            val frames = 1 + n % 30
            (0L until frames).filter(_ % 5 == 0)
              .map(k => Frame(b.doc_id, k, (n * 31 + k) % 997))
          }
          .toDF()
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, k AS frame_idx,
          |  (strlen(text) * 31 + k) % 997 AS feat
          |FROM documents
          |CROSS JOIN (SELECT unnest(range(0, 30)) AS k)
          |WHERE k < 1 + strlen(text) % 30 AND k % 5 = 0
          |ORDER BY doc_id, frame_idx""".stripMargin)),

    // X7 — pixel-level decode stub: the payload's bytes ARE the pixels
    // (ascii codes of the text stand in for a decoded gray-scale
    // raster). Per-image stats, 4 band means (the pooling shape of a
    // feature extractor) and a stride-16 "thumbnail" checksum (the
    // resize shape) — all computed with codegen'd higher-order
    // functions over the pixel array, no UDF. The oracle recomputes
    // every figure from the same bytes in DuckDB.
    Q("x7_pixel_stats",
      (s, d) => {
        // split("", -1) can retain a trailing zero-width match — drop it
        val px = transform(filter(split(col("text"), ""), ch => ch =!= ""),
          ch => ascii(ch))
        // n div 4, NOT n/4: Spark `/` is true division (12.25 for n=49)
        val q4 = expr("n div 4")
        def bandMean(b: Int) = round(
          aggregate(slice(col("px"), q4 * b + 1, q4),
            lit(0L), (a, x) => a + x).cast("double") / q4.cast("double"), 6)
        Tables.documents(s, d)
          .where(col("n_chars") >= 8)
          .select(col("doc_id"), px.as("px"))
          .withColumn("n", size(col("px")).cast("long"))
          .select(
            col("doc_id"),
            col("n").as("n_px"),
            round(aggregate(col("px"), lit(0L), (a, x) => a + x)
              .cast("double") / col("n"), 6).as("mean_px"),
            array_min(col("px")).cast("long").as("min_px"),
            array_max(col("px")).cast("long").as("max_px"),
            bandMean(0).as("band0"), bandMean(1).as("band1"),
            bandMean(2).as("band2"), bandMean(3).as("band3"),
            expr("aggregate(filter(px, (x, i) -> i % 16 = 0), 0L, (a, x) -> a + x)")
              .as("thumb_sum"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
          |  SELECT doc_id,
          |         list_transform(string_split(text, ''), ch -> ascii(ch)) AS px,
          |         strlen(text) AS n
          |  FROM documents WHERE n_chars >= 8)
          |SELECT doc_id, n AS n_px,
          |  round(1.0 * list_sum(px) / n, 6) AS mean_px,
          |  CAST(list_min(px) AS BIGINT) AS min_px,
          |  CAST(list_max(px) AS BIGINT) AS max_px,
          |  round(1.0 * list_sum(px[n // 4 * 0 + 1 : n // 4 * 1]) / (n // 4), 6) AS band0,
          |  round(1.0 * list_sum(px[n // 4 * 1 + 1 : n // 4 * 2]) / (n // 4), 6) AS band1,
          |  round(1.0 * list_sum(px[n // 4 * 2 + 1 : n // 4 * 3]) / (n // 4), 6) AS band2,
          |  round(1.0 * list_sum(px[n // 4 * 3 + 1 : n // 4 * 4]) / (n // 4), 6) AS band3,
          |  CAST(list_sum(px[1 : n : 16]) AS BIGINT) AS thumb_sum
          |FROM p ORDER BY doc_id""".stripMargin)),

    // X9 — audio-frame shape: the payload bytes as PCM-ish samples,
    // framed into 256-sample windows with hop 128 (the STFT framing a
    // real audio featurizer does before the codec-specific transform),
    // per-frame energy = sum of squared samples — integer math, so the
    // oracle is exact. One row per (doc, frame); frame count =
    // (n - 256) div 128 + 1.
    Q("x9_audio_frames",
      (s, d) => {
        val px = transform(filter(split(col("text"), ""), ch => ch =!= ""),
          ch => ascii(ch).cast("long"))
        Tables.documents(s, d)
          .where(col("doc_id") < 100 && col("n_chars") >= 256)
          .select(col("doc_id"), px.as("px"),
            size(px).cast("long").as("n"))
          .select(col("doc_id"),
            posexplode(expr("transform(sequence(0, (n - 256) div 128), " +
              "k -> aggregate(slice(px, k * 128 + 1, 256), 0L, (a, x) -> a + x * x))"))
              .as(Seq("frame_idx", "energy")))
          .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("energy"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH p AS (
          |  SELECT doc_id,
          |         list_transform(string_split(text, ''), ch -> ascii(ch)) AS px,
          |         strlen(text) AS n
          |  FROM documents WHERE doc_id < 100 AND n_chars >= 256)
          |SELECT doc_id, k AS frame_idx,
          |  CAST(list_sum(list_transform(px[k * 128 + 1 : k * 128 + 256],
          |    x -> x * x)) AS BIGINT) AS energy
          |FROM p CROSS JOIN (SELECT unnest(range(0, 1000)) AS k)
          |WHERE k <= (n - 256) // 128
          |ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
