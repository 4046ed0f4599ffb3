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
          |ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
