package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Npy

/** The NPZ DataSource V2 (graft.sources.NpzVectorSource): the
  * reference's at-rest format (`generate_coco_embeddings.py:87-91` —
  * `embeddings.npy` n×d f4 + `image_ids.npy` n i8 inside a zip).
  * Covers: bit-exact roundtrip, reading REAL numpy-written fixtures
  * (both savez/STORED and savez_compressed/DEFLATED, f4/i8 and f8/i4
  * dtypes), per-file parallelism, column pruning down to the ids
  * entry, empty-projection counts, and overwrite-as-truncate.
  */
class NpzSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkDf(n: Int, d: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong * 7, (0 until d).map(j => i * 10f + j / 8f).toArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(
        StructField("id", LongType),
        StructField("vector", ArrayType(FloatType)))))
  }

  test("write + read roundtrip is bit-exact; one file per non-empty task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_rt").toString
    mkDf(50, 16).write.format("npz").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".npz"))
    assert(files.length == 3, s"expected 3 shard files, got ${files.length}")

    val back = spark.read.format("npz").load(dir)
    assert(back.rdd.getNumPartitions == 3) // parallelism = files
    val got = back.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    val want = mkDf(50, 16).collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    assert(got == want)
  }

  test("reads numpy savez fixture (f4 vectors, i8 ids, STORED)") {
    val df = spark.read.format("npz")
      .load(getClass.getResource("/npz/ref_style.npz").getPath)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 1000L)
    assert(rows.last.getLong(0) == 1009L)
    // emb[i][j] = i + j/10 as float32
    val v3 = rows(3).getSeq[Float](1)
    assert(v3.length == 8)
    (0 until 8).foreach(j => assert(v3(j) == (3 + j / 10.0).toFloat))
  }

  test("reads numpy savez_compressed fixture (f8 vectors narrowed, i4 ids)") {
    val df = spark.read.format("npz")
      .load(getClass.getResource("/npz/alt_dtypes.npz").getPath)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 7)
    assert(rows.map(_.getLong(0)).toSeq == (5L to 11L))
    val v2 = rows(2).getSeq[Float](1) // i=2: 2*2 + j/4
    assert(v2.toSeq == (0 until 6).map(j => (4 + j / 4.0).toFloat))
  }

  test("column pruning: id-only projection never opens the vectors entry") {
    // Hand-build an NPZ whose vectors entry is TRUNCATED mid-body: any
    // attempt to stream it throws EOF, so a clean id-only read proves
    // the pruned scan touched only the ids entry.
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_prune")
    val f = dir.resolve("broken_vecs.npz").toFile
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    zos.putNextEntry(new ZipEntry("embeddings.npy"))
    val vh = Npy.headerBytes("<f4", Seq(4L, 8L))
    zos.write(vh)
    zos.write(new Array[Byte](10)) // 10 of the promised 128 body bytes
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("image_ids.npy"))
    zos.write(Npy.headerBytes("<i8", Seq(4L)))
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(11L, 22L, 33L, 44L).foreach(bb.putLong)
    zos.write(bb.array())
    zos.closeEntry()
    zos.close()

    val src = spark.read.format("npz").load(f.getPath)
    assert(src.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(11L, 22L, 33L, 44L))
    // empty projection (count) also reads only the ids header
    assert(src.count() == 4)
    // and the full read DOES fail — the truncation is real
    intercept[org.apache.spark.SparkException] { src.collect() }
  }

  test("overwrite truncates prior shard files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_tr").toString
    mkDf(30, 4).write.format("npz").mode("append").save(dir)
    mkDf(30, 4).write.format("npz").mode("append").save(dir)
    assert(spark.read.format("npz").load(dir).count() == 60)
    mkDf(20, 4).write.format("npz").mode("overwrite").save(dir)
    assert(spark.read.format("npz").load(dir).count() == 20)
  }

  test("streaming read: each trigger picks up only newly arrived shard files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_npz_stream_ck").toString
    mkDf(10, 4).write.format("npz").mode("append").save(dir)
    val q = spark.readStream.format("npz").load(dir)
      .writeStream.format("memory").queryName("npz_stream_spec")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    assert(spark.table("npz_stream_spec").count() == 10)
    // second wave: distinct ids, must arrive exactly once (no re-read
    // of wave-1 files)
    mkDf(10, 4).withColumn("id", col("id") + 1000)
      .write.format("npz").mode("append").save(dir)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("npz_stream_spec")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.length == 20)
    assert(ids.distinct.length == 20, "a shard file was read twice")
    assert(ids.count(_ >= 1000) == 10)
  }

  test("SQL surface: npz reads query through a registered view") {
    // `SELECT ... FROM npz.`path`` direct-file SQL is restricted by
    // Spark to FileFormat sources (ResolveSQLOnFile); the supported
    // SQL route for a TableProvider is a registered view.
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_sql").toString
    mkDf(12, 4).write.format("npz").mode("append").save(dir)
    spark.read.format("npz").load(dir).createOrReplaceTempView("npz_sql_spec")
    val n = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM npz_sql_spec").head()
    assert(n.getLong(0) == 12)
    assert(n.getLong(1) == (0 until 12).map(_.toLong * 7).sum)
  }

  test("STORED shards row-split under maxPartitionBytes; values intact") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_split").toString
    // ONE shard file of 200 rows × 16 dims (the sink writes STORED)
    mkDf(200, 16).coalesce(1).write.format("npz").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".npz")) == 1)
    try {
      spark.conf.set(key, "2048") // ≈ 30 rows per split
      val df = spark.read.format("npz").load(dir)
      assert(df.rdd.getNumPartitions > 3,
        s"expected row splits, got ${df.rdd.getNumPartitions} partition(s)")
      val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
      assert(got.length == 200 && got.map(_._1).distinct.length == 200)
      val want = mkDf(200, 16).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
      got.foreach { case (id, v) => assert(want(id) == v, s"row $id diverged") }
      // pruned + empty projections work on splits too
      assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        (0 until 200).map(_.toLong * 7).sorted)
      assert(df.count() == 200)
      // numpy's own savez fixture (STORED) splits as well
      val fx = spark.read.format("npz")
        .load(getClass.getResource("/npz/ref_style.npz").getPath)
      assert(fx.rdd.getNumPartitions == 1) // 10 rows fit one 2 KiB split
      spark.conf.set(key, "128")
      val fx2 = spark.read.format("npz")
        .load(getClass.getResource("/npz/ref_style.npz").getPath)
      assert(fx2.rdd.getNumPartitions > 1)
      assert(fx2.collect().map(_.getLong(0)).sorted.toSeq == (1000L to 1009L))
      // DEFLATE (savez_compressed) cannot split: one partition per file
      val cz = spark.read.format("npz")
        .load(getClass.getResource("/npz/alt_dtypes.npz").getPath)
      assert(cz.rdd.getNumPartitions == 1)
      assert(cz.count() == 7)
    } finally spark.conf.set(key, prev)
  }

  test("entry order in the zip does not matter; vector-only projection works") {
    // numpy writes entries in kwargs order — this fixture has
    // image_ids BEFORE embeddings; the reader locates entries by name
    // in separate passes, so order is irrelevant.
    val df = spark.read.format("npz")
      .load(getClass.getResource("/npz/ids_first.npz").getPath)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(7L, 8L, 9L))
    val vecs = df.select("vector").collect().map(_.getSeq[Float](0).toVector)
    assert(vecs.toSet == Set(
      Vector(0f, 1f, 2f, 3f), Vector(1f, 2f, 3f, 4f), Vector(2f, 3f, 4f, 5f)))
  }

  test("glob paths resolve to matching shard files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_glob").toString
    mkDf(20, 4).write.format("npz").mode("append").save(dir)
    val all = spark.read.format("npz").load(s"$dir/part-*.npz")
    assert(all.count() == 20)
    val one = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".npz")).map(_.getName).sorted.head
    val first = spark.read.format("npz").load(s"$dir/${one.take(10)}*.npz")
    assert(first.rdd.getNumPartitions == 1 && first.count() > 0)
  }

  test("column pruning is visible in the physical plan description") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_plan").toString
    mkDf(5, 4).write.format("npz").mode("append").save(dir)
    val pruned = spark.read.format("npz").load(dir).select("id")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("NpzScan") && pruned.contains("columns=id]"),
      s"expected pruned NpzScan in plan:\n$pruned")
    val full = spark.read.format("npz").load(dir)
      .queryExecution.executedPlan.toString
    assert(full.contains("columns=id,vector]"), s"plan:\n$full")
  }

  test("COUNT(*) is answered from NPY headers alone (aggregate pushdown)") {
    // File with an intact ids HEADER but truncated ids BODY: a pushed
    // count succeeds (headers only); any row read fails.
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_cnt")
    val f = dir.resolve("hdr_only.npz").toFile
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    zos.putNextEntry(new ZipEntry("embeddings.npy"))
    zos.write(Npy.headerBytes("<f4", Seq(6L, 4L)))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("image_ids.npy"))
    zos.write(Npy.headerBytes("<i8", Seq(6L)))
    zos.write(new Array[Byte](8)) // 1 of the promised 6 ids
    zos.closeEntry()
    zos.close()

    val src = spark.read.format("npz").load(f.getPath)
    val agg = src.agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=COUNT"), s"count not pushed:\n$plan")
    assert(agg.head().getLong(0) == 6L)
    intercept[org.apache.spark.SparkException] { src.select("id").collect() }
    // count with a residual filter takes the row path (not pushable)
    intercept[org.apache.spark.SparkException] {
      src.where(col("id") > 0).count()
    }
    // and a normal multi-file count still matches the data
    val d2 = java.nio.file.Files.createTempDirectory("graft_npz_cnt2").toString
    mkDf(50, 4).write.format("npz").mode("append").save(d2)
    assert(spark.read.format("npz").load(d2).count() == 50)
  }

  test("npy header writer round-trips through its own parser") {
    val h = Npy.headerBytes("<f4", Seq(123L, 64L))
    assert(h.length % 64 == 0)
    val parsed = Npy.readHeader(new java.io.ByteArrayInputStream(h))
    assert(parsed == graft.sources.NpyHeader("<f4", Seq(123L, 64L)))
    val h1 = Npy.headerBytes("<i8", Seq(9L))
    assert(Npy.readHeader(new java.io.ByteArrayInputStream(h1)) ==
      graft.sources.NpyHeader("<i8", Seq(9L)))
  }

  test("npy header bytes satisfy numpy's parser contract") {
    // numpy ast.literal_eval-s the header after stripping the trailing
    // newline: the padding must be SPACES ending in '\n', never NULs
    // (a NUL raises ValueError in np.load — regression test for the
    // pad-offset bug caught in review)
    for (shape <- Seq(Seq(3L, 4L), Seq(9L), Seq(1000000L, 2048L))) {
      val h = Npy.headerBytes("<f4", shape)
      assert(h.last == '\n'.toByte, "header must end with newline")
      // the dict + padding portion (after magic/version/u16 length)
      // must be NUL-free ASCII: dict, then spaces, then '\n'
      val body = new String(h.drop(10), java.nio.charset.StandardCharsets.US_ASCII)
      assert(!body.contains('\u0000'), "dict/padding must contain no NULs")
      assert(body.matches("""\{[^}]*\} *\n"""), s"unexpected header body: '$body'")
    }
  }

  test("streaming offsets survive a checkpoint restart (JSON, multi-file)") {
    assert(graft.sources.NpzOffset.fromJson(
      graft.sources.NpzOffset(Seq("/a/b.npz", "/c d/e.npz")).json()) ==
      graft.sources.NpzOffset(Seq("/a/b.npz", "/c d/e.npz")))
    // memory sink forbids checkpoint recovery, so restart through a
    // parquet sink (the recoverable kind)
    val dir = java.nio.file.Files.createTempDirectory("graft_npz_restart").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_npz_restart_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_npz_restart_ck").toString
    mkDf(6, 4).write.format("npz").mode("append").save(dir) // 3 shard files
    def run(): Unit = {
      val q = spark.readStream.format("npz").load(dir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(spark.read.parquet(outDir).count() == 6)
    // restart from the same checkpoint: the committed multi-file offset
    // must deserialize, and only NEW files may be read
    mkDf(4, 4).withColumn("id", col("id") + 500)
      .coalesce(1).write.format("npz").mode("append").save(dir)
    run()
    val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(ids.length == 10, s"restart re-read old files or lost rows: $ids")
    assert(ids.count(_ >= 500) == 4 && ids.count(_ < 500) == 6)
  }
}
