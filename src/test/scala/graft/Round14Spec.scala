package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ManifestScan

/** Round-14 operator semantics: manifest file skipping (x28), hard
  * negative mining (e22), the JL projection funnel (e23), sliding
  * chunking (d29). The DuckDB hash gate checks cross-engine equality;
  * these pin the internal contracts the oracle can't see — above all
  * that x28's pruning really skips FILES without ever changing rows.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    queries.Registry.all.find(_.name == name).get.run(spark, TestSpark.sf)

  private def clusteredEventsDir(): String = {
    val dir = graft.util.TempDirs.create("graft_r14_mspec").toString
    Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("hour_bucket"),
        col("value"))
      .repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(dir)
    ManifestScan.buildManifest(spark, dir, Seq("user_id", "hour_bucket"))
    dir
  }

  test("x28 manifest prunes files at planning time and never changes rows") {
    val dir = clusteredEventsDir()
    // data-driven range: the first file's own user_id zone — provably
    // present in ≥1 file and, under range clustering, not in the last
    val zones = ManifestScan.loadManifest(dir)
      .flatMap(_.zones.get("user_id"))
      .collect { case graft.store.Zone.I64(l, h) => (l, h) }.sortBy(_._1)
    val (lo, hi) = zones.head
    val (df, kept, total) = ManifestScan.readPruned(spark, dir,
      Map("user_id" -> (lo, hi)))
    assert(total >= 2, s"range write produced $total files")
    assert(kept > 0 && kept < total, s"no pruning: kept $kept of $total")
    // the PLAN reads exactly the kept files, not the directory
    assert(df.inputFiles.length == kept,
      s"plan reads ${df.inputFiles.length} files, manifest kept $kept")
    // pruning is semantics-free: identical rows to the unpruned scan
    val full = spark.read.parquet(dir)
      .where(col("user_id").between(lo, hi))
    assert(df.count() == full.count())
    assert(df.exceptAll(full).isEmpty && full.exceptAll(df).isEmpty)
  }

  test("x28 disjoint range keeps zero files and returns empty with schema") {
    val dir = clusteredEventsDir()
    val (df, kept, _) = ManifestScan.readPruned(spark, dir,
      Map("user_id" -> (-500L, -100L)))
    assert(kept == 0)
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("user_id", "hour_bucket", "value"))
  }

  test("x28 unindexed/missing-zone columns never prune (conservative)") {
    val dir = clusteredEventsDir()
    // `value` is a double column: no INT64 zones exist for it, so a
    // range on it must keep every file and rely on the residual filter
    val (df, kept, total) = ManifestScan.readPruned(spark, dir,
      Map("value" -> (0L, 1L)))
    assert(kept == total)
    val expected = spark.read.parquet(dir)
      .where(col("value").between(0L, 1L)).count()
    assert(df.count() == expected)
  }

  test("x28 kept files follow SELECTIVITY, not corpus size (4x corpus, flat kept)") {
    // 1x: events range-clustered into 16 files. 4x: four key-shifted
    // copies (disjoint user_id spans) into 64 files — file size and
    // zone width stay constant, the corpus quadruples. A query whose
    // selected VOLUME is constant (it only matches the first copy)
    // must keep a ~constant number of files while total files 4x —
    // the planning-time analogue of "task count follows selectivity".
    val base = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("hour_bucket"),
        col("value"))
    val dir1 = graft.util.TempDirs.create("graft_r14_scale1").toString
    base.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id").write.mode("overwrite").parquet(dir1)
    ManifestScan.buildManifest(spark, dir1, Seq("user_id"))
    val dir4 = graft.util.TempDirs.create("graft_r14_scale4").toString
    (0 until 4).map(k => base.withColumn("user_id",
        col("user_id") + lit(k.toLong * 1000000L)))
      .reduce(_ unionAll _)
      .repartitionByRange(64, col("user_id"))
      .sortWithinPartitions("user_id").write.mode("overwrite").parquet(dir4)
    ManifestScan.buildManifest(spark, dir4, Seq("user_id"))

    val (lo, hi) = ManifestScan.loadManifest(dir1)
      .flatMap(_.zones.get("user_id"))
      .collect { case graft.store.Zone.I64(l, h) => (l, h) }.sortBy(_._1).head
    val (df1, kept1, total1) = ManifestScan.readPruned(spark, dir1,
      Map("user_id" -> (lo, hi)))
    val (df4, kept4, total4) = ManifestScan.readPruned(spark, dir4,
      Map("user_id" -> (lo, hi)))
    assert(total4 >= 3 * total1, s"corpus files: $total1 -> $total4")
    assert(df4.count() == df1.count()) // same selected volume
    assert(kept4 <= kept1 + 2,
      s"kept files grew with corpus size: $kept1 of $total1 -> $kept4 of $total4")
  }

  test("e22 mines one positive and 3 ordered cross-lang negatives per anchor") {
    val out = q("e22_hard_negatives").collect()
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val anchors = docs.keys.filter(_ % 25 == 0).toSet
    assert(out.map(_.getLong(0)).toSet == anchors)
    assert(out.length == anchors.size * 3)
    for ((aId, rows) <- out.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
      // one positive, same language, not the anchor itself
      assert(sorted.map(_.getLong(1)).distinct.length == 1)
      val posId = sorted.head.getLong(1)
      assert(posId != aId && docs(posId) == docs(aId))
      // negatives: different language, descending similarity
      for (r <- sorted) assert(docs(r.getLong(4)) != docs(aId))
      val negCos = sorted.map(_.getDouble(5))
      assert(negCos.toSeq == negCos.sortBy(-_).toSeq)
    }
  }

  test("e23 JL funnel: 10 rows, descending, rerun-stable, real recall") {
    val out = q("e23_jl_funnel").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 10)
    assert(out.map(_._1).distinct.length == 10)
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
    val again = q("e23_jl_funnel").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq == out.toSeq)
    val qv = queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
    val exact = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val overlap = out.map(_._1).count(exact.contains)
    assert(overlap >= 3, s"JL funnel recall@10 too low: $overlap/10")
  }

  test("e23 kernel, HOF lambda and driver mirror agree bit-for-bit") {
    val both = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        queries.Round14Queries.jlProjectCol.as("kernel"),
        queries.Round14Queries.jlProjectHofCol.as("hof"))
      .collect()
    assert(both.nonEmpty)
    for (r <- both)
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"kernel != lambda on vec ${r.getLong(0)}")
    val x = queries.VectorQueries.qvec(spark, TestSpark.sf, 7L)
    val mirror = queries.Round14Queries.jlProjectS(x)
    val fromPlan = both.find(_.getLong(0) == 7L).get.getSeq[Double](1)
    assert(fromPlan.toArray.toSeq == mirror.toSeq)
  }

  test("d29 chunks tile every doc: counts, offsets, coverage, fingerprint") {
    val out = q("d29_sliding_chunks").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val lens = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.wordHashes(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == lens.filter(_._2 > 0).keySet)
    for ((id, chunks) <- byDoc) {
      val n = lens(id)
      val expected = if (n <= 50) 1L else 1L + (n - 11) / 40
      assert(chunks.length.toLong == expected, s"doc $id: $n tokens")
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until chunks.length).toSeq)
      for (c <- sorted) {
        assert(c._3 == c._2.toLong * 40)         // start = ix * stride
        assert(c._4 == math.min(50L, n - c._3))  // window or tail
        assert(c._4 > 0)
      }
      assert(sorted.last._3 + sorted.last._4 == n) // tiles to the end
    }
    // fingerprint replay on one doc
    val whs = Tables.documents(spark, TestSpark.sf).where(col("doc_id") === 0L)
      .select(graft.functions.TextFunctions.wordHashes(col("text")))
      .head.getSeq[Long](0)
    val P = graft.functions.TextFunctions.P
    for (c <- byDoc(0L).sortBy(_._2)) {
      val slice = whs.slice(c._3.toInt, (c._3 + c._4).toInt)
      val h = slice.foldLeft(0L)((acc, t) => (acc * 31 + t) % P)
      assert(c._5 == h)
    }
  }
}
