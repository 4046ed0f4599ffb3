package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-8 surface: the Avro container source (splits + pruning), the
  * degree-oriented triangle count, and CDC merge semantics.
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def stageAvro(n: Int, parts: Int): String = {
    val dir = graft.util.TempDirs.create("avro_spec").toString
    spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat(lit("l"), (col("id") % 3).cast("string")).as("lang"),
        (col("id") * 7 % 1000).as("n_chars"))
      .repartition(parts, col("doc_id"))
      .write.format("avrograft").option("syncInterval", "512")
      .mode("append").save(dir)
    dir
  }

  test("avro roundtrip: schema inference + all rows back") {
    val dir = stageAvro(500, 3)
    val back = spark.read.format("avrograft").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(back.count() == 500)
    val sums = back.agg(sum("doc_id"), sum("n_chars")).collect()(0)
    assert(sums.getLong(0) == (0L until 500L).sum)
    assert(sums.getLong(1) == (0L until 500L).map(_ * 7 % 1000).sum)
  }

  test("avro byte-range splits partition one file without dup/loss") {
    val dir = stageAvro(2000, 1)
    val whole = spark.read.format("avrograft").load(dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // tiny split size forces many byte ranges over the single file
    val split = spark.read.format("avrograft")
      .option("maxSplitBytes", "1024").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      s"expected multiple splits, got ${split.rdd.getNumPartitions}")
    val rows = split.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == whole.toSeq)
    assert(rows.length == 2000)
  }

  test("avro column pruning reaches the scan") {
    val dir = stageAvro(100, 1)
    val plan = spark.read.format("avrograft").load(dir)
      .select("lang").queryExecution.executedPlan.toString
    assert(plan.contains("avrograft ReadSchema: struct<lang:string>"),
      s"pruned read schema not in scan:\n$plan")
  }

  test("avro sink: overwrite truncates, append accumulates, " +
    "nulls and wide types round-trip") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("avro_sink_spec").toString
    val df = Seq(
      (1L, Some("a"), 1.5, 2.5f, true, Some(Array[Byte](1, 2))),
      (2L, None, -0.25, 0f, false, None))
      .toDF("id", "s", "d", "f", "b", "bin")
    df.write.format("avrograft").mode("append").save(dir)
    df.write.format("avrograft").mode("append").save(dir)
    assert(spark.read.format("avrograft").load(dir).count() == 4,
      "append accumulates")
    df.write.format("avrograft").mode("overwrite").save(dir)
    val back = spark.read.format("avrograft").load(dir)
      .orderBy("id").collect()
    assert(back.length == 2, "overwrite truncates")
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "a")
    assert(back(0).getDouble(2) == 1.5 && back(0).getFloat(3) == 2.5f)
    assert(back(0).getBoolean(4))
    assert(back(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2))
    assert(back(1).isNullAt(1) && back(1).isNullAt(5), "nulls survive")
  }

  test("avro array<float> round-trips byte-losslessly (p14 path)") {
    val dir = graft.util.TempDirs.create("avro_vec_spec").toString
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .repartition(2)
      .write.format("avrograft").mode("overwrite").save(dir)
    val back = spark.read.format("avrograft").load(dir)
    assert(back.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(got.length == orig.size)
    got.foreach { case (id, v) =>
      assert(v == orig(id), s"vector $id drifted through avro")
    }
  }

  test("r78 triangle count matches a brute-force reference") {
    val row = graft.queries.Round8Queries.all
      .find(_.name == "r78_triangle_count").get.run(spark, sf).collect()(0)
    // brute force on the same graph, driver-side
    val li = Tables.lineitem(spark, sf)
      .where(to_date(col("l_shipdate")).between("1995-01-01", "1995-12-31"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder: Map[Long, Seq[Long]] =
      li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    val edges: Set[(Long, Long)] = byOrder.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var tri = 0L
    for ((a, b) <- edges; c <- adj.getOrElse(b, Set.empty))
      if (adj.getOrElse(a, Set.empty).contains(c)) tri += 1
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet.size
    assert(row.getLong(0) == nodes.toLong, "n_nodes")
    assert(row.getLong(1) == edges.size.toLong, "n_edges")
    assert(row.getLong(2) == tri, s"n_triangles: got ${row.getLong(2)} want $tri")
  }

  test("s23 streaming avro ingest picks up late files incrementally") {
    val row = graft.queries.Round8Queries.all
      .find(_.name == "s23_stream_avro_ingest").get.run(spark, sf)
      .agg(sum("n_docs"), sum("sum_chars")).collect()(0)
    val want = Tables.documents(spark, sf)
      .where(col("doc_id") < 2000)
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(row.getLong(0) == want.getLong(0), "doc count")
    assert(row.getLong(1) == want.getLong(1), "char sum")
  }

  test("int4 nibble pack and distance match driver-side math") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val codes = Seq.fill(20)(Array.fill(37)(rnd.nextInt(256)))
    val df = codes.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("i", "sq8")
    val packed = df.select(col("i"),
        graft.functions.VectorFunctions.nibblePack(col("sq8")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    codes.zipWithIndex.foreach { case (c, i) =>
      val want = graft.functions.VectorFunctions
        .nibblePackS(c.map(_.toLong))
      assert(packed(i).toSeq == want.toSeq, s"row $i pack mismatch")
    }
    // distance: expression result == brute-force over top nibbles
    val qp = graft.functions.VectorFunctions
      .nibblePackS(codes.head.map(_.toLong))
    val got = df.select(col("i"),
        graft.functions.VectorFunctions.nibbleL2(
          graft.functions.VectorFunctions.nibblePack(col("sq8")),
          typedLit(qp.toSeq)).as("d"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    codes.zipWithIndex.foreach { case (c, i) =>
      val want = c.zip(codes.head)
        .map { case (a, b) => val d = (a >> 4) - (b >> 4); d * d }.sum
      assert(got(i) == want, s"row $i dist ${got(i)} != $want")
    }
  }

  test("r79 merge preserves row-count identity") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val nUpd = orders.where(col("o_orderkey") % 10 === 0).count()
    val nDel = orders.where(col("o_orderkey") % 10 =!= 0 &&
      col("o_orderkey") % 97 === 3).count()
    val nIns = orders.where(col("o_orderkey") % 53 === 7).count()
    val out = graft.queries.Round8Queries.all
      .find(_.name == "r79_merge_upsert").get.run(spark, sf).collect()
    val mergedRows = out.map(_.getLong(1)).sum
    assert(mergedRows == total - nDel + nIns,
      s"merged $mergedRows vs ${total - nDel + nIns}")
    val uRow = out.find(_.getString(0) == "U")
    assert(uRow.exists(_.getLong(1) == nUpd), "updated rows keep status U")
    val nRow = out.find(_.getString(0) == "N")
    assert(nRow.exists(_.getLong(1) == nIns), "inserted rows have status N")
  }
}
