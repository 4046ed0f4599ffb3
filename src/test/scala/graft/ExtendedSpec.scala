package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.TextHash
import graft.functions.{TextFunctions => TF}

class ExtendedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text poly hash: empty string is 0, fold matches definition") {
    assert(TextHash.polyHash("", 100) == 0L)
    // "ab" -> ((0*31 + 97) % P)*31 + 98 % P
    assert(TextHash.polyHash("ab", 100) == 97L * 31 + 98)
    // truncation
    assert(TextHash.polyHash("abcdef", 2) == TextHash.polyHash("ab", 100))
  }

  test("word hashes keep empty tokens (split -1 semantics)") {
    import spark.implicits._
    val r = Seq("a  b", "", "x").toDF("text")
      .select(TF.wordHashes(col("text")).as("wh"))
      .collect().map(_.getSeq[Long](0))
    assert(r(0).length == 3 && r(0)(1) == 0L)
    assert(r(1) == Seq(0L))
    assert(r(2) == Seq(TextHash.polyHash("x", Int.MaxValue)))
  }

  test("p1_pca: scalar projection norms, deterministic across fits") {
    val a = run("p1_pca").collect()
    assert(a.length == 500)
    val b = run("p1_pca").collect()
    assert(a.map(_.getDouble(1)).toSeq == b.map(_.getDouble(1)).toSeq)
  }

  test("p1_pca captures variance: projected norms nonzero and bounded") {
    val rows = run("p1_pca").collect()
    val norms = rows.map(_.getDouble(1))
    val meanNorm = norms.sum / norms.length
    assert(meanNorm > 0.1, s"mean projected norm $meanNorm")
    // projection onto an 8-D subspace can't exceed the input norm
    val maxIn = Tables.embeddings(spark, sf)
      .select(sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .agg(max("n")).head.getDouble(0)
    assert(norms.max <= maxIn + 1e-6, s"max pc_norm ${norms.max} > $maxIn")
  }

  test("r16_pivot row sums equal group counts") {
    val p = run("r16_pivot").collect()
    val total = p.map(r =>
      (1 to 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("r17 sessions: counts sum to events, bounds ordered") {
    val rows = run("r17_sessionize").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4)))
  }

  test("s2 sliding: every tumbling event appears in 4 sliding windows") {
    val n_slide = run("s2_stream_sliding").agg(sum("n")).head.getLong(0)
    val ev = Tables.events(spark, sf)
      .select(expr("ts div 1000").as("us"))
    val mx = ev.agg(max("us")).head.getLong(0)
    // events whose all-4 windows close below the watermark contribute 4;
    // near-tail events contribute fewer — so 4×(events fully inside).
    val full = ev.where(
      (expr("us div 1800000000") + 1) * 1800000000L + 5400000000L <= mx - 600000000L)
      .count()
    assert(n_slide >= full * 4, s"slide=$n_slide full4=${full * 4}")
  }
}

class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("SQL function registration: vec kernels usable from spark.sql") {
    graft.extensions.GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT vec_id, vec_l2sq(embedding, embedding) AS z,
        |       vec_norm(embedding) AS n, vec_safe_norm(embedding) AS sn,
        |       vec_dot(embedding, vec_l2normalize(embedding)) AS dn,
        |       text_poly_hash('ab') AS h
        |FROM emb_v WHERE vec_id = 0""".stripMargin).head
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) > 0 && r.getDouble(2) == r.getDouble(3))
    // dot(v, v/||v||) == ||v|| up to fp
    assert(math.abs(r.getDouble(4) - r.getDouble(2)) < 1e-9)
    assert(r.getLong(5) == 97L * 31 + 98)
  }

  test("session built withExtensions resolves graft functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extensions.GraftExtensions)
      .getOrCreate()
    val v = s2.sql("SELECT text_poly_hash('x') AS h").head.getLong(0)
    assert(v == 'x'.toLong)
  }

  test("e4 centroids: 10 labels x 64 dims, matches manual mean") {
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("e4_vec_centroids")(spark2, sf).collect()
    assert(rows.length == 640)
    // spot-check one (label, dim) against a direct computation
    val l0d0 = rows.find(r => r.getInt(0) == 0 && r.getLong(1) == 0L).get.getDouble(2)
    val direct = Tables.embeddings(spark2, sf).where(col("label") === 0)
      .select(avg(element_at(col("embedding"), 1).cast("double"))).head.getDouble(0)
    assert(math.abs(l0d0 - BigDecimal(direct).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("r18 as-of: last purchase is <= event time and is a purchase ts") {
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark2, sf)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("pus"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = SparkEntry.queries("r18_asof_join")(spark2, sf)
      .where(col("last_purchase_us").isNotNull).limit(200).collect()
    out.foreach { r =>
      assert(purchases.contains((r.getLong(1), r.getLong(2))),
        s"last_purchase_us not a purchase: $r")
    }
  }
}

class NullSafetySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.functions.{VectorFunctions => VF, TextFunctions => TF}

  test("vector kernels propagate null inputs as null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(
      VF.l2sq(col("a"), col("b")).as("d"),
      VF.dot(col("b"), col("a")).as("p"),
      VF.norm(col("b")).as("n"),
      VF.l2normalize(col("b")).as("z")).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("text kernels propagate null inputs as null") {
    import spark.implicits._
    val df = Seq((Option.empty[String], "x")).toDF("t", "u")
    val r = df.select(
      TF.polyHash(col("t")).as("h"),
      TF.wordHashes(col("t")).as("wh")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("empty array through kernels: zero distance/norm, empty normalize") {
    import spark.implicits._
    val df = Seq(Seq.empty[Float]).toDF("a")
    val r = df.select(
      VF.l2sq(col("a"), col("a")).as("d"),
      VF.norm(col("a")).as("n"),
      VF.safeNorm(col("a")).as("sn"),
      VF.l2normalize(col("a")).as("z")).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getSeq[Double](3).isEmpty)
  }
}

class ApproxSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("approx quantiles within tolerance of exact") {
    val row = SparkEntry.queries("r7_approx_quantiles")(spark, TestSpark.sf)
      .head
    val emitted = Seq(row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val exact = Tables.events(spark, TestSpark.sf)
      .agg(percentile(col("value"), array(lit(0.25), lit(0.5), lit(0.75))))
      .head.getSeq[Double](0)
    emitted.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 1e-6, s"emitted exact=$a recomputed=$e")
    }
    assert(row.getInt(3) == 1, "approx quantiles outside tolerance of exact")
  }

  test("salted aggregation equals direct aggregation") {
    val salted = SparkEntry.queries("r19_salted_agg")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    import org.apache.spark.sql.types.DecimalType
    val direct = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }
}

class SampleSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("a6 seeded sample is deterministic and plausibly sized") {
    val spark = TestSpark.spark
    val a = SparkEntry.queries("a6_sample")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("a6_sample")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val n = Tables.orders(spark, TestSpark.sf).count()
    assert(a.length > n * 0.01 && a.length < n * 0.15)
  }
}

class TopKAggSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("TopKAgg batch kNN equals the window formulation row-for-row") {
    val spark = TestSpark.spark
    def rows(n: String) = SparkEntry.queries(n)(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows("e5_batch_knn_agg") == rows("v6_batch_knn"))
  }

  test("TopKAgg unit semantics: bounded, ascending, ties by id") {
    val agg = graft.functions.TopKAgg(3)
    val b = Seq((5L, 2.0), (1L, 1.0), (9L, 3.0), (2L, 1.0), (7L, 0.5))
      .foldLeft(agg.zero)(agg.reduce)
    assert(b == Seq((7L, 0.5), (1L, 1.0), (2L, 1.0)))
    val merged = agg.merge(b, Seq((0L, 0.1), (3L, 1.0)))
    assert(merged == Seq((0L, 0.1), (7L, 0.5), (1L, 1.0)))
  }
}
