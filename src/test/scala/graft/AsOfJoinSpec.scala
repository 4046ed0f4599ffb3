package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("physical plan: AsOfJoinExec fed by hash exchanges and sorts") {
    graft.extensions.GraftExtensions.register(spark)
    val df = SparkEntry.queries("r40_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"operator not planned:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"no hash exchange on the key:\n$plan")
    assert(plan.contains("Sort ["), s"no sort before the merge:\n$plan")
  }

  test("native as-of equals the max-over-interval join semantics") {
    val native = SparkEntry.queries("r40_asof_native")(spark, sf)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
    val p = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), expr("ts div 1000").as("pus"))
    val expected = ev.join(p,
        col("user_id") === col("pu") && col("pus") <= col("us"), "left")
      .groupBy("event_id")
      .agg(max("pus").as("lp"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native.size == expected.size)
    assert(native == expected)
  }

  test("column pruning rule: unused left columns never reach the exchange") {
    graft.extensions.GraftExtensions.register(spark)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("us"), col("event_type"), col("props"))
    val p = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("pus"))
    val out = graft.plans.AsOfJoin(ev, p, "user_id", "us", "pus", "lp")
      .select("event_id", "lp")
    assert(out.count() > 0)
    val top = out.queryExecution.executedPlan
    val finalPlan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exec = finalPlan.collectFirst {
      case a: graft.plans.AsOfJoinExec => a
    }.get
    val leftCols = exec.left.output.map(_.name).toSet
    assert(!leftCols.contains("event_type") && !leftCols.contains("props"),
      s"unpruned left side: $leftCols")
  }

  test("withExtensions session plans AsOfJoin without manual registration") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extensions.GraftExtensions)
      .getOrCreate()
    import s2.implicits._
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m")
      .orderBy("k").collect()
    assert(out.map(x => (x.getLong(0),
      if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq ==
      Seq((1L, 5L), (2L, -1L)))
  }

  test("as-of over an empty right side yields all-null matches") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq.empty[(Long, Long)].toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(2)))
  }

  test("null times: left null time matches nothing; right null time skipped") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, Some(10L)), (1L, None), (2L, Some(5L)))
      .toDF("k", "t")
    // right row (2, null) must NOT unbox to epoch 0 and match (2, 5)
    val r = Seq((1L, Some(4L)), (2L, Option.empty[Long])).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m")
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    assert(out == Seq((1L, -1L), (1L, 4L), (2L, -1L)))
  }

  test("direction=forward: smallest right time >= left time") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 12L), (1L, 30L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L), (1L, 12L), (1L, 20L), (2L, 3L)).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m", "forward")
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    assert(out == Seq((1L, 10L, 12L), (1L, 12L, 12L), (1L, 30L, -1L),
      (2L, 10L, -1L)))
  }

  test("direction=nearest: closer of backward/forward, ties backward") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 14L), (1L, 100L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 8L), (1L, 16L), (2L, 50L)).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m", "nearest")
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    // t=10: back 8 (d=2) vs fwd 16 (d=6) -> 8; t=14: back 8 (d=6) vs
    // fwd 16 (d=2) -> 16; t=100: only back 16; k=2 t=10: only fwd 50.
    assert(out == Seq((1L, 10L, 8L), (1L, 14L, 16L), (1L, 100L, 16L),
      (2L, 10L, 50L)))
  }

  test("direction=nearest: equidistant tie prefers backward") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 7L), (1L, 13L)).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m", "nearest")
      .collect()
    assert(out.head.getLong(2) == 7L)
  }

  test("ties: a right row at exactly leftTime matches (<= semantics)") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 15L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L), (1L, 12L), (3L, 1L)).toDF("k", "t")
    val out = graft.plans.AsOfJoin(l, r, "k", "t", "t", "m")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq((1L, 10L, 10L), (1L, 15L, 12L), (2L, 10L, -1L)))
  }
}
