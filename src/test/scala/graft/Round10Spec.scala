package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def run(name: String) =
    queries.Registry.all.find(_.name == name).get.run(spark, sf)

  test("v20: rrf scores recompute from the emitted ranks; arms consistent") {
    val rows = run("v20_rrf_fusion").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Int])
      val rrf = r.getDouble(3)
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 1e-6, s"row $r: rrf $rrf != $want")
      assert(lex.isDefined || sem.isDefined, "row in neither arm")
    }
    // descending by fused score (ties by doc_id make it deterministic)
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the lexical arm's ranks must agree with d25's own ordering
    val bm25 = run("d25_bm25").collect()
      .map(r => r.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
      .toMap
    rows.foreach { r =>
      Option(r.get(1)).map(_.asInstanceOf[Int]).foreach { lr =>
        assert(bm25.get(r.getLong(0)).contains(lr),
          s"doc ${r.getLong(0)}: lex_rank $lr vs d25 ${bm25.get(r.getLong(0))}")
      }
    }
  }

  test("e18: single index scan (filtered aggregate), recall matches 2-pass") {
    val df = run("e18_ivf_recall_audit")
    // plan pin: ONE scan of the quant index feeds both top-10
    // aggregates (the FILTER (WHERE cell = qcell) form) — a second
    // scan would mean the probed aggregate re-read the corpus
    val plan = df.queryExecution.executedPlan.toString
    val scans = "graft_quant".r.findAllIn(plan).size
    assert(scans >= 1, s"no quant-index scan in plan:\n$plan")
    assert("(?i)scan parquet".r.findAllIn(plan).size <= 1,
      s"e18 must read the index once, found multiple parquet scans:\n$plan")
    val rows = df.collect()
    assert(rows.length == 10)
    // recompute recall the slow way: two independent top-10s
    val idx = queries.QuantCache.forDir(spark, sf)
    rows.foreach { r =>
      val qid = r.getLong(0)
      val qcell = r.getInt(1)
      val q = queries.VectorQueries.qvec(spark, sf, qid)
      assert(idx.model.ivfNearestCells(q, 1).head == qcell)
      val base = idx.indexDf.select(col("id"), col("embedding"), col("cell"))
      def top10(dfx: org.apache.spark.sql.DataFrame): Set[Long] =
        dfx.select(col("id"),
            graft.functions.VectorFunctions.l2sqLit(col("embedding"), q).as("d"))
          .orderBy(col("d"), col("id")).limit(10)
          .collect().map(_.getLong(0)).toSet
      val exact = top10(base)
      val probed = top10(base.where(col("cell") === qcell))
      val want = (exact intersect probed).size / 10.0
      assert(math.abs(r.getDouble(2) - want) < 1e-9,
        s"qid $qid: recall ${r.getDouble(2)} vs recomputed $want")
    }
  }
}
