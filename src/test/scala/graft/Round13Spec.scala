package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 operator semantics: trained NB classifier (d27), CCNet
  * per-lang terciles (d28), margin bitext mining (e20), global shuffle
  * index (p18). The DuckDB hash gate checks cross-engine equality;
  * these tests pin the INTERNAL contracts the oracle can't see.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    queries.Registry.all.find(_.name == name).get.run(spark, TestSpark.sf)

  test("d27 classifies every held-out doc exactly once, over all 5 classes") {
    val out = q("d27_nb_langid").collect()
    val held = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") % 3 === 0).count()
    assert(out.length == held)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val langs = Tables.documents(spark, TestSpark.sf)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(2)).toSet.subsetOf(langs))
    assert(out.forall(r => Set(0, 1).contains(r.getInt(4))))
    // winner really is the max: correct=1 iff pred equals true lang
    assert(out.forall(r => (r.getString(1) == r.getString(2)) == (r.getInt(4) == 1)))
  }

  test("d27 argmax agrees with a driver-side replay on one doc") {
    // replay the integer scoring for the smallest held-out doc
    val docs = Tables.documents(spark, TestSpark.sf)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.TextFunctions.wordHashes(col("text"))).as("wh"))
    val train = toks.where(col("doc_id") % 3 =!= 0).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val byClass = train.groupBy(_._1)
    val v = train.map(_._2).distinct.length
    val target = toks.where(col("doc_id") === 0).collect().map(_.getLong(2))
    val scores = byClass.map { case (cls, rows) =>
      val nC = rows.length
      val cnt = rows.groupBy(_._2).map { case (w, g) => (w, g.length.toLong) }
      val s = target.map(w =>
        (cnt.getOrElse(w, 0L) + 1L) * 1000000L / (nC + v)).sum
      (cls, s)
    }
    val expected = scores.toSeq.sortBy { case (c, s) => (-s, c) }.head
    val got = q("d27_nb_langid").where(col("doc_id") === 0).collect().head
    assert(got.getString(2) == expected._1)
    assert(got.getLong(3) == expected._2)
  }

  test("d28 buckets are per-lang terciles: each lang has all three buckets" +
    " and head fluency >= tail fluency") {
    val out = q("d28_ccnet_buckets")
      .select("lang", "bucket", "fluency_micro").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val langs = out.map(_._1).distinct
    assert(langs.length == 5)
    for (l <- langs) {
      val g = out.filter(_._1 == l)
      val heads = g.filter(_._2 == "head").map(_._3)
      val tails = g.filter(_._2 == "tail").map(_._3)
      val mids = g.filter(_._2 == "middle").map(_._3)
      assert(heads.nonEmpty && tails.nonEmpty,
        s"$l missing a tercile: ${g.groupBy(_._2).view.mapValues(_.length).toMap}")
      assert(heads.min >= mids.max || mids.isEmpty)
      assert(mids.isEmpty || mids.min >= tails.max)
      // tercile masses: no bucket more than ~2/3 of the lang (ties
      // can unbalance, but not collapse the split)
      assert(heads.length <= 2 * g.length / 3 + 1)
    }
  }

  test("e20 mines exactly one best french doc per english doc, margin near 1") {
    val out = q("e20_bitext_margin").collect()
    val en = Tables.documents(spark, TestSpark.sf)
      .where(col("lang") === "en").count()
    val fr = Tables.documents(spark, TestSpark.sf)
      .where(col("lang") === "fr")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.length == en)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => fr.contains(r.getLong(1))))
    // ratio margin of the per-x best candidate: cos(best) over the
    // mean of two 4-NN neighborhoods — bounded and centred near 1
    assert(out.forall(r => r.getDouble(2) > 0.5 && r.getDouble(2) < 2.5),
      s"margin out of range: ${out.map(_.getDouble(2)).min}..${out.map(_.getDouble(2)).max}")
  }

  test("e21 prefix funnel returns 10 rows from the coarse top-50, rerun-stable") {
    val out = q("e21_matryoshka_prefix").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 10)
    assert(out.map(_._1).distinct.length == 10)
    // descending full-dim cosine
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
    val again = q("e21_matryoshka_prefix").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq == out.toSeq)
    // the funnel recalls most of the exact full-dim top-10: prefix
    // dims of random embeddings still rank-correlate enough that the
    // 50-candidate pool catches the true neighbors
    val qv = queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
    val exact = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val overlap = out.map(_._1).count(exact.contains)
    assert(overlap >= 3, s"prefix funnel recall@10 too low: $overlap/10")
  }

  test("s25 gates every stream doc exactly once and fills both sinks") {
    val out = q("s25_stream_neardup_gate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") % 4 === 0).count()
    assert(out.length == expected)
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => (r._2 == "dup") == (r._3 > 0)))
    val sinks = out.map(_._2).toSet
    assert(sinks == Set("dup", "unique"),
      s"expected both sinks at ${TestSpark.sf}: got $sinks")
  }

  test("p18 global_ix is a permutation consistent with the (shard,h,id) sort") {
    val out = q("p18_global_shuffle_index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = out.length
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq)
    // shards are contiguous runs in global order
    val ordered = out.sortBy(_._3).map(_._2)
    assert(ordered.toSeq == ordered.sorted.toSeq)
    // determinism: a rerun yields the identical assignment
    val again = q("p18_global_shuffle_index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }
}
