package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Scratch diagnostic for the 1M smoke's exact-search anchor. */
object Debug1M {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("debug1m")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val N = 2000000
    val corpus = spark.range(N).select(
      col("id"),
      transform(sequence(lit(0), lit(63)),
        j => (hash(col("id"), j).cast("double") / lit(2147483648.0))
          .cast("float"))
        .as("embedding"))

    val q = corpus.where(col("id") === 123456)
      .head.getSeq[Float](1).map(_.toDouble).toArray
    println(s"q head: ${q.take(4).mkString(", ")}")

    val top = corpus
      .select(col("id"), VF.l2sqLit(col("embedding"), q).as("d"))
      .orderBy(col("d"), col("id")).limit(5).collect()
    top.foreach(r => println(s"id=${r.getLong(0)} d=${r.getDouble(1)}"))

    val self = corpus.where(col("id") === 123456)
      .select(VF.l2sqLit(col("embedding"), q).as("d")).head.getDouble(0)
    println(s"self distance: $self")

    val dir = graft.util.TempDirs.create("graft_dbg1m").toString
    val idx = graft.store.QuantIndex.build(spark, corpus, s"$dir/index",
      graft.store.QuantConfig())
    println(s"index rows: ${idx.indexDf.count()}")
    val top2 = idx.indexDf
      .select(col("id"), VF.l2sqLit(col("embedding"), q).as("d"))
      .orderBy(col("d"), col("id")).limit(5).collect()
    top2.foreach(r => println(s"idx id=${r.getLong(0)} d=${r.getDouble(1)}"))
    val self2 = idx.indexDf.where(col("id") === 123456)
      .select(VF.l2sqLit(col("embedding"), q).as("d")).head.getDouble(0)
    println(s"idx self distance: $self2")

    // listener-based bytes for a full embedding scan vs a codes scan
    def bytesOf(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            acc.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        var prev = -1L; var w = 0
        while (acc.get != prev && w < 5000) { prev = acc.get; Thread.sleep(200); w += 200 }
        acc.get
      } finally spark.sparkContext.removeSparkListener(l)
    }
    def med3(body: => Unit): Double = {
      body
      Seq.fill(3) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    def exactT(): Unit =
      idx.indexDf.select(col("id"), VF.l2sqLit(col("embedding"), q).as("d"))
        .orderBy(col("d"), col("id")).limit(10).collect()
    def ivfpqT(): Unit = idx.searchIvfPq(q, 10, nprobe = 2).collect()
    def ivfT(): Unit = idx.searchIvf(q, 10, nprobe = 2).collect()
    println(f"aqe=on  exact=${med3(exactT())}%.3f ivfpq=${med3(ivfpqT())}%.3f")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"aqe=off exact=${med3(exactT())}%.3f ivfpq=${med3(ivfpqT())}%.3f ivf=${med3(ivfT())}%.3f")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
