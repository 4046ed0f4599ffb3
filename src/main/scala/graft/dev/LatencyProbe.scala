package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.VectorQueries
import graft.store.VectorStore

/** Dev tool: decompose the single-query kNN latency floor. */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding"))
      .coalesce(4).cache()
    emb.count()
    val qs = (0L until 30L).map(VectorQueries.qvec(spark, sfDir, _))

    def run(label: String)(f: Array[Double] => Unit): Unit = {
      qs.take(10).foreach(f) // warm
      val t0 = System.nanoTime()
      qs.foreach(f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / qs.size}%.2f ms/query")
    }

    run("aqe-on  collect")(q => VectorStore.searchIn(emb, q, 10).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe-off collect")(q => VectorStore.searchIn(emb, q, 10).collect())
    // plan-only: how much is Catalyst vs execution?
    run("plan-only      ")(q =>
      VectorStore.searchIn(emb, q, 10).queryExecution.executedPlan)
    val emb1 = emb.coalesce(1).cache(); emb1.count()
    run("1-part  collect")(q => VectorStore.searchIn(emb1, q, 10).collect())
    spark.stop()
  }
}
