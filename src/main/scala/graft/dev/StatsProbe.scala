package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: cold-JVM cost of the two stats-pass shapes (129-expression
  * single agg vs posexplode+groupBy). Run with GRAFT_STATS_MODE=agg|pos.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = sys.env.getOrElse("GRAFT_STATS_MODE", "agg")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    df.count() // warm footers (bench has a warm-up query too)
    val slim = df.select(col("id"), col("embedding").cast("array<double>").as("e"))
    val dim = 64
    val t0 = System.nanoTime()
    mode match {
      case "agg" =>
        val aggs =
          count(lit(1)) +: min(size(col("e"))) +: max(size(col("e"))) +:
            (0 until dim).flatMap(i => Seq(
              min(element_at(col("e"), i + 1)),
              max(element_at(col("e"), i + 1))))
        slim.agg(aggs.head, aggs.tail: _*).head
      case _ =>
        slim.select(posexplode(col("e")).as(Seq("i", "x")))
          .groupBy("i")
          .agg(min(col("x").cast("double")), max(col("x").cast("double")),
            count(lit(1)))
          .orderBy("i").collect()
    }
    println(f"[probe] stats($mode): ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
