package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{QuantConfig, QuantIndex, QuantTier}

/** One-off probe: where does a small-index compact() spend its time?
  * Usage: runMain graft.dev.CompactProbe
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val Dim = 64
    def gen(from: Long, until: Long) =
      spark.range(from, until).select(
        col("id"),
        transform(sequence(lit(0), lit(Dim - 1)),
          j => (hash(col("id"), j).cast("double") / lit(2147483648.0))
            .cast("float"))
          .as("embedding"))
    val dir = graft.util.TempDirs.create("graft_cprobe").toString + "/index"
    var idx: QuantIndex = null
    timed("build 1k") { idx = QuantIndex.build(spark, gen(0, 1000), dir,
      QuantConfig(tiers = Set(QuantTier.Pq))) }
    timed("10 adds")((0 until 10).foreach(i =>
      idx.add(gen(1000 + i * 1000, 1000 + (i + 1) * 1000))))
    timed("compact")(idx.compact(targetRowsPerFile = 1 << 20,
      vacuumGraceMs = 0L))
    timed("count")(idx.indexDf.count())
    spark.stop()
  }
}
