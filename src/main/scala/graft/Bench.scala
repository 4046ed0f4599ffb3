package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round; BASELINE.md protocol).
  *
  * Runs every registered query once warm (after a short JVM/Catalyst
  * warm-up pass) against SPARK_GRAFT_SF_DIR and prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * Timings are wall-clock around a full materialization (count of the
  * final plan), the same steady-state-after-warmup shape the reference
  * measured (`performance_analysis.py:60-70`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JVM/codegen/parquet-footer caches (not timed).
    try SparkEntry.queries("v1_knn")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
