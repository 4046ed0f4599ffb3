package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.store.{QuantConfig, QuantModel}

/** Dev-only decomposition of QuantModel.train's wall clock (stats agg,
  * sample collect, each fit family) — measurement aid for the r15
  * optimization round; never invoked by the driver or the bench.
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val df = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    df.count() // warm parquet footers
    val cfg = QuantConfig()
    val slim = df.select(col("id"),
      col("embedding").cast("array<double>").as("e"))
    val dim = t("dim head")(df.select(size(col("embedding"))).head.getInt(0))
    val aggs =
      count(lit(1)) +: min(size(col("e"))) +: max(size(col("e"))) +:
        (0 until dim).flatMap(i => Seq(
          min(element_at(col("e"), i + 1)),
          max(element_at(col("e"), i + 1))))
    val row = t("stats agg")(slim.agg(aggs.head, aggs.tail: _*).head)
    val n = row.getLong(0)
    val step = math.max(1L, n / cfg.sampleCap)
    val sample = t("sample collect")(
      slim.where(pmod(col("id"), lit(step)) === 0)
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray))
    println(s"[probe] sample n=${sample.length} dim=$dim")
    val ivf = t("ivf fit")(QuantModel.fitSub(sample, cfg.ivfCells, cfg.seed + 2000))
    val sub = dim / cfg.pqSubspaces
    t("pq books")(QuantModel.parTabulate(cfg.pqSubspaces)(j =>
      QuantModel.fitSub(sample.map(_.slice(j * sub, (j + 1) * sub)),
        cfg.pqCentroids, cfg.seed + j)))
    t("pqr books") {
      val resSample = QuantModel.parTabulate(sample.length) { si =>
        val p = sample(si)
        val c = ivf.minBy(cc => graft.functions.VectorFunctions.l2sqS(cc, p))
        Array.tabulate(dim)(i => p(i) - c(i))
      }
      QuantModel.parTabulate(cfg.pqSubspaces)(j =>
        QuantModel.fitSub(resSample.map(_.slice(j * sub, (j + 1) * sub)),
          cfg.pqCentroids, cfg.seed + 1000 + j))
    }
    t("opq")(QuantModel.trainOpq(sample, cfg, dim))
    t("full train (concurrent)")(QuantModel.train(df, cfg))
    spark.stop()
  }
}
