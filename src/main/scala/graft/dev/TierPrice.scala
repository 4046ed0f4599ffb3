package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.store.{QuantConfig, QuantIndex, QuantTier}

/** Price each quantization tier's build cost in isolation (dev tool,
  * feeds the BASELINE.md per-tier table): for the full set, the
  * legacy no-opq set, and each singleton tier, time
  * [[QuantIndex.build]] over the sf embeddings and report the
  * train/encode phase split plus the stored bytes per column.
  *
  * Usage: runMain graft.dev.TierPrice [sfDir]
  * Prints one line per selection:
  *   tiers=<sel> build=<s> train=<s> encode=<s> mb={col=..,..}
  */
object TierPrice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding"))
      .localCheckpoint(true) // price the BUILD, not the source scan

    // singletons first: the composite rows then measure steady-state
    // build cost, not first-use JIT (breeze SVD, codegen kernels)
    val selections: Seq[(String, Set[String])] =
      QuantTier.All.toSeq.sorted.map(t => t -> Set(t)) ++
        Seq("all_minus_opq" -> (QuantTier.All - QuantTier.Opq),
          "all" -> QuantTier.All)

    // one untimed warm-up build (JVM/codegen warmth)
    QuantIndex.build(spark, emb,
      graft.util.TempDirs.create("graft_tierprice_warm").toString + "/index",
      QuantConfig(tiers = Set(QuantTier.Bitq)))

    selections.foreach { case (name, tiers) =>
      val path =
        graft.util.TempDirs.create(s"graft_tierprice_$name").toString + "/index"
      val t0 = System.nanoTime()
      val idx = QuantIndex.build(spark, emb, path, QuantConfig(tiers = tiers))
      val secs = (System.nanoTime() - t0) / 1e9
      val phases = QuantIndex.lastBuildPhases.toMap
      val mb = QuantIndex.columnMb(spark, idx.dataDir).toSeq.sortBy(_._1)
        .map { case (c, v) => f"$c=$v%.2f" }.mkString(",")
      println(f"[tierprice] tiers=$name%-14s build=$secs%7.2f " +
        f"train=${phases.getOrElse("train", 0.0)}%7.2f " +
        f"encode=${phases.getOrElse("encode", 0.0)}%7.2f mb={$mb}")
    }
    spark.stop()
  }
}
