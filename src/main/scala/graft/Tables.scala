package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * `events.ts` has shipped in two physical layouts across rounds:
  * INT64 TIMESTAMP(NANOS) (rounds 1–6; Spark 4 only reads it with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing LONG
  * nanoseconds) and TIMESTAMP(MICROS) isAdjustedToUTC=false (round 7+;
  * Spark reads TIMESTAMP_NTZ). [[events]] normalizes BOTH to the same
  * logical view every event query and oracle is written against:
  * `ts_ns BIGINT` nanoseconds since epoch (DuckDB sees a timestamp
  * either way and uses `epoch_ns(ts)` for the identical view — the
  * sessions all run in UTC, so the NTZ→epoch cast is exact).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = {
    val df = load(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // already ns
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
