package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared inventory (SURVEY §2.9 + the
  * training-pipeline extensions); `oracleSql` carries the DuckDB twin
  * for every SQL-expressible query. Approximate / pruned operators
  * (HLL estimate, multi-probe LSH search) are rows-only checked and
  * covered by ScalaTest properties instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * exact kNN (top-10 squared-L2 neighbors of vec_id 0) — the
    * reference's `POST /search` path as one DataFrame chain.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("v1_knn")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(Registry.all.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ListMap(Registry.all.flatMap(q => q.oracleNow.map(q.name -> _)): _*)
}
