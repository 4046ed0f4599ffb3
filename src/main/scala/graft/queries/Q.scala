package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent DuckDB oracle statement run by the
  * driver over the same parquet tables. Queries without an oracle get a
  * weaker rows-only check.
  *
  * Cross-engine determinism rules (SURVEY §2.9):
  *  - every DOUBLE that results from arithmetic is rounded to 6 decimals
  *    on BOTH sides (columns read straight from parquet stay raw);
  *  - sums over many rows go through DECIMAL casts (order-independent,
  *    exact) instead of floating accumulation;
  *  - every output is fully ordered by a unique key where cheap;
  *  - column names match exactly between the two dialects.
  *
  * `streaming` marks queries whose `run` executes a streaming query to
  * completion — plan-materializing them runs the stream, so structural
  * audits (PlanAuditSpec) skip them by this flag.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    lateOracle: () => Option[String] = () => None,
    streaming: Boolean = false) {

  /** The oracle to dump NOW. `lateOracle` serves queries whose DuckDB
    * twin embeds literals only known after the query has trained a
    * model on the target scale factor (e.g. e8's PQ codebooks): Verify
    * runs every query before dumping oracle_sql.json, so by dump time
    * the trained literals are available. If the query never ran in
    * this process the late oracle is empty and the driver falls back
    * to the rows-only check — never a wrong oracle.
    */
  def oracleNow: Option[String] = oracle.orElse(lateOracle())
}
