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
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
