package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-4 relational additions: the remaining classic TPC-H shapes
  * expressible on the driver testdata schema. The testdata lacks
  * `l_receiptdate`/`l_commitdate`/`l_shipmode`, so Q4 and Q12 keep
  * their operator SHAPE (correlated-EXISTS semi-join; two-level
  * conditional counts over a join) with adapted predicates, the same
  * adaptation discipline as the partsupp-free Q9/Q16 in round 3.
  */
object Round4Queries {

  val all: Seq[Q] = Seq(

    // R57 — TPC-H Q4 shape (order-priority checking): count orders per
    // priority in a quarter having AT LEAST ONE late-shipped line
    // (shipdate > orderdate + 60 days stands in for the reference's
    // receipt>commit). Plans as a LEFT SEMI join: the equi key joins,
    // the range predicate filters inside the join — no duplicate
    // orders, no distinct, and the orders scan carries the date
    // pushdown.
    Q("r57_tpch_q4",
      (s, d) => Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1996-04-01'
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem
          |    WHERE l_orderkey = o_orderkey
          |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R58 — TPC-H Q12 shape (shipping-mode priority split): per
    // category (l_returnflag stands in for l_shipmode), conditional
    // counts of high- vs low-priority orders over the orders⋈lineitem
    // join with a ship-year pushdown. The two CASE sums are one
    // partial-aggregated pass — never two scans.
    Q("r58_tpch_q12",
      (s, d) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R59 — TPC-H Q14 (promotion effect): promo revenue share for one
    // ship month. Both sums accumulate in DECIMAL (exact, order-
    // independent at any parallelism) and only the final ratio drops
    // to DOUBLE; part is the broadcast side of the join.
    Q("r59_tpch_q14",
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))
        val zero = lit(0).cast(DecimalType(18, 6))
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) *
              sum(when(col("p_type").like("PROMO%"), rev).otherwise(zero))
                .cast("double") /
              sum(rev).cast("double"),
            6).as("promo_revenue"))
      },
      Some("""SELECT round(100.0 *
          |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
          |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
          |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
          |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin))
  )
}
