package graft.queries

import org.apache.spark.sql.expressions.Window
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
          |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin)),

    // R60 — TPC-H Q6 (forecasting revenue change): the canonical
    // scan-only query. Every predicate is parquet-pushable
    // (PushedFilters on l_shipdate/l_discount/l_quantity), the sum
    // accumulates in DECIMAL (order-independent at any parallelism),
    // and the plan is a single WholeStageCodegen span with no shuffle
    // beyond the final 1-row partial-agg merge — exactly the plan that
    // scales linearly to 100 TB.
    Q("r60_tpch_q6",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.08) && col("l_quantity") < 24)
        .agg(round(
          sum((col("l_extendedprice") * col("l_discount"))
            .cast(DecimalType(18, 6))).cast("double"), 6).as("revenue")),
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount BETWEEN 0.04 AND 0.08
          |  AND l_quantity < 24""".stripMargin)),

    // R61 — TPC-H Q13 (customer order-count distribution): LEFT join
    // with the filter INSIDE the join condition (an o_orderpriority
    // predicate stands in for the reference's o_comment NOT LIKE),
    // then two cascaded aggregations. The first groupBy shuffles on
    // c_custkey; the second is a near-free re-agg over ≤|distinct
    // counts| rows. Customers with zero orders survive the left join
    // (count(o_orderkey)=0), which is the whole point of Q13.
    Q("r61_tpch_q13",
      (s, d) => Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderpriority"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count")),
      Some("""SELECT c_count, count(*) AS custdist
          |FROM (
          |  SELECT c_custkey, count(o_orderkey) AS c_count
          |  FROM customer LEFT JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |  GROUP BY 1)
          |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // R62 — TPC-H Q15 (top supplier): per-supplier quarterly revenue,
    // then the max-revenue supplier(s) via a 1-row broadcast join —
    // never a global sort. Revenue sums are exact DECIMAL so the
    // double equality against the max is deterministic cross-engine.
    // The per-supplier agg is the only real shuffle; everything after
    // operates on |suppliers| rows.
    Q("r62_tpch_q15",
      (s, d) => {
        val revExpr = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))
        val rev = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(revExpr).cast("double").as("total_revenue"))
        val top = rev.join(
          broadcast(rev.agg(max("total_revenue").as("max_revenue"))),
          col("total_revenue") === col("max_revenue"))
        Tables.supplier(s, d)
          .join(broadcast(top), col("s_suppkey") === col("supplier_no"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_revenue"), 6).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |    AND l_shipdate < TIMESTAMP '1996-04-01'
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue
          |FROM supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)),

    // R63 — TPC-H Q17 (small-quantity-order revenue): the correlated
    // avg-quantity subquery becomes a per-part aggregate joined back
    // to the fact — Spark's standard decorrelation, written explicitly
    // so the threshold arithmetic (0.2 * (exact-DECIMAL sum → double
    // / count)) is bit-identical in both engines. The brand/size part
    // filter broadcasts; the per-part threshold agg is the one
    // full-fact shuffle.
    Q("r63_tpch_q17",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val thresh = li.groupBy(col("l_partkey").as("t_partkey"))
          .agg((lit(0.2) *
            (sum(col("l_quantity").cast(DecimalType(18, 6))).cast("double") /
              count(lit(1)))).as("qty_thresh"))
        val parts = Tables.part(s, d)
          .where(col("p_brand") === "Brand#13" && col("p_size") < 15)
          .select("p_partkey")
        li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(thresh, col("l_partkey") === col("t_partkey"))
          .where(col("l_quantity") < col("qty_thresh"))
          .agg(round(
            sum(col("l_extendedprice").cast(DecimalType(18, 6)))
              .cast("double") / 7.0, 6).as("avg_yearly"))
      },
      Some("""WITH pa AS (
          |  SELECT l_partkey AS t_partkey,
          |    0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
          |      / count(*)) AS qty_thresh
          |  FROM lineitem GROUP BY 1)
          |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
          |    AS DOUBLE) / 7.0, 6) AS avg_yearly
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey
          |JOIN pa ON t_partkey = l_partkey
          |WHERE p_brand = 'Brand#13' AND p_size < 15
          |  AND l_quantity < qty_thresh""".stripMargin)),

    // R64 — TPC-H Q19 (discounted revenue, disjunctive predicates):
    // three OR'd brand/size/quantity branches. The part side is
    // pre-filtered with the part-only disjunction (broadcastable even
    // at scale: ~3 brands × small sizes), the lineitem side carries
    // the derivable l_quantity ∈ [1,30] envelope so the range reaches
    // the parquet scan, and the equi key l_partkey=p_partkey still
    // drives the join with the residual OR as a post-condition.
    Q("r64_tpch_q19",
      (s, d) => {
        val b1 = col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
        val b2 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
        val b3 = col("p_brand") === "Brand#4" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
        val pf = Tables.part(s, d).where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#4" && col("p_size").between(1, 15)))
        Tables.lineitem(s, d)
          .where(col("l_quantity").between(1, 30))
          .join(broadcast(pf),
            col("l_partkey") === col("p_partkey") && (b1 || b2 || b3))
          .agg(round(
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(18, 6))).cast("double"), 6).as("revenue"))
      },
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          |       AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          |       AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // R65 — TPC-H Q21 shape (suppliers who kept orders waiting): the
    // testdata lacks l_receiptdate/l_commitdate, so "late" is
    // l_shipdate > o_orderdate + 90 days (same adaptation family as
    // Q4). The EXISTS becomes a LEFT SEMI join (another supplier has
    // a line on the order), the NOT EXISTS a LEFT ANTI join (no OTHER
    // supplier was late on it) — both keep l_orderkey as the equi key
    // with the supplier/date residuals inside the join, so each is
    // one shuffle on orderkey, never a cartesian.
    Q("r65_tpch_q21",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val lateBy90 = col("o_orderdate") + expr("INTERVAL 90 DAYS")
        val base = li.join(
          Tables.orders(s, d).where(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > lateBy90)
        val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
          col("l_suppkey").as("l2_suppkey"))
        val l3 = li.select(col("l_orderkey").as("l3_orderkey"),
          col("l_suppkey").as("l3_suppkey"), col("l_shipdate").as("l3_shipdate"))
        base
          .join(l2, col("l2_orderkey") === col("l_orderkey") &&
            col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
          .join(l3, col("l3_orderkey") === col("l_orderkey") &&
            col("l3_suppkey") =!= col("l_suppkey") &&
            col("l3_shipdate") > lateBy90, "left_anti")
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), col("s_name"))
      },
      Some("""SELECT s_name, count(*) AS numwait
          |FROM supplier, lineitem l1, orders
          |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
          |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin)),

    // R66 — TPC-H Q2 shape (minimum-cost supplier): the testdata has
    // no partsupp, so DISTINCT (l_partkey, l_suppkey) from lineitem
    // stands in for it and s_acctbal for ps_supplycost — the
    // correlated-min-per-part semantics are intact. The min is a
    // window over the part key on the already part-filtered rows
    // (one shuffle, no self-join); suppliers×nation×region EUROPE
    // and the filtered part list both broadcast.
    Q("r66_tpch_q2",
      (s, d) => {
        val supEur = Tables.supplier(s, d)
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d).where(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_acctbal", "s_name", "n_name")
        val parts = Tables.part(s, d)
          .where(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        // Part filter BEFORE the distinct: the correlated min only
        // matters for parts that survive the size/type filter, so the
        // (partkey, suppkey) distinct shuffle shrinks ~|filtered part|
        // / |part| — the difference between shuffling the whole fact
        // and a sliver of it at 100 TB.
        val elig = Tables.lineitem(s, d)
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .select("l_partkey", "l_suppkey", "p_partkey", "p_name").distinct()
          .join(broadcast(supEur), col("l_suppkey") === col("s_suppkey"))
        elig
          .withColumn("min_bal",
            min("s_acctbal").over(Window.partitionBy("l_partkey")))
          .where(col("s_acctbal") === col("min_bal"))
          .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
            col("p_partkey"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
          |elig AS (
          |  SELECT l_partkey, s_acctbal, s_name, n_name
          |  FROM ps
          |  JOIN supplier ON s_suppkey = l_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'EUROPE')
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
          |FROM elig JOIN part ON p_partkey = l_partkey
          |WHERE p_size = 15 AND p_type = 'STANDARD'
          |  AND s_acctbal = (SELECT min(e2.s_acctbal) FROM elig e2
          |                   WHERE e2.l_partkey = elig.l_partkey)
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin)),

    // R67 — TPC-H Q11 shape (important stock): per-part value among
    // one nation's suppliers vs a fraction of the global total. Both
    // the per-part values and the grand total stay DECIMAL-exact; the
    // total is the sum of the per-part sums, so AQE's ReuseExchange
    // serves both branches from ONE shuffle of the fact. The
    // threshold joins back as a 1-row broadcast.
    Q("r67_tpch_q11",
      (s, d) => {
        val supN = Tables.supplier(s, d)
          .join(Tables.nation(s, d).where(col("n_name") === "NATION_12"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val v = Tables.lineitem(s, d)
          .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
          .groupBy("l_partkey")
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 6))).as("pvd"))
        v.crossJoin(broadcast(
            v.agg((sum(col("pvd")).cast("double") * lit(0.001)).as("thresh"))))
          .where(col("pvd").cast("double") > col("thresh"))
          .select(col("l_partkey"),
            round(col("pvd").cast("double"), 6).as("part_value"))
          .orderBy(desc("part_value"), col("l_partkey"))
      },
      Some("""WITH v AS (
          |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS pvd
          |  FROM lineitem
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_12' GROUP BY 1)
          |SELECT l_partkey, round(CAST(pvd AS DOUBLE), 6) AS part_value
          |FROM v, (SELECT CAST(sum(pvd) AS DOUBLE) * 0.001 AS thresh FROM v) t
          |WHERE CAST(pvd AS DOUBLE) > thresh
          |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    // R68 — TPC-H Q20 shape (excess-inventory suppliers): nested
    // IN-subqueries become broadcast-filtered aggregation + LEFT SEMI.
    // availqty has no testdata twin, so the inner threshold is a
    // shipped-quantity sum per (supplier, part) over one year — the
    // group-HAVING-IN pipeline is the preserved shape. The part-name
    // prefilter broadcasts into the fact scan; the only wide shuffle
    // is the (l_suppkey, l_partkey) agg.
    Q("r68_tpch_q20",
      (s, d) => {
        val parts = Tables.part(s, d)
          .where(col("p_name").like("small%")).select("p_partkey")
        val qualified = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(col("l_quantity").cast(DecimalType(18, 6))).as("qty"))
          .where(col("qty").cast("double") > 50.0)
          .select("l_suppkey")
        Tables.supplier(s, d)
          .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey
          |  FROM lineitem JOIN part ON p_partkey = l_partkey
          |  WHERE p_name LIKE 'small%'
          |    AND l_shipdate >= TIMESTAMP '1997-01-01'
          |    AND l_shipdate < TIMESTAMP '1998-01-01'
          |  GROUP BY l_suppkey, l_partkey
          |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 50.0)
          |ORDER BY s_suppkey""".stripMargin))
  )
}
