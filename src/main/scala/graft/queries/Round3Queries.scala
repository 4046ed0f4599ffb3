package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-3 additions: the remaining classic TPC-H join shapes (Q8
  * market share, Q9 profit, Q10 returned-item revenue — adapted to
  * the driver schema, which has no partsupp table), IGNORE NULLS
  * window functions, and the native as-of join's forward/nearest
  * directions (`graft.plans.AsOfJoinExec`). Determinism follows the
  * Q.scala rules: DECIMAL(18,6) sums, 6-dp rounding of derived
  * doubles, unique full orderings, matching column names.
  *
  * Reference tie-in: the reference has no join/window surface at all
  * (SURVEY §2.8); these extend the engine-generalization categories.
  * At 100 TB each query is shuffle-bounded on its join keys; nation/
  * region dims are broadcast so only the fact tables shuffle.
  */
object Round3Queries {

  private val D6 = DecimalType(18, 6)

  val all: Seq[Q] = Seq(

    // R47 — TPC-H Q8 shape: NATION_3's market share of STANDARD-part
    // volume sold by suppliers into EUROPE-resident customers,
    // 1995-1996, per year. Fact-side joins shuffle on the fact keys;
    // nation/region dims broadcast.
    Q("r47_tpch_q8",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .join(Tables.region(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "EUROPE")
          .select(col("n_nationkey").as("c_nk"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation"))
        val vol = Tables.lineitem(s, d)
          .join(Tables.part(s, d).where(col("p_type") === "STANDARD"),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d)
            .where(col("o_orderdate").between("1995-01-01", "1996-12-31")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
          .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
          .select(year(col("o_orderdate")).cast("long").as("o_year"),
            col("supp_nation"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(D6).as("volume"))
        vol.groupBy("o_year")
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3", col("volume"))
              .otherwise(lit(0).cast(D6))).cast("double") /
              sum(col("volume")).cast("double"), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""WITH vol AS (
          |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |    n2.n_name AS supp_nation,
          |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS volume
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
          |  JOIN region ON n1.n_regionkey = r_regionkey
          |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
          |  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
          |    AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
          |SELECT o_year,
          |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
          |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
          |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
          |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R48 — TPC-H Q9 shape: per-supplier-nation yearly "profit" on
    // parts named like gear. The schema has no partsupp, so supply
    // cost is proxied as 10% of p_retailprice per unit (same join/agg
    // shape: 4-way fact join + 2 grouping keys).
    Q("r48_tpch_q9",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).where(col("p_name").like("%gear%")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("supp_nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(sum(
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
              lit(0.1) * col("p_retailprice") * col("l_quantity"))
              .cast(D6)).cast("double"), 6).as("profit"))
          .orderBy(col("supp_nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS supp_nation,
          |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,6)))
          |    AS DOUBLE), 6) AS profit
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%gear%'
          |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin)),

    // R49 — native as-of join, forward + nearest directions: for every
    // event, the next purchase time (>= event time) and the nearest
    // purchase time of the same user. Two chained AsOfJoinExec merges;
    // the second reuses the first's (key-clustered, time-sorted)
    // output, so AQE plans a single exchange per side. Oracle:
    // decorrelated min/max subqueries per direction.
    Q("r49_asof_direction",
      (s, d) => {
        graft.extensions.GraftExtensions.register(s)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("us"))
        val purchases = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("pus"))
        val fwd = graft.plans.AsOfJoin(ev, purchases,
          key = "user_id", leftTime = "us", rightTime = "pus",
          outName = "next_purchase_us", direction = "forward")
        graft.plans.AsOfJoin(fwd, purchases,
            key = "user_id", leftTime = "us", rightTime = "pus",
            outName = "nearest_purchase_us", direction = "nearest")
          .select("event_id", "user_id", "next_purchase_us",
            "nearest_purchase_us")
          .orderBy("event_id")
      },
      Some("""WITH p AS (
          |  SELECT user_id, epoch_ns(ts) // 1000 AS pus
          |  FROM events WHERE event_type = 'purchase'),
          |e AS (
          |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events),
          |m AS (SELECT e.event_id, e.user_id, e.us,
          |  (SELECT max(pus) FROM p
          |   WHERE p.user_id = e.user_id AND p.pus <= e.us) AS back,
          |  (SELECT min(pus) FROM p
          |   WHERE p.user_id = e.user_id AND p.pus >= e.us) AS fwd
          |  FROM e)
          |SELECT event_id, user_id, fwd AS next_purchase_us,
          |  CASE WHEN back IS NULL THEN fwd WHEN fwd IS NULL THEN back
          |       WHEN us - back <= fwd - us THEN back ELSE fwd END
          |    AS nearest_purchase_us
          |FROM m ORDER BY event_id""".stripMargin)),

    // R50 — TPC-H Q10 shape: top-20 customers by revenue on returned
    // lineitems in 1995Q4. Global top-N after a shuffle agg →
    // TakeOrderedAndProject; ties broken by unique c_custkey.
    Q("r50_tpch_q10",
      (s, d) => {
        Tables.customer(s, d)
          .join(Tables.orders(s, d)
            .where(col("o_orderdate") >= "1995-10-01" &&
              col("o_orderdate") < "1996-01-01"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d).where(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum(
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(D6)).cast("double"), 6).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |  AND o_orderdate >= DATE '1995-10-01'
          |  AND o_orderdate < DATE '1996-01-01'
          |GROUP BY 1, 2, 3
          |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // R51 — IGNORE NULLS window battery: per user, last/previous/2nd
    // purchase value as of each event (purchase values are sparse →
    // null-skipping frames). Unique (ts_ns, event_id) ordering keeps
    // both engines deterministic.
    Q("r51_window_ignore_nulls",
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts").as("ts_ns"),
            when(col("event_type") === "purchase", col("value")).as("pv"))
        val ord = Window.partitionBy("user_id")
          .orderBy(col("ts_ns"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.select(col("event_id"), col("user_id"),
            last(col("pv"), ignoreNulls = true).over(cum).as("last_pv"),
            lag(col("pv"), 1, null, ignoreNulls = true).over(ord)
              .as("prev_pv"),
            nth_value(col("pv"), 2, ignoreNulls = true).over(cum)
              .as("second_pv"))
          .orderBy("event_id")
      },
      Some("""WITH base AS (
          |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
          |    CASE WHEN event_type = 'purchase' THEN value END AS pv
          |  FROM events)
          |SELECT event_id, user_id,
          |  last_value(pv IGNORE NULLS) OVER w AS last_pv,
          |  lag(pv, 1 IGNORE NULLS) OVER
          |    (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_pv,
          |  nth_value(pv, 2 IGNORE NULLS) OVER w AS second_pv
          |FROM base
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)),

    // R52 — LATERAL correlated subquery: top-2 orders per customer,
    // expressed as a per-row dependent subquery rather than a window.
    // Catalyst decorrelates the LATERAL into a ranked window/join —
    // verifying the rewrite (not a per-customer loop) is the point;
    // Round3Spec asserts no nested-loop artifacts at scale.
    Q("r52_lateral_join",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("r52_customer")
        Tables.orders(s, d).createOrReplaceTempView("r52_orders")
        s.sql("""SELECT c_custkey, o_orderkey, o_totalprice
            |FROM r52_customer,
            |LATERAL (
            |  SELECT o_orderkey, o_totalprice FROM r52_orders
            |  WHERE o_custkey = c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
            |WHERE c_custkey < 200
            |ORDER BY c_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
          |FROM customer,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c_custkey < 200
          |ORDER BY c_custkey, o_orderkey""".stripMargin)),

    // D7 — text normalization for dedup keying: strip everything but
    // ASCII alphanumerics/space FIRST (so case-mapping never touches
    // non-ASCII, where engines' unicode tables could disagree), then
    // lowercase and collapse runs of whitespace. The canonical form
    // feeding d1/d5/m1 at corpus scale — a single native byte-scan
    // kernel ([[graft.expressions.TextNormalize]]); the oracle keeps
    // the equivalent regex chain as the independent spec.
    Q("d7_normalize",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.functions.TextFunctions.normalize(col("text")).as("norm"))
          .select(col("doc_id"), col("norm"),
            length(col("norm")).cast("long").as("norm_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          |  trim(regexp_replace(
          |    lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
          |    ' +', ' ', 'g')) AS norm,
          |  CAST(length(trim(regexp_replace(
          |    lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
          |    ' +', ' ', 'g'))) AS BIGINT) AS norm_len
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // X12 — XML source round-trip (Spark 4's built-in XML data
    // source): orders staged as XML, read back with an explicit
    // schema (skips inference), aggregated; oracle runs on the
    // original table, so any serde drift fails the hash.
    Q("x12_xml_source",
      (s, d) => {
        val tmp = graft.util.TempDirs.create("graft_x12_xml").toString + "/o"
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderpriority")
          .write.mode("overwrite").option("rowTag", "order")
          .format("xml").save(tmp)
        s.read.schema("o_orderkey LONG, o_custkey LONG, o_orderpriority STRING")
          .option("rowTag", "order").format("xml").load(tmp)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sum_key"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R53 — TPC-H Q16 shape: distinct-supplier counts per part
    // attribute triple. COUNT(DISTINCT) over a shuffled join — the
    // two-phase distinct aggregation (partial dedup before the final
    // shuffle) is what keeps this bounded at 100 TB.
    Q("r53_tpch_q16",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).where(col("p_size").isin(5, 10, 15, 20)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
          |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_size IN (5, 10, 15, 20)
          |GROUP BY 1, 2, 3
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // R54 — TPC-H Q18 shape: large-quantity orders. The HAVING
    // pre-aggregate runs FIRST and semi-joins into orders, so the
    // expensive 3-way join only sees qualifying orderkeys — at scale
    // this prunes the join input by ~1000×.
    Q("r54_tpch_q18",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sq"))
          .where(col("sq") > 210.0)
          .select(col("l_orderkey").as("big_ok"))
        val qualOrders = Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("big_ok"), "left_semi")
        Tables.customer(s, d)
          .join(qualOrders, col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
          .agg(round(sum(col("l_quantity").cast(D6)).cast("double"), 6)
            .as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""WITH big AS (
          |  SELECT l_orderkey FROM lineitem
          |  GROUP BY 1 HAVING sum(l_quantity) > 210)
          |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
          |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS total_qty
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
          |GROUP BY 1, 2, 3, 4
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // R55 — TPC-H Q22 shape: above-average-balance customers with
    // fewer than 5 orders, grouped by a derived code. The average
    // threshold is applied as an EXACT cross-multiplied decimal
    // comparison (balance × n > total) — no floating average whose
    // last-ulp could differ between engines at a boundary.
    Q("r55_tpch_q22",
      (s, d) => {
        val st = Tables.customer(s, d).where(col("c_acctbal") > 0.0)
          .agg(sum(col("c_acctbal").cast(D6)).as("tot"),
            count(lit(1)).as("n")).head
        val (tot, n) = (st.getDecimal(0), st.getLong(1))
        val cnt = Tables.orders(s, d).groupBy("o_custkey").count()
        Tables.customer(s, d)
          .join(cnt, col("c_custkey") === col("o_custkey"), "left")
          .where(col("c_acctbal").cast(D6) * lit(n) > lit(tot) &&
            coalesce(col("count"), lit(0L)) < 5)
          .groupBy((col("c_custkey") % 10).cast("long").as("cc"))
          .agg(count(lit(1)).as("numcust"),
            round(sum(col("c_acctbal").cast(D6)).cast("double"), 6)
              .as("totacctbal"))
          .orderBy("cc")
      },
      Some("""WITH s AS (
          |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS tot,
          |    count(*) AS n
          |  FROM customer WHERE c_acctbal > 0.0)
          |SELECT CAST(c_custkey % 10 AS BIGINT) AS cc,
          |  count(*) AS numcust,
          |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS totacctbal
          |FROM customer, s
          |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n > tot
          |  AND (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) < 5
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M6 — normalized-prefix exact dedup: d7's canonical form,
    // truncated to 60 chars, as the grouping key; emit groups with
    // >1 member. The hash-groupBy dedup pattern at its cheapest:
    // one shuffle on the normalized key. The native kernel's maxChars
    // cap also early-exits the scan at 60 kept chars per doc, so key
    // extraction cost is O(prefix) not O(doc).
    Q("m6_norm_dedup",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.functions.TextFunctions.normalize(col("text"), 60)
              .as("norm"))
          .groupBy("norm")
          .agg(min("doc_id").as("rep_id"), count(lit(1)).as("group_size"))
          .where(col("group_size") > 1)
          .select("rep_id", "group_size")
          .orderBy("rep_id")
      },
      Some("""WITH n AS (
          |  SELECT doc_id,
          |    substr(trim(regexp_replace(
          |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
          |      ' +', ' ', 'g')), 1, 60) AS norm
          |  FROM documents)
          |SELECT min(doc_id) AS rep_id, count(*) AS group_size
          |FROM n GROUP BY norm HAVING count(*) > 1
          |ORDER BY rep_id""".stripMargin)),

    // X13 — gzip-compressed CSV round-trip: codec handling on both
    // the write (compression option) and read (transparent .gz
    // decode) paths; oracle on the original table.
    Q("x13_gzip_csv",
      (s, d) => {
        val tmp = graft.util.TempDirs.create("graft_x13_csv").toString + "/c"
        x13Write(s, d, tmp)
        x13Read(s, tmp)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R56 — recursive CTE (Spark 4's WITH RECURSIVE): generate the
    // 1995-01..2001-08 month spine recursively, then left-join order
    // counts per month so empty months surface as zero — the calendar
    // densification pattern. The 80-row spine broadcasts; the fact
    // side aggregates before the join would at scale (here the
    // equi-join on the month string keeps it shuffle-bounded).
    Q("r56_recursive_cte",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("r56_orders")
        s.sql("""WITH RECURSIVE m AS (
            |  SELECT DATE '1995-01-01' AS mth
            |  UNION ALL
            |  SELECT mth + INTERVAL '1' MONTH FROM m
            |  WHERE mth < DATE '2001-08-01')
            |SELECT date_format(mth, 'yyyy-MM') AS ym,
            |  count(o_orderkey) AS n_orders
            |FROM m LEFT JOIN r56_orders
            |  ON date_format(o_orderdate, 'yyyy-MM') =
            |     date_format(mth, 'yyyy-MM')
            |GROUP BY 1 ORDER BY 1""".stripMargin)
      },
      Some("""WITH RECURSIVE m(mth) AS (
          |  SELECT DATE '1995-01-01'
          |  UNION ALL
          |  SELECT CAST(mth + INTERVAL 1 MONTH AS DATE) FROM m
          |  WHERE mth < DATE '2001-08-01')
          |SELECT strftime(mth, '%Y-%m') AS ym,
          |  count(o_orderkey) AS n_orders
          |FROM m LEFT JOIN orders
          |  ON strftime(o_orderdate, '%Y-%m') = strftime(mth, '%Y-%m')
          |GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** x13's write phase, exposed so Bench can time layout-building cost
    * separately from query cost (the combined query timing is
    * build-dominated and was the noisiest row of every sweep).
    */
  private[graft] def x13Write(s: org.apache.spark.sql.SparkSession,
      d: String, tmp: String): Unit =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
      .write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(tmp)

  /** x13's read phase over an already-written gzip CSV directory. */
  private[graft] def x13Read(s: org.apache.spark.sql.SparkSession,
      tmp: String): org.apache.spark.sql.DataFrame =
    s.read.schema("l_orderkey LONG, l_linenumber LONG, l_returnflag STRING")
      .option("header", "true").csv(tmp)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"))
      .orderBy("l_returnflag")
}
