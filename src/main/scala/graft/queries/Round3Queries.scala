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
    // feeding d1/d5/m1 at corpus scale — pure codegen'd string ops.
    Q("d7_normalize",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            trim(regexp_replace(
              lower(regexp_replace(col("text"), "[^A-Za-z0-9 ]", " ")),
              " +", " ")).as("norm"))
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
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
