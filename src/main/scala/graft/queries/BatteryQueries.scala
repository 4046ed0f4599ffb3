package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-2 breadth batteries: datetime/string/map scalar functions,
  * statistical and conditional aggregates, grouping sets, token
  * explode (lateral unnest), multi-table TPC-H-shape joins, and a
  * binary-file multimodal source. Each query carries a DuckDB oracle;
  * cross-engine determinism follows the Q.scala rules (6-dp rounding,
  * DECIMAL sums, full ordering by unique keys, matching column names).
  *
  * Reference tie-in: the reference has no scalar-function or join
  * surface at all (SURVEY §2.8) — these are the engine-generalization
  * categories a user of the reference gains when switching.
  */
object BatteryQueries {

  private val D = DecimalType(18, 2)

  val all: Seq[Q] = Seq(

    // R24 — datetime function battery over o_orderdate. All outputs
    // rendered as strings/longs so both engines hash identically.
    // DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday → oracle adds 1.
    Q("r24_datetime_funcs",
      (s, d) => Tables.orders(s, d)
        .where(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          weekofyear(col("o_orderdate")).as("woy"),
          date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("next_month"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_2002"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          |  year(o_orderdate) AS y,
          |  quarter(o_orderdate) AS q,
          |  month(o_orderdate) AS m,
          |  dayofmonth(o_orderdate) AS dom,
          |  dayofweek(o_orderdate) + 1 AS dow,
          |  weekofyear(o_orderdate) AS woy,
          |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
          |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
          |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
          |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
          |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin)),

    // R25 — string function battery #2 (regex + edit distance + pads)
    // over events.props (JSON text: has digits and punctuation).
    Q("r25_string_funcs2",
      (s, d) => Tables.events(s, d)
        .where(col("event_id") < 2000)
        .select(
          col("event_id"),
          expr("regexp_extract(props, '[0-9]+', 0)").as("first_num"),
          expr("regexp_replace(props, '[0-9]+', '#')").as("masked"),
          expr("size(regexp_extract_all(props, '[0-9]+', 0))").cast("long").as("n_nums"),
          levenshtein(col("event_type"), lit("purchase")).cast("long").as("lev"),
          lpad(col("event_id").cast("string"), 8, "0").as("padded"),
          translate(col("event_type"), "aeiou", "AEIOU").as("tr"),
          reverse(col("event_type")).as("rev"),
          expr("instr(props, 'k')").cast("long").as("pos_k"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
          |  coalesce(regexp_extract(props, '[0-9]+'), '') AS first_num,
          |  regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
          |  len(regexp_extract_all(props, '[0-9]+')) AS n_nums,
          |  levenshtein(event_type, 'purchase') AS lev,
          |  lpad(CAST(event_id AS VARCHAR), 8, '0') AS padded,
          |  translate(event_type, 'aeiou', 'AEIOU') AS tr,
          |  reverse(event_type) AS rev,
          |  strpos(props, 'k') AS pos_k
          |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // R26 — statistical aggregate battery per event_type. Spark's
    // skewness/kurtosis are population (g1/g2); DuckDB's bare
    // skewness/kurtosis are sample-corrected, so the oracle uses
    // kurtosis_pop and de-corrects skewness via the g1 identity.
    Q("r26_stats_agg",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(corr(col("value"), col("event_id")), 6).as("corr_ve"),
          round(covar_samp(col("value"), col("event_id")), 6).as("cov_s"),
          round(covar_pop(col("value"), col("event_id")), 6).as("cov_p"),
          round(var_samp(col("value")), 6).as("var_s"),
          round(var_pop(col("value")), 6).as("var_p"),
          round(stddev_pop(col("value")), 6).as("std_p"),
          round(skewness(col("value")), 6).as("skew"),
          round(kurtosis(col("value")), 6).as("kurt"),
          round(expr("regr_slope(value, event_id)"), 6).as("slope"),
          round(expr("regr_intercept(value, event_id)"), 6).as("icept"),
          round(expr("regr_r2(value, event_id)"), 6).as("r2"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
          |  round(corr(value, event_id), 6) AS corr_ve,
          |  round(covar_samp(value, event_id), 6) AS cov_s,
          |  round(covar_pop(value, event_id), 6) AS cov_p,
          |  round(var_samp(value), 6) AS var_s,
          |  round(var_pop(value), 6) AS var_p,
          |  round(stddev_pop(value), 6) AS std_p,
          |  round(skewness(value) * (count(*) - 2)
          |        / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew,
          |  round(kurtosis_pop(value), 6) AS kurt,
          |  round(regr_slope(value, event_id), 6) AS slope,
          |  round(regr_intercept(value, event_id), 6) AS icept,
          |  round(regr_r2(value, event_id), 6) AS r2
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R27 — conditional / argmax aggregates per o_orderpriority.
    // max_by/min_by keyed on the UNIQUE o_orderkey (deterministic
    // argmax — double keys could tie).
    Q("r27_cond_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          expr("max_by(o_orderstatus, o_orderkey)").as("last_status"),
          expr("min_by(o_orderstatus, o_orderkey)").as("first_status"),
          expr("count_if(o_totalprice > 150000)").as("n_big"),
          expr("bool_and(o_totalprice > 0)").as("all_pos"),
          expr("bool_or(o_totalprice > 400000)").as("any_huge"),
          expr("bit_and(o_custkey)").as("band"),
          expr("bit_or(o_custkey)").as("bor"),
          expr("bit_xor(o_custkey)").as("bxor"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          |  max_by(o_orderstatus, o_orderkey) AS last_status,
          |  min_by(o_orderstatus, o_orderkey) AS first_status,
          |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
          |  bool_and(o_totalprice > 0) AS all_pos,
          |  bool_or(o_totalprice > 400000) AS any_huge,
          |  bit_and(o_custkey) AS band,
          |  bit_or(o_custkey) AS bor,
          |  bit_xor(o_custkey) AS bxor
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R28 — GROUPING SETS with grouping() markers (generalizes r8's
    // rollup/cube to arbitrary set lists).
    Q("r28_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql("""SELECT
            |  coalesce(o_orderpriority, 'ALL') AS prio,
            |  coalesce(o_orderstatus, 'ALL') AS status,
            |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
            |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
            |  count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            |FROM orders_gs
            |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
            |                        (o_orderpriority), (o_orderstatus), ())
            |ORDER BY g_prio, g_status, prio, status""".stripMargin)
      },
      Some("""SELECT
          |  coalesce(o_orderpriority, 'ALL') AS prio,
          |  coalesce(o_orderstatus, 'ALL') AS status,
          |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
          |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
          |                        (o_orderpriority), (o_orderstatus), ())
          |ORDER BY g_prio, g_status, prio, status""".stripMargin)),

    // R29 — lateral token explode (unnest) + global top-20 frequency.
    // Fully ordered by (n desc, token) — deterministic at the cut.
    Q("r29_token_explode",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
      Some("""SELECT token, count(*) AS n
          |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          |WHERE token <> ''
          |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // R30 — map + struct construction/access (complex-type scalar
    // surface; DuckDB map extraction yields a list, indexed [1]).
    Q("r30_map_struct",
      (s, d) => Tables.orders(s, d)
        .where(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          map_from_arrays(
            array(lit("p"), lit("s")),
            array(col("o_orderpriority"), col("o_orderstatus")))("p").as("m_p"),
          struct(col("o_orderstatus").as("st"),
            col("o_custkey").as("ck")).getField("st").as("st"),
          struct(col("o_orderstatus").as("st"),
            col("o_custkey").as("ck")).getField("ck").as("ck"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          |  map(['p', 's'], [o_orderpriority, o_orderstatus])['p'][1] AS m_p,
          |  struct_pack(st := o_orderstatus, ck := o_custkey).st AS st,
          |  struct_pack(st := o_orderstatus, ck := o_custkey).ck AS ck
          |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)),

    // R31 — TPC-H Q3 shape (shipping-priority): 3-way join
    // customer ⋈ orders ⋈ lineitem with selective date/segment filters,
    // revenue per order, global top-10. The segment dim filter prunes
    // before the join; at scale orders/lineitem co-shuffle on orderkey
    // and the revenue agg is partial-aggregated map-side.
    Q("r31_tpch_q3",
      (s, d) => Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("o_date"),
          round(col("revenue"), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey,
          |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1999-01-01'
          |  AND l_shipdate > TIMESTAMP '1999-01-01'
          |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // R32 — TPC-H Q5 shape (local-supplier volume): 6-way join with
    // region → nation dims broadcast, supplier nation pinned to the
    // customer nation, revenue per nation. The dims broadcast; the big
    // fact joins shuffle on their keys only.
    Q("r32_tpch_q5",
      (s, d) => {
        val nations = Tables.nation(s, d)
          .join(Tables.region(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .select("n_nationkey", "n_name")
        Tables.customer(s, d)
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .select(col("n_name"), round(col("revenue"), 6).as("revenue"),
            col("n"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
          |  count(*) AS n
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON o_orderkey = l_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
          |WHERE r_name = 'ASIA'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // D6 — BPE-ish regex tokenization (alpha runs | digit runs | single
    // other-glyph) — the token-counting shape of an LLM-data pipeline;
    // distinct-token ratio is a standard quality signal.
    Q("d6_regex_tokens",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
            .cast("long").as("n_tokens"),
          expr("size(array_distinct(regexp_extract_all(text, '[a-z]+', 0)))")
            .cast("long").as("n_uniq_words"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens,
          |  len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS n_uniq_words
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // R33 — null-handling battery: nulls derived via nullif, folded
    // back via coalesce/ifnull/nvl2, counted, ordered NULLS FIRST, and
    // joined null-safely (<=> / IS NOT DISTINCT FROM).
    Q("r33_null_handling",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"),
            nullif(col("event_type"), lit("view")).as("nk"))
        val dim = Tables.events(s, d)
          .select(nullif(col("event_type"), lit("view")).as("nk"))
          .distinct()
          .withColumn("dim_tag",
            coalesce(concat(lit("t_"), col("nk")), lit("t_null")))
        ev.join(dim, ev("nk") <=> dim("nk"))
          .drop(dim("nk"))
          .select(
            col("event_id"),
            coalesce(col("nk"), lit("(null)")).as("k_filled"),
            expr("ifnull(nk, 'x')").as("k_ifnull"),
            expr("nvl2(nk, 'has', 'none')").as("k_nvl2"),
            col("dim_tag"))
          .orderBy(col("event_id"))
          .limit(3000)
      },
      Some("""WITH ev AS (
          |  SELECT event_id, nullif(event_type, 'view') AS nk FROM events),
          |dim AS (
          |  SELECT nk, coalesce('t_' || nk, 't_null') AS dim_tag
          |  FROM (SELECT DISTINCT nullif(event_type, 'view') AS nk FROM events))
          |SELECT event_id,
          |  coalesce(ev.nk, '(null)') AS k_filled,
          |  ifnull(ev.nk, 'x') AS k_ifnull,
          |  CASE WHEN ev.nk IS NOT NULL THEN 'has' ELSE 'none' END AS k_nvl2,
          |  dim_tag
          |FROM ev JOIN dim ON ev.nk IS NOT DISTINCT FROM dim.nk
          |ORDER BY event_id LIMIT 3000""".stripMargin)),

    // R34 — analytic-window battery: ntile / percent_rank / cume_dist /
    // lead / lag / first_value / last_value / nth_value over the
    // per-priority order timeline (unique orderkey → deterministic).
    Q("r34_window_extras",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.orders(s, d)
          .where(col("o_orderkey") < 5000)
          .select(
            col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            lead(col("o_orderkey"), 2).over(w).as("lead2"),
            lag(col("o_orderkey"), 3).over(w).as("lag3"),
            first_value(col("o_orderkey")).over(w).as("fv"),
            last_value(col("o_orderkey")).over(wf).as("lv"),
            nth_value(col("o_orderkey"), 5).over(wf).as("nth5"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
          |  ntile(4) OVER w AS quartile,
          |  round(percent_rank() OVER w, 6) AS pr,
          |  round(cume_dist() OVER w, 6) AS cd,
          |  lead(o_orderkey, 2) OVER w AS lead2,
          |  lag(o_orderkey, 3) OVER w AS lag3,
          |  first_value(o_orderkey) OVER w AS fv,
          |  last_value(o_orderkey) OVER wf AS lv,
          |  nth_value(o_orderkey, 5) OVER wf AS nth5
          |FROM orders WHERE o_orderkey < 5000
          |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey),
          |  wf AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |ORDER BY o_orderkey""".stripMargin)),

    // R35 — exact interpolated percentiles per group (the exact twin of
    // r7_approx_quantiles).
    Q("r35_percentiles",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.25)), 6).as("p25"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.75)), 6).as("p75"),
          round(percentile(col("value"), lit(0.99)), 6).as("p99"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
          |  round(quantile_cont(value, 0.25), 6) AS p25,
          |  round(quantile_cont(value, 0.5), 6) AS p50,
          |  round(quantile_cont(value, 0.75), 6) AS p75,
          |  round(quantile_cont(value, 0.99), 6) AS p99
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R36 — array set-operation battery over document token arrays.
    // Set results are sort-normalized and string-projected (array cells
    // break the comparison harness; Spark's array_except/union also
    // dedup, so both sides go through distinct+sort).
    Q("r36_array_ops",
      (s, d) => {
        val toks = split(col("text"), " ")
        val stop = array(lit("the"), lit("a"), lit("value"))
        Tables.documents(s, d)
          .where(col("doc_id") < 200)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_toks"),
            array_join(sort_array(array_distinct(toks)), ",").as("uniq"),
            array_join(sort_array(array_intersect(toks, stop)), ",").as("hits"),
            array_join(sort_array(array_except(toks, stop)), ",").as("rest"),
            array_position(toks, "table").cast("long").as("pos_table"),
            array_contains(toks, "data").as("has_data"),
            array_join(slice(toks, 1, 5), "-").as("head5"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          |  WHERE doc_id < 200)
          |SELECT doc_id,
          |  len(toks) AS n_toks,
          |  array_to_string(list_sort(list_distinct(toks)), ',') AS uniq,
          |  coalesce(array_to_string(list_sort(list_distinct(list_filter(toks,
          |    x -> list_contains(['the','a','value'], x)))), ','), '') AS hits,
          |  coalesce(array_to_string(list_sort(list_distinct(list_filter(toks,
          |    x -> NOT list_contains(['the','a','value'], x)))), ','), '') AS rest,
          |  coalesce(list_position(toks, 'table'), 0) AS pos_table,
          |  list_contains(toks, 'data') AS has_data,
          |  array_to_string(toks[1:5], '-') AS head5
          |FROM t ORDER BY doc_id""".stripMargin)),

    // R37 — unionByName with missing columns null-filled (schema
    // evolution shape; DuckDB UNION ALL BY NAME).
    Q("r37_union_by_name",
      (s, d) => {
        val a = Tables.orders(s, d).where(col("o_orderkey") < 1000)
          .select(col("o_orderkey"), col("o_orderstatus"))
        val b = Tables.orders(s, d)
          .where(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000)
          .select(col("o_orderstatus"), col("o_orderkey"),
            col("o_orderpriority"))
        a.unionByName(b, allowMissingColumns = true)
          .select(col("o_orderkey"), col("o_orderstatus"),
            coalesce(col("o_orderpriority"), lit("-")).as("prio"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          |  coalesce(o_orderpriority, '-') AS prio
          |FROM (
          |  SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority
          |  FROM orders WHERE o_orderkey < 1000
          |  UNION ALL BY NAME
          |  SELECT o_orderstatus, o_orderkey, o_orderpriority
          |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000)
          |ORDER BY o_orderkey""".stripMargin)),

    // X8 — partitioned parquet sink + partition-pruned source: events
    // written partitionBy(event_type), read back filtered to one
    // partition (the scan lists only that directory — file-level
    // pruning, asserted in BatterySpec).
    Q("x8_partitioned_source",
      (s, d) => {
        val tmp = graft.util.TempDirs.create("graft_x8_part").toString + "/events_part"
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value").cast(DecimalType(18, 6)).as("dv"))
          .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
        s.read.parquet(tmp)
          .where(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum("dv").cast("double").as("sum_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R38 — hash / encode / error-tolerant function battery. Spark hex
    // is uppercase (DuckDB lower) → normalized with lower(); Spark
    // try_cast/try_divide NULLs mirror DuckDB's NULL-on-error division
    // and try_cast.
    Q("r38_hash_encode",
      (s, d) => Tables.documents(s, d)
        .where(col("doc_id") < 200)
        .select(
          col("doc_id"),
          sha2(col("text"), 256).as("sha"),
          base64(encode(substring(col("text"), 1, 12), "utf-8")).as("b64"),
          lower(hex(encode(substring(col("text"), 1, 4), "utf-8"))).as("hx"),
          (unbase64(base64(encode(col("text"), "utf-8"))).cast("string")
            === col("text")).as("b64_roundtrip"),
          coalesce(expr("try_cast(lang AS INT)"), lit(-1)).cast("long").as("tc"),
          coalesce(expr("try_divide(n_chars, n_chars - n_chars)"), lit(-1.0))
            .as("td"),
          format_string("%07d|%s", col("doc_id"), col("lang")).as("fs"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          |  sha256(text) AS sha,
          |  to_base64(encode(substring(text, 1, 12))) AS b64,
          |  lower(hex(encode(substring(text, 1, 4)))) AS hx,
          |  decode(from_base64(to_base64(encode(text)))) = text AS b64_roundtrip,
          |  CAST(coalesce(try_cast(lang AS INT), -1) AS BIGINT) AS tc,
          |  coalesce(n_chars / (n_chars - n_chars), -1.0) AS td,
          |  printf('%07d|%s', doc_id, lang) AS fs
          |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // R42 — TPC-H Q7 shape (volume shipping): two nation-pinned sides
    // (customer nation × supplier nation, both broadcast dims), yearly
    // revenue per directed nation pair via CASE-bucketed aggregation.
    Q("r42_tpch_q7",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
          .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
          .where(col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
            col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
            col("cust_nation") =!= col("supp_nation"))
          .groupBy(col("cust_nation"), col("supp_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6))).cast("double").as("revenue"))
          .select(col("cust_nation"), col("supp_nation"), col("l_year"),
            round(col("revenue"), 6).as("revenue"))
          .orderBy("cust_nation", "supp_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
          |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation n1 ON c_nationkey = n1.n_nationkey
          |JOIN nation n2 ON s_nationkey = n2.n_nationkey
          |WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          |  AND n1.n_name <> n2.n_name
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // R43 — PURE range join (no equi key) via the bin-join pattern:
    // orders × lineitems where l_extendedprice lies within ±500 of
    // o_totalprice/100. A naive theta join is a cartesian product; here
    // each side maps to 1000-wide price bins (the probe side to its
    // bin ± 1), the join is an equi-join on the bin, and the exact
    // range predicate filters after — shuffle is bounded by bin
    // population, the 100 TB-safe shape for interval/range joins.
    Q("r43_range_bin_join",
      (s, d) => {
        val W = 1000L
        val o = Tables.orders(s, d)
          .where(col("o_orderkey") < 3000)
          .select(col("o_orderkey"),
            (col("o_totalprice") / 100.0).as("target"))
        val probes = o.select(col("o_orderkey"), col("target"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("off"))
          .select(col("o_orderkey"), col("target"),
            ((col("target") / W).cast("long") + col("off")).as("bin"))
        val l = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"),
            (col("l_extendedprice") / W).cast("long").as("bin"))
        probes.join(l, Seq("bin"))
          .where(abs(col("l_extendedprice") - col("target")) <= 500.0)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_near"),
            round(min(col("l_extendedprice")), 6).as("min_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_near,
          |  round(min(l_extendedprice), 6) AS min_price
          |FROM orders JOIN lineitem
          |  ON abs(l_extendedprice - o_totalprice / 100.0) <= 500.0
          |WHERE o_orderkey < 3000
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R46 — explicit cross join (dims only — the one join type where
    // all-pairs IS the semantics; both sides tiny, planned as
    // BroadcastNestedLoopJoin).
    Q("r46_cross_join",
      (s, d) => Tables.region(s, d).select(col("r_name").as("a"))
        .crossJoin(Tables.region(s, d).select(col("r_name").as("b")))
        .orderBy("a", "b"),
      Some("""SELECT r1.r_name AS a, r2.r_name AS b
          |FROM region r1 CROSS JOIN region r2
          |ORDER BY 1, 2""".stripMargin)),

    // R45 — multiple DISTINCT aggregates in one GROUP BY (plans through
    // Expand: one shuffled pass per distinct set plus the plain
    // aggregates — the multi-distinct shape Catalyst rewrites for).
    Q("r45_multi_distinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          |  count(DISTINCT o_custkey) AS n_cust,
          |  count(DISTINCT o_orderstatus) AS n_status,
          |  count(DISTINCT year(o_orderdate)) AS n_years,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_price
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R44 — RANGE window frame (value-based, vs r10's row-based): per
    // customer, the sum of order prices within the 30 PRECEDING DAYS of
    // each order — the frame holds peers by VALUE distance on the
    // day-ordinal ordering, not by row position.
    Q("r44_range_frame",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("day_ord"))
          .rangeBetween(-30L, 0L)
        Tables.orders(s, d)
          .where(col("o_custkey") < 300)
          .withColumn("day_ord",
            (unix_timestamp(col("o_orderdate")) / 86400L).cast("long"))
          .select(col("o_orderkey"), col("o_custkey"), col("day_ord"),
            sum(col("o_totalprice").cast(D)).over(w)
              .cast("double").as("sum_30d"),
            count(lit(1)).over(w).as("n_30d"))
          .select(col("o_orderkey"), col("o_custkey"), col("day_ord"),
            round(col("sum_30d"), 6).as("sum_30d"), col("n_30d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
          |  CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day_ord,
          |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
          |        AS DOUBLE), 6) AS sum_30d,
          |  count(*) OVER w AS n_30d
          |FROM orders WHERE o_custkey < 300
          |WINDOW w AS (PARTITION BY o_custkey
          |  ORDER BY epoch(o_orderdate) // 86400
          |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
          |ORDER BY o_orderkey""".stripMargin)),

    // R41 — typed JSON parsing: from_json into a schema'd struct (the
    // typed twin of r13's get_json_object string extraction), plus
    // json_tuple-style multi-extract and a validity probe.
    Q("r41_from_json",
      (s, d) => Tables.events(s, d)
        .where(col("event_id") < 2000)
        .select(
          col("event_id"),
          from_json(col("props"), lit("k INT"))
            .getField("k").cast("long").as("k_typed"),
          get_json_object(col("props"), "$.k").cast("long").as("k_str"),
          from_json(col("props"), lit("k INT")).isNotNull.as("parsed"),
          (from_json(col("props"), lit("k INT")).getField("k") % 10)
            .cast("long").as("k_mod"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
          |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
          |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_str,
          |  json_valid(props) AS parsed,
          |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
          |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // R39 — mergeable HLL sketches (Apache DataSketches via Spark's
    // hll_sketch_agg): per-type user sketches unioned into a global
    // estimate — the re-aggregatable distinct-count shape a 100 TB
    // rollup needs (partial sketches merge associatively across
    // partitions/days). Hash-gated: output is the exact distinct plus
    // two flags — the merged (union-of-per-type) estimate and the
    // direct single-sketch estimate each within 5% of exact; the
    // oracle pins both to 1. (The union is NOT bit-identical to the
    // direct sketch at every cardinality — DataSketches' union gadget
    // can coarsen a register — so equality is not an invariant; the
    // error bound is.)
    Q("r39_hll_sketch",
      (s, d) => {
        val perType = Tables.events(s, d)
          .groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        perType.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_est"))
          .crossJoin(Tables.events(s, d)
            .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
              .as("direct_est"),
              countDistinct(col("user_id")).as("n_exact")))
          .select(col("n_exact"),
            (abs(col("merged_est") - col("n_exact")).cast("double")
              / col("n_exact") <= 0.05).cast("int").as("merged_within_5pct"),
            (abs(col("direct_est") - col("n_exact")).cast("double")
              / col("n_exact") <= 0.05).cast("int").as("direct_within_5pct"))
      },
      Some("""SELECT count(DISTINCT user_id) AS n_exact,
          |  CAST(1 AS INT) AS merged_within_5pct,
          |  CAST(1 AS INT) AS direct_within_5pct FROM events""".stripMargin)),

    // R40 — the NATIVE as-of join operator (graft.plans.AsOfJoinExec:
    // custom LogicalPlan → Strategy → SparkPlan, injected through
    // GraftExtensions): last purchase time at-or-before each event of
    // the same user, via one co-partitioned sorted merge pass with
    // O(1) state — no window buffering, no union. The declarative twin
    // is r18; the oracle here is the plain max-over-interval join.
    Q("r40_asof_native",
      (s, d) => {
        graft.extensions.GraftExtensions.register(s)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("us"))
        val purchases = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("pus"))
        graft.plans.AsOfJoin(ev, purchases,
            key = "user_id", leftTime = "us", rightTime = "pus",
            outName = "last_purchase_us")
          .select("event_id", "user_id", "last_purchase_us")
          .orderBy("event_id")
      },
      Some("""WITH p AS (
          |  SELECT user_id, epoch_ns(ts) // 1000 AS pus
          |  FROM events WHERE event_type = 'purchase'),
          |e AS (
          |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events)
          |SELECT e.event_id, e.user_id, max(p.pus) AS last_purchase_us
          |FROM e LEFT JOIN p
          |  ON e.user_id = p.user_id AND p.pus <= e.us
          |GROUP BY 1, 2 ORDER BY 1""".stripMargin))
  ) ++ Seq(

    // X10 — the UDTF tier end-to-end: the custom TextShingles
    // Generator expression driven from SQL via LATERAL VIEW (planned
    // through Generate exactly like explode), one row per word
    // trigram.
    Q("x10_shingle_udtf",
      (s, d) => {
        graft.extensions.GraftExtensions.register(s)
        Tables.documents(s, d).where(col("doc_id") < 50)
          .createOrReplaceTempView("docs_sh")
        s.sql("""SELECT doc_id, shingle FROM docs_sh
            |LATERAL VIEW text_shingles(text, 3) t AS shingle
            |ORDER BY doc_id, shingle""".stripMargin)
      },
      Some("""SELECT doc_id,
          |  unnest(list_transform(range(1, len(w) - 1),
          |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
          |FROM (SELECT doc_id, string_split(text, ' ') AS w
          |      FROM documents WHERE doc_id < 50)
          |ORDER BY doc_id, shingle""".stripMargin)),

    // X11 — line-oriented text source: documents staged one-per-line
    // (the raw corpus-file shape), read back via spark.read.text and
    // re-keyed by a split on the tab prefix; oracle recomputes from the
    // table.
    Q("x11_text_source",
      (s, d) => {
        val tmp = graft.util.TempDirs.create("graft_x11_text").toString + "/docs"
        Tables.documents(s, d)
          .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
          .write.mode("overwrite").text(tmp)
        s.read.text(tmp)
          .select(
            split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
            length(split(col("value"), "\t").getItem(1)).cast("long")
              .as("text_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, strlen(text) AS text_len
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // P3 — TF-IDF: document frequency per term → idf = ln(N/df) →
    // per-doc term frequency → global top-20 terms by summed tf-idf.
    // Two shuffles (term df, term agg), both partial-aggregated — the
    // canonical corpus-statistics pipeline.
    Q("p3_tfidf_top_terms",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count()
        val terms = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .where(col("term") =!= "")
        val tf = terms.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(df, "term")
          .withColumn("tfidf",
            col("tf") * log(lit(n.toDouble) / col("df")))
          .groupBy("term")
          .agg(round(sum("tfidf"), 6).as("sum_tfidf"),
            max("df").as("df"))
          .orderBy(col("sum_tfidf").desc, col("term"))
          .limit(20)
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM documents),
          |terms AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
          |  FROM documents),
          |tf AS (
          |  SELECT doc_id, term, count(*) AS tf FROM terms
          |  WHERE term <> '' GROUP BY 1, 2),
          |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
          |SELECT tf.term,
          |  round(sum(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)), 6)
          |    AS sum_tfidf,
          |  max(df.df) AS df
          |FROM tf JOIN df ON tf.term = df.term, n
          |GROUP BY 1 ORDER BY sum_tfidf DESC, tf.term LIMIT 20""".stripMargin)),

    // X6 — binaryFile multimodal source: documents staged as raw .txt
    // blobs, read back via the binary-file datasource (the pattern for
    // opaque image/audio payloads: path + length + content bytes),
    // fingerprinted with md5 over the bytes. At scale the staging is an
    // object-store listing; here the first 100 docs.
    Q("x6_binary_source",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x6_bin")
        Tables.documents(s, d).where(col("doc_id") < 100)
          .select("doc_id", "text").collect().foreach { r =>
            java.nio.file.Files.write(
              dir.resolve(s"doc_${r.getLong(0)}.txt"),
              r.getString(1).getBytes("UTF-8"))
          }
        s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
          .load(dir.toString)
          .select(
            expr("CAST(regexp_extract(path, 'doc_([0-9]+)\\\\.txt', 1) AS LONG)")
              .as("doc_id"),
            col("length"),
            md5(col("content")).as("content_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS length,
          |  md5(text) AS content_md5
          |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))
  )
}
