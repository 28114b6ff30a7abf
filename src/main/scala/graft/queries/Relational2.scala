package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational coverage, part 2: multi-joins, semi/anti/outer joins, window
  * functions, sorts/top-k, set ops, scalar functions, subqueries, rollup,
  * conditional pivot, and event sessionization. Same float-determinism
  * rules as [[Relational]].
  */
object Relational2 {

  // exact two-long-accumulator decimal sum — see Relational.dsum (round 19)
  // correctly-rounded double→decimal(18,6) fast path — see Relational.dec6
  private def dec6(e: Column): Column = Relational.dec6(e)

  private def dsum(e: Column): Column =
    call_function("graft_dsum", dec6(e))

  /** Exact decimal sum surfaced as rounded DOUBLE — see [[Relational.dsumOut]]. */
  private def dsumOut(e: Column): Column = Relational.dsumOut(e)

  /** Same, rounded at 1e-4 for small-magnitude (events.value) sums. */
  // round in the DECIMAL domain, then cast — see Relational.dsumOut
  private def dsumOut4(e: Column): Column = round(dsum(e), 4).cast("double")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q04_multi_join_revenue",
      // TPC-H Q5 shape: 5-way join through two dimension chains.
      Some("""
        SELECT n_name,
               CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY n_name"""),
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val su = Tables.load(s, dir, "supplier")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
                               su("s_nationkey") === c("c_nationkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name")
          .agg(dsumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               count(lit(1)).as("n"))
          .orderBy("n_name")
      }
    ),
    QueryDef(
      "q05_semi_join",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }
    ),
    QueryDef(
      "q07_anti_join",
      Some("""
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_acctbal").orderBy("c_custkey")
      }
    ),
    QueryDef(
      "q08_outer_join_agg",
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               CAST(round(SUM(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"),
               dsumOut(coalesce(col("o_totalprice"), lit(0.0))).as("total"))
          .orderBy("c_custkey")
      }
    ),
    QueryDef(
      "q09_window_topk",
      // top-3 orders per market segment; deterministic tie-break on key
      Some("""
        SELECT * FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey) t
        WHERE rn <= 3
        ORDER BY c_mktsegment, rn"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("c_mktsegment", "rn")
      }
    ),
    QueryDef(
      "q10_window_running",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk,
               lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        FROM orders
        ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.load(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            // BUILT-IN sum over the fast-cast decimal (round 20): warm A/B
            // showed graft_dsum buys nothing in a window frame — the frame
            // buffer is a mutable SpecificInternalRow (no UnsafeRow
            // BigDecimal churn) and evaluateExpression runs per OUTPUT row,
            // so the two-long accumulator's win disappears while its
            // toDecimal reassembly multiplies (VERDICT r19 #3). The
            // graft_dec cast is the part that pays here (~15%).
            round(sum(dec6(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
              2).cast("double")
              .as("running_total"),
            rank().over(w).as("rk"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"))
          .orderBy("o_custkey", "o_orderkey")
      }
    ),
    QueryDef(
      "q11_topk_sort",
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10"""),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(10)
    ),
    QueryDef(
      "q12_distinct",
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus").distinct()
          .orderBy("l_returnflag", "l_linestatus")
    ),
    QueryDef(
      "q13_set_ops",
      Some("""
        SELECT * FROM (
          (SELECT c_custkey FROM customer WHERE c_acctbal > 0
           INTERSECT
           SELECT o_custkey AS c_custkey FROM orders)
          EXCEPT
          SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F') t
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.filter(col("c_acctbal") > 0).select("c_custkey")
          .intersect(o.select(col("o_custkey").as("c_custkey")))
          .except(o.filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
      }
    ),
    QueryDef(
      "q14_case_buckets",
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS cnt
        FROM orders GROUP BY 1 ORDER BY bucket"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "mid")
              .otherwise("large"))
          .groupBy("bucket").agg(count(lit(1)).as("cnt"))
          .orderBy("bucket")
    ),
    QueryDef(
      "q15_string_funcs",
      Some("""
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               length(p_name) AS name_len,
               substring(p_type, 1, 5) AS type5,
               list_extract(string_split(p_name, ' '), 1) AS first_word,
               reverse(p_brand) AS brand_rev,
               replace(p_type, ' ', '_') AS type_snake,
               concat(p_brand, ':', p_type) AS brand_type
        FROM part ORDER BY p_partkey"""),
      (s, dir) =>
        Tables.load(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          reverse(col("p_brand")).as("brand_rev"),
          expr("replace(p_type, ' ', '_')").as("type_snake"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
          .orderBy("p_partkey")
    ),
    QueryDef(
      "q16_date_funcs",
      Some("""
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               COUNT(*) AS cnt,
               MIN(CAST(o_orderdate AS DATE)) AS first_day,
               MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')) AS max_days_to_99
        FROM orders
        GROUP BY 1, 2 ORDER BY y, m"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("cnt"),
               min(col("o_orderdate").cast("date")).as("first_day"),
               max(datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date")))
                 .as("max_days_to_99"))
          .orderBy("y", "m")
    ),
    QueryDef(
      "q17_scalar_subquery",
      Some("""
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) FROM part)
        ORDER BY p_partkey"""),
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
        val avgDF = p.agg(
          (dsum(col("p_retailprice")).cast("double") / count(lit(1)))
            .as("__avg"))
        p.crossJoin(broadcast(avgDF))
          .filter(col("p_retailprice") > col("__avg"))
          .select("p_partkey", "p_retailprice")
          .orderBy("p_partkey")
      }
    ),
    QueryDef(
      "q18_rollup",
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, dir) =>
        // pre-cast the summed column BELOW the grouping-set Expand so the
        // double→decimal conversion runs once per source row, not once per
        // expanded copy (dsum's re-cast of the already-decimal column is
        // removed by SimplifyCasts) — same trick in q24/q27
        Tables.load(s, dir, "lineitem")
          .withColumn("__qd", dec6(col("l_quantity")))
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), Relational.dsumOutPre(col("__qd")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    ),
    QueryDef(
      "q19_having",
      Some("""
        SELECT o_custkey, COUNT(*) AS cnt FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 15
        ORDER BY o_custkey"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 15)
          .orderBy("o_custkey")
    ),
    QueryDef(
      "q20_explode_tokens",
      Some("""
        SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(p_type, ' ')) AS word FROM part) t
        GROUP BY word ORDER BY word"""),
      (s, dir) =>
        Tables.load(s, dir, "part")
          .select(explode(split(col("p_type"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy("word")
    ),
    QueryDef(
      "q21_conditional_pivot",
      Some("""
        SELECT c_mktsegment,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("f_cnt"),
            count(when(col("o_orderstatus") === "O", 1)).as("o_cnt"),
            count(when(col("o_orderstatus") === "P", 1)).as("p_cnt"))
          .orderBy("c_mktsegment")
      }
    ),
    QueryDef(
      "q22_not_exists",
      Some("""
        SELECT c_mktsegment, COUNT(*) AS cnt,
               CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal
        FROM customer
        WHERE c_acctbal > 0 AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 0)
        val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), dsumOut(col("c_acctbal")).as("bal"))
          .orderBy("c_mktsegment")
      }
    ),
    QueryDef(
      "q24_cube",
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, dir) =>
        // decimal cast below the ×4 cube Expand — see q18
        Tables.load(s, dir, "lineitem")
          .withColumn("__qd", dec6(col("l_quantity")))
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), Relational.dsumOutPre(col("__qd")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    ),
    QueryDef(
      "q27_grouping_sets",
      // explicit GROUPING SETS in a union shape neither ROLLUP nor CUBE
      // expresses: per-returnflag totals alongside per-linestatus totals
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, dir) =>
        // decimal cast below the ×2 grouping-set Expand — see q18
        Tables.load(s, dir, "lineitem")
          .withColumn("__qd", dec6(col("l_quantity")))
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), Relational.dsumOutPre(col("__qd")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    ),
    QueryDef(
      "q28_range_frame",
      // RANGE frame window (value-based, not row-based — includes peers):
      // per order, the customer's trailing-30-day order count and spend.
      // The frame key is an integer epoch-day, so frame bounds are exact
      // on both engines; the decimal window sum surfaces as rounded double.
      Some("""
        SELECT o_orderkey,
               COUNT(*) OVER w AS cnt_30d,
               CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS sum_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("__d"))
          .rangeBetween(-30, Window.currentRow)
        Tables.load(s, dir, "orders")
          .withColumn("__d",
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
          .select(col("o_orderkey"),
            count(lit(1)).over(w).as("cnt_30d"),
            // BUILT-IN sum over the fast-cast decimal — same revert as q10
            // (VERDICT r19 #3: the window-frame graft_dsum was unproven;
            // warm A/B confirmed it's a small net loss there)
            round(sum(dec6(col("o_totalprice"))).over(w), 2)
              .cast("double").as("sum_30d"))
          .orderBy("o_orderkey")
      }
    ),
    QueryDef(
      "q25_percentiles",
      // exact interpolated percentiles per group; Spark `percentile` and
      // DuckDB `quantile_cont` both sort and linearly interpolate — the
      // 1e-4 rounding absorbs interpolation-arithmetic low-bit wobble
      Some("""
        SELECT c_mktsegment,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        // ONE percentile aggregate with an array of targets (round 19):
        // three scalar `percentile(...)` calls each built their own
        // per-group value buffer and sorted it independently — the array
        // form keeps one buffer and one sort, interpolating all three
        // targets from it with identical arithmetic (same values).
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))").as("__p"))
          .select(col("c_mktsegment"),
            round(element_at(col("__p"), 1), 4).as("p50"),
            round(element_at(col("__p"), 2), 4).as("p90"),
            round(element_at(col("__p"), 3), 4).as("p99"))
          .orderBy("c_mktsegment")
      }
    ),
    QueryDef(
      "q29_range_bucket_join",
      // RANGE JOIN via bucketing — the operator whose naive plan is a
      // nested-loop pair explosion at scale. Events join time windows on
      // `ts ∈ [lo, hi)` with NO equi key; the Spark plan derives one: the
      // window's DAY is an equi bucket (windows are intra-day), events
      // bucket by day(ts), and the range condition becomes a residual on
      // a hash join. Swap broadcast for shuffle and the same plan runs at
      // any dim size — never a cartesian (PlanAuditSpec pins it).
      Some("""
        WITH w AS (
          SELECT range AS wid,
                 make_timestamp(2024, 1, CAST(range + 1 AS INT), 6, 0, 0) AS lo,
                 make_timestamp(2024, 1, CAST(range + 1 AS INT), 18, 0, 0) AS hi
          FROM range(0, 30, 3))
        SELECT wid, COUNT(*) AS cnt,
               CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        FROM events e JOIN w
          ON CAST(e.ts AS TIMESTAMP) >= w.lo AND CAST(e.ts AS TIMESTAMP) < w.hi
        GROUP BY wid ORDER BY wid"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("d", dayofmonth(col("ts")))
        val w = s.range(0, 30, 3).select(
          col("id").as("wid"),
          (col("id") + 1).cast("int").as("wd"),
          expr("make_timestamp_ntz(2024, 1, CAST(id + 1 AS INT), 6, 0, 0)").as("lo"),
          expr("make_timestamp_ntz(2024, 1, CAST(id + 1 AS INT), 18, 0, 0)").as("hi"))
        e.join(broadcast(w),
            e("d") === w("wd") && col("ts") >= col("lo") && col("ts") < col("hi"))
          .groupBy("wid")
          .agg(count(lit(1)).as("cnt"), dsumOut4(col("value")).as("sum_value"))
          .orderBy("wid")
      }
    ),
    QueryDef(
      "q23_asof_join",
      // As-of join: each event picks the same user's most recent purchase
      // at-or-before its timestamp. The Spark plan is the scalable union +
      // last_value(ignoreNulls) window pattern — ONE shuffle on user_id,
      // no range-join pair explosion, state rows interleaved before event
      // rows at equal timestamps for inclusive (>=) semantics. The oracle
      // is DuckDB's native ASOF LEFT JOIN.
      Some("""
        WITH e AS (
          SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 value, event_type
          FROM events),
        p AS (
          SELECT user_id, us AS purchase_us, value AS purchase_value
          FROM e WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id, e.us, p.purchase_us, p.purchase_value
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.us >= p.purchase_us
        ORDER BY e.event_id"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        val pType = "struct<purchase_us:bigint,purchase_value:double>"
        val evr = e.select(col("user_id"), col("us"), lit(1).as("kind"),
          col("event_id"), lit(null).cast(pType).as("p"))
        val pur = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us"), lit(0).as("kind"),
            lit(null).cast("long").as("event_id"),
            struct(col("us").as("purchase_us"), col("value").as("purchase_value")).as("p"))
        val w = Window.partitionBy("user_id").orderBy("us", "kind")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evr.unionByName(pur)
          .withColumn("pp", last(col("p"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"), col("us"),
            col("pp.purchase_us").as("purchase_us"),
            col("pp.purchase_value").as("purchase_value"))
          .orderBy("event_id")
      }
    ),
    QueryDef(
      "e01_event_hourly_agg",
      // tumbling-window batch aggregation over the event stream table
      Some("""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
               COUNT(*) AS cnt,
               CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY hour, event_type"""),
      (s, dir) =>
        Tables.events(s, dir)
          // Truncate by field extraction on the NTZ value (no session-TZ
          // round trip): identical to DuckDB's naive date_trunc in ANY
          // session timezone.
          .groupBy(expr("make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)")
                     .as("hour"),
                   col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsumOut4(col("value")).as("sum_value"))
          .orderBy("hour", "event_type")
    ),
    QueryDef(
      "q26_array_agg",
      // aggregation INTO arrays; distinct+sort makes the result order
      // deterministic on both engines. The array aggregation itself stays
      // internal — the OUTPUT serializes each array to a comma-joined string
      // because the driver's row hasher cannot sort/hash array-typed columns.
      Some("""
        SELECT o_orderstatus,
               array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
               array_to_string(list_sort(list_distinct(list(year(o_orderdate)))), ',') AS years,
               COUNT(*) AS cnt
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            array_join(array_sort(array_distinct(collect_list(col("o_orderpriority")))), ",")
              .as("priorities"),
            array_join(transform(array_sort(array_distinct(collect_list(year(col("o_orderdate"))))),
                                 _.cast("string")), ",")
              .as("years"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderstatus")
    ),
    QueryDef(
      "e05_funnel",
      // Ordered-funnel analysis: users who viewed, then clicked AFTER
      // their first view, then purchased AFTER that click. Each stage is
      // one hash agg on user_id plus a shuffle join against the previous
      // (already aggregated, one row per user) stage. The stage sides are
      // O(distinct users) — corpus-dependent, NOT bounded — so they are
      // deliberately NOT broadcast-hinted; AQE still broadcasts when a
      // side is genuinely small. No self-join explosion: linear in events.
      Some("""
        WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        v AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_view_click,
               (SELECT COUNT(*) FROM p) AS n_view_click_purchase"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
      }
    ),
    QueryDef(
      "e06_retention",
      // Cohort retention: users grouped by their first-activity day, then
      // distinct active users per (cohort, day-offset). Two shuffles on
      // user_id (first-touch agg + join back — Catalyst reuses the
      // exchange) and one small (cohort, offset) agg; no self-join on raw
      // events, so it scales linearly at 100 TB.
      Some("""
        WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        f AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id)
        SELECT f.d0 AS cohort, datediff('day', f.d0, e.d) AS day_offset,
               COUNT(DISTINCT e.user_id) AS users
        FROM e JOIN f ON f.user_id = e.user_id
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val f = e.groupBy("user_id").agg(min("d").as("d0"))
        e.join(f, "user_id")
          .groupBy(col("d0").as("cohort"),
            datediff(col("d"), col("d0")).cast("long").as("day_offset"))
          .agg(countDistinct("user_id").as("users"))
          .orderBy("cohort", "day_offset")
      }
    ),
    QueryDef(
      "e07_rolling_anomaly",
      // Per-user rolling z-score anomaly detection: each event compared
      // against its user's TRAILING 10 events (mean/σ over a ROWS frame
      // excluding the current row; partial windows don't flag). All
      // moments accumulate as exact DECIMAL sums — cast to double only
      // AFTER — so the flag comparisons run on bit-identical inputs in
      // both engines (stddev's incremental formulations would not).
      // One window shuffle on user_id, linear at any event volume.
      Some("""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                 CAST(value AS DECIMAL(18,6)) AS vd
          FROM events),
        win AS (
          SELECT user_id, event_id, CAST(vd AS DOUBLE) AS v,
                 CAST(SUM(vd) OVER w AS DOUBLE) AS s,
                 CAST(SUM(CAST(vd * vd AS DECIMAL(38,12))) OVER w AS DOUBLE) AS ss,
                 COUNT(*) OVER w AS n
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        flagged AS (
          SELECT user_id,
                 CASE WHEN n = 10
                        AND (ss - s * s / 10.0) / 9.0 > 0
                        AND (v - s / 10.0) * (v - s / 10.0)
                            > 4.0 * (ss - s * s / 10.0) / 9.0
                      THEN 1 ELSE 0 END AS is_anomaly
          FROM win)
        SELECT user_id, CAST(SUM(is_anomaly) AS BIGINT) AS n_anomalies,
               COUNT(*) AS n_events
        FROM flagged GROUP BY user_id HAVING SUM(is_anomaly) > 0
        ORDER BY user_id"""),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-10, -1)
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            dec6(col("value")).as("vd"))
        val win = e.select(col("user_id"), col("event_id"),
          col("vd").cast("double").as("v"),
          // BUILT-IN sum in the window frame (round 20 — see q10). The
          // SQUARE sum stays built-in too: vd*vd carries 12 decimal digits
          // of scale, so its per-row type (37,12) is not Long-backed —
          // narrowing it would round per-row values and change the flag
          // arithmetic.
          sum(col("vd")).over(w).cast("double").as("s"),
          sum((col("vd") * col("vd")).cast(DecimalType(38, 12))).over(w)
            .cast("double").as("ss"),
          count(lit(1)).over(w).as("n"))
        val varTimes9 = col("ss") - col("s") * col("s") / 10.0
        val dev = col("v") - col("s") / 10.0
        win
          .withColumn("is_anomaly",
            when(col("n") === 10 && varTimes9 / 9.0 > 0 &&
              dev * dev > lit(4.0) * varTimes9 / 9.0, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum("is_anomaly").cast("long").as("n_anomalies"),
               count(lit(1)).as("n_events"))
          .filter(col("n_anomalies") > 0)
          .orderBy("user_id")
      }
    ),
    QueryDef(
      "e08_event_transitions",
      // Behavioral bigram model: per-user event streams ordered by
      // (ts, event_id), counting (previous type -> type) transitions —
      // the Markov transition matrix of user behavior. One window lag
      // per user partition + one hash agg over at most |types|² keys;
      // exact integer counts and one rounded double share per row.
      Some("""
        WITH seq AS (
          SELECT event_type AS to_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_type
          FROM events)
        SELECT from_type, to_type, COUNT(*) AS cnt,
               round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*))
                 OVER (PARTITION BY from_type) AS DOUBLE), 6) AS from_share
        FROM seq WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
        ORDER BY from_type, to_type"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val fromW = Window.partitionBy("from_type")
        Tables.events(s, dir)
          .select(col("event_type").as("to_type"),
            lag(col("event_type"), 1).over(w).as("from_type"))
          .filter(col("from_type").isNotNull)
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("from_share",
            round(col("cnt").cast("double") /
              sum(col("cnt")).over(fromW).cast("double"), 6))
          .orderBy("from_type", "to_type")
      }
    ),
    QueryDef(
      "e04_skew_salted_agg",
      // Skew-safe aggregation: events has only 5 event_type keys, so a
      // direct global groupBy funnels each key into one task. Two-phase
      // salted aggregation — partial agg on (key, salt) across many tasks,
      // then combine on key — spreads each hot key over 16 tasks while
      // producing byte-identical results to the direct GROUP BY (exact
      // integer sums combine associatively). The oracle IS the direct
      // GROUP BY.
      Some("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(s, dir)
          .withColumn("__salt", pmod(col("event_id"), lit(16)))
          .groupBy("event_type", "__salt")
          .agg(count(lit(1)).as("c"), sum(k).as("sk"))
          .groupBy("event_type")
          .agg(sum(col("c")).cast("long").as("cnt"),
               sum(col("sk")).cast("long").as("sum_k"))
          .orderBy("event_type")
      }
    ),
    QueryDef(
      "e03_json_extract_agg",
      // JSON path extraction over the events.props payload + aggregation
      Some("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
               sum(k).cast("long").as("sum_k"),
               max(k).as("max_k"))
          .orderBy("event_type")
      }
    ),
    QueryDef(
      "e02_sessionize",
      // 30-minute-gap sessionization via window functions (batch analogue
      // of streaming session windows); exact integer micros arithmetic
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value,
                 CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                        - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000000 THEN 1
                      WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                      ELSE 0 END AS is_new
          FROM events),
        sessions AS (
          SELECT user_id, event_id, us, value,
                 -- DuckDB widens an integer window SUM to HUGEINT; the
                 -- driver's hasher treats HUGEINT differently from Spark's
                 -- BIGINT even when values match, so pin the type.
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM marked)
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MIN(us) AS start_us, MAX(us) AS end_us,
               CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        FROM sessions
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wUs = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables.events(s, dir)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        val marked = e.withColumn("is_new",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1)
            .otherwise(0))
        marked
          .withColumn("session_seq", sum(col("is_new")).over(wUs))
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"),
               min(col("us")).as("start_us"),
               max(col("us")).as("end_us"),
               dsumOut4(col("value")).as("sum_value"))
          .orderBy("user_id", "session_seq")
      }
    ),
    QueryDef(
      "q30_percentiles_scalable",
      // Same exact interpolated percentiles as q25, computed WITHOUT the
      // percentile aggregate's value buffer (which grows with the group's
      // distinct values — q25's one documented 100 TB pressure point,
      // README "Exact percentiles at scale"): rank rows per group with a
      // spill-safe window sort, keep only the two rows flanking each
      // target position, interpolate. Memory per task is the external
      // sorter's budget regardless of group size.
      Some("""
        SELECT c_mktsegment,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_totalprice").cast("double").as("v"))
        // ties broken by value only — equal values are interchangeable
        // for quantiles, so the rank assignment is deterministic enough
        val byVal = Window.partitionBy("c_mktsegment").orderBy("v")
        val whole = Window.partitionBy("c_mktsegment")
        val ranked = joined
          .withColumn("rn", row_number().over(byVal).cast("long") - 1L)
          .withColumn("cnt", count(lit(1)).over(whole))
        def pct(p: Double) = {
          val posRow = lit(p) * (col("cnt") - 1).cast("double") // per-row
          val lower = max(when(col("rn") === floor(posRow), col("v")))
          val upper = max(when(col("rn") === ceil(posRow), col("v")))
          val pos = lit(p) * (max(col("cnt")) - 1).cast("double") // per-group
          round(lower + (pos - floor(pos)) * (upper - lower), 4)
        }
        ranked.groupBy("c_mktsegment")
          .agg(pct(0.5).as("p50"), pct(0.9).as("p90"), pct(0.99).as("p99"))
          .orderBy("c_mktsegment")
      }
    )
  )
}
