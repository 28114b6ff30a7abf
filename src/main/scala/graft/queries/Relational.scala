package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage (SURVEY.md §2.2–§2.7): aggregation, joins,
  * windows, sorts, set ops, scalar functions — each as a Spark-first
  * DataFrame program plus an equivalent DuckDB oracle SQL.
  *
  * Float-determinism rules (calibrated against DuckDB 1.0):
  *  - Per-row double arithmetic is bit-identical across engines; only the
  *    aggregation ORDER varies. So any SUM over doubles casts the per-row
  *    value to DECIMAL(18,6) first so the sum itself is exact.
  *  - Exact decimal sums never appear in OUTPUT: DuckDB backs DECIMAL(38,10)
  *    with int128 and the driver's hasher rejects that representation even
  *    when values match. Final projections go through
  *    round(cast(sum as double), 2) on BOTH engines (see dsumOut).
  *  - Ratios (avg) go through round(cast(sum as double)/count, 6): the
  *    1-ulp cast wobble is absorbed by rounding at 1e-6.
  */
object Relational {

  /** Exact decimal sum of a per-row double expression. Scale 6 is lossless
    * for the 2-dp money columns and their ≤6-dp products, and precision 18
    * keeps Spark's per-row decimals Long-backed (compact).
    * Internal only: exact decimals hash differently across engines (DuckDB
    * backs wide sums with int128), so never surface this type in output.
    * Round 19: the aggregation runs through [[graft.functions.DecimalSum128]]
    * (`graft_dsum`) — the exact unscaled sum kept in two primitive long
    * buffer slots — instead of `sum(decimal(18,6))`, whose decimal(28,6)
    * accumulator falls off UnsafeRow's compact-long path and costs a
    * BigDecimal (de)serialization per row (~0.35 s per aggregate per 600k
    * rows, measured at sf0.1). Same exact value, same null-on-empty
    * semantics; registered by GraftSqlExtensions on every engine session. */
  /** Correctly-rounded double→decimal(18,6) — value-identical to
    * `.cast(DecimalType(18,6))` on a double input (proven by
    * DoubleToDecimalSpec) without the built-in cast's per-row
    * `Double.toString` + BigDecimal parse (~0.15 s per 600k rows per
    * expression at sf0.1 — round 20, guide §4). Double inputs ONLY:
    * [[graft.functions.DoubleToDecimal18]] rejects other types at
    * analysis rather than silently changing cast semantics. */
  private[queries] def dec6(e: Column): Column =
    call_function("graft_dec", e, lit(6))

  private def dsum(e: Column): Column =
    call_function("graft_dsum", dec6(e))

  /** Output form of a decimal sum: round the EXACT decimal at 1e-2, THEN
    * cast to double. Rounding must happen in the decimal domain — a sum
    * landing exactly on a half-cent (549463674.4350, sf1 q04) rounds
    * differently per engine once it has passed through a double (Spark's
    * round(double) re-derives the shortest decimal and sees the tie;
    * DuckDB rounds the binary value sitting just below it). The final
    * decimal(…,2)→double cast is the correctly-rounded nearest double in
    * both engines, so the surfaced value is bit-identical.
    * Mirrors `CAST(round(SUM(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)`. */
  private[queries] def dsumOut(e: Column): Column =
    round(dsum(e), 2).cast("double")

  /** dsumOut over a column ALREADY cast to decimal(18,6) (the grouping-set
    * queries pre-cast below the Expand so the conversion runs once per
    * source row, not per expanded copy). */
  private[queries] def dsumOutPre(e: Column): Column =
    round(call_function("graft_dsum", e), 2).cast("double")

  /** Deterministic average surfaced as a rounded double. */
  private def davg(e: Column): Column =
    round(dsum(e).cast("double") / count(lit(1)), 6)

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  val defs: Seq[QueryDef] = Seq(
    // ----- Aggregation (SURVEY §2.4) -----------------------------------
    QueryDef(
      "q01_pricing_summary",
      // TPC-H Q1 shape: group-by agg with sum/avg/count over lineitem.
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
               round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsumOut(col("l_quantity")).as("sum_qty"),
            dsumOut(col("l_extendedprice")).as("sum_base_price"),
            dsumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }
    ),
    QueryDef(
      "q06_revenue_filter_agg",
      // TPC-H Q6 shape: selective filter + single exact aggregate; the
      // filter must reach the parquet scan as a pushed predicate.
      Some("""
        SELECT CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24"""),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(
            dsumOut(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n"))
    ),
    QueryDef(
      "q03_join_broadcast_agg",
      // Fact ⋈ small dim: the dim side must broadcast (no shuffle of orders).
      Some("""
        SELECT c_mktsegment,
               COUNT(*) AS order_cnt,
               CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("order_cnt"),
               dsumOut(col("o_totalprice")).as("total_price"))
          .orderBy("c_mktsegment")
      }
    )
  )
}
