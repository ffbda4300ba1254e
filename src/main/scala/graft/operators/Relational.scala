package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TimeFns

/** Relational operator suite over the TPC-H-ish tables — the
  * scan/filter/join/aggregate/window/sort core (SURVEY.md §2.1-2.6)
  * exercised at a scale where plan shape matters. Filters and column
  * pruning reach the parquet scan; dimension joins broadcast; top-k
  * compiles to TakeOrderedAndProject.
  *
  * Money math: 2-decimal doubles are summed as exact decimals (or
  * integer cents) and surfaced as double — see TimeFns.dec2/dec4/dec6 —
  * so results hash-match the DuckDB oracle exactly.
  */
object Relational {
  import TimeFns._

  /** TPC-H Q1-shaped pricing summary (grouped SUM/AVG/COUNT, A1-A3
    * analog) with the ship-date filter pushed to the scan. Sums run on
    * exact long units (primitive codegen adds; see TimeFns.longUnits)
    * and surface as one double division each. */
  def pricingSummary(t: Tables): DataFrame =
    t.lineitem
      .where(col("l_shipdate") <= lit("1998-12-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(longUnits(col("l_quantity"), 2)).as("qty_c"),
        sum(longUnits(col("l_extendedprice"), 2)).as("price_c"),
        sum(longUnits(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .as("disc_u"),
        sum(longUnits(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 6)).as("charge_u"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        (col("qty_c") / lit(100.0)).as("sum_qty"),
        (col("price_c") / lit(100.0)).as("sum_base_price"),
        (col("disc_u") / lit(10000.0)).as("sum_disc_price"),
        (col("charge_u") / lit(1000000.0)).as("sum_charge"),
        col("count_order"),
        (col("qty_c") / lit(100.0) / col("count_order")).as("avg_qty"),
        (col("price_c") / lit(100.0) / col("count_order")).as("avg_price"))

  /** TPC-H Q3-shaped: top-10 orders by discounted revenue for one
    * market segment (J4 star join + A7 top-k). No forced broadcast on
    * customer: it grows linearly with SF, so a hard hint becomes a
    * driver OOM at 100x — the segment filter still reaches the scan,
    * and AQE broadcasts the filtered side whenever its *measured* size
    * fits, falling back to a shuffle join when it no longer does. */
  def topRevenueOrders(t: Tables, segment: String = "BUILDING",
      k: Int = 10): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.where(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(longUnits(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .as("rev_u"))
      .orderBy(col("rev_u").desc, col("o_orderkey").asc)
      .limit(k)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"),
        (col("rev_u") / lit(10000.0)).as("revenue"))

  /** TPC-H Q5-shaped: revenue per nation through the full
    * region->nation->customer->orders->lineitem join chain (J1/J4).
    * nation/region are constant-cardinality (25/5 rows) and keep the
    * broadcast hint; customer is SF-proportional, so its join is
    * hint-free — AQE broadcasts it while it measures small and
    * degrades to a shuffle join at scale instead of OOMing on a stale
    * hint. Only lineitem x orders always shuffles. */
  def regionRevenue(t: Tables, region: String): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(longUnits(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .as("rev_u"),
        count(lit(1)).as("n_items"))
      .select(col("n_name"), (col("rev_u") / lit(10000.0)).as("revenue"),
        col("n_items"))

  /** J3 NOT-IN-style anti join: parts never ordered. The reference's
    * NOT IN columns are non-null, so left_anti matches its semantics
    * (SURVEY.md §2.3 J3). */
  def partsNeverOrdered(t: Tables): DataFrame =
    t.part
      .join(t.lineitem.select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  /** J2 NOT-EXISTS-style anti join: customers with no orders. */
  def customersWithoutOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** EXISTS-style semi join (the positive twin of
    * [[customersWithoutOrders]]): customers with at least one order.
    * left_semi never widens the row and stops probing a key at its
    * first match — cheaper than join+distinct at any scale. */
  def customersWithOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** NTILE quartiles of order value WITHIN each order priority — a
    * partitioned ranking window (no global sort: each priority class
    * sorts independently, so the window parallelizes across the
    * partition key at any scale). */
  def orderQuartiles(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    t.orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_cents"))
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("price_cents")) / lit(100.0)).as("total_spend"))
  }

  /** W1-W2-shaped windows: per-customer order sequence with running
    * spend (exact cents) and order rank. */
  def customerOrderWindows(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_date").asc, col("o_orderkey").asc)
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        cents(col("o_totalprice")).as("price_cents"))
      .withColumn("order_rank", row_number().over(w))
      .withColumn("running_spend",
        (sum(col("price_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)) / lit(100.0)))
      .select(col("o_custkey"), col("o_orderkey"), col("o_date"),
        col("order_rank"), col("running_spend"),
        (col("price_cents") / lit(100.0)).as("order_total"))
  }

  /** Value-based RANGE window frame (vs [[customerOrderWindows]]'s
    * ROWS frames): each order's trailing-30-day spend for its customer
    * — the frame is bounded by the ORDER BY VALUE (days since epoch),
    * not by row offsets, so date gaps and same-day peer rows behave
    * per SQL RANGE semantics in both engines. Exact cents, one final
    * division. */
  def trailingSpend(t: Tables, days: Int = 30): DataFrame =
    trailingSpendOf(t.orders, days)

  /** DataFrame form of [[trailingSpend]] (unit-testable without a
    * parquet-backed Tables). */
  def trailingSpendOf(orders: DataFrame, days: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_date_int"))
      .rangeBetween(-(days - 1).toLong, 0L)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("o_date_int"),
        cents(col("o_totalprice")).as("price_cents"))
      .withColumn("trailing_cents", sum(col("price_cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_date"),
        (col("trailing_cents") / lit(100.0)).as("trailing_spend"))
  }

  /** Supplier-side star join (J4 over the remaining dimension chain):
    * suppliers per nation/region with account-balance stats. */
  def supplierByNation(t: Tables): DataFrame =
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(cents(col("s_acctbal"))).as("bal_c"))
      .select(col("r_name"), col("n_name"), col("n_suppliers"),
        (col("bal_c") / lit(100.0)).as("total_acctbal"))

  /** §2.4 completeness: one-pass CUBE over (priority, status) — all
    * four grouping combinations (detail, two one-dim subtotals, grand
    * total) from a single EXPAND pass, the A2-rollup's superset
    * sibling. Null grouping keys are COALESCE-labeled 'ALL' (sound
    * here: both columns are non-null in the data, like the rollup
    * row). Exact cents, one final division. */
  def cubeRevenue(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderpriority"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("price_cents")) / lit(100.0)).as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("revenue"))

  /** Explicit GROUPING SETS with the grouping_id marker — the subtotal
    * layout CUBE/ROLLUP cannot express: exactly (priority),
    * (status), and the grand total, with NO (priority, status)
    * detail rows. grouping_id disambiguates a genuine NULL group key
    * from a subtotal NULL (the reason the marker exists); Spark's
    * grouping_id bit order is left-to-right over the listed columns,
    * matching DuckDB's GROUPING(a, b). Same one-pass EXPAND shape as
    * [[cubeRevenue]]. */
  def groupingSetsRevenue(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderpriority"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")),
          Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        (sum(col("price_cents")) / lit(100.0)).as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid").cast("long").as("gid"), col("n_orders"),
        col("revenue"))

  /** §2.5 completeness: the ANSI window-function surface in one frame —
    * ranking (row_number/rank/dense_rank/ntile), relative position
    * (percent_rank/cume_dist — each a single IEEE division of exact
    * integer ranks, bit-identical across engines), offsets (lag/lead),
    * and frame navigation (first/nth_value over the default frame).
    * The order is a TOTAL order (price desc, then the unique key), so
    * every function is deterministic; partitions are the handful of
    * priorities, each SF-proportional — per-partition sorts, no global
    * window. */
  def windowShowcase(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    t.orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_cents"))
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(5).over(w).as("bucket5"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("top_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
  }

  /** §2.8 scalar-function surface: string ops, MD5 surrogate ids
    * (daily_etl_pipeline.py:357 pattern), conditional buckets, exact
    * cents arithmetic. */
  def scalarShowcase(t: Tables): DataFrame =
    t.customer.select(
      col("c_custkey"),
      concat(lit("cust_"), md5(col("c_custkey").cast("string")))
        .as("surrogate_key"),
      upper(col("c_name")).as("name_upper"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      length(col("c_name")).as("name_len"),
      trim(col("c_mktsegment")).as("segment"),
      cents(col("c_acctbal")).as("bal_cents"),
      abs(cents(col("c_acctbal"))).as("bal_cents_abs"),
      when(col("c_acctbal") < 0, "overdrawn")
        .when(col("c_acctbal") < 5000, "standard")
        .otherwise("premium").as("balance_tier"),
      coalesce(nullif(col("c_mktsegment"), lit("")), lit("UNKNOWN"))
        .as("segment_clean"))
}
