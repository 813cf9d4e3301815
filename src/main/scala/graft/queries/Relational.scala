package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query battery — the correctness surface for the SQL engine
  * capability (reference: src/sql/engine.py:66 executes arbitrary SQL over
  * the cached corpus via DataFusion; here the engine is Catalyst/Tungsten
  * and each query is a declarative DataFrame plan the optimizer is free to
  * rewrite). Each query has a DuckDB oracle in [[oracles]] with identical
  * column names and decimal-exact aggregation (see graft.functions.Exact).
  */
object Relational {

  /** TPC-H Q1-style wide aggregate: map-side partial agg, single shuffle
    * on a 6-value grouping key. Scale note: pure hash agg, no join; at
    * 100 TB this is scan-bound and the decimal sums stay exact. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        // ROUND to money scale BEFORE the double cast: the scale-8 exact
        // sums need ~18 significant digits at sf>=0.1, beyond double, and
        // engines round the decimal->double conversion differently. Both
        // engines' ROUND is half-away-from-zero (a decimal CAST would
        // truncate in DuckDB)
        round(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))), 2)
          .cast("double").as("sum_charge"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        avgMoney(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Projection + filter: Catalyst pushes both into the parquet scan
    * (`PushedFilters: [GT(l_quantity,45.0)]`, 3-column ReadSchema). */
  def qScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45)
      .select(
        col("l_orderkey"),
        col("l_extendedprice"),
        unix_timestamp(col("l_shipdate")).as("ship_epoch"))

  /** TPC-H Q6-style selective conjunctive filter → single scalar. */
  def qFilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(
        sum(money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q3-style: broadcast customer dim into orders, shuffle join to
    * lineitem on orderkey, agg, deterministic top-10. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style 6-way join: region/nation broadcast, fact joins
    * shuffle on their keys, revenue per nation. */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** EXISTS semi-join (TPC-H Q4 shape): left-semi, no row duplication. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val bigLines = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
    o.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** NOT EXISTS anti-join: customers with no 2001 orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Order-by-limit with unique tiebreaker (deterministic top-k). */
  def qTopK(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .limit(20)

  /** Multi-column distinct (shuffle dedup). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()

  /** Window rank: top-3 customers per nation by balance. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rk"))
  }

  /** Running sum per customer over order history (decimal-exact frame). */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("run_total", sum(money(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("run_total"))
  }

  /** GROUP BY ROLLUP: multi-level totals with null markers. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("total_price"))

  /** Scalar subquery: parts above the (decimal-exact) average price.
    * One declarative plan — the 1-row aggregate is broadcast-crossed
    * into the scan (no driver-side action, composable/cacheable as a
    * single plan; at scale the agg is a tiny side-stage feeding a
    * BroadcastNestedLoopJoin of one row). */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val avgPrice = p.agg(avgMoney(col("p_retailprice")).as("__avg"))
    p.crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("__avg"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
  }

  /** IN-subquery chain region → nation → supplier (broadcast semis). */
  def qInSubquery(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left_semi")
    Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
  }

  /** UNION ALL of two entity sets + aggregate by kind. */
  def qUnion(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(lit("cust").as("kind"), col("c_acctbal").as("bal"))
    val sup = Tables.supplier(s, dir)
      .select(lit("supp").as("kind"), col("s_acctbal").as("bal"))
    c.unionAll(sup)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_rows"), sumMoney(col("bal")).as("total_bal"))
  }

  /** CASE + string functions per row. */
  def qCaseString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
      length(col("c_name")).cast("int").as("name_len"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 5000, "mid")
        .otherwise("high").as("bal_band"),
      concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"))

  /** Date extraction / truncation / arithmetic per row. */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"),
      month(col("o_orderdate")).cast("int").as("o_month"),
      dayofmonth(col("o_orderdate")).cast("int").as("o_day"),
      quarter(col("o_orderdate")).cast("int").as("o_quarter"),
      unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_start_epoch"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
        .cast("int").as("days_to_2002"))

  /** TPC-H Q13 shape: LEFT OUTER join preserving customers with no
    * orders, then the distribution of order counts (zeros included). */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 shape: correlated per-group average — lineitems below
    * 40% of their part's average quantity (decimal-exact per-part avg).
    * The correlation key IS the grouping key, so the per-part average
    * is a WINDOW over the partkey shuffle rather than an aggregate
    * joined back: ONE lineitem shuffle total, no join, and window
    * partition width is bounded by lineitems-per-part (never corpus
    * shape). The previous broadcast-hinted agg-join was faster only
    * while one-row-per-part fit the broadcast budget — ~2M parts at the
    * 100× sweep already pressed the threshold, and at 100 TB the hint
    * forces an OOM where this form just scales with the shuffle. */
  def qCorrelatedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .withColumn("avg_qty",
        sum(money(col("l_quantity"))).over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("l_quantity") < col("avg_qty") * 0.4)
      .agg(
        sumMoney(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_rows"))
  }

  /** Ordered string aggregation (LISTAGG / STRING_AGG): the distinct
    * market segments per nation, sorted and comma-joined. Spark has no
    * ordered string_agg; `collect_set` → `array_sort` → `array_join`
    * expresses it deterministically (set semantics make the result
    * order-independent, so it hash-matches any engine). Scale: the
    * per-group set is bounded by segment cardinality (5), never group
    * row count. */
  def qListagg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count_distinct(col("c_mktsegment")).as("n_segs"))

  /** NTILE bucketing: customers split into balance quartiles with a
    * unique tiebreak (c_custkey), then profiled per bucket. The window
    * is deliberately GLOBAL — ntile needs a total order — so this is the
    * bounded/reporting ORACLE form; [[qNtileApprox]] is the scale twin
    * (broadcast approx-quantile boundaries, map-side assignment, no
    * WindowExec) to run at 100 TB. */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("bucket", ntile(4).over(w))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sumMoney(col("c_acctbal")).as("sum_bal"))
  }

  /** Scale-safe twin of [[qNtile]] (R47's 100 TB form): the exact NTILE
    * needs a TOTAL order — one task sorts every row — so at scale the
    * quartile split is done by VALUE boundaries instead: a one-row
    * `percentile_approx` sketch (mergeable, one reduce) broadcasts the
    * three quartile cut points, bucket assignment is a map-side
    * comparison, and the profile is an ordinary hash aggregation. No
    * WindowExec, no single-partition stage, one scan + one 4-group
    * shuffle. Buckets are approximately-equal-sized rather than exactly
    * ±1 (value-boundary semantics; ties share a bucket), which is the
    * standard trade — the exact form stays beside it as the bounded/
    * reporting oracle gate, mirroring q_profile / q_profile_approx. */
  def qNtileApprox(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val bounds = c.agg(percentile_approx(
      col("c_acctbal"), array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("bs"))
    c.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        lit(1) + (col("c_acctbal") > col("bs")(0)).cast("int")
          + (col("c_acctbal") > col("bs")(1)).cast("int")
          + (col("c_acctbal") > col("bs")(2)).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sumMoney(col("c_acctbal")).as("sum_bal"))
  }

  /** [[qNtileApprox]]'s machinery on an EXACT grid (the oracle twin the
    * rows-only form lacked): the same sketch → broadcast cut points →
    * map-side bucketing, but over `l_quantity` — 50 duplicated values
    * whose runs each span ~2% of the table — at quantiles that land
    * STRICTLY INSIDE a run (0.25 → 13, 0.49 → 25, 0.75 → 38; 0.50 sits
    * exactly at value 25's run edge and is avoided). The sketch's rank
    * error (n/accuracy = 0.01% of rows) is orders of magnitude smaller
    * than the distance to the nearest run edge (~1% of rows) AT EVERY
    * SCALE — both scale with n — so the approximate boundary equals the
    * exact one and the whole bucket profile hash-matches an oracle that
    * derives its own cut points with an exact discrete quantile. */
  def qNtileExactgrid(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val bounds = li.agg(percentile_approx(
      col("l_quantity"), array(lit(0.25), lit(0.49), lit(0.75)), lit(10000)).as("bs"))
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        lit(1) + (col("l_quantity") > col("bs")(0)).cast("int")
          + (col("l_quantity") > col("bs")(1)).cast("int")
          + (col("l_quantity") > col("bs")(2)).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_items"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sumMoney(col("l_extendedprice")).as("sum_price"))
  }

  /** Window-function breadth (R48) — the SQL:2003 navigation/distribution
    * battery beyond rank/running/ntile: lag/lead neighbors, percent_rank
    * and cume_dist relative positions, and the partition's first value,
    * all over one per-customer order-history window. The window key is
    * made unique by (o_orderdate, o_orderkey), so every function is
    * deterministic; the two distribution ratios are divisions of small
    * ints in IEEE doubles, which hash-match any engine. Scale: one
    * shuffle on o_custkey serves all five functions — Spark computes
    * them in a single Window exec over the same sort. */
  def qWindowMisc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("first_date", first(col("o_orderdate")).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("prev_price"),
        col("next_price"), col("pct_rank"), col("cdist"), col("first_date"))
  }

  /** TPC-H Q2 shape: correlated min over a 4-way join — for each size-15
    * part, the EUROPE-supplied lineitems at that part's minimum price
    * (partsupp doesn't exist in this schema; lineitem is the
    * part↔supplier bridge). The correlated `= (SELECT min ...)` becomes
    * a window min partitioned by partkey over the region-restricted
    * join: ONE shuffle on partkey replaces the rejoin-the-subquery plan.
    * supplier⋈nation⋈region and the size-filtered part side are
    * broadcast — at 100 TB only lineitem is big here. */
  def qTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val supEur = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val p = Tables.part(s, dir).filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val elig = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(supEur), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    elig
      .withColumn("min_price",
        min(col("l_extendedprice")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("l_extendedprice") === col("min_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q15 shape: max over an aggregated view — top supplier(s) by
    * quarterly revenue. The view aggregates once (supplier-cardinality
    * output), its max is a 1-row broadcast joined back; the view is NOT
    * recomputed per comparison. */
  def qTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("total_revenue"))
    val best = revenue.agg(max(col("total_revenue")).as("best_revenue"))
    Tables.supplier(s, dir)
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(best), col("total_revenue") === col("best_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q20 shape: nested IN/semi chains — EUROPE suppliers who
    * shipped >50 units of some small part in 1996. Three IN levels:
    * part(p_size<=10) broadcast-semi into lineitem, the HAVING on a
    * (suppkey, partkey) partial-agg'd groupBy, and nation←region as a
    * broadcast semi chain into the supplier dim. Every step is linear
    * in lineitem. */
  def qTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(s, dir).filter(col("p_size") <= 10).select(col("p_partkey"))
    val bigShippers = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(money(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 50)
      .select(col("l_suppkey")).distinct()
    val eurNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select(col("n_nationkey"))
    Tables.supplier(s, dir)
      .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: double-EXISTS anti pattern — NATION_7 suppliers
    * whose returned ('R') lines sit in finished multi-supplier orders
    * where NO other supplier had a return.
    *
    * SINGLE-SCAN form: both the EXISTS ("another supplier has a line in
    * this order") and the NOT EXISTS ("no other supplier has an R line")
    * are facts about the ORDER's per-supplier profile, so one pass
    * computes them: group lineitem by (l_orderkey, l_suppkey) counting
    * each supplier's R lines, then per-order windows give the distinct
    * supplier count and the count of R-flagged suppliers. A supplier's
    * R lines survive iff the order has ≥2 suppliers and exactly one —
    * itself — with a return. One lineitem scan and ONE shuffle: the
    * explicit repartition on l_orderkey satisfies both the
    * (l_orderkey, l_suppkey) aggregation (subset clustering) and the
    * per-order window, so no second exchange; the naïve semi+anti plan
    * scans lineitem three times and shuffles each copy. */
  def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val ordersF = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val perSupp = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("is_r"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(col("is_r")).as("n_r"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_r_supp", sum((col("n_r") > 0).cast("int")).over(w))
      .filter(col("n_r") > 0 && col("n_supp") >= 2 && col("n_r_supp") === 1)
      .join(ordersF, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_r")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q7 shape (volume shipping): bilateral flow between two
    * nations by year. Both nation filters go INTO the dims before any
    * big join (2/25 of suppliers and customers survive), nations are
    * broadcast onto their dims, and the two big joins are co-keyed
    * shuffles: lineitem⋈orders on orderkey, then ⋈customer on custkey.
    * The supplier side rides lineitem as a broadcast at battery scale;
    * at 100 TB AQE flips it to a shuffle join on l_suppkey on its own —
    * the plan is threshold-driven, not hand-pinned. */
  def qTpchQ7(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q9 shape (product-type profit by nation and year). Schema
    * adaptation: this corpus has no partsupp, so supply cost is modeled
    * as 10% of p_retailprice per unit — the JOIN/AGG shape (the point
    * of Q9) is unchanged. Decimal-exact amounts: every product stays
    * inside decimal(38) so the sum is order-independent and the final
    * double cast hash-matches any engine. One lineitem scan; part and
    * supplier⋈nation broadcast; orders co-keyed on orderkey for the
    * year column. */
  def qTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))) -
        money(col("p_retailprice")) * money(col("l_quantity")) * rate(lit(0.10)))
        .cast("double").as("sum_profit"))
  }

  /** TPC-H Q14 shape (promo revenue share): TWO conditional aggregates
    * from ONE lineitem scan — the case-inside-sum idiom that avoids a
    * second pass or a self-join; part is broadcast. The ratio divides
    * two decimal-exact doubles, so it is bit-identical on any engine. */
  def qTpchQ14(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val amount = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", amount).otherwise(lit(0).cast("decimal(15,4)")))
          .cast("double") /
        sum(amount).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q19 shape (disjunctive join predicates): an OR of three
    * conjunctive (part-attribute AND lineitem-range) blocks. The
    * classic optimization is DERIVED COMMON PREDICATES: the union of
    * the part-side disjuncts (brand IN (...), size ≤ 15) pre-filters
    * the broadcast side, and the union of the lineitem ranges
    * (quantity ≤ 30) reaches the scan as a pushed filter — so the join
    * touches only plausibly-matching rows and the exact OR runs
    * post-join on that reduced set. Without the derivation the OR can't
    * push anywhere and the join sees every row. */
  def qTpchQ19(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#17", "Brand#25") &&
        col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(1, 30))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#17" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q4 shape (order priority checking): orders in a quarter
    * having at least one problem lineitem (returnflag R stands in for
    * commit<receipt — the corpus carries no commit/receipt dates, as
    * in Q21), counted per priority. Shape: the EXISTS is a LEFT SEMI
    * join co-keyed on orderkey; the lineitem side is filtered and
    * key-only (distinct folds into the semi join itself), so the
    * shuffle ships 8-byte keys, never lineitem payload. */
  def qTpchQ4(s: SparkSession, dir: String): DataFrame = {
    val problem = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(problem, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): orders per
    * customer including zero-order customers, then the histogram of
    * that count. The priority filter stands in for the comment NOT
    * LIKE. Shape: aggregate orders by custkey FIRST (map-side partial
    * → custkey-sized), then one co-keyed LEFT join from customer;
    * the histogram agg is |distinct counts|-sized. Joining raw orders
    * to customer and double-counting rows would ship order payload
    * through the join for no reason. */
  def qTpchQ13(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total quantity
    * exceeds a threshold, with customer context, top-100 by value.
    * Shape: ONE lineitem aggregation on orderkey produces the filter
    * AND the output quantity (the classical form re-joins lineitem a
    * second time for the SELECT-list sum); survivors are a tiny set,
    * so the orders/customer joins run over ~1% of keys and the
    * TakeOrdered(100) never materializes a global sort. Quantity sums
    * go through decimal so the threshold compare and output are
    * order-independent. */
  def qTpchQ18(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).as("qty"))
      .filter(col("qty") > lit(300).cast("decimal(15,4)"))
    bigOrders
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22 shape (global sales opportunity): customers from a set
    * of countries (nationkey stands in for the phone country code)
    * with above-average balance and NO orders. The scalar-subquery
    * threshold is a one-row broadcast; the compare cross-multiplies
    * (bal·n > total in decimal) so the boundary is exact in any
    * engine — never a float division. The NOT EXISTS is a LEFT ANTI
    * join on custkey over key-only filtered order rows (every customer
    * in this corpus has SOME order, so "no large order" stands in for
    * the classic "no order" — the anti-join shape is identical and the
    * order-side filter pushes to the scan). */
  def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq(3, 8, 13, 17, 19, 22, 24).map(lit(_))
    val pool = Tables.customer(s, dir)
      .filter(col("c_nationkey").isin(codes: _*))
    val thr = pool.filter(col("c_acctbal") > 0)
      .agg(sum(money(col("c_acctbal"))).as("bal_total"),
        count(lit(1)).as("bal_n"))
    pool
      .crossJoin(broadcast(thr))
      .filter(money(col("c_acctbal")) * col("bal_n") > col("bal_total"))
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("int").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  /** TPC-H Q8 shape (national market share): the target nation's share
    * of a part type's trade volume per year. The share is a
    * conditional-sum ratio computed in ONE aggregation (no self-join);
    * part (type-filtered, ~1/25 survives) and supplier⋈nation broadcast
    * onto the single lineitem scan; orders/customer co-keyed. Both
    * decimal sums cast to double before the divide, so the ratio is
    * bit-identical cross-engine. */
  def qTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val amount = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", amount)
          .otherwise(lit(0).cast("decimal(15,4)"))).cast("double") /
        sum(amount).cast("double")).as("mkt_share"))
  }

  /** TPC-H Q10 shape (returned-item revenue): top 20 customers by
    * revenue lost to returns in a quarter. One lineitem scan
    * (returnflag + date filters pushed), orders co-keyed, customer
    * joined AFTER the per-customer rollup so the join input is
    * customer-sized, nation broadcast; TakeOrdered(20) — no global
    * sort. Tie at the cut broken by custkey, so the top-20 SET is
    * deterministic in any engine. */
  def qTpchQ10(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
    revenue
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"), col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): revenue from
    * lineitems under 20% of their part's average quantity. The
    * correlated AVG is a per-part WINDOW over the one filtered scan —
    * single lineitem pass, one exchange (the agg+join-back form scans
    * lineitem twice; a partkey partition is bounded by lines-per-part,
    * so this window has none of the stopword-skew hazard that killed
    * the tfidf window). The 0.2·avg boundary is cross-multiplied
    * (5·qty·n < total in decimal) so membership is engine-exact, never
    * a float compare; the final /7.0 runs in double on both sides
    * (identical IEEE op). */
  def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#23", "Brand#12") && col("p_size") <= 25)
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("qty_total", sum(money(col("l_quantity"))).over(w))
      .withColumn("qty_n", count(lit(1)).over(w))
      .filter(money(col("l_quantity")) * lit(5) * col("qty_n") < col("qty_total"))
      .agg((sum(money(col("l_extendedprice"))).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-bound
    * query — one pass, three pushed filters, no join, no grouping. The
    * whole point at 100 TB is that all three predicates reach the
    * parquet reader (min/max + dictionary pruning skip most files) and
    * the aggregate is a map-side partial; the discount literals parse
    * to the same IEEE doubles on both engines so the range compare is
    * engine-exact. */
  def qTpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q11 shape (important stock identification): per-key value
    * rollup filtered against a GLOBAL scalar — the
    * HAVING-over-fraction-of-total idiom. Schema adaptation (as Q9):
    * no partsupp, so a part's "stock value" is its shipped-quantity
    * value at 10% of retail price from lineitem, restricted to one
    * nation's suppliers. Plan shape: the per-part aggregate subtree
    * appears on BOTH sides (rows + grand total); Catalyst's
    * ReuseExchange collapses them to one scan + one shuffle, and the
    * 1-row total rides a broadcast cross join. The threshold compare
    * runs in double on both engines (same decimal→double cast, same
    * IEEE multiply — bit-identical), never in engine-specific decimal
    * division. */
  def qTpchQ11(s: SparkSession, dir: String): DataFrame = {
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"))
    val value = Tables.lineitem(s, dir)
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(money(col("l_quantity")) * money(col("p_retailprice")) * rate(lit(0.10)))
        .as("value"))
    val total = value.agg(sum(col("value")).cast("double").as("total"))
    value
      .join(broadcast(total))
      .filter(col("value").cast("double") * 1000.0 > col("total"))
      .select(col("l_partkey").as("ps_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** TPC-H Q12 shape (shipping priority audit): co-keyed fact⋈fact join
    * feeding DUAL conditional aggregates (case-inside-sum — one pass,
    * no self-join). Schema adaptation: no l_shipmode/commitdate, so the
    * audit groups by l_linestatus and `l_returnflag = 'R'` stands in
    * for the late-delivery predicate (the same stand-in Q4/Q21 use).
    * The lineitem side filters to ~5% BEFORE the shuffle, and orders
    * ships only (orderkey, priority) — key-plus-one-column traffic. */
  def qTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT)
    * per wide grouping key with a NOT-IN supplier exclusion. Schema
    * adaptation: no partsupp — the part↔supplier association is the
    * distinct (l_partkey, l_suppkey) pairs of lineitem (exactly what
    * partsupp materializes), and `s_acctbal < 0` stands in for the
    * complaints filter. Plan: part prunes to the brand/type/size
    * subset and broadcasts; the exclusion list is a broadcast anti
    * join; the distinct count partial-aggregates (Expand + two-stage
    * agg), so no stage ever holds more than the surviving pair set. */
  def qTpchQ16(s: SparkSession, dir: String): DataFrame = {
    val complainers = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complainers), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q4" -> (qTpchQ4 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q22" -> (qTpchQ22 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q9" -> (qTpchQ9 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q2" -> (qTpchQ2 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_tpch_q20" -> (qTpchQ20 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q11" -> (qTpchQ11 _),
    "q_tpch_q12" -> (qTpchQ12 _),
    "q_tpch_q16" -> (qTpchQ16 _),
    "q_listagg" -> (qListagg _),
    "q_ntile" -> (qNtile _),
    "q_ntile_approx" -> (qNtileApprox _),
    "q_ntile_exactgrid" -> (qNtileExactgrid _),
    "q_outer_join" -> (qOuterJoin _),
    "q_correlated_avg" -> (qCorrelatedAvg _),
    "q1_agg" -> (q1Agg _),
    "q_scan_project" -> (qScanProject _),
    "q_filter_pushdown" -> (qFilterPushdown _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q5_multijoin" -> (q5MultiJoin _),
    "q_semijoin" -> (qSemiJoin _),
    "q_antijoin" -> (qAntiJoin _),
    "q_topk" -> (qTopK _),
    "q_distinct" -> (qDistinct _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_misc" -> (qWindowMisc _),
    "q_rollup" -> (qRollup _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_in_subquery" -> (qInSubquery _),
    "q_union" -> (qUnion _),
    "q_case_string" -> (qCaseString _),
    "q_date_funcs" -> (qDateFuncs _))

  val oracles: Map[String, String] = Map(
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
        |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(15,4)) * CAST(p_retailprice AS DECIMAL(15,4))
        |      * CAST(0.10 AS DECIMAL(4,2))) AS val_d
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1)
        |SELECT l_partkey AS ps_partkey, CAST(val_d AS DOUBLE) AS value
        |FROM v, (SELECT CAST(SUM(val_d) AS DOUBLE) AS total FROM v) t
        |WHERE CAST(val_d AS DOUBLE) * 1000.0 > total
        |ORDER BY value DESC, ps_partkey""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q2" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        |FROM part, lineitem, supplier, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND p_size = 15
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q20" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_nationkey IN (
        |    SELECT n_nationkey FROM nation WHERE n_regionkey IN (
        |      SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
        |      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY 1""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(qty AS DOUBLE) AS sum_qty
        |FROM (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(15,4))) AS qty
        |  FROM lineitem GROUP BY 1) t
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE qty > 300
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q22" ->
      """WITH pool AS (
        |  SELECT * FROM customer
        |  WHERE c_nationkey IN (3, 8, 13, 17, 19, 22, 24)),
        |thr AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS bal_total,
        |    COUNT(*) AS bal_n
        |  FROM pool WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS INT) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS totacctbal
        |FROM pool, thr
        |WHERE CAST(c_acctbal AS DECIMAL(15,4)) * bal_n > bal_total
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY 1""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN amt
        |    ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
        |  / CAST(SUM(amt) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT n.n_name AS supp_nation,
        |    CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n ON n.n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation nc ON nc.n_nationkey = c_nationkey
        |  WHERE p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')) t
        |GROUP BY 1""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment
        |FROM (
        |  SELECT o_custkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1) r
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand IN ('Brand#23', 'Brand#12') AND p_size <= 25),
        |a AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(l_quantity AS DECIMAL(15,4))) AS qty_total,
        |    COUNT(*) AS qty_n
        |  FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM li JOIN a ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(15,4)) * 5 * qty_n < qty_total""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(amt) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ns ON ns.n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation nc ON nc.n_nationkey = c_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |    AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |    AND ns.n_name <> nc.n_name) t
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(amt) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |      - CAST(p_retailprice AS DECIMAL(15,4)) * CAST(l_quantity AS DECIMAL(15,4))
        |        * CAST(0.10 AS DECIMAL(4,2)) AS amt
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  WHERE p_name LIKE '%bolt%') t
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN amt
        |    ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
        |  / CAST(SUM(amt) AS DOUBLE) AS promo_revenue
        |FROM (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-02-01') t""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_listagg" ->
      """SELECT c_nationkey,
        |  string_agg(seg, ',' ORDER BY seg) AS segments,
        |  CAST(COUNT(*) AS BIGINT) AS n_segs
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer) t
        |GROUP BY c_nationkey""".stripMargin,
    "q_ntile" ->
      """SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n_cust,
        |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS sum_bal
        |FROM (
        |  SELECT c_acctbal,
        |    NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
        |  FROM customer) t
        |GROUP BY bucket""".stripMargin,
    "q_ntile_exactgrid" ->
      """WITH b AS (
        |  SELECT quantile_disc(l_quantity, 0.25) AS b1,
        |         quantile_disc(l_quantity, 0.49) AS b2,
        |         quantile_disc(l_quantity, 0.75) AS b3
        |  FROM lineitem
        |)
        |SELECT 1 + CAST(l_quantity > b1 AS INT) + CAST(l_quantity > b2 AS INT)
        |         + CAST(l_quantity > b3 AS INT) AS bucket,
        |  COUNT(*) AS n_items, MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_price
        |FROM lineitem, b
        |GROUP BY 1""".stripMargin,
    "q_outer_join" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q_correlated_avg" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN pa ON l_partkey = pk
        |WHERE l_quantity < avg_qty * 0.4""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_extendedprice,
        |  CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_antijoin" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_acctbal DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) t
        |WHERE rk <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders""".stripMargin,
    "q_window_misc" ->
      """SELECT o_orderkey, o_custkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist,
        |  first_value(o_orderdate) OVER w AS first_date
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_retailprice > (
        |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) FROM part)""".stripMargin,
    "q_in_subquery" ->
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier
        |WHERE s_nationkey IN (
        |  SELECT n_nationkey FROM nation WHERE n_regionkey IN (
        |    SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))""".stripMargin,
    "q_union" ->
      """SELECT kind, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(bal AS DECIMAL(15,4))) AS DOUBLE) AS total_bal
        |FROM (
        |  SELECT 'cust' AS kind, c_acctbal AS bal FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS kind, s_acctbal AS bal FROM supplier) t
        |GROUP BY kind""".stripMargin,
    "q_case_string" ->
      """SELECT c_custkey,
        |  UPPER(SUBSTR(c_name, 1, 8)) AS name_prefix,
        |  CAST(LENGTH(c_name) AS INT) AS name_len,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_band,
        |  c_mktsegment || '-' || c_name AS seg_name
        |FROM customer""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS o_quarter,
        |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
        |FROM orders""".stripMargin)
}
