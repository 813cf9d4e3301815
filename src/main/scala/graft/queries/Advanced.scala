package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational surface (SURVEY §2.2 extension): multi-level
  * aggregation, pivot, as-of/range temporal joins, distinct counting,
  * and the skew-salting pattern — each oracle-checked against DuckDB.
  */
object Advanced {

  /** GROUP BY CUBE over status × order-year. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("total_price"))

  /** GROUPING SETS through the SQL engine (S18 surface). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Engine.engineFor(s, dir).sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  /** Pivot order counts by status (fixed value set → stable columns). */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** As-of join: each purchase event paired with the user's most recent
    * click at-or-before it. Spark-first: ONE sort per user partition via
    * a last-non-null window — no pair explosion, the scalable as-of
    * (both engines use the identical (ts, event_id) frame, so ties are
    * deterministic). */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame =
    asofLastClick(Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase")))

  /** The as-of core over any `(event_id, user_id, ts, event_type)`
    * frame, factored out so the skew stress spec (`AsofSkewStressSpec`)
    * drives the exact production window. Skew posture: one pathological
    * user serializes ONE task at O(n log n) sort + O(n) scan — measured
    * near-linear through 800k rows/key; the range-bucketed
    * pre-partition escalation documented in SURVEY §7 stays unbuilt
    * until a real corpus shows >10M-event keys. */
  def asofLastClick(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("last_click_us"))
  }

  /** Range join expressed as a RANGE window frame: clicks in the 5 min
    * before each purchase, per user — the shuffle-once formulation of an
    * interval self-join. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-300000000L, 0L)
    e.withColumn("n_recent_clicks",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("n_recent_clicks"))
  }

  /** Exact distinct counting (shuffle-dedup based). */
  def qCountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Skew-salting pattern: two-phase aggregation through an explicit
    * 16-way salt, proven identical to the direct group-by (the oracle IS
    * the unsalted query). At 100 TB this is the hot-key pressure valve:
    * phase 1 spreads a pathological key over 16 reducers. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val salted = l
      .withColumn("__salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(
        sum(money(col("l_extendedprice"))).as("__p"),
        count(lit(1)).as("__n"))
    salted
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("__p")).cast("double").as("sum_price"),
        sum(col("__n")).as("n_rows"))
  }

  /** Approximate aggregates (HLL distinct, quantile sketch) — rows-only:
    * sketch implementations differ across engines by design; the
    * accuracy contract is spec-tested against exact values. */
  def qApproxStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median_price"))

  /** Semi-structured extraction: pull a typed field out of a JSON
    * string column and aggregate it (the schema-on-read path event
    * pipelines run constantly). `get_json_object` is a codegen'd
    * Catalyst expression, so extraction happens map-side inside the
    * scan stage — no UDF, no shuffle beyond the final agg. */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_missing"))

  /** Table profiling (the data-quality monitoring sweep): per-column
    * row/null/distinct counts and min/max, unpivoted to long form with
    * `stack`. Long/string columns only: their VARCHAR rendering is
    * identical across engines (doubles are not).
    *
    * r17 shape change (same values, 3-4× faster): the exact
    * count_distinct×4 no longer rides the same aggregate as min/max —
    * that combination planned as a 5× row Expand whose 13-column rows
    * then went through THREE SortAggregates with two full sorts,
    * because the string min/max buffers disqualify hash aggregation
    * for the whole aggregate. Now the plain stats run in ONE keyless
    * aggregate (no Expand, and keyless sort-agg needs no Sort) and
    * each distinct count runs as its own single-column two-phase hash
    * aggregate over a pruned scan; the five one-row results cross-join
    * back under the stack. At 100 TB each pass reads only its own
    * column — the same bytes the old Expand plan read once and then
    * amplified 5×; the no-amplification single-pass sweep remains
    * [[qProfileHll]]. */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = ProfileCols
    val o = Tables.orders(s, dir)
    val statAggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"nn__$c"),
        min(col(c)).cast("string").as(s"mn__$c"),
        max(col(c)).cast("string").as(s"mx__$c"))
    }
    val stats = o.agg(statAggs.head, statAggs.tail: _*)
    val nds = cols.map(c => o.agg(count_distinct(col(c)).as(s"nd__$c")))
    nds.foldLeft(stats)(_.crossJoin(_))
      .select(stackProfile(cols))
  }

  private val ProfileCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  private def stackProfile(cols: Seq[String]): Column = {
    val stackArgs = cols.map(c =>
      s"'$c', n, nn__$c, nd__$c, mn__$c, mx__$c").mkString(", ")
    expr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_rows, n_null, n_distinct, min_s, max_s)")
  }

  /** Shared single-scan profile scaffold for the SKETCH-based variants:
    * one aggregate computes every per-column metric, `stack` unpivots
    * to long form. Sketch aggregators merge in the aggregate buffer
    * (no multi-distinct Expand), so for these the one-pass form is the
    * right plan; the exact form above splits instead. */
  private def profileScan(
      s: SparkSession, dir: String, distinctAgg: String => Column,
      cols: Seq[String] = ProfileCols): DataFrame = {
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"nn__$c"),
        distinctAgg(c).as(s"nd__$c"),
        min(col(c)).cast("string").as(s"mn__$c"),
        max(col(c)).cast("string").as(s"mx__$c"))
    }
    Tables.orders(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(stackProfile(cols))
  }

  /** The 100 TB profiling sweep: same single-scan shape as [[qProfile]]
    * but HLL-approximate distincts. The exact form's 4 `count_distinct`s
    * in one aggregate plan via Expand — every input row replicated
    * (nCols+1)× through the first agg stage — which is linear but a 5×
    * row amplification a petabyte sweep shouldn't pay. HLL sketches
    * merge in the aggregate buffer (no Expand, no amplification); the
    * accuracy contract vs the exact form is spec-tested
    * (`AdvancedSpec`). Rows-only for the driver: sketch estimates are
    * engine-specific by design. */
  def qProfileApprox(s: SparkSession, dir: String): DataFrame =
    profileScan(s, dir, c => approx_count_distinct(col(c)))

  /** The HLL profiling sweep on an EXACT grid (the oracle twin of
    * [[qProfileApprox]]'s rows-only claim): same single-scan stack
    * shape, but the sketch is datasketches HLL over LOW-cardinality
    * columns (3 and 5 distinct values), where the sparse-mode sketch
    * stores every coupon and the estimate is EXACT — so the maintained
    * sweep hash-matches DuckDB's exact COUNT(DISTINCT), proving the
    * sketch plumbing end-to-end (the q_mv_nd trick applied to
    * profiling). */
  def qProfileHll(s: SparkSession, dir: String): DataFrame =
    profileScan(s, dir,
      c => hll_sketch_estimate(hll_sketch_agg(col(c).cast("string"))),
      Seq("o_orderstatus", "o_orderpriority"))

  /** [[qApproxStats]]'s machinery on an EXACT grid (its oracle twin):
    * datasketches HLL distincts over 2- and 7-value columns (sparse
    * mode → exact estimate) and an approximate median over
    * `l_linenumber`, whose 7 duplicated values leave the 0.5 rank deep
    * inside value 4's run at every scale — the sketch's rank error
    * (0.01% of rows) cannot reach a run edge (~7% away), so the
    * approximate median IS the exact discrete median. */
  def qApproxStatsExact(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_linestatus"))).as("nd_status"),
        hll_sketch_estimate(hll_sketch_agg(col("l_linenumber").cast("string")))
          .as("nd_lines"),
        percentile_approx(col("l_linenumber"), lit(0.5), lit(10000))
          .cast("long").as("med_line"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_extract" -> (qJsonExtract _),
    "q_profile" -> (qProfile _),
    "q_profile_approx" -> (qProfileApprox _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_pivot" -> (qPivot _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_count_distinct" -> (qCountDistinct _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_approx_stats" -> (qApproxStats _),
    "q_approx_exactgrid" -> (qApproxStatsExact _),
    "q_profile_hll" -> (qProfileHll _))

  val oracles: Map[String, String] = Map(
    "q_approx_exactgrid" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_linestatus) AS nd_status,
        |  COUNT(DISTINCT l_linenumber) AS nd_lines,
        |  CAST(quantile_disc(l_linenumber, 0.5) AS BIGINT) AS med_line
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_profile_hll" ->
      Seq("o_orderstatus", "o_orderpriority").map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority").map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS n_missing
        |FROM events GROUP BY event_type""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS INT))""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, purchase_us, last_click_us FROM (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
        |    last_value(CASE WHEN event_type = 'click'
        |               THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_range_join" ->
      """SELECT event_id, user_id, purchase_us, n_recent_clicks FROM (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
    |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |            RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_recent_clicks
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
