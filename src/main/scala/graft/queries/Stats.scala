package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregates with cross-engine-exact formulations:
  * covariance/correlation/stddev from decimal-exact moment sums (the
  * built-in `covar_pop`/`corr` accumulate doubles order-dependently and
  * can't be oracle-compared), histogram binning, and edit distance.
  */
object Stats {

  /** Per-flag covariance / correlation of quantity vs price, computed
    * from exact decimal moments: sums are order-independent decimals,
    * then one fixed double expression tree per group. */
  def qStatsAgg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    // moments use narrower decimals than Exact.money: the squared terms
    // must fit DuckDB's decimal multiplication width
    val q = col("l_quantity").cast("decimal(8,2)")
    val p = col("l_extendedprice").cast("decimal(12,2)")
    val agg = l.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(q).cast("double").as("sx"),
      sum(p).cast("double").as("sy"),
      sum(q * p).cast("double").as("sxy"),
      sum(q * q).cast("double").as("sxx"),
      sum(p * p).cast("double").as("syy"))
    // derived moments round to 6 decimals on BOTH engines: the moment
    // sums are decimal-exact, but DuckDB contracts the downstream double
    // arithmetic (FMA), so corr/stddev can differ in the last ulp
    agg.select(
      col("l_returnflag"), col("n"),
      round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6).as("covar_pop"),
      round(((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")) /
        (sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")) *
         sqrt((col("syy") - col("sy") * col("sy") / col("n")) / col("n"))), 6).as("corr"),
      round(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / col("n")), 6).as("stddev_price"))
  }

  /** Exact distribution quantiles per group — the baseline the approx
    * sketches (q_approx_stats) are graded against. Spark's `percentile`
    * is exact (full value aggregation) with R-7 interpolation, the same
    * definition as DuckDB's quantile_cont; outputs round to 6 decimals
    * so the one interpolation step can't flake the hash compare. */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95"))

  /** 10-bin histogram of extended price over the global [min,max]. */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val bounds = l.agg(
      min(col("l_extendedprice")).as("mn"),
      max(col("l_extendedprice")).as("mx"))
    l.crossJoin(broadcast(bounds))
      .select(least(floor((col("l_extendedprice") - col("mn")) /
        (col("mx") - col("mn")) * 10), lit(9)).cast("int").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Edit distance between two windows of each document — the
    * string-similarity primitive for fuzzy dedup. */
  def qEditDistance(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      levenshtein(
        substring(lower(col("text")), 1, 30),
        substring(lower(col("text")), 31, 30)).cast("int").as("lev"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_agg" -> (qStatsAgg _),
    "q_percentiles" -> (qPercentiles _),
    "q_histogram" -> (qHistogram _),
    "q_edit_distance" -> (qEditDistance _))

  val oracles: Map[String, String] = Map(
    "q_stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop,
        |  ROUND(((sxy - sx * sy / n) / n) /
        |    (sqrt((sxx - sx * sx / n) / n) * sqrt((syy - sy * sy / n) / n)), 6) AS corr,
        |  ROUND(sqrt((syy - sy * sy / n) / n), 6) AS stddev_price
        |FROM m""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor((l_extendedprice - m.mn) / (m.mx - m.mn) * 10), 9) AS INT) AS bin,
        |  COUNT(*) AS n_rows
        |FROM lineitem,
        |  (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx FROM lineitem) m
        |GROUP BY 1""".stripMargin,
    "q_edit_distance" ->
      """SELECT doc_id,
        |  CAST(levenshtein(substring(lower(text), 1, 30), substring(lower(text), 31, 30)) AS INT) AS lev
        |FROM documents""".stripMargin)
}
