package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral + corpus-distribution analytics (SURVEY §2 extension):
  * the event-funnel / cohort-retention workloads a product-analytics
  * deployment of the engine runs over the `events` table, plus
  * corpus-level distribution diagnostics (Zipf profile, cross-source
  * vocabulary overlap) and the remaining relational set-op /
  * arg-max surface. Everything is oracle-checked: no floats except
  * single fixed-order divisions, all tie-breaks made explicit.
  */
object Analytics {

  // ---- event behavioral analytics --------------------------------------

  /** Ordered conversion funnel view → click → purchase (A1): stage k
    * counts users whose FIRST qualifying event strictly follows their
    * stage-(k-1) timestamp — the product-analytics funnel, expressed as
    * three keyed aggregations.
    *
    * Scale: each stage is one `groupBy(user_id)` + one join on
    * `user_id`; all three stages hash-partition on the SAME key, so
    * after the first exchange the joins are co-partitioned — no
    * broadcast of the (unbounded) user dimension needed.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stage = (step: Int, name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("stage"), col("n_users"))
    stage(1, "view", v)
      .unionAll(stage(2, "click_after_view", c))
      .unionAll(stage(3, "purchase_after_click", p))
  }

  /** Weekly cohort retention (A2): users grouped by the epoch-week of
    * their first event; `week_n` counts weeks elapsed since that cohort
    * week; cell = distinct users from the cohort active that week. Weeks
    * are absolute 7-day buckets from the epoch (`floor(days/7)`), so the
    * bucketing is engine- and timezone-free (session tz is UTC).
    *
    * Scale: one `groupBy(user_id)` for first-activity, one join back on
    * `user_id` (co-partitioned with the agg), one count-distinct keyed
    * by (cohort, week) — cardinality cohorts × weeks, tiny.
    */
  def qRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val epochDate = lit("1970-01-01").cast("date")
    val e = Tables.events(s, dir)
      .select(col("user_id"), datediff(to_date(col("ts")), epochDate).as("du"))
    val first = e.groupBy(col("user_id")).agg(min(col("du")).as("du0"))
    e.join(first, "user_id")
      .select(col("user_id"),
        floor(col("du0") / 7.0).cast("int").as("cohort_week"),
        (floor(col("du") / 7.0) - floor(col("du0") / 7.0)).cast("int").as("week_n"))
      .groupBy(col("cohort_week"), col("week_n"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Rolling engagement (A7): per day, the exact count of distinct users
    * active that day (DAU) and within the trailing 7 days (WAU). The
    * rolling distinct is computed WITHOUT a range self-join: each
    * distinct (day, user) pair fans out map-side to the ≤7 window
    * anchors it can serve (`sequence` + `explode`), then ONE hash
    * aggregate counts distinct users per anchor — linear in active pairs,
    * no window sort, no N×N day join.
    */
  def qActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val epochDate = lit("1970-01-01").cast("date")
    val p = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), epochDate).as("du"), col("user_id"))
      .distinct()
    val dau = p.groupBy(col("du").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val bounds = p.agg(min(col("du")).as("lo"), max(col("du")).as("hi"))
    val wau = p
      .select(explode(sequence(col("du"), col("du") + 6)).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    wau.join(dau, Seq("day"), "left")
      .na.fill(0, Seq("dau"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") >= col("lo") && col("day") <= col("hi"))
      .select(col("day"), col("dau"), col("wau"))
  }

  // ---- corpus distribution diagnostics ---------------------------------

  /** Zipf rank-frequency profile (A3): the top-50 vocabulary with rank,
    * frequency, running cumulative frequency, and the corpus total — the
    * head-concentration diagnostic (template spam shows up as a cum_n
    * curve that saturates in a handful of ranks). All counts are exact
    * BIGINTs; no floats anywhere.
    *
    * Scale: word counts partial-aggregate map-side; the top-50 is a
    * `TakeOrdered` (never a global sort); the rank/cumsum window runs
    * over exactly 50 rows; the corpus total is a 1-row broadcast join.
    */
  def qZipfProfile(s: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val top = wc.orderBy(col("n").desc, col("w")).limit(50)
    val total = wc.agg(sum(col("n")).as("total_n"))
    val ord = Window.orderBy(col("n").desc, col("w"))
    top
      .withColumn("rank", row_number().over(ord))
      .withColumn("cum_n", sum(col("n")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("w"), col("n"), col("cum_n"), col("total_n"))
  }

  /** Cross-source vocabulary overlap (A4): pairwise Jaccard similarity
    * of the distinct-word sets of every source pair — the contamination /
    * provenance diagnostic (a mirror site shows up as a ~1.0 pair).
    * `jaccard` is ONE IEEE division of two exact BIGINTs — bit-identical
    * across engines.
    *
    * Scale: the join is on the distinct (source, word) projection —
    * vocabulary-sized, ≪ corpus. Per-word cost is bounded by the number
    * of sources containing that word, so the worst (ubiquitous) word
    * costs #sources² pairs, with #sources in the thousands at most —
    * never corpus-quadratic.
    */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sw = Tables.documents(s, dir)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val vocab = sw.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = sw.as("a")
      .join(sw.as("b"), col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(vocab.select(col("source").as("s1"), col("v").as("v1")), "s1")
      .join(vocab.select(col("source").as("s2"), col("v").as("v2")), "s2")
      .select(col("s1"), col("s2"), col("n_inter"),
        (col("v1") + col("v2") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") / (col("v1") + col("v2") - col("n_inter"))
          ).as("jaccard"))
  }

  // ---- relational set ops + arg-max ------------------------------------

  /** INTERSECT / EXCEPT surface (A5): customers with orders in BOTH
    * status F and P, and in F only — Spark's set operators (which plan
    * as left-semi / left-anti over aggregated keys), tagged and unioned.
    */
  def qIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey")).distinct()
    f.intersect(p).withColumn("op", lit("both"))
      .unionAll(f.except(p).withColumn("op", lit("f_only")))
  }

  /** Per-group arg-max (A6): each nation's top customer by account
    * balance via `max_by` — ONE aggregation, no self-join, no window
    * sort. The ranking key is an exact integer (balance in cents scaled,
    * minus custkey) so ties break deterministically toward the lowest
    * custkey on every engine.
    */
  def qArgmax(s: SparkSession, dir: String): DataFrame = {
    val key = round(col("c_acctbal") * 100).cast("long") * 100000000L - col("c_custkey")
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(max_by(col("c_name"), key).as("top_name"),
        max(col("c_acctbal")).as("top_bal"),
        count(lit(1)).as("n_cust"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (qFunnel _),
    "q_retention_cohort" -> (qRetentionCohort _),
    "q_active_users" -> (qActiveUsers _),
    "q_zipf_profile" -> (qZipfProfile _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_intersect_except" -> (qIntersectExcept _),
    "q_argmax" -> (qArgmax _))

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (
        |  SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, 'view' AS stage,
        |       (SELECT COUNT(*) FROM v) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click_after_view', (SELECT COUNT(*) FROM c)
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase_after_click', (SELECT COUNT(*) FROM p)
        |""".stripMargin,
    "q_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS du
        |  FROM events),
        |f AS (SELECT user_id, min(du) AS du0 FROM e GROUP BY 1)
        |SELECT CAST(floor(f.du0 / 7.0) AS INT) AS cohort_week,
        |  CAST(floor(e.du / 7.0) - floor(f.du0 / 7.0) AS INT) AS week_n,
        |  COUNT(DISTINCT e.user_id) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_active_users" ->
      """WITH p AS (
        |  SELECT DISTINCT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INT) AS du,
        |    user_id
        |  FROM events),
        |b AS (SELECT min(du) AS lo, max(du) AS hi FROM p),
        |expanded AS (
        |  SELECT CAST(p.du + o.off AS INT) AS day, p.user_id
        |  FROM p CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM expanded GROUP BY 1),
        |dau AS (SELECT du AS day, COUNT(DISTINCT user_id) AS dau FROM p GROUP BY 1)
        |SELECT w.day, CAST(coalesce(d.dau, 0) AS BIGINT) AS dau, w.wau
        |FROM wau w LEFT JOIN dau d USING (day), b
        |WHERE w.day BETWEEN b.lo AND b.hi""".stripMargin,
    "q_zipf_profile" ->
      """WITH wc AS (
        |  SELECT w, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w),
        |top AS (SELECT w, n FROM wc ORDER BY n DESC, w LIMIT 50),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM wc)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, w) AS INT) AS rank, w, n,
        |  CAST(SUM(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
        |  (SELECT total_n FROM t) AS total_n
        |FROM top""".stripMargin,
    "q_source_overlap" ->
      """WITH sw AS (
        |  SELECT DISTINCT source, w
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |vocab AS (SELECT source, COUNT(*) AS v FROM sw GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_inter
        |  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.s1, i.s2, i.n_inter,
        |  va.v + vb.v - i.n_inter AS n_union,
        |  CAST(i.n_inter AS DOUBLE) / (va.v + vb.v - i.n_inter) AS jaccard
        |FROM inter i
        |JOIN vocab va ON va.source = i.s1
        |JOIN vocab vb ON vb.source = i.s2""".stripMargin,
    "q_intersect_except" ->
      """SELECT o_custkey, 'both' AS op FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS op FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin,
    "q_argmax" ->
      """SELECT c_nationkey,
        |  arg_max(c_name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 - c_custkey) AS top_name,
        |  max(c_acctbal) AS top_bal,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_nationkey""".stripMargin)
}
