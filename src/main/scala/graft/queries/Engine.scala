package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.cache.{CacheKey, LruPolicy, TableCache}
import graft.functions.Exact._
import graft.meta.{RangeNum, SnapshotCatalog}
import graft.sql.QueryEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Oracle-checked queries that run through the engine's cache, snapshot
  * and SQL layers — each must produce byte-identical results to the
  * plain-scan oracle, proving the layers are transparent.
  */
object Engine {

  private val caches = TrieMap.empty[String, TableCache]
  private def cacheFor(sessionDir: String): TableCache =
    caches.getOrElseUpdate(sessionDir, new TableCache(policy = LruPolicy))

  /** Aggregate over a TableCache-persisted lineitem (SURVEY §2 S5):
    * second run within a session is a cache hit on the persisted plan. */
  def qCachedAgg(s: SparkSession, dir: String): DataFrame = {
    val tc = cacheFor(dir)
    val l = tc.getOrLoad(CacheKey("lineitem", columns = Set("*"), predicate = dir))(
      Tables.lineitem(s, dir))
    l.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sumMoney(col("l_extendedprice")).as("sum_price"),
        sumMoney(col("l_quantity")).as("sum_qty"))
  }

  /** Read lineitem through a freshly-committed SnapshotCatalog manifest
    * (SURVEY §2 S16) with a file-level range filter, then row-filter and
    * aggregate; equals the plain-scan oracle. */
  def qSnapshotRead(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-snap-").toString
    val cat = new SnapshotCatalog(tmp)
    cat.commit(s, "lineitem", Seq(Tables.path(dir, "lineitem")))
    cat.read(s, "lineitem", filters = Seq(RangeNum("l_quantity", 40.0, Double.MaxValue)))
      .filter(col("l_quantity") > 40)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sumMoney(col("l_extendedprice")).as("sum_price"))
  }

  /** Arbitrary SQL through QueryEngine's registered corpus (SURVEY §2
    * S18) — the reference's `execute_query` path (src/sql/engine.py:66). */
  def qSqlEngine(s: SparkSession, dir: String): DataFrame =
    new QueryEngine(s, dir).sql(
      """SELECT o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cached_agg" -> (qCachedAgg _),
    "q_snapshot_read" -> (qSnapshotRead _),
    "q_sql_engine" -> (qSqlEngine _))

  val oracles: Map[String, String] = Map(
    "q_cached_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_snapshot_read" ->
      """SELECT l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity > 40
        |GROUP BY l_linestatus""".stripMargin,
    "q_sql_engine" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin)
}
