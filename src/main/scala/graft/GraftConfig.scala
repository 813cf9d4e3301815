package graft

import graft.cache.{CostPolicy, EvictionPolicy, LfuPolicy, LruPolicy, TableCache}
import graft.meta.SnapshotCatalog
import graft.sql.QueryEngine
import org.apache.spark.sql.SparkSession

/** Deployment configuration — the Spark-first analogue of the reference
  * cache node's config dict (reference: src/core/config.py: cache size,
  * catalog, store endpoints): one value an operator tunes to stand up
  * the engine (reference: src/core/cache_node.py:29 builds
  * loader+cache+engine from config; [[GraftConfig.node]] does the same).
  */
final case class GraftConfig(
    maxCacheBytes: Long = 2L * 1024 * 1024 * 1024,
    evictionPolicy: String = "lru",
    cacheTtlMillis: Long = 3600 * 1000L,
    catalogRoot: Option[String] = None) {

  def policy: EvictionPolicy = evictionPolicy match {
    case "lru" => LruPolicy
    case "lfu" => LfuPolicy
    case "cost" => CostPolicy
    case other => throw new IllegalArgumentException(
      s"Unknown eviction policy '$other' (expected lru|lfu|cost)")
  }
}

/** A wired-up engine node: cache + optional catalog + SQL engine. */
final class GraftNode(
    val spark: SparkSession,
    val dataDir: String,
    val config: GraftConfig) {
  val cache: TableCache = new TableCache(config.maxCacheBytes, config.policy)
  val catalog: Option[SnapshotCatalog] = config.catalogRoot.map(new SnapshotCatalog(_))
  val engine: QueryEngine = new QueryEngine(spark, dataDir, Some(cache))

  /** Periodic maintenance entry point (reference:
    * src/core/cache_node.py:77) — explicit, caller-scheduled. With a
    * catalog configured this is one FULL maintenance pass (MV refreshes
    * → retention sweeps → cache TTL, per-object error isolation — the
    * [[graft.serve.Maintenance.runOnce]] semantics); without one, the
    * cache sweep is the whole node state and runs alone. Returns the
    * expired-cache-entry count either way (the original surface). */
  def maintain(): Int = catalog match {
    case Some(_) => maintenance.runOnce().cacheExpired
    case None => cache.expire(config.cacheTtlMillis)
  }

  /** The node's composed maintenance pass over ITS OWN catalog, cache
    * and data layout — requires a configured catalog root (a cache-only
    * node has no tables to sweep or views to refresh). Data for swept
    * tables and refreshed views lands under `dataDir/<table>`, the same
    * layout the SQL verbs use. */
  lazy val maintenance: graft.serve.Maintenance = new graft.serve.Maintenance(
    spark,
    catalog.getOrElse(throw new IllegalStateException(
      "node maintenance needs a catalog: set GraftConfig.catalogRoot")),
    t => java.nio.file.Paths.get(dataDir, t).toString,
    Some(cache),
    config.cacheTtlMillis)

  /** Start the S69 background maintenance daemon on this node's own
    * catalog/cache (reference: cache_node.py:66 `_start_maintenance_
    * thread`) — one call stands up the loop the reference's node owns.
    * Caller owns the handle; close it to stop. */
  def startMaintenance(intervalMs: Long = 60000L): graft.serve.MaintenanceHandle =
    maintenance.start(intervalMs)

  /** The node's SQL-serving session: with a catalog configured, a
    * sibling session (same SparkContext) with [[GraftExtensions]]
    * installed and the catalog root bound — so SQL arriving over
    * `/query` resolves catalog tables by name and supports
    * `VERSION AS OF <id|tag|branch>` / `TIMESTAMP AS OF` with
    * WHERE-driven manifest pruning (S50), exactly like a
    * `spark.sql.extensions`-configured deployment. Without a catalog
    * the caller's session serves as-is. */
  lazy val sqlSession: SparkSession = config.catalogRoot match {
    case Some(root) =>
      val s = org.apache.spark.sql.GraftColumnShim.sessionWithExtensions(
        spark, e => new GraftExtensions().apply(e))
      s.conf.set(graft.sql.GraftSqlResolution.RootConf, root)
      s
    case None => spark
  }

  /** Stand up the node's serving endpoint (reference: the Flight server
    * a cache node exposes, src/flight_server/server.py:9), wired to this
    * node's snapshot catalog so `/changes` and `/history` serve when one
    * is configured — and, via [[sqlSession]], so `/query` SQL time
    * travels over catalog tables. Caller owns the returned server's
    * lifecycle. */
  def serve(port: Int = 0, queryTimeoutMs: Long = 0L): graft.serve.GraftHttpServer =
    new graft.serve.GraftHttpServer(sqlSession, dataDir, port,
      queryTimeoutMs = queryTimeoutMs, catalog = catalog).start()

  def cacheStats: graft.cache.CacheStats = cache.stats
}

object GraftConfig {
  def node(spark: SparkSession, dataDir: String, config: GraftConfig = GraftConfig()): GraftNode =
    new GraftNode(spark, dataDir, config)
}
