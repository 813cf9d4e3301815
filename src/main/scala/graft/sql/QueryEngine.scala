package graft.sql

import graft.Tables
import graft.cache.{CacheKey, TableCache}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL engine over the table corpus — the Spark-first re-expression of
  * the reference's DataFusion engine (reference: src/sql/engine.py:48
  * `QueryEngine`): register every table as a view, then hand arbitrary
  * SQL to the optimizer. Catalyst + Tungsten replace DataFusion; the
  * whole plan (pushdown, join strategy, codegen) is the optimizer's.
  *
  * With a [[TableCache]] attached, view registration goes through the
  * cache (`_safe_register_view` over cached Arrow tables in the
  * reference, engine.py:52) so repeated queries hit persisted plans.
  */
final class QueryEngine(
    spark: SparkSession,
    dir: String,
    cache: Option[TableCache] = None) {

  @volatile private var registered = false

  /** Register all known tables as temp views, through the cache when one
    * is attached. Idempotent. */
  def register(): Unit = synchronized {
    if (!registered) {
      graft.functions.VecFunctions.register(spark)
      Tables.names.foreach { name =>
        val df = cache match {
          case Some(tc) => tc.getOrLoad(CacheKey(s"$dir/$name"))(Tables.load(spark, dir, name))
          case None => Tables.load(spark, dir, name)
        }
        df.createOrReplaceTempView(name)
      }
      registered = true
    }
  }

  /** Force re-registration — used when another QueryEngine (different
    * `dir`) has since rebound this session's temp views. */
  def registerFresh(): Unit = synchronized {
    registered = false
    register()
  }

  /** Execute SQL over the registered corpus (reference: engine.py:66
    * `execute_query`). */
  def sql(query: String): DataFrame = {
    register()
    spark.sql(query)
  }

  /** Register a catalog table's metadata tables as SQL views —
    * `<table>__snapshots` and `<table>__files` — so operational queries
    * run in plain SQL over live manifest state (Iceberg's
    * `SELECT * FROM t$snapshots` surface; `$` is not legal in a Spark
    * temp-view name, hence `__`). Re-invoke after commits to observe a
    * newer snapshot. */
  def registerMetadata(catalog: graft.meta.SnapshotCatalog, table: String): Unit = {
    catalog.snapshotsDf(spark, table).createOrReplaceTempView(s"${table}__snapshots")
    catalog.filesDf(spark, table).createOrReplaceTempView(s"${table}__files")
    catalog.deleteFilesDf(spark, table).createOrReplaceTempView(s"${table}__delete_files")
    catalog.partitionsDf(spark, table).createOrReplaceTempView(s"${table}__partitions")
    // a materialized aggregate view additionally registers rendered
    // (`<view>__rendered`): derived aggregates computed, state hidden
    if (catalog.currentSnapshot(table).exists(_.props.contains(
        graft.sinks.MaterializedAgg.SrcProp)))
      graft.sinks.MaterializedAgg.readRendered(spark, catalog, table)
        .createOrReplaceTempView(s"${table}__rendered")
  }
}
