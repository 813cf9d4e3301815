package graft.serve

import java.util.concurrent.{Executors, TimeUnit}

import graft.cache.TableCache
import graft.meta.SnapshotCatalog
import graft.sinks.{MaterializedAgg, Writers}
import org.apache.spark.sql.SparkSession

/** One table's result from a maintenance pass. `error` carries the
  * message when the sweep refused (half policy, dangling column) — the
  * pass never aborts on one bad table. */
final case class TableSweep(
    table: String, expired: Int, rowsSwept: Long, error: Option[String])

/** One materialized view's refresh result from a maintenance pass. */
final case class MvRefresh(
    view: String, refreshedAt: Option[Long], error: Option[String])

/** The outcome of one [[Maintenance.runOnce]] pass. */
final case class MaintenanceReport(
    sweeps: Seq[TableSweep], mvRefreshes: Seq[MvRefresh], cacheExpired: Int)

/** Background node maintenance — the reference's cache-node maintenance
  * thread (`src/core/cache_node.py:66-89`: a loop that sleeps, sweeps
  * TTL-expired cache entries, and error-isolates each pass), widened to
  * this catalog's declared policies: one pass (a) refreshes every
  * materialized aggregate view (the no-arg `CALL graft.refresh_mv()`
  * semantics — idle sources are metadata no-ops, so the steady-state
  * cost is one watermark read per view), (b) enforces every opted-in
  * table's OWN sticky retention policy (`graft.retention.*` — the
  * row-TTL sweep then the history trim, exactly the no-arg
  * `CALL graft.enforce_retention` semantics with per-table error
  * isolation) and (c) expires cache entries idle beyond the TTL.
  *
  * Testability: [[runOnce]] is the whole behavior and takes no time
  * dependency of its own — retention cutoffs come from the CATALOG'S
  * injectable clock, so a spec drives epochs by advancing that clock
  * and calling [[runOnce]] directly (no sleeps). [[start]] merely
  * schedules [[runOnce]] on a daemon thread at a fixed delay, the
  * reference's every-minute cadence by default.
  *
  * Scale: a pass's cost is metadata-bounded for tables with nothing to
  * sweep (one policy-prop read each); a table WITH doomed rows pays the
  * same min/max-pruned marking scan the SQL verb pays — on a
  * time-ordered layout the cold prefix, never the live tail. */
class Maintenance(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    dataDirFor: String => String,
    cache: Option[TableCache] = None,
    cacheTtlMs: Long = 15 * 60 * 1000L) {

  /** One maintenance pass: refresh every materialized view (FIRST, so
    * the incremental path sees the watermark snapshot before any
    * retention trim could expire it), sweep every opted-in table, then
    * expire idle cache entries — each phase error-isolated per object.
    * Tables that never declared a policy are never touched; a refresh
    * of an idle-source view is a metadata no-op. */
  def runOnce(): MaintenanceReport = {
    val refreshes = MaterializedAgg.views(catalog).map { v =>
      try MvRefresh(v,
        Some(MaterializedAgg.refreshByName(spark, catalog, v, dataDirFor(v))), None)
      catch { case e: Exception => MvRefresh(v, None, Option(e.getMessage)) }
    }
    val sweeps = catalog.tables().filter(catalog.hasRetentionPolicy).map { t =>
      try {
        val (expired, rows) = Writers.enforceRetention(spark, catalog, t, dataDirFor(t))
        TableSweep(t, expired, rows, None)
      } catch {
        // one misconfigured table must not abort maintenance for every
        // table after it (a catalog-wide compliance outage from one bad
        // policy is worse than a deferred failure) — report and go on
        case e: Exception => TableSweep(t, 0, 0L, Option(e.getMessage))
      }
    }
    val expiredEntries = cache.map(_.expire(cacheTtlMs)).getOrElse(0)
    MaintenanceReport(sweeps, refreshes, expiredEntries)
  }

  /** Start the daemon: [[runOnce]] every `intervalMs` on a daemon
    * thread (fixed DELAY, so a slow sweep never stacks passes). A pass
    * that throws outright is survived — the loop must reach the next
    * tick, like the reference's try/except around
    * `_perform_maintenance` — but never SILENTLY: the throwable is
    * recorded on the returned handle ([[MaintenanceHandle.lastError]],
    * cleared by the next clean pass) and one line goes to stderr, so a
    * persistently failing pass (bad catalog root, FS outage) is
    * observable instead of leaving MV refreshes and retention
    * enforcement quietly dead. Close the handle to stop. */
  def start(intervalMs: Long = 60000L): MaintenanceHandle = {
    require(intervalMs >= 1, s"maintenance interval must be positive; got $intervalMs")
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-maintenance")
      t.setDaemon(true)
      t
    }
    val handle = new MaintenanceHandle(exec)
    exec.scheduleWithFixedDelay(
      () => handle.record(try { runOnce(); None } catch {
        case e: Exception =>
          Console.err.println(s"graft-maintenance: pass failed: $e")
          Some(e)
      }),
      intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    handle
  }
}

/** A running maintenance daemon: close to stop. `lastError` carries the
  * most recent pass-level failure (None after a clean pass), `passes`
  * counts completed ticks — the two signals a health check needs to
  * tell "quietly idle" from "quietly dead". */
final class MaintenanceHandle private[serve] (
    exec: java.util.concurrent.ScheduledExecutorService) extends AutoCloseable {
  @volatile private var _passes = 0L
  @volatile private var _lastError: Option[Throwable] = None
  private[serve] def record(err: Option[Throwable]): Unit = {
    _passes += 1
    _lastError = err
  }
  def passes: Long = _passes
  def lastError: Option[Throwable] = _lastError
  def close(): Unit = { exec.shutdownNow(); () }
}
