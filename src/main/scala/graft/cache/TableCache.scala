package graft.cache

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Normalized cache key: table id + canonical predicate + column set.
  *
  * Mirrors the reference's `CacheKey` (reference:
  * src/core/cache_data_model.py:63 — `table_id # partition_spec #
  * columns-hash`): same query shape → same key, so repeated reads of a
  * (table, filter, projection) triple hit the cache.
  */
final case class CacheKey(tableId: String, predicate: String = "", columns: Set[String] = Set.empty) {
  def render: String = s"$tableId#$predicate#${columns.toSeq.sorted.mkString(",")}"
}

final case class EntryMeta(
    key: String,
    sizeBytes: Long,
    createdAt: Long,
    var lastAccessed: Long,
    var accessCount: Long)

/** Pluggable eviction — the reference's `EvictionPolicy` hierarchy
  * (reference: src/core/eviction_policy.py:9). Returns keys to evict to
  * free at least `targetBytes`.
  */
sealed trait EvictionPolicy {
  def name: String
  protected def order(entries: Seq[EntryMeta], now: Long): Seq[EntryMeta]
  final def selectVictims(entries: Seq[EntryMeta], targetBytes: Long, now: Long): Seq[String] = {
    val victims = mutable.ListBuffer.empty[String]
    var freed = 0L
    val it = order(entries, now).iterator
    while (freed < targetBytes && it.hasNext) {
      val e = it.next()
      victims += e.key
      freed += e.sizeBytes
    }
    victims.toList
  }
}

/** Least-recently-used (reference: src/core/eviction_policy.py:17). */
case object LruPolicy extends EvictionPolicy {
  val name = "lru"
  protected def order(entries: Seq[EntryMeta], now: Long): Seq[EntryMeta] =
    entries.sortBy(_.lastAccessed)
}

/** Least-frequently-used, recency tiebreak (reference:
  * src/core/eviction_policy.py:36). */
case object LfuPolicy extends EvictionPolicy {
  val name = "lfu"
  protected def order(entries: Seq[EntryMeta], now: Long): Seq[EntryMeta] =
    entries.sortBy(e => (e.accessCount, e.lastAccessed))
}

/** Cost model 0.4·ageSec + 0.4·1/(freq+1) + 0.2·sizeMB, evict highest
  * (reference: src/core/eviction_policy.py:56 `CustomEvictionPolicy`). */
case object CostPolicy extends EvictionPolicy {
  val name = "cost"
  protected def order(entries: Seq[EntryMeta], now: Long): Seq[EntryMeta] = {
    def score(e: EntryMeta): Double = {
      val ageSec = (now - e.lastAccessed) / 1000.0
      val freqScore = 1.0 / (e.accessCount + 1)
      val sizeMb = e.sizeBytes / (1024.0 * 1024.0)
      ageSec * 0.4 + freqScore * 0.4 + sizeMb * 0.2
    }
    entries.sortBy(e => -score(e))
  }
}

final case class CacheStats(
    entries: Int,
    sizeBytes: Long,
    maxSizeBytes: Long,
    hits: Long,
    misses: Long,
    evictions: Long) {
  def utilization: Double = if (maxSizeBytes == 0) 0.0 else sizeBytes.toDouble / maxSizeBytes * 100.0
}

/** Size-bounded cache of persisted DataFrames with pluggable eviction.
  *
  * The Spark-first re-expression of the reference cache node's policy
  * layer (reference: src/core/cache_node.py:26 `ArrowCacheNode`,
  * src/core/lru_cache.py:16 `LRUCache`, src/core/
  * arrow_memory_management.py:7): Spark's block manager is the Arrow
  * memory pool — `persist(MEMORY_AND_DISK)` stores the data, spilling
  * instead of OOMing — while this class supplies what Spark's own
  * `CacheManager` does not: query-shaped keys, a byte budget with
  * evict-to-fit, LRU/LFU/cost policies, TTL expiry, per-table
  * invalidation and hit/miss accounting.
  *
  * Scale note: entries hold *lazy* persisted plans; the budget tracks
  * estimated plan sizes so a 1000-executor cluster's aggregate memory is
  * the real pool and the driver only bookkeeps.
  */
final class TableCache(
    maxSizeBytes: Long = 2L * 1024 * 1024 * 1024,
    policy: EvictionPolicy = LruPolicy,
    clock: () => Long = () => System.currentTimeMillis(),
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK) {

  private final case class Entry(df: DataFrame, meta: EntryMeta)

  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private var hits = 0L
  private var misses = 0L
  private var evictions = 0L

  /** Estimate bytes for budget accounting from the optimized plan stats
    * (Catalyst's equivalent of `pa.Table.nbytes` in reference
    * src/core/lru_cache.py:44). */
  private def estimateSize(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong

  def get(key: CacheKey): Option[DataFrame] = synchronized {
    entries.get(key.render) match {
      case Some(e) =>
        hits += 1
        e.meta.lastAccessed = clock()
        e.meta.accessCount += 1
        Some(e.df)
      case None =>
        misses += 1
        None
    }
  }

  /** Cache-first read: the analogue of `ArrowCacheNode.get_table_data`
    * (reference: src/core/cache_node.py:128) — hit returns the persisted
    * plan, miss runs `loader`, evicts to fit, persists, caches. The
    * whole operation is atomic (the loader builds a LAZY plan — cheap —
    * so holding the lock prevents two racing threads from both loading
    * and double-persisting the same key). */
  def getOrLoad(key: CacheKey, sizeHint: Option[Long] = None)(loader: => DataFrame): DataFrame =
    synchronized {
      get(key).getOrElse(put(key, loader, sizeHint))
    }

  def put(key: CacheKey, df: DataFrame, sizeHint: Option[Long] = None): DataFrame = synchronized {
    val k = key.render
    entries.remove(k).foreach { old =>
      old.df.unpersist(blocking = false)
    }
    val size = sizeHint.getOrElse(estimateSize(df))
    val free = maxSizeBytes - currentBytes
    if (size > free) evictToFree(size - free)
    val persisted = df.persist(storageLevel)
    val now = clock()
    entries.put(k, Entry(persisted, EntryMeta(k, size, now, now, 1)))
    persisted
  }

  private def currentBytes: Long = entries.valuesIterator.map(_.meta.sizeBytes).sum

  private def evictToFree(targetBytes: Long): Unit = {
    val victims = policy.selectVictims(entries.valuesIterator.map(_.meta).toSeq, targetBytes, clock())
    victims.foreach(evict)
  }

  private def evict(k: String): Unit =
    entries.remove(k).foreach { e =>
      e.df.unpersist(blocking = false)
      evictions += 1
    }

  /** Drop every entry of a table (reference: src/core/cache_node.py:225
    * `invalidate_table`). */
  def invalidateTable(tableId: String): Int = synchronized {
    val victims = entries.keysIterator.filter(_.startsWith(s"$tableId#")).toList
    victims.foreach(evict)
    victims.size
  }

  /** Evict entries idle beyond `ttlMillis` (reference:
    * src/core/cache_node.py:77 `_perform_maintenance`, 1h TTL). */
  def expire(ttlMillis: Long): Int = synchronized {
    val now = clock()
    val victims = entries.valuesIterator
      .filter(e => now - e.meta.lastAccessed > ttlMillis)
      .map(_.meta.key).toList
    victims.foreach(evict)
    victims.size
  }

  def clear(): Unit = synchronized {
    entries.keysIterator.toList.foreach(evict)
  }

  private var maintenance: Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Background TTL maintenance on a daemon thread (reference:
    * src/core/cache_node.py:66 `_start_maintenance_thread` — a 60 s loop
    * evicting idle entries). The explicit [[expire]] stays the testable
    * injected-clock surface; this just schedules it. */
  def startMaintenance(intervalMillis: Long, ttlMillis: Long): Unit = synchronized {
    require(maintenance.isEmpty, "maintenance already running")
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-cache-maintenance"); t.setDaemon(true); t
    }
    ex.scheduleAtFixedRate(new Runnable {
      def run(): Unit = try { expire(ttlMillis); () } catch { case _: Exception => () }
    }, intervalMillis, intervalMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
    maintenance = Some(ex)
  }

  def stopMaintenance(): Unit = synchronized {
    maintenance.foreach(_.shutdownNow())
    maintenance = None
  }

  def keys: Seq[String] = synchronized(entries.keysIterator.toList)

  /** Reference: src/core/lru_cache.py:66 `get_stats`. */
  def stats: CacheStats = synchronized {
    CacheStats(entries.size, currentBytes, maxSizeBytes, hits, misses, evictions)
  }
}
