package graft.cache

import graft.{SparkSpec, Tables}

class TableCacheSpec extends SparkSpec {

  private def fixedClock(t: => Long): () => Long = () => t

  test("getOrLoad caches on miss and hits on repeat") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    val key = CacheKey("nation", "", Set("*"))
    var loads = 0
    def loader = { loads += 1; Tables.nation(spark, sfDir) }
    val df1 = tc.getOrLoad(key)(loader)
    val df2 = tc.getOrLoad(key)(loader)
    assert(loads == 1)
    assert(df1.count() == df2.count())
    val st = tc.stats
    assert(st.hits == 1 && st.misses == 1 && st.entries == 1)
    tc.clear()
  }

  test("background maintenance evicts idle entries without explicit expire calls") {
    var now = 1000L
    val tc = new TableCache(maxSizeBytes = 1L << 40, clock = fixedClock(now))
    tc.put(CacheKey("a"), Tables.nation(spark, sfDir), sizeHint = Some(100))
    tc.startMaintenance(intervalMillis = 50, ttlMillis = 500)
    try {
      Thread.sleep(200) // several ticks at now=1000: nothing idle yet
      assert(tc.stats.entries == 1)
      now = 2000 // entry now idle 1000ms > ttl 500ms
      val deadline = System.currentTimeMillis() + 5000
      while (tc.stats.entries > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(tc.stats.entries == 0, "maintenance thread never expired the idle entry")
      intercept[IllegalArgumentException](tc.startMaintenance(50, 500))
    } finally tc.stopMaintenance()
  }

  test("distinct predicates / column sets are distinct entries") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    tc.getOrLoad(CacheKey("nation", "k<5", Set("n_name")))(Tables.nation(spark, sfDir))
    tc.getOrLoad(CacheKey("nation", "k<9", Set("n_name")))(Tables.nation(spark, sfDir))
    tc.getOrLoad(CacheKey("nation", "k<5", Set("n_nationkey")))(Tables.nation(spark, sfDir))
    assert(tc.stats.entries == 3)
    tc.clear()
  }

  test("LRU evicts least recently used when over budget") {
    var now = 1000L
    val tc = new TableCache(maxSizeBytes = 250, policy = LruPolicy, clock = fixedClock(now))
    tc.put(CacheKey("a"), Tables.nation(spark, sfDir), sizeHint = Some(100))
    now = 2000
    tc.put(CacheKey("b"), Tables.region(spark, sfDir), sizeHint = Some(100))
    now = 3000
    tc.get(CacheKey("a")) // refresh a → b is now LRU
    now = 4000
    tc.put(CacheKey("c"), Tables.supplier(spark, sfDir), sizeHint = Some(100))
    assert(tc.keys.exists(_.startsWith("a#")))
    assert(!tc.keys.exists(_.startsWith("b#")))
    assert(tc.keys.exists(_.startsWith("c#")))
    assert(tc.stats.evictions == 1)
    tc.clear()
  }

  test("LFU evicts least frequently used") {
    var now = 1000L
    val tc = new TableCache(maxSizeBytes = 250, policy = LfuPolicy, clock = fixedClock(now))
    tc.put(CacheKey("a"), Tables.nation(spark, sfDir), sizeHint = Some(100))
    tc.put(CacheKey("b"), Tables.region(spark, sfDir), sizeHint = Some(100))
    tc.get(CacheKey("a")); tc.get(CacheKey("a")) // a freq=3, b freq=1
    now = 2000
    tc.put(CacheKey("c"), Tables.supplier(spark, sfDir), sizeHint = Some(100))
    assert(tc.keys.exists(_.startsWith("a#")) && !tc.keys.exists(_.startsWith("b#")))
    tc.clear()
  }

  test("cost policy evicts old / cold / large entries first") {
    var now = 0L
    val tc = new TableCache(maxSizeBytes = 250, policy = CostPolicy, clock = fixedClock(now))
    tc.put(CacheKey("old"), Tables.nation(spark, sfDir), sizeHint = Some(100))
    now = 3600 * 1000L // an hour later
    tc.put(CacheKey("fresh"), Tables.region(spark, sfDir), sizeHint = Some(100))
    tc.get(CacheKey("fresh"))
    tc.put(CacheKey("new2"), Tables.supplier(spark, sfDir), sizeHint = Some(100))
    assert(!tc.keys.exists(_.startsWith("old#")))
    assert(tc.keys.exists(_.startsWith("fresh#")))
    tc.clear()
  }

  test("invalidateTable drops only that table's entries") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    tc.put(CacheKey("nation", "p1"), Tables.nation(spark, sfDir), Some(10))
    tc.put(CacheKey("nation", "p2"), Tables.nation(spark, sfDir), Some(10))
    tc.put(CacheKey("region", "p1"), Tables.region(spark, sfDir), Some(10))
    assert(tc.invalidateTable("nation") == 2)
    assert(tc.stats.entries == 1)
    assert(tc.keys.head.startsWith("region#"))
    tc.clear()
  }

  test("expire drops idle entries past TTL") {
    var now = 0L
    val tc = new TableCache(maxSizeBytes = 1L << 40, clock = fixedClock(now))
    tc.put(CacheKey("a"), Tables.nation(spark, sfDir), Some(10))
    now = 5000
    tc.put(CacheKey("b"), Tables.region(spark, sfDir), Some(10))
    now = 7000
    assert(tc.expire(ttlMillis = 3000) == 1) // only a (idle 7000ms)
    assert(tc.keys.exists(_.startsWith("b#")) && !tc.keys.exists(_.startsWith("a#")))
    tc.clear()
  }

  test("stats utilization reflects byte budget") {
    val tc = new TableCache(maxSizeBytes = 1000)
    tc.put(CacheKey("a"), Tables.nation(spark, sfDir), Some(250))
    assert(tc.stats.utilization == 25.0)
    tc.clear()
  }

  test("concurrent getOrLoad of one key loads exactly once") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = CacheKey("nation", "race")
    val threads = (1 to 8).map(_ => new Thread(() => {
      tc.getOrLoad(key) { loads.incrementAndGet(); Tables.nation(spark, sfDir) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(loads.get() == 1, s"loader ran ${loads.get()} times")
    assert(tc.stats.entries == 1 && tc.stats.hits == 7 && tc.stats.misses == 1)
    tc.clear()
  }

  test("cached plan returns identical data to uncached") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    val cached = tc.getOrLoad(CacheKey("lineitem"))(Tables.lineitem(spark, sfDir))
    val plain = Tables.lineitem(spark, sfDir)
    assert(cached.count() == plain.count())
    assert(cached.agg(org.apache.spark.sql.functions.sum("l_orderkey")).head().getLong(0) ==
      plain.agg(org.apache.spark.sql.functions.sum("l_orderkey")).head().getLong(0))
    tc.clear()
  }
}
