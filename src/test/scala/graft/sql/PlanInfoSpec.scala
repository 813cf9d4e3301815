package graft.sql

import graft.{SparkSpec, Tables}
import graft.cache.{CacheKey, TableCache}
import graft.queries.Relational
import org.apache.spark.sql.functions._

class PlanInfoSpec extends SparkSpec {

  test("analyze reports scans, pruned columns and pushed filters") {
    val info = PlanInfo.analyze(Relational.qScanProject(spark, sfDir))
    assert(info.scannedPaths.exists(_.contains("lineitem.parquet")))
    assert(info.readColumns.toSet ==
      Set("l_orderkey", "l_extendedprice", "l_quantity", "l_shipdate"))
    assert(info.pushedFilters.exists(_.contains("GreaterThan(l_quantity,45")))
    assert(!info.usesCache)
  }

  test("analyze counts data movement: joins shuffle and broadcast") {
    val info = PlanInfo.analyze(Relational.q5MultiJoin(spark, sfDir))
    assert(info.broadcasts >= 2, s"expected dim broadcasts, got $info")
    assert(info.shuffles >= 1, s"expected fact shuffle, got $info")
    assert(info.scannedPaths.size == 6)
  }

  test("analyze detects cached scans") {
    val tc = new TableCache(maxSizeBytes = 1L << 40)
    val cached = tc.getOrLoad(CacheKey("nation_pi"))(Tables.nation(spark, sfDir))
    cached.count() // materialize
    val info = PlanInfo.analyze(cached.filter(col("n_nationkey") < 5))
    assert(info.usesCache && info.cachedScans == 1)
    tc.clear()
  }
}
