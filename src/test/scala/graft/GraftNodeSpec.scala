package graft

import graft.serve.ServingApi

class GraftNodeSpec extends SparkSpec {

  test("config wires a node: SQL through the cache, stats, maintenance") {
    val node = GraftConfig.node(spark, sfDir,
      GraftConfig(maxCacheBytes = 1L << 32, evictionPolicy = "lfu"))
    val n = node.engine.sql("SELECT COUNT(*) AS n FROM lineitem").head().getLong(0)
    assert(n == Tables.lineitem(spark, sfDir).count())
    assert(node.cacheStats.entries == Tables.names.size) // corpus registered through cache
    assert(node.maintain() == 0) // nothing idle past the TTL yet
    node.cache.clear()
  }

  test("unknown eviction policy fails fast") {
    intercept[IllegalArgumentException](GraftConfig(evictionPolicy = "fifo").policy)
  }

  test("listTables serves the corpus catalog (list_flights parity)") {
    val tables = ServingApi.listTables(spark, sfDir)
    assert(tables.keySet == Tables.names.toSet)
    assert(tables("lineitem").fieldNames.contains("l_orderkey"))
    assert(tables("events").fields.find(_.name == "ts").get.dataType.typeName == "timestamp")
  }

  test("node.serve stands up the HTTP endpoint wired to the node's catalog") {
    val root = java.nio.file.Files.createTempDirectory("graft-node-cat-").toString
    val dataDir = java.nio.file.Files.createTempDirectory("graft-node-data-").toString
    val node = GraftConfig.node(spark, sfDir, GraftConfig(catalogRoot = Some(root)))
    graft.sinks.Writers.writeSnapshot(node.catalog.get, "cust",
      Tables.customer(spark, sfDir), dataDir)
    val srv = node.serve()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      def get(url: String): Int = {
        val c = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        val code = c.getResponseCode; c.disconnect(); code
      }
      assert(get(s"$base/tables") == 200)
      assert(get(s"$base/history?table=cust") == 200)
    } finally srv.stop()
  }
}
