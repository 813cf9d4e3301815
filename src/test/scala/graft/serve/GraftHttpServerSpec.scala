package graft.serve

import java.net.{HttpURLConnection, URI, URLEncoder}

import graft.SparkSpec

import scala.io.Source

class GraftHttpServerSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def enc(sql: String) = URLEncoder.encode(sql, "UTF-8")

  test("serves table listing, schemas, and streamed query results over HTTP") {
    val srv = new GraftHttpServer(spark, sfDir, port = 0, batchSize = 1000).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"

      val (tc, tables) = get(s"$base/tables")
      assert(tc == 200)
      assert(tables.contains("\"orders\"") && tables.contains("o_orderkey"))

      val (sc, schema) = get(s"$base/schema?sql=" + enc(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1"))
      assert(sc == 200)
      assert(schema.contains("o_orderstatus") && schema.contains("\"n\""))

      // do_get analogue: first line schema, then one JSON row per line
      val (qc, body) = get(s"$base/query?sql=" + enc(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1"))
      assert(qc == 200)
      val lines = body.trim.split("\n")
      assert(lines.head.contains("struct"), "first line must be the schema")
      val rows = lines.tail
      assert(rows.length == 3 && rows.forall(_.startsWith("{\"o_orderstatus\"")))

      // a result larger than one batch streams completely
      val n = 2500 // lineitem has ~6000 rows at sf0.001; batchSize is 1000
      val (bc, big) = get(s"$base/query?sql=" + enc(
        s"SELECT l_orderkey FROM lineitem LIMIT $n"))
      assert(bc == 200)
      assert(big.trim.split("\n").length == n + 1)

      // bad SQL is a clean 400, not a hung stream
      val (ec, err) = get(s"$base/query?sql=" + enc("SELECT FROM nope"))
      assert(ec == 400 && err.contains("error"))

      val (mc, _) = get(s"$base/query")
      assert(mc == 400)
    } finally srv.stop()
  }
}
