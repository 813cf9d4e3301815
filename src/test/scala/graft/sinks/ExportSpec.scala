package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.SnapshotCatalog
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

/** Snapshot export (`CALL graft.export`): a table state written to
  * external files must round-trip exactly — current state, time-travel
  * versions, tag refs, where-scoped subsets — and the default must
  * refuse to write over an existing export. */
class ExportSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-exp-").toString
  private lazy val dataDir = Files.createTempDirectory("graft-exp-data-").toString
  private lazy val cat = new SnapshotCatalog(root)

  private lazy val ext = {
    val s = GraftColumnShim.sessionWithExtensions(
      spark, e => new graft.GraftExtensions().apply(e))
    s.conf.set(graft.sql.GraftSqlResolution.RootConf, root)
    s
  }

  test("export round-trips current state, versions, tags and where-scopes") {
    import spark.implicits._
    Writers.writeSnapshot(cat, "exp",
      (1L to 50L).map(i => (i, s"row$i", i * 1.5)).toDF("id", "name", "score"), dataDir)
    ext.sql("CALL graft.tag('exp', 'epoch1')")
    ext.sql("INSERT INTO exp VALUES (51, 'late', 99.0)")
    ext.sql("DELETE FROM exp WHERE id <= 5")

    // current state, parquet
    val out1 = Files.createTempDirectory("graft-expout-").toString + "/cur"
    val r1 = ext.sql(s"CALL graft.export('exp', '$out1')").head()
    assert(r1.getLong(0) >= 1 && r1.getLong(1) > 0)
    val back1 = spark.read.parquet(out1)
    assert(back1.count() == 46 && back1.agg(sum("id")).head().getLong(0) ==
      ext.sql("SELECT sum(id) FROM exp").head().getLong(0))

    // the tagged epoch exports the OLD state
    val out2 = Files.createTempDirectory("graft-expout-").toString + "/v1"
    ext.sql(s"CALL graft.export('exp', '$out2', version => 'epoch1')")
    assert(spark.read.parquet(out2).count() == 50)

    // where both scopes the scan and filters the rows; csv round-trips
    val out3 = Files.createTempDirectory("graft-expout-").toString + "/csv"
    ext.sql(s"CALL graft.export('exp', '$out3', format => 'csv', " +
      "header => 'true', where => 'id BETWEEN 10 AND 20')")
    val back3 = spark.read.option("header", "true").option("inferSchema", "true").csv(out3)
    assert(back3.count() == 11)
    assert(back3.agg(sum("id")).head().getLong(0) == (10L to 20L).sum)

    // default refuses an existing destination; overwrite replaces
    val e = intercept[Exception] { ext.sql(s"CALL graft.export('exp', '$out1')").collect() }
    assert(e.getMessage != null)
    ext.sql(s"CALL graft.export('exp', '$out1', overwrite => true, " +
      "where => 'id > 40')")
    assert(spark.read.parquet(out1).count() == 11) // 41..51

    // a destination under the catalog root refuses
    val e2 = intercept[Exception] {
      ext.sql(s"CALL graft.export('exp', '$root/evil')").collect()
    }
    assert(e2.getMessage.contains("catalog root"))
    // an unknown version refuses loudly — numeric OR named (a numeric
    // miss must never silently fall back to current)
    val e3 = intercept[Exception] {
      ext.sql(s"CALL graft.export('exp', '/tmp/never', version => 'nope')").collect()
    }
    assert(e3.getMessage.contains("no snapshot id or tag"))
    val e4b = intercept[Exception] {
      ext.sql(s"CALL graft.export('exp', '/tmp/never2', version => '999')").collect()
    }
    assert(e4b.getMessage.contains("no snapshot id or tag"))
    // timestamp travel: as-of NOW serves current; a pre-table timestamp refuses
    val out4 = Files.createTempDirectory("graft-expout-").toString + "/asof"
    ext.sql(s"CALL graft.export('exp', '$out4', as_of_ms => ${System.currentTimeMillis()})")
    assert(spark.read.parquet(out4).count() == 46)
    val e5 = intercept[Exception] {
      ext.sql(s"CALL graft.export('exp', '/tmp/never3', as_of_ms => 1000)").collect()
    }
    assert(e5.getMessage.contains("at or before"))
  }

  test("partition_by exports a hive layout a downstream reader partition-prunes") {
    import spark.implicits._
    Writers.writeSnapshot(cat, "expp",
      (1L to 30L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 1.0))
        .toDF("id", "parity", "score"), dataDir)
    val out = Files.createTempDirectory("graft-expout-p-").toString + "/hive"
    ext.sql(s"CALL graft.export('expp', '$out', partition_by => 'parity')")
    assert(Files.isDirectory(java.nio.file.Paths.get(out, "parity=even")) &&
      Files.isDirectory(java.nio.file.Paths.get(out, "parity=odd")),
      "the output must be a hive layout")
    val back = spark.read.parquet(out)
    assert(back.count() == 30)
    assert(back.filter(col("parity") === "even").count() == 15)
  }

  test("export of a branch ref serves the branch state") {
    import spark.implicits._
    Writers.writeSnapshot(cat, "expb",
      (1L to 10L).map(i => (i, i * 2L)).toDF("id", "v"), dataDir)
    ext.sql("CALL graft.branch('expb', 'dev')")
    ext.sql("INSERT INTO `expb/branches/dev` VALUES (11, 22)")
    val out = Files.createTempDirectory("graft-expout-b-").toString + "/dev"
    ext.sql(s"CALL graft.export('expb/branches/dev', '$out')")
    assert(spark.read.parquet(out).count() == 11)
    val outMain = Files.createTempDirectory("graft-expout-b-").toString + "/main"
    ext.sql(s"CALL graft.export('expb', '$outMain')")
    assert(spark.read.parquet(outMain).count() == 10,
      "the base table export must not see branch commits")
  }
}
