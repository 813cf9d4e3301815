package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.meta.{RangeNum, SnapshotCatalog}
import graft.sinks.Writers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The snapshot table consumed AS A STREAM: initial full load, then one
  * incremental batch per commit range, with COW deletes contributing
  * nothing (appends-only contract) — and offsets = snapshot ids. */
class SnapshotSourceSpec extends SparkSpec {

  test("streams the table: full first batch, append-only increments, delete-silent") {
    val root = Files.createTempDirectory("graft-src-").toString
    val dataDir = Files.createTempDirectory("graft-src-data-").toString
    val cat = new SnapshotCatalog(root)
    val c = Tables.customer(spark, sfDir)
    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey") <= 50), dataDir)

    val stream = spark.readStream
      .format("graft.streaming.SnapshotSourceProvider")
      .option("catalogRoot", root).option("table", "cust")
      .load()
      .writeStream.format("memory").queryName("snapsrc")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.processAllAvailable()
      val base = c.filter(col("c_custkey") <= 50).count()
      assert(spark.table("snapsrc").count() == base)

      // an append lands as exactly the new rows
      Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey").between(51, 80)), dataDir)
      stream.processAllAvailable()
      assert(spark.table("snapsrc").count() == c.filter(col("c_custkey") <= 80).count())

      // a COW delete triggers a batch with NO rows (no resurrection)
      Writers.deleteWhere(spark, cat, "cust",
        rowPredicate = df => df.filter(!col("c_custkey").between(10, 20)),
        pruneFilters = Seq(RangeNum("c_custkey", 10, 20)), dataDir = dataDir)
      stream.processAllAvailable()
      assert(spark.table("snapsrc").count() == c.filter(col("c_custkey") <= 80).count())

      // a merge streams exactly its net-new rows (insert-file lineage)
      val src = c.filter(col("c_custkey").between(60, 65))
        .withColumn("c_acctbal", lit(-5.0))
      Writers.mergeInto(spark, cat, "cust", src, Seq("c_custkey"), dataDir)
      stream.processAllAvailable()
      assert(spark.table("snapsrc").count() ==
        c.filter(col("c_custkey") <= 80).count() + src.count())
      assert(spark.table("snapsrc").filter(col("c_acctbal") === -5.0).count() == src.count())
    } finally stream.stop()
  }

  test("restart from checkpoint resumes at the last committed snapshot offset") {
    val root = Files.createTempDirectory("graft-ckpt-").toString
    val dataDir = Files.createTempDirectory("graft-ckpt-data-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-meta-").toString
    val cat = new SnapshotCatalog(root)
    val c = Tables.customer(spark, sfDir)
    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey") <= 50), dataDir)

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.SnapshotSourceProvider")
        .option("catalogRoot", root).option("table", "cust")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = df.count(); if (n > 0) batches.add(n); ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }

    runOnce() // initial load
    val base = c.filter(col("c_custkey") <= 50).count()
    assert(batches.toArray.toSeq == Seq(base))

    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey").between(51, 70)), dataDir)
    runOnce() // resume: ONLY the appended rows, never the base again
    val inc = c.filter(col("c_custkey").between(51, 70)).count()
    assert(batches.toArray.toSeq == Seq(base, inc))
  }

  test("missing options and schema-less tables fail fast") {
    intercept[Exception] {
      spark.readStream.format("graft.streaming.SnapshotSourceProvider")
        .option("table", "cust").load()
    }
    intercept[Exception] {
      spark.readStream.format("graft.streaming.SnapshotSourceProvider")
        .option("catalogRoot", Files.createTempDirectory("graft-empty-").toString)
        .option("table", "nope").load()
    }
  }
}
