package graft.meta

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SnapshotCatalogSpec extends SparkSpec {

  /** Write customer split into two files partitioned by key parity so
    * min/max pruning has something to skip. */
  private def twoFileTable(): (String, String, String) = {
    val data = Files.createTempDirectory("graft-data-").toString
    val c = Tables.customer(spark, sfDir)
    c.filter(col("c_custkey") <= 75).coalesce(1).write.parquet(s"$data/low")
    c.filter(col("c_custkey") > 75).coalesce(1).write.parquet(s"$data/high")
    def one(sub: String) = {
      val d = new java.io.File(s"$data/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    }
    (data, one("low"), one("high"))
  }

  test("commit records per-file rows, bytes, min/max; read returns all data") {
    val (_, low, high) = twoFileTable()
    var t = 1000L
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString, () => t)
    val snap = cat.commit(spark, "customer", Seq(low, high))
    assert(snap.snapshotId == 1 && snap.files.size == 2)
    assert(snap.totalRows == Tables.customer(spark, sfDir).count())
    assert(snap.files.forall(_.sizeBytes > 0))
    val lowMeta = snap.files.find(_.path == low).get
    assert(lowMeta.stats("c_custkey").maxD.get <= 75.0)
    assert(lowMeta.stats("c_name").minS.isDefined)
    assert(cat.read(spark, "customer").count() == snap.totalRows)
  }

  test("min/max pruning skips non-overlapping files") {
    val (_, low, high) = twoFileTable()
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString)
    cat.commit(spark, "customer", Seq(low, high))
    val planned = cat.planFiles("customer", Seq(RangeNum("c_custkey", 100, 200)))
    assert(planned.map(_.path) == Seq(high))
    val df = cat.read(spark, "customer", Seq(RangeNum("c_custkey", 100, 200)))
    assert(df.agg(min("c_custkey")).head().getLong(0) > 75)
  }

  test("pruning everything yields empty frame with schema") {
    val (_, low, high) = twoFileTable()
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString)
    cat.commit(spark, "customer", Seq(low, high))
    val df = cat.read(spark, "customer", Seq(RangeNum("c_custkey", 1e9, 2e9)))
    assert(df.count() == 0)
    assert(df.schema.fieldNames.contains("c_name"))
  }

  test("snapshot log: history, time travel by id and by timestamp") {
    val (_, low, high) = twoFileTable()
    var t = 1000L
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString, () => t)
    cat.commit(spark, "customer", Seq(low))
    t = 2000L
    cat.commit(spark, "customer", Seq(low, high))

    assert(cat.snapshots("customer").map(_.snapshotId) == Seq(1L, 2L))
    assert(cat.currentSnapshot("customer").get.snapshotId == 2L)
    assert(cat.snapshotById("customer", 2L).get.parentId.contains(1L))

    val h = cat.history("customer")
    assert(h.map(_("snapshot_id")) == Seq(2L, 1L)) // newest first

    // as-of timestamp lands on snapshot 1
    assert(cat.snapshotAsOf("customer", 1500L).get.snapshotId == 1L)
    val oldCount = cat.read(spark, "customer", asOfTimestampMs = Some(1500L)).count()
    val newCount = cat.read(spark, "customer", asOfTimestampMs = Some(2500L)).count()
    assert(oldCount < newCount)
    // by explicit id
    assert(cat.read(spark, "customer", snapshotId = Some(1L)).count() == oldCount)
  }

  test("schema and tableStats surface snapshot metadata") {
    val (_, low, high) = twoFileTable()
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString)
    cat.commit(spark, "customer", Seq(low, high))
    assert(cat.schema("customer").get.fieldNames.toSet ==
      Tables.customer(spark, sfDir).schema.fieldNames.toSet)
    val st = cat.tableStats("customer")
    assert(st("file_count") == 2)
    assert(st("total_records") == Tables.customer(spark, sfDir).count())
    assert(st("snapshot_id") == 1L && st("current_snapshot_id") == 1L)
  }

  test("unknown snapshot id raises") {
    val (_, low, _) = twoFileTable()
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString)
    cat.commit(spark, "customer", Seq(low))
    intercept[IllegalArgumentException] {
      cat.planFiles("customer", Nil, snapshotId = Some(99L))
    }
  }
}
