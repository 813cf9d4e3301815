package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.meta.SnapshotCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SnapshotSinkSpec extends SparkSpec {

  import spark.implicits._

  test("each micro-batch commits one snapshot; history and incremental reads work") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-sink-").toString
    val cat = new SnapshotCatalog(s"$tmp/cat")
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "event_type", "value")

    mem.addData((1L, "click", 1.0), (2L, "view", 2.0))
    val q1 = SnapshotSink.start(df, cat, "ev", s"$tmp/data", s"$tmp/chk",
      Trigger.AvailableNow())
    q1.awaitTermination(60000)

    assert(cat.currentSnapshot("ev").map(_.totalRows).contains(2L))

    mem.addData((3L, "click", 3.0))
    val q2 = SnapshotSink.start(df, cat, "ev", s"$tmp/data", s"$tmp/chk",
      Trigger.AvailableNow())
    q2.awaitTermination(60000)

    val snaps = cat.snapshots("ev")
    assert(snaps.size == 2, s"got ${snaps.map(_.snapshotId)}")
    assert(cat.read(spark, "ev").count() == 3)
    // incremental read between the two commits sees only the new row
    val inc = cat.readIncremental(spark, "ev", fromSnapshotId = snaps.head.snapshotId)
    assert(inc.select("event_id").as[Long].collect().toSeq == Seq(3L))
    // exactly-once bookkeeping: restarting with same checkpoint adds nothing
    val q3 = SnapshotSink.start(df, cat, "ev", s"$tmp/data", s"$tmp/chk",
      Trigger.AvailableNow())
    q3.awaitTermination(60000)
    assert(cat.read(spark, "ev").count() == 3)
  }
}
