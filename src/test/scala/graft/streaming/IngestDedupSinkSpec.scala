package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.SnapshotCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T10 streaming ingest-dedup: micro-batches land only never-seen
  * fingerprints; state is the corpus + index TABLES (restart needs no
  * state store); the two-table commit pair is idempotent under
  * re-delivery. */
class IngestDedupSinkSpec extends SparkSpec {

  private def newCat = new SnapshotCatalog(
    Files.createTempDirectory("graft-ingdd-").toString)

  test("cross-batch and in-batch dups drop; novel docs land; restartable state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cat = newCat
    val dataDir = Files.createTempDirectory("graft-ingdd-data-").toString
    val ckpt = Files.createTempDirectory("graft-ingdd-ckpt-").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")

    // batch 0: in-batch dup (3 mirrors same text, min id wins) + novel
    mem.addData((1L, "alpha beta gamma"), (3L, "Alpha  beta   GAMMA"),
      (7L, "alpha beta gamma"), (2L, "delta epsilon"))
    IngestDedupSink.start(stream, cat, "docs", "doc_id", "text",
      dataDir, ckpt).processAllAvailable()
    assert(cat.read(spark, "docs").select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))

    // batch 1: cross-batch dup of doc 1 + one novel doc
    mem.addData((9L, "ALPHA beta gamma"), (4L, "zeta eta"))
    IngestDedupSink.start(stream, cat, "docs", "doc_id", "text",
      dataDir, ckpt).processAllAvailable()
    assert(cat.read(spark, "docs").select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 4L))

    // the index table holds one row per distinct fingerprint
    val idx = cat.read(spark, IngestDedupSink.indexTable("docs"))
    assert(idx.count() == 3)
    assert(idx.select("dup_of").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))

    // re-delivery of an already-committed batch is a no-op on BOTH
    // tables (the exactly-once discipline, exercised directly)
    val replay = Seq((1L, "alpha beta gamma"), (3L, "Alpha  beta   GAMMA"),
      (7L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val before = (cat.currentSnapshot("docs").get.snapshotId,
      cat.currentSnapshot(IngestDedupSink.indexTable("docs")).get.snapshotId)
    IngestDedupSink.ingestBatch(cat, "docs", "doc_id", "text", dataDir, ckpt)(replay, 0L)
    val after = (cat.currentSnapshot("docs").get.snapshotId,
      cat.currentSnapshot(IngestDedupSink.indexTable("docs")).get.snapshotId)
    assert(before == after, "replayed batch must commit nothing")

    // crash window: the corpus commit of batch 2 lands, the index
    // commit doesn't (the only possible partial state — corpus commits
    // first). Construct that state directly, then re-deliver: the
    // corpus must NOT double-commit and the index must catch up.
    val idxTable = IngestDedupSink.indexTable("docs")
    val b2novel = Seq((11L, "theta iota")).toDF("doc_id", "text")
    graft.sinks.Writers.writeSnapshot(cat, "docs", b2novel, dataDir,
      props = Map(IngestDedupSink.BatchIdProp -> "2",
        IngestDedupSink.CheckpointProp -> ckpt))
    val corpusAfterPartial = cat.currentSnapshot("docs").get.snapshotId
    val b2 = Seq((11L, "theta iota"), (13L, "THETA iota")).toDF("doc_id", "text")
    IngestDedupSink.ingestBatch(cat, "docs", "doc_id", "text", dataDir, ckpt)(b2, 2L)
    assert(cat.currentSnapshot("docs").get.snapshotId == corpusAfterPartial,
      "re-delivered corpus commit must skip")
    assert(cat.read(spark, "docs").select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 4L, 11L))
    val idxAfter = cat.read(spark, idxTable)
    assert(idxAfter.count() == 4, "index must catch up to batch 2's fingerprint")
    assert(idxAfter.select("dup_of").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 11L))
  }

  test("streaming result equals the batch exactGroups keeper set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cat = newCat
    val dataDir = Files.createTempDirectory("graft-ingdd-data-").toString
    val ckpt = Files.createTempDirectory("graft-ingdd-ckpt-").toString
    // ascending doc_id order makes "first seen" == "global min id per
    // fingerprint", so the batch exactGroups keeper set is the oracle
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(120).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    docs.grouped(40).foreach { chunk =>
      mem.addData(chunk: _*)
      IngestDedupSink.start(stream, cat, "d2", "doc_id", "text",
        dataDir, ckpt).processAllAvailable()
    }
    val streamed = cat.read(spark, "d2").select("doc_id").as[Long].collect().sorted
    // batch oracle: keeper = min doc_id per normalized fingerprint
    val keepers = docs.toDF("doc_id", "text")
      .groupBy(graft.ops.TextAnalysis.fingerprint(org.apache.spark.sql.functions.col("text")))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(streamed.toSeq == keepers.toSeq)
  }
}
