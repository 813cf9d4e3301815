package graft.streaming

import graft.meta.SnapshotCatalog
import graft.ops.TextAnalysis
import graft.sinks.Writers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest with exact dedup against everything already
  * ingested (SURVEY §2.4 T10) — the DEPLOY shape of L36's incremental
  * dedup: a crawl/firehose streams in, and each micro-batch lands only
  * the documents whose normalized-text fingerprint has never been seen,
  * in this batch or any before it.
  *
  * State lives in TABLES, not in streaming state stores: the corpus
  * table plus a fingerprint index table (`<table>__fpindex`, one row
  * per distinct fingerprint with its keeper id — [[graft.ops.Dedup
  * .exactGroups]]' output shape, maintained incrementally). Restarting
  * the query, or pointing a SECOND query at the same tables, needs no
  * state migration — the disk format is the coordination point, same
  * as the CDC race pool. At 100 TB the per-batch cost is one co-keyed
  * join of the (small) batch against the fingerprint-count-sized
  * index, never a corpus scan.
  *
  * Exactly-once across TWO tables: each commit carries (checkpoint,
  * batchId); the corpus and index commits are checked independently on
  * re-delivery. A crash between the two commits re-delivers the batch,
  * recomputes the SAME survivor set (the index is unchanged until its
  * own commit lands), skips the already-landed corpus commit and
  * completes the index commit — deterministic recomputation makes the
  * two-table pair idempotent without a cross-table transaction.
  *
  * In-batch dups resolve before the index probe (min id per
  * fingerprint, a batch-sized aggregate), so a batch carrying the same
  * article from three mirrors lands it once. */
object IngestDedupSink {

  private[streaming] val BatchIdProp = "graft.ingestdedup.batchId"
  private[streaming] val CheckpointProp = "graft.ingestdedup.checkpoint"

  /** The fingerprint index table for `table`. */
  def indexTable(table: String): String = s"${table}__fpindex"

  private def lastCommitted(
      catalog: SnapshotCatalog, table: String, checkpointDir: String): Long =
    catalog.snapshots(table)
      .filter(_.props.get(CheckpointProp).contains(checkpointDir))
      .flatMap(_.props.get(BatchIdProp))
      .map(_.toLong)
      .reduceOption(_ max _)
      .getOrElse(-1L)

  private[streaming] def ingestBatch(
      catalog: SnapshotCatalog,
      table: String,
      idCol: String,
      textCol: String,
      dataDir: String,
      checkpointDir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val props = Map(BatchIdProp -> batchId.toString, CheckpointProp -> checkpointDir)
    val spark = batch.sparkSession
    val idx = indexTable(table)

    // in-batch winners: lowest id per fingerprint (batch-sized agg)
    val fp = batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val winners = fp.join(
      fp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq("__fp", idCol), "left_semi")

    // novel = winners whose fingerprint is absent from the index; the
    // anti join co-keys on the fingerprint (index side is one row per
    // distinct fingerprint — bounded, never corpus-sized)
    val novel =
      if (catalog.currentSnapshot(idx).isEmpty) winners
      else winners.join(
        catalog.read(spark, idx).select(col("fingerprint").as("__fp")),
        Seq("__fp"), "left_anti")

    // both commits are per-table idempotent under re-delivery
    if (batchId > lastCommitted(catalog, table, checkpointDir))
      Writers.writeSnapshot(catalog, table, novel.drop("__fp"), dataDir, props = props)
    if (batchId > lastCommitted(catalog, idx, checkpointDir))
      Writers.writeSnapshot(catalog, idx,
        novel.select(col("__fp").as("fingerprint"), col(idCol).as("dup_of")),
        dataDir, props = props)
    ()
  }

  def start(
      stream: DataFrame,
      catalog: SnapshotCatalog,
      table: String,
      idCol: String,
      textCol: String,
      dataDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(ingestBatch(catalog, table, idCol, textCol, dataDir, checkpointDir) _)
      .start()
}
