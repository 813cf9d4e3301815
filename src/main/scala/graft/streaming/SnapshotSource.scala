package graft.streaming

import graft.meta.SnapshotCatalog
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[SnapshotCatalog]] table — the
  * read-side complement of [[SnapshotSink]] (which commits micro-batches
  * as snapshots): a downstream job consumes the table AS A STREAM, one
  * micro-batch per snapshot range, the Delta/Iceberg `readStream`
  * pattern on this catalog's own metadata.
  *
  *   spark.readStream
  *     .format("graft.streaming.SnapshotSourceProvider")
  *     .option("catalogRoot", root).option("table", "docs")
  *     .load()
  *
  * Semantics: the first batch is the full table at the then-current
  * snapshot; every later batch is `readIncremental(lastSeen, current)` —
  * appends only, walked commit-by-commit, so COW deletes/rewrites,
  * merges and compactions between triggers are classified exactly like
  * any other incremental read (rewrite outputs never resurface as
  * inserts; merge insert-files and compaction lineage pass through).
  *
  * Scale: `getOffset` is one pointer read (O(1) at any snapshot count —
  * this poll runs every trigger); a batch plans only the files the range
  * appended. Offsets are snapshot ids, so restart-from-checkpoint
  * resumes exactly where the stream stopped: streaming in AND out of the
  * catalog is end-to-end exactly-once (sink side: batch-id-in-props).
  */
final class SnapshotSource(
    sqlContext: SQLContext,
    root: String,
    table: String,
    maxSnapshotsPerTrigger: Option[Long] = None) extends Source {

  private val catalog = new SnapshotCatalog(root)
  private def spark = sqlContext.sparkSession

  override val schema: StructType = catalog.schema(table).getOrElse(
    throw new IllegalArgumentException(
      s"table $table has no snapshots under $root (the source needs a schema)"))

  // last end offset handed to getBatch — the rate-limit anchor. Restored
  // naturally on checkpoint restart: MicroBatchExecution replays the
  // last committed range through getBatch before polling getOffset.
  @volatile private var lastEnd: Option[Long] = None

  /** Latest offset to OFFER this trigger: the current snapshot, capped
    * to `lastEnd + maxSnapshotsPerTrigger` — a consumer catching up on a
    * deep backlog takes it in bounded micro-batches (the Delta
    * `maxFilesPerTrigger` analogue) instead of one unbounded batch. If
    * expiration removed the snapshot at the cap, the offer slides down
    * to the nearest surviving id (never past `lastEnd`). */
  override def getOffset: Option[Offset] =
    catalog.currentSnapshot(table).map { s =>
      val capped = (lastEnd, maxSnapshotsPerTrigger) match {
        case (Some(le), Some(m)) if le + m < s.snapshotId =>
          ((le + m) to (le + 1) by -1)
            .find(id => catalog.snapshotById(table, id).isDefined)
            .getOrElse(s.snapshotId)
        case _ => s.snapshotId
      }
      LongOffset(capped)
    }

  private def id(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    lastEnd = Some(id(end))
    val batch = start match {
      // first batch: the whole table as of the end snapshot
      case None => catalog.read(spark, table, snapshotId = Some(id(end)))
      case Some(s) if id(s) >= id(end) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(s) =>
        catalog.readIncremental(spark, table, id(s), Some(id(end)))
    }
    // MicroBatchExecution asserts isStreaming on the returned frame
    org.apache.spark.sql.GraftColumnShim.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}

/** `format("graft.streaming.SnapshotSourceProvider")` registration.
  * Options: `catalogRoot` (required), `table` (required). */
final class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshots"

  private def opt(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new IllegalArgumentException(s"missing required option: $key"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val cat = new SnapshotCatalog(opt(parameters, "catalogRoot"))
    val table = opt(parameters, "table")
    (shortName(), schema.orElse(cat.schema(table)).getOrElse(
      throw new IllegalArgumentException(
        s"table $table has no snapshots (schema unknown)")))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(sqlContext, opt(parameters, "catalogRoot"), opt(parameters, "table"),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong))
}
