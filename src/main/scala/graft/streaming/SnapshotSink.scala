package graft.streaming

import graft.meta.SnapshotCatalog
import graft.sinks.Writers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion into the snapshot catalog: every micro-batch
  * lands as one transactional append snapshot (write files → single
  * metadata commit), so downstream readers get atomic visibility, time
  * travel over the ingest history, and incremental (CDC-style)
  * consumption via `SnapshotCatalog.readIncremental` — the reference's
  * streaming-ingestion + cache-refresh path (reference:
  * docs/arrow_iceberg_cache_design.md §4 "Streaming Ingestion";
  * snapshot consumption in src/iceberg_management/metadata.py).
  *
  * Scale: commit cost is O(files in batch) thanks to manifest metadata
  * reuse; the stream's only serialization point is the tiny JSON commit.
  */
object SnapshotSink {

  def start(
      stream: DataFrame,
      catalog: SnapshotCatalog,
      table: String,
      dataDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Writers.writeSnapshot(catalog, table, batch, dataDir)
          ()
        }
      }
      .start()
}
