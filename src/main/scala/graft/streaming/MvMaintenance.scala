package graft.streaming

import graft.meta.SnapshotCatalog
import graft.sinks.MaterializedAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous maintenance of an incremental materialized aggregate
  * (T11) — the streaming half of S39: a Structured Streaming loop that
  * refreshes the view WHENEVER ITS SOURCE TABLE COMMITS, turning the
  * scheduled `CALL graft.refresh_mv` into a follow-the-table daemon
  * (Databricks DLT / Snowflake dynamic-table cadence, on this catalog's
  * own change feed).
  *
  * Design: the [[SnapshotSource]] stream over the source table is used
  * as a COMMIT SIGNAL ONLY — each micro-batch fires one
  * [[MaterializedAgg.refreshByName]], and the batch DataFrame is never
  * executed (Spark plans lazily, so the signal costs zero data I/O;
  * `getOffset` is one pointer read per trigger). The refresh itself
  * reads the CDC slice from the VIEW'S OWN watermark, so:
  *
  *   - work per trigger ∝ rows changed since the last refresh, never
  *     source size (the S39 contract);
  *   - the loop is SELF-HEALING: stream offsets and the view watermark
  *     are independent — a replayed trigger refreshes from an already-
  *     current watermark (no-op, no commit), a missed one is absorbed
  *     by the next refresh reading a slightly larger slice. Crash
  *     anywhere, restart from the checkpoint, and the view converges;
  *   - idle source = no batch = no work (unlike a cron refresh, which
  *     pays a poll; `maxSnapshotsPerTrigger` is deliberately not set —
  *     a refresh always folds to CURRENT, so capping the signal would
  *     only add empty triggers).
  *
  * At 100 TB: the daemon's steady-state cost is the delta aggregation
  * over each commit's churn plus a keyed outer-join against the
  * keys-sized view — the same plan the batch refresh runs, on the same
  * code path (`CdcLifecycleSpec` races it against the full op pool). */
object MvMaintenance {

  /** Start the refresh daemon for `viewTable` (built by
    * [[MaterializedAgg.build]] / `CALL graft.create_mv`). The source
    * table rides the view's own stored definition. */
  def start(
      spark: SparkSession,
      catalogRoot: String,
      viewTable: String,
      dataDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val catalog = new SnapshotCatalog(catalogRoot)
    val src = MaterializedAgg.spec(catalog, viewTable).src
    spark.readStream
      .format("graft.streaming.SnapshotSourceProvider")
      .option("catalogRoot", catalogRoot)
      .option("table", src)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        // the batch frame is the signal, not the payload: refresh reads
        // its own watermark-to-current slice (idempotent, exactly-once
        // BY CONVERGENCE rather than by offset bookkeeping)
        MaterializedAgg.refreshByName(spark, catalog, viewTable, dataDir)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
