package graft.sinks

import graft.meta.SnapshotCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate views over a snapshot table:
  * a keyed (COUNT, SUMs) materialization refreshed from the row-level
  * change feed — refresh cost ∝ CHANGED rows, never table size. The
  * 100 TB pattern this enables: a dashboard aggregate over a 100 TB
  * fact table refreshes from a day's CDC slice instead of a full
  * recompute (Materialize/Snowflake MV semantics, on this catalog's
  * own [[graft.meta.SnapshotCatalog.changesBetween]]).
  *
  * COUNT and SUM are the self-maintainable aggregates (deltas compose
  * by addition with sign; a key whose count reaches zero leaves the
  * view). AVG derives as sum/count at read time. MIN/MAX are NOT
  * self-maintainable under deletes (a retracted max needs the base
  * table) and are deliberately not offered.
  *
  * Sums run through DECIMAL(28,6) so the view is bit-identical to a
  * from-scratch recompute — the invariant the spec enforces after every
  * refresh. Key columns must be non-null (the standard MV key
  * constraint: the refresh merge joins on key equality). The view's own state lives in the SAME catalog as a table:
  * snapshot-versioned, time-travelable, servable; its `refreshed_at`
  * source snapshot rides the view snapshot's props (refresh IS a
  * commit, so view state and watermark advance atomically).
  */
object MaterializedAgg {

  /** Prop on the view's snapshots: the source snapshot the view equals. */
  val RefreshedAtProp = "graft.view.refreshed_at"

  /** Props on the view's snapshots recording its own definition (source
    * table, key columns, sum columns) — written by [[build]] and carried
    * by every [[refresh]], so a scheduled maintenance job can drive a
    * refresh from the VIEW NAME ALONE ([[refreshByName]], the
    * `CALL graft.refresh_mv` surface). */
  val SrcProp = SnapshotCatalog.MvSrcProp
  val KeysProp = "graft.view.keys"
  val SumsProp = "graft.view.sums"

  private def specProps(srcTable: String, keyCols: Seq[String],
      sumCols: Seq[String]): Map[String, String] = Map(
    SrcProp -> srcTable,
    KeysProp -> keyCols.mkString(","),
    SumsProp -> sumCols.mkString(","))

  private def sumExpr(c: String): Column =
    sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")

  /** REPLACE-write the view state (a refresh rewrites the whole view —
    * the view is keys-sized, ≪ source; labeled `rewrite` so the view's
    * own CDC classifies it correctly). */
  private def writeReplace(
      catalog: SnapshotCatalog,
      table: String,
      df: DataFrame,
      dataDir: String,
      props: Map[String, String]): Unit = {
    val dir = java.nio.file.Paths.get(dataDir,
      s"view-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(dir.toString)
    catalog.commit(df.sparkSession, table, Writers.listParquetIn(dir),
      props = Map(SnapshotCatalog.OperationProp -> SnapshotCatalog.OpRewrite) ++ props)
    ()
  }

  private def aggOf(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sumCols.map(sumExpr): _*)

  /** Full build: materialize the aggregate of `srcTable`'s CURRENT
    * snapshot into `viewTable` (one commit, watermark recorded). */
  def build(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      srcTable: String,
      viewTable: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      dataDir: String): Long = {
    val srcSnap = catalog.currentSnapshot(srcTable).getOrElse(
      throw new IllegalArgumentException(s"No snapshots for table $srcTable"))
    val agg = aggOf(catalog.read(spark, srcTable, snapshotId = Some(srcSnap.snapshotId)),
      keyCols, sumCols)
    writeReplace(catalog, viewTable, agg, dataDir,
      specProps(srcTable, keyCols, sumCols) +
        (RefreshedAtProp -> srcSnap.snapshotId.toString))
    srcSnap.snapshotId
  }

  /** The stored definition of `viewTable` (source, keys, sums) — the
    * spec [[build]] recorded. Refuses loudly on a table that is not a
    * materialized aggregate view. */
  def spec(catalog: SnapshotCatalog, viewTable: String): (String, Seq[String], Seq[String]) = {
    val props = catalog.currentSnapshot(viewTable).getOrElse(
      throw new IllegalArgumentException(s"No snapshots for table $viewTable")).props
    def cols(k: String): Seq[String] =
      props.getOrElse(k, throw new IllegalArgumentException(
        s"$viewTable is not a materialized aggregate view (no $k prop); " +
          "build it first")).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val src = props.getOrElse(SrcProp, throw new IllegalArgumentException(
      s"$viewTable is not a materialized aggregate view (no $SrcProp prop); " +
        "build it first"))
    (src, cols(KeysProp), cols(SumsProp))
  }

  /** [[refresh]] driven by the view name alone, using the definition
    * the view's own snapshots carry — the scheduled-maintenance shape
    * (`CALL graft.refresh_mv('mv')`). Returns the new watermark. */
  def refreshByName(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      viewTable: String,
      dataDir: String): Long = {
    val (src, keys, sums) = spec(catalog, viewTable)
    refresh(spark, catalog, src, viewTable, keys, sums, dataDir)
  }

  /** Incremental refresh: fold the change feed since the view's
    * watermark into the keyed state. Inserts add, deletes subtract,
    * keys at count zero drop out; the work is ONE delta aggregation
    * over the changed rows plus a keyed outer-join against the view
    * (view size ∝ distinct keys ≪ source rows). No-op (and no commit)
    * when the source hasn't moved. Returns the new watermark. */
  def refresh(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      srcTable: String,
      viewTable: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      dataDir: String): Long = {
    val viewSnap = catalog.currentSnapshot(viewTable).getOrElse(
      throw new IllegalArgumentException(
        s"View $viewTable has no snapshots — run build() first"))
    val from = viewSnap.props.getOrElse(RefreshedAtProp,
      throw new IllegalStateException(
        s"View $viewTable carries no $RefreshedAtProp watermark")).toLong
    val srcSnap = catalog.currentSnapshot(srcTable).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view $viewTable: source table $srcTable not found " +
          "(dropped or renamed since the build?)"))
    if (srcSnap.snapshotId == from) return from
    // history trimming may have expired the watermark snapshot — the
    // incremental path needs it as the diff base, so fall back to a
    // full rebuild (the dynamic-table re-initialize shape); schedule
    // expiration to retain at least the MV cadence to avoid this
    if (catalog.snapshotById(srcTable, from).isEmpty)
      return build(spark, catalog, srcTable, viewTable, keyCols, sumCols, dataDir)

    val changes = catalog.changesBetween(spark, srcTable, from, Some(srcSnap.snapshotId))
    val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__sign")).cast("long").as("d_n"),
        sumCols.map(c =>
          sum(col(c).cast("decimal(28,6)") * col("__sign")).as(s"d_$c")): _*)

    val view = catalog.read(spark, viewTable)
    val merged = view.join(delta, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++
          Seq((coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
            .as("n_rows")) ++
          sumCols.map { c =>
            (coalesce(col(s"sum_$c"), lit(0).cast("decimal(28,6)")) +
              coalesce(col(s"d_$c"), lit(0).cast("decimal(28,6)")))
              .cast("decimal(28,6)").as(s"sum_$c")
          }: _*)
      .filter(col("n_rows") > 0)
    writeReplace(catalog, viewTable, merged, dataDir,
      specProps(srcTable, keyCols, sumCols) +
        (RefreshedAtProp -> srcSnap.snapshotId.toString))
    srcSnap.snapshotId
  }
}
