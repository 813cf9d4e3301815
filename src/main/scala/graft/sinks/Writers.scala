package graft.sinks

import java.nio.file.{Files, Paths}
import java.util.UUID

import graft.meta.{SnapshotCatalog, SnapshotMeta}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Write-side surface (SURVEY §2.1): partitioned layouts, bucketed
  * tables, and snapshot-committed writes — the producer half of the
  * reference's cache/metadata story (its loader consumes Iceberg-written
  * files; reference: src/storage/dataloader.py:17. Here both halves are
  * Spark-native).
  *
  * Scale notes: hive-style partition dirs turn predicate pushdown into
  * directory pruning (the coarsest, cheapest skip level); bucketed +
  * sorted tables pre-shuffle data ONCE at write time so every later
  * equi-join/aggregation on the bucket key runs exchange-free.
  */
object Writers {

  /** List .parquet leaves, closing the directory stream (Files.list/walk
    * leak an fd if abandoned — a long-lived committer driver cares). */
  private def listParquet(dir: java.nio.file.Path, recursive: Boolean = false): Seq[String] = {
    val stream = if (recursive) Files.walk(dir) else Files.list(dir)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath.toString).toList.sorted
    finally stream.close()
  }

  /** Morton (z-order) value of the given columns under per-column sorted
    * bucket boundaries: bucket index = #boundaries strictly below the
    * value (rank binning), 6 bits per dimension, bit i of dimension d at
    * position i·nDims+d. Pure column expression — property-tested against
    * an independent driver-side reimplementation. */
  private[sinks] def zorderValue(colsAndBounds: Seq[(String, Seq[Double])]): Column = {
    val idxs = colsAndBounds.map { case (c, bs) =>
      size(filter(array(bs.map(lit): _*), b => b < col(c).cast("double"))).cast("long")
    }
    val nDims = colsAndBounds.length
    val terms = for {
      (idx, d) <- idxs.zipWithIndex
      i <- 0 until 6
    } yield shiftleft(shiftright(idx, i).bitwiseAND(lit(1L)), i * nDims + d)
    terms.reduce(_ + _)
  }

  /** Hive-style partitioned parquet write. Readers filtering on
    * `partitionCols` scan only matching directories. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Hive-partitioned write COMMITTED to the snapshot catalog: the
    * partition values of every leaf file land in its manifest entry
    * (parsed from the `k=v` path segments), so later
    * `planFiles(EqString(partitionCol, v))` skips non-matching files
    * from metadata alone — no footer reads, the same directory-level
    * skip Iceberg gets from its partition spec (reference:
    * src/iceberg_management/metadata.py:26 `get_data_files`). */
  def writePartitionedSnapshot(
      catalog: SnapshotCatalog,
      table: String,
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      props: Map[String, String] = Map.empty): SnapshotMeta = {
    writePartitioned(df, path, partitionCols)
    val files = listParquet(Paths.get(path), recursive = true)
    catalog.commit(df.sparkSession, table, files,
      props = Map(SnapshotCatalog.OperationProp -> SnapshotCatalog.OpAppend) ++ props)
  }

  /** Bucketed + sorted managed table: pre-shuffled on `bucketCol` into
    * `numBuckets` files per partition, so joins between co-bucketed
    * tables skip the exchange entirely. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCol: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Z-order (morton) clustered snapshot write: rows cluster by the
    * interleaved bits of their per-column QUANTILE bucket indices, so
    * every output file covers a small hyper-rectangle of the z-space and
    * file-level min/max stats become selective on EVERY z column at once
    * — the multi-dimensional layout lever behind Delta/Iceberg
    * `OPTIMIZE ZORDER`, driving the same manifest pruning
    * [[graft.meta.SnapshotCatalog.planFiles]] already does.
    *
    * Spark-first mechanics: bucket boundaries come from
    * `df.stat.approxQuantile` (a bounded sampled model, like a range
    * partitioner's), so binning is rank-based and skew-robust; the
    * z-value is a pure column expression; `repartitionByRange` on it is
    * ONE shuffle; files write sorted within partitions. 64 buckets per
    * dimension = 6 bits, up to 10 dims in a long. */
  def writeZOrderedSnapshot(
      catalog: SnapshotCatalog,
      table: String,
      df: DataFrame,
      dataDir: String,
      zCols: Seq[String],
      nFiles: Int = 16,
      props: Map[String, String] = Map.empty): SnapshotMeta = {
    require(zCols.nonEmpty && zCols.size <= 10, "z-order needs 1..10 columns")
    val buckets = 64
    val bounds: Seq[Seq[Double]] = zCols.map { c =>
      df.stat.approxQuantile(c, (1 until buckets).map(_.toDouble / buckets).toArray, 0.01).toSeq
    }
    val zValue = zorderValue(zCols.zip(bounds))
    val dir = Paths.get(dataDir, s"zorder-${UUID.randomUUID().toString.take(8)}")
    df.withColumn("__z", zValue)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(dir.toString)
    val files = listParquet(dir)
    // append semantics, like writeSnapshot: prior files survive with their
    // manifest metadata intact (a full OPTIMIZE-style recluster is
    // read-everything + deleteWhere, an explicit user choice)
    val prevFiles = catalog.currentSnapshot(table).map(_.files).getOrElse(Nil)
    catalog.commit(df.sparkSession, table, prevFiles.map(_.path) ++ files,
      reuseMeta = prevFiles.map(f => f.path -> f).toMap,
      props = Map(SnapshotCatalog.OperationProp -> SnapshotCatalog.OpAppend) ++ props)
  }

  /** Copy-on-write row-level delete (Iceberg COW DELETE semantics):
    * files containing matching rows are rewritten without them; files
    * provably untouched by the predicate survive as-is; one metadata
    * commit. Scale: only the affected files are read and rewritten —
    * `pruneFilters` (manifest min/max + bloom) bounds the rewrite set.
    */
  def deleteWhere(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      table: String,
      rowPredicate: DataFrame => DataFrame,
      pruneFilters: Seq[graft.meta.PruneFilter],
      dataDir: String): SnapshotMeta = {
    val current = catalog.currentSnapshot(table)
      .getOrElse(throw new IllegalArgumentException(s"No snapshots for table $table"))
    val affected = catalog.planFiles(table, pruneFilters).map(_.path).toSet
    val untouchedMeta = current.files.filterNot(f => affected.contains(f.path))
    val rewritten: Seq[String] =
      if (affected.isEmpty) Nil
      else {
        val remaining = rowPredicate(
          spark.read.schema(current.schema).parquet(affected.toSeq: _*))
        val dir = Paths.get(dataDir, s"rewrite-${UUID.randomUUID().toString.take(8)}")
        remaining.write.parquet(dir.toString)
        listParquet(dir)
      }
    // untouched files keep their manifest metadata — the commit scans
    // only the rewritten files. The operation kind + rewrite lineage in
    // props let incremental readers exclude rewrite outputs (surviving
    // rows of a COW delete are NOT new rows — see
    // SnapshotCatalog.readIncremental).
    catalog.commit(spark, table, untouchedMeta.map(_.path) ++ rewritten,
      reuseMeta = untouchedMeta.map(f => f.path -> f).toMap,
      props = Map(
        SnapshotCatalog.OperationProp -> SnapshotCatalog.OpDelete,
        SnapshotCatalog.RewrittenFromProp -> affected.toSeq.sorted.mkString(",")))
  }

  /** Write `df` as parquet under `dataDir` and commit the produced files
    * as a new snapshot of `table` — the transactional append pattern
    * (write files, then one atomic metadata commit), mirroring the
    * Iceberg commit flow the reference's metadata manager consumes
    * (reference: src/iceberg_management/metadata.py:26). */
  def writeSnapshot(
      catalog: SnapshotCatalog,
      table: String,
      df: DataFrame,
      dataDir: String,
      bloomColumns: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): SnapshotMeta = {
    val dir = Paths.get(dataDir, s"commit-${UUID.randomUUID().toString.take(8)}")
    df.write.parquet(dir.toString)
    val files = listParquet(dir)
    val prevFiles = catalog.currentSnapshot(table).map(_.files).getOrElse(Nil)
    catalog.commit(df.sparkSession, table, prevFiles.map(_.path) ++ files, bloomColumns,
      reuseMeta = prevFiles.map(f => f.path -> f).toMap,
      props = Map(SnapshotCatalog.OperationProp -> SnapshotCatalog.OpAppend) ++ props)
  }
}
