package graft.sinks

import java.nio.file.{Files, Path, Paths}

import graft.meta.{PruneFilter, SnapshotCatalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Snapshot export — the inverse of [[Ingest]]: write a table's state
  * (current, a snapshot id, or a tag — a branch exports by its
  * first-class `t/branches/dev` ref) to an EXTERNAL directory as
  * parquet/csv/json for consumers outside the catalog (training jobs
  * that want raw shards, partner data shares, downstream systems that
  * read files not catalogs). The reference serves external readers over
  * its wire protocol (`flight_server/server.py`); file export is the
  * batch-shaped complement.
  *
  * Scale: one distributed write of the selected state — file pruning
  * (`where` scopes via manifest min/max/blooms before planning) keeps
  * the scan at the matching files, the row filter keeps the output
  * exact, and nothing is collected to the driver. Default mode refuses
  * an existing destination (an export that silently merges into last
  * week's export corrupts the consumer); `overwrite => true` replaces. */
object Export {

  val Formats: Set[String] = Set("parquet", "csv", "json")

  /** Returns (files written, bytes written) — counted from one
    * driver-side listing of the destination. */
  def export(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      table: String,
      dest: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      version: Option[String] = None,
      asOfMs: Option[Long] = None,
      where: Option[String] = None,
      pruneFilters: Seq[PruneFilter] = Nil,
      overwrite: Boolean = false,
      partitionBy: Seq[String] = Nil): (Long, Long) = {
    require(version.isEmpty || asOfMs.isEmpty,
      "export takes at most one of version / as_of_ms")
    require(Formats.contains(format),
      s"export format must be one of ${Formats.toSeq.sorted.mkString(", ")}; got '$format'")
    // resolve the snapshot ONCE and read it PINNED: a re-resolution at
    // read time could fall back to current (e.g. the historical
    // snapshot expired between check and read) and hand the consumer
    // today's data labeled as history. A numeric version must name an
    // existing snapshot; a tag wins when the id doesn't resolve (covers
    // tags that happen to look numeric).
    val snap: graft.meta.SnapshotMeta = version.map { v =>
      v.toLongOption.flatMap(catalog.snapshotById(table, _))
        .orElse(catalog.snapshotByTag(table, v))
        .getOrElse(throw new IllegalArgumentException(
          s"export version => '$v': no snapshot id or tag of that name on $table"))
    }.orElse(asOfMs.map { ts =>
      catalog.snapshotAsOf(table, ts).getOrElse(throw new IllegalArgumentException(
        s"export as_of_ms => $ts: no snapshot of $table at or before that time"))
    }).getOrElse(catalog.currentSnapshot(table).getOrElse(
      throw new IllegalArgumentException(s"No snapshots for table $table")))
    val base = catalog.readSnapshot(spark, snap, filters = pruneFilters)
    val df = where.map(w => base.filter(expr(w))).getOrElse(base)
    // hive-layout output (`dest/c=v/...`) for consumers that
    // partition-prune by directory; one shuffle-free write per
    // partition value present in each task's split
    val writer = df.write.format(format).options(options)
      .mode(if (overwrite) "overwrite" else "errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .save(dest)
    var files = 0L
    var bytes = 0L
    val walk = Files.walk(Paths.get(dest))
    try walk.forEach { (p: Path) =>
      val n = p.getFileName.toString
      if (Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")) {
        files += 1; bytes += Files.size(p)
      }
    } finally walk.close()
    (files, bytes)
  }
}
