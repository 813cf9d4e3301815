package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Structural description of a query's physical plan — the Spark-first
  * analogue of the reference's `DistributedQueryPlan` (reference:
  * src/sql/engine.py:31: table references, predicates, projections,
  * local/remote/missing partition bookkeeping). On Spark the
  * partition-placement half is the scheduler's job, so the useful
  * introspection is: what is scanned (files, columns, pushed filters),
  * what is cached, and how much data movement (shuffles/broadcasts) the
  * plan incurs.
  */
final case class QueryPlanInfo(
    scannedPaths: Seq[String],
    readColumns: Seq[String],
    pushedFilters: Seq[String],
    cachedScans: Int,
    shuffles: Int,
    broadcasts: Int,
    scanPartitions: Int = 0,
    preferredHosts: Map[String, Int] = Map.empty) {
  def usesCache: Boolean = cachedScans > 0
}

object PlanInfo {

  /** Recursively flatten, stepping INTO adaptive sub-plans (AQE wraps
    * the real plan in AdaptiveSparkPlanExec). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Analyze a DataFrame's physical plan without executing it.
    *
    * `scanPartitions`/`preferredHosts` surface the scheduler's locality
    * view — the Spark-side analogue of the reference coordinator's
    * partition-location bookkeeping (reference: src/core/coordinator.py:9
    * local/remote partition maps): each scan task's preferred hosts come
    * from the storage layer's block locations (empty on a local
    * filesystem, populated on HDFS/object-store deployments), and the
    * scheduler — not user code — routes tasks to them. */
  def analyze(df: DataFrame): QueryPlanInfo = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    val hostCounts = scans
      .flatMap(s => s.inputRDD.partitions.flatMap(p => s.inputRDD.preferredLocations(p)))
      .groupBy(identity).view.mapValues(_.size).toMap
    QueryPlanInfo(
      scannedPaths = scans.flatMap(_.relation.location.rootPaths.map(_.toString)).distinct,
      readColumns = scans.flatMap(_.requiredSchema.fieldNames).distinct,
      pushedFilters = scans.flatMap(_.metadata.get("PushedFilters")).distinct,
      cachedScans = nodes.count(_.isInstanceOf[InMemoryTableScanExec]),
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      scanPartitions = scans.map(_.inputRDD.partitions.length).sum,
      preferredHosts = hostCounts)
  }
}
