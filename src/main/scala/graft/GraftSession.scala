package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Mirrors the reference's cache-node bootstrap (reference:
  * src/core/cache_node.py:29 builds loader + cache + engine from a config
  * dict) — here the "node" is a SparkSession with scale-appropriate
  * defaults: AQE on (runtime re-plan / skew handling), shuffle
  * parallelism sized to the local core count instead of the 200 default,
  * UTC session time, parquet pushdown left on.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

  def local(appName: String = "graft", nCpus: Int = cpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$nCpus]")
      .config("spark.sql.shuffle.partitions", nCpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
