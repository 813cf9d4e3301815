package graft

import org.apache.spark.sql.SparkSession

/** Bench a named subset of the battery (dev tool for A/B plan work and
  * scale sweeps — `Bench` stays the driver-facing full run). Args are
  * query names; `--runs N` controls repetitions (default 2, best-of).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.BenchOne q_ngram_jaccard_lsh q_kmeans"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (flags, names0) = args.partition(_.startsWith("--runs="))
    val runs = flags.headOption.map(_.stripPrefix("--runs=").toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (names0.nonEmpty) names0.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark: SparkSession = GraftSession.local("graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(f"$name%-28s UNKNOWN")
        case Some(fn) =>
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name%-28s best=${times.min}%7.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
