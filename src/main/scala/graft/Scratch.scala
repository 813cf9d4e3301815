package graft

import org.apache.spark.sql.functions._

/** Dev scratch profiler — NOT part of the product; delete before commit. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
      val pairsDf = graft.ops.Dedup.ngramJaccardSearch(docs, "doc_id", "text", lit(true), 0.5)
      time("pairs: count") { println("    n pairs: " + pairsDf.count()) }
      time("pairs: count again") { pairsDf.count() }
      val pairs = pairsDf
      time("clusters") {
        println("    n labels: " + graft.ops.Dedup.duplicateClusters(pairs).count())
      }
      time("full q_dup_clusters") {
        graft.queries.Pipeline.qDupClusters(spark, sfDir).count()
      }
      time("full q_neardup_keep") {
        graft.queries.Pipeline.qNeardupKeep(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
