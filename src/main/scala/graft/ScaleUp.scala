package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf scale-up generator (SURVEY §6's validation sweep): writes an
  * N×-scaled copy of an sf directory by replicating each scaling table
  * with CONSISTENT key remapping — every key column k becomes
  * `k * N + copy` in every table that carries it, so join fan-outs,
  * key cardinalities and group counts all scale with the data (a bare
  * union would scale bytes but collapse distinct counts). The fixed
  * dimension tables (region, nation) stay as-is, exactly like TPC-H's
  * own sf scaling. Document/event/vector ids shift the same way so
  * dedup clusters and ANN corpora grow in POPULATION, not in copies of
  * one population (`doc_id` collisions would turn every near-dup
  * family into one giant cluster and invalidate the sweep).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.ScaleUp /tmp/graft-sf1 10"
  */
object ScaleUp {

  /** Key columns per table — remapped consistently everywhere. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Nil,
    "nation" -> Nil)

  def scaled(spark: SparkSession, sfDir: String, table: String, copies: Int): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    val keys = keyCols.getOrElse(table, Nil)
    if (keys.isEmpty || copies <= 1) df
    else (0 until copies).map { i =>
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) * copies + i))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-scaleup", GraftSession.cpus)
    // events.ts is TIMESTAMP(NANOS): read it as epoch-nanos long and
    // write it back as plain INT64 — Tables.events handles both shapes
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    keyCols.keys.toSeq.sorted.foreach { t =>
      val out = s"$outDir/$t.parquet"
      scaled(spark, sfDir, t, copies)
        .write.mode("overwrite").parquet(out)
      println(s"$t -> $out")
    }
    spark.stop()
  }
}
