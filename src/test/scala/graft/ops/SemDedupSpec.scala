package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  test("markDuplicatesExact: hand-checked kept set on tiny vectors") {
    // cluster = argmax component: 1,2 share cluster 1; 4 is alone in 2.
    // cos(1,2) = 1.0 (same direction) ≥ τ=0.3 ⇒ 2 dropped, 1 (earliest
    // id) kept; 4 kept (no in-cluster neighbor).
    val df = Seq(
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(2.0f, 0.2f)),
      (4L, Array(0.1f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = SemDedup.markDuplicatesExact(
      df, "vec_id", "embedding",
      SemDedup.axisCluster(col("embedding")))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(got(1L) == (1, true))
    assert(got(2L) == (1, false)) // cos(1,2)=1 ≥ 0.3, id 1 earlier
    assert(got(4L) == (2, true))  // alone in its cluster
  }

  test("one-pass rule is deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val r1 = SemDedup.markDuplicatesExact(e, "vec_id", "embedding",
      SemDedup.axisCluster(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val r2 = SemDedup.markDuplicatesExact(e.repartition(13, col("vec_id")),
      "vec_id", "embedding", SemDedup.axisCluster(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(r1 == r2)
    assert(r1.exists(!_._3), "corpus should contain semantic near-dups at τ=0.3")
    assert(r1.count(_._3) > r1.size / 2, "most of the corpus should survive")
  }

  test("semDedup (kmeans form) drops planted near-copies, keeps originals") {
    val e = Tables.embeddings(spark, sfDir).where(col("vec_id") < 200)
    // plant: exact copy of each vec_id < 20 under id+10000 — identical
    // vector ⇒ identical kmeans cell and cos = 1 ≥ τ
    val copies = e.where(col("vec_id") < 20)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"), col("label"))
    val planted = e.unionByName(copies)
    val got = SemDedup.semDedup(planted, "vec_id", "embedding", tau = 0.95,
      targetClusterSize = 64)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // the copy (larger id) is dropped; originals survive
    (0L until 20L).foreach { id =>
      assert(got(id), s"original $id should be kept")
      assert(!got(id + 10000L), s"copy of $id should be dropped")
    }
  }
}
