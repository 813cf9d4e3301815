package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashExprsSpec extends SparkSpec {

  import spark.implicits._

  test("simhash64 matches a scala reference implementation") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, -7L)),
      (2L, Seq(0L)),
      (3L, Seq(Long.MaxValue, Long.MinValue, 42L))).toDF("id", "wh")
    val got = df.select(col("id"), HashExprs.simhash64(col("wh")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def ref(hs: Seq[Long]): Long = {
      val votes = Array.fill(64)(0)
      hs.foreach(h => (0 until 64).foreach(k =>
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1))
      (0 until 64).foldLeft(0L)((acc, k) => if (votes(k) > 0) acc | (1L << k) else acc)
    }
    Seq(1L -> Seq(1L, 2L, 3L, -7L), 2L -> Seq(0L),
      3L -> Seq(Long.MaxValue, Long.MinValue, 42L)).foreach { case (id, hs) =>
      assert(got(id) == ref(hs), s"id $id")
    }
  }

  test("minhash_sig: 64 slots, min-stable, order-insensitive") {
    val df = Seq(
      (1L, Seq(5L, 9L, 123L)),
      (2L, Seq(123L, 5L, 9L)), // permutation of 1 → identical signature
      (3L, Seq(5L, 9L))).toDF("id", "h")
    val rows = df.select(col("id"), HashExprs.minhashSig(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == 64)
    assert(rows(1L) == rows(2L), "signature must be order-insensitive")
    // superset's minima are <= subset's minima
    rows(1L).zip(rows(3L)).foreach { case (sup, sub) => assert(sup <= sub) }
  }

  test("sorted_intersect_count equals array_intersect size on distinct sorted inputs") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))).toDF("a", "b")
    val rows = df.select(
      HashExprs.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("expressions survive mixed use in one projection (codegen name hygiene)") {
    val df = Seq((Seq(1L, 2L), Seq(2L, 3L))).toDF("a", "b")
    val r = df.select(
      HashExprs.simhash64(col("a")).as("s1"),
      HashExprs.simhash64(col("b")).as("s2"),
      HashExprs.sortedIntersectCount(col("a"), col("b")).as("i1"),
      HashExprs.sortedIntersectCount(col("b"), col("a")).as("i2"),
      HashExprs.minhashSig(col("a")).as("m1"),
      HashExprs.minhashSig(col("b")).as("m2")).head()
    assert(r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getSeq[Long](4) != r.getSeq[Long](5))
  }
}
