package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private val K = 4

  // planted corpus: docs 1 and 2 share a 6-token boilerplate run (so
  // three overlapping 4-gram windows are duplicated); doc 3 is
  // unrelated; doc 4 is too short to carry any window
  private val boiler = "all rights reserved see license terms"
  private lazy val planted = Seq(
    (1L, s"alpha beta $boiler gamma delta"),
    (2L, s"omega psi chi $boiler"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "too short")
  ).toDF("doc_id", "text")

  /** Driver-side naive re-implementation of the same semantics. */
  private def naive(docs: Seq[(Long, String)], k: Int): (Map[Long, (Long, Long)], Map[Long, String]) = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val grams = docs.flatMap { case (id, _) =>
      val w = toks(id)
      if (w.size < k) Nil
      else (0 to w.size - k).map(i => (id, i, w.slice(i, i + k).mkString(" ")))
    }
    val byGram = grams.groupBy(_._3)
    val owners = byGram.map { case (g, occ) => g -> occ.map(_._1).min }
    val nDocs = byGram.map { case (g, occ) => g -> occ.map(_._1).distinct.size }
    val stats = grams.groupBy(_._1).map { case (id, occ) =>
      id -> (occ.size.toLong, occ.count(o => nDocs(o._3) >= 2).toLong)
    }
    val cutTokens: Map[Long, Set[Int]] = grams
      .filter { case (id, _, g) => nDocs(g) >= 2 && owners(g) != id }
      .groupBy(_._1)
      .map { case (id, occ) => id -> occ.flatMap(o => o._2 until o._2 + k).toSet }
    val rebuilt = docs.map { case (id, _) =>
      val cut = cutTokens.getOrElse(id, Set.empty)
      id -> toks(id).zipWithIndex.collect { case (t, i) if !cut.contains(i) => t }.mkString(" ")
    }.toMap
    (stats, rebuilt)
  }

  test("markDuplicated matches the naive implementation on the planted corpus") {
    val (stats, _) = naive(Seq(
      1L -> s"alpha beta $boiler gamma delta",
      2L -> s"omega psi chi $boiler",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "too short"), K)
    val got = SubstringDedup.markDuplicated(planted, "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == stats)
    // sanity on the planted shape: the shared 6-token run is 3 windows
    assert(got(1L)._2 == 3 && got(2L)._2 == 3 && got(3L)._2 == 0)
    assert(!got.contains(4L)) // sub-k docs carry no windows
  }

  test("hashed grams produce identical counts to string grams") {
    val docs = Tables.documents(spark, sfDir)
    val s = SubstringDedup.markDuplicated(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h = SubstringDedup.markDuplicated(docs, "doc_id", "text", 8, hashed = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s == h)
    assert(s.values.map(_._2).sum > 0, "corpus should contain duplicated spans")
  }

  test("removeDuplicatedSpans cuts non-owner spans, keeps owner text verbatim") {
    val (_, rebuilt) = naive(Seq(
      1L -> s"alpha beta $boiler gamma delta",
      2L -> s"omega psi chi $boiler",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "too short"), K)
    val got = SubstringDedup.removeDuplicatedSpans(planted, "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == rebuilt)
    // owner (min doc id) keeps its text; non-owner lost the whole run
    assert(got(1L) == s"alpha beta $boiler gamma delta")
    assert(got(2L) == "omega psi chi")
    assert(got(3L) == "the quick brown fox jumps over the lazy dog")
    assert(got(4L) == "too short")
  }

  test("removal agrees with naive on real documents") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
    val in = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val (_, rebuilt) = naive(in, 8)
    val got = SubstringDedup.removeDuplicatedSpans(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == rebuilt)
  }
}
