package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Driver-side exact top-k ground truth (test only). */
  private lazy val groundTruth: Map[Long, Seq[Long]] = {
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    val norms = rows.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }.toMap
    val queries = rows.filter(_._1 < 10)
    queries.map { case (qid, qv) =>
      val top = rows.filter(_._1 != qid).map { case (id, v) =>
        val cos = qv.zip(v).map { case (a, b) => a * b }.sum / (norms(qid) * norms(id))
        (id, cos)
      }.sortBy { case (id, cos) => (-cos, id) }.take(5).map(_._1).toSeq
      qid -> top
    }.toMap
  }

  test("brute-force top-k matches driver-side ground truth exactly") {
    val got = Ann.bruteForceTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5)
      .orderBy("query_id", "rank").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    assert(got == groundTruth)
  }

  test("LSH top-k achieves reasonable recall@5 vs brute force") {
    val got = Ann.lshTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = groundTruth.map { case (q, truth) =>
      got.get(q).map(_.intersect(truth.toSet).size).getOrElse(0)
    }.sum
    val recall = hits.toDouble / (groundTruth.size * 5)
    assert(recall >= 0.2, s"recall@5 = $recall") // multi-probe over 8-bit buckets
  }

  test("LSH top-k candidates are ranked by exact cosine (precision exact)") {
    val rows = Ann.lshTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5)
      .orderBy("query_id", "rank").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val coss = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(coss.sameElements(coss.sortBy(-(_: Double))), "ranks must be cosine-descending")
    }
  }

  test("embedding near-dup pairs carry exact verified cosine") {
    val pairs = Ann.cosineNearDup(emb, "vec_id", "embedding", 0.35).collect()
    val byId = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    pairs.foreach { r =>
      val (a, b, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (va, vb) = (byId(a), byId(b))
      val expect = va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(cos - expect) < 1e-9)
      assert(cos >= 0.35)
      assert(a < b)
    }
  }

  test("ANN plans broadcast the query side (scale guard)") {
    val plan = Ann.bruteForceTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }
}
