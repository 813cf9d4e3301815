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

  test("cosine near-dup recall gates: planted near-identical vectors >= 0.85; weak pairs match LSH theory") {
    import spark.implicits._
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    // the operator's contract is recall on TRUE near-dups (cos -> 1):
    // plant 30 perturbed copies (cos ~ 0.99) and require they're found
    val rnd = new scala.util.Random(13)
    val planted = rows.take(30).map { case (id, v) =>
      (id + 1000000L, v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat))
    }
    val corpus = (rows ++ planted).toSeq.toDF("vec_id", "embedding")
    val found = Ann.cosineNearDup(corpus, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.take(30).map { case (id, _) => (id, id + 1000000L) }.toSet
    val plantedRecall = want.count(found.contains).toDouble / want.size
    info(f"plantedNearDupRecall=$plantedRecall%.3f (${want.size} planted, cos~0.99)")
    assert(plantedRecall >= 0.85, f"planted near-dup recall $plantedRecall%.3f")

    // natural pairs here are WEAK (max cos 0.48, labels uncorrelated
    // with geometry): recall must track the hyperplane collision model
    // p(theta) = 1 - (1 - (1 - theta/pi)^8)^4, not an arbitrary bar
    val byId = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val norms = byId.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
    val naturalPairs = (for {
      (ia, va) <- byId.toSeq; (ib, vb) <- byId.toSeq if ia < ib
      cos = va.zip(vb).map { case (x, y) => x * y }.sum / (norms(ia) * norms(ib))
      if cos >= 0.35
    } yield ((ia, ib), cos)).toMap
    assert(naturalPairs.nonEmpty)
    val naturalFound = Ann.cosineNearDup(emb, "vec_id", "embedding", threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val observed = naturalPairs.keys.count(naturalFound.contains).toDouble / naturalPairs.size
    val expected = naturalPairs.values.map { cos =>
      val pPlane = 1.0 - math.acos(cos) / math.Pi
      1.0 - math.pow(1.0 - math.pow(pPlane, Ann.NumPlanes), Ann.NumTables)
    }.sum / naturalPairs.size
    info(f"weakPairs=${naturalPairs.size} observedRecall=$observed%.3f theoreticalRecall=$expected%.3f")
    assert(observed >= expected * 0.5 && observed <= math.min(1.0, expected * 2.5 + 0.05),
      f"recall $observed%.3f diverges from collision model $expected%.3f")
  }

  test("adaptive geometry: planted recall holds past the bucket-bit switch (20k corpus)") {
    // above n ≈ targetWidth·2^8 the bucket bits grow with the corpus
    // (fixed bits make the same-bucket self-join N²/2^bits) and every 2
    // extra bits add a table as the recall repair — this gate runs the
    // REAL operator in that regime: 20k vectors → 10 bits / 5 tables,
    // and the planted near-identical pairs must still surface
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0L until 20000L).map(i => (i, unit()))
    val planted = base.take(50).map { case (id, v) =>
      (id + 1000000L, v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
      .repartition(8)
    val found = Ann.cosineNearDup(corpus, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = base.take(50).map { case (id, _) => (id, id + 1000000L) }.toSet
    val recall = want.count(found.contains).toDouble / want.size
    info(f"adaptiveRecall=$recall%.3f over ${want.size} planted pairs at 20k vectors")
    assert(recall >= 0.85, f"adaptive-geometry planted recall $recall%.3f")
    // random unit vectors at threshold 0.9: every surfaced pair must be
    // a planted one (precision is exact-cosine verified)
    assert(found.forall(p => want.contains(p)))
  }

  test("IVF top-k: planted near-identical queries find their source at rank 1") {
    import spark.implicits._
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val rnd = new scala.util.Random(29)
    val planted = rows.take(30).map { case (id, v) =>
      (id + 1000000L, v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat))
    }
    val corpus = (rows ++ planted).toSeq.toDF("vec_id", "embedding")
    val got = Ann.ivfTopK(corpus, "vec_id", "embedding",
        col("query_id") >= 1000000L, k = 1, nCells = 32, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = planted.count { case (pid, _) => got.get(pid).contains(pid - 1000000L) }
    val recall = hits.toDouble / planted.length
    info(f"ivfPlantedRecall=$recall%.3f (${planted.length} planted, cos~0.99, nProbe=4/32)")
    assert(recall >= 0.85, f"planted IVF recall $recall%.3f")
  }

  test("IVF top-k achieves reasonable recall@5 vs brute force while pruning most of the corpus") {
    val nProbe = 8
    val got = Ann.ivfTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5,
        nCells = 32, nProbe = nProbe)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = groundTruth.map { case (q, truth) =>
      got.get(q).map(_.intersect(truth.toSet).size).getOrElse(0)
    }.sum
    val recall = hits.toDouble / (groundTruth.size * 5)
    info(f"ivfRecall@5=$recall%.3f (nProbe=$nProbe/32, weak natural neighbors)")
    assert(recall >= 0.2, s"recall@5 = $recall")
    // precision exact: ranks are cosine-descending
    val rows = Ann.ivfTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5,
      nCells = 32, nProbe = nProbe).orderBy("query_id", "rank").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val coss = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(coss.sameElements(coss.sortBy(-(_: Double))))
    }
  }

  test("ANN plans broadcast the query side (scale guard)") {
    val plan = Ann.bruteForceTopK(emb, "vec_id", "embedding", col("query_id") < 10, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("IVF centroid bootstrap plans as TakeOrderedAndProject, never a global sort") {
    // orderBy(md5).limit(nCells) must stay a per-partition top-k heap:
    // O(N) scan, O(nCells) driver result. A regression to Exchange+Sort
    // (full shuffle-sort of the corpus) would dominate at 100 TB — pin
    // the plan so a Spark upgrade can't silently change it.
    val plan = Ann.ivfCentroidQuery(emb, "vec_id", "embedding", 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    // a Sort node renders as "Sort [" in the plan string (nodeName,
    // not the SortExec class name); TakeOrderedAndProject renders its
    // ordering as "orderBy=[...]" so this can't false-positive
    assert(!plan.contains("Sort [") && !plan.contains("rangepartitioning"),
      s"centroid bootstrap must not global-sort:\n$plan")
  }
}
