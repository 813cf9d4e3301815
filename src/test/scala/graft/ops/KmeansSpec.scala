package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K-means Lloyd iterations (SURVEY §2.3 L38): planted ground truth,
  * empty-cell stability, and the determinism contract (identical model
  * under any partitioning — the property that makes a distributed
  * clustering job reproducible at 100 TB).
  */
class KmeansSpec extends SparkSpec {

  // 3 well-separated centers in 4-D; 60 points each with small
  // deterministic offsets — recoverable by any correct Lloyd run
  private def planted() = {
    import spark.implicits._
    val centers = Seq(
      Seq(10.0f, 0.0f, 0.0f, 0.0f),
      Seq(0.0f, 10.0f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 10.0f, 10.0f))
    val rows = for {
      (c, g) <- centers.zipWithIndex
      i <- 0 until 60
    } yield {
      val eps = (i % 7 - 3) * 0.05f
      (g.toLong * 100 + i, c.map(_ + eps).toArray, g)
    }
    rows.toDF("id", "vec", "g")
  }

  test("recovers planted clusters with perfect purity") {
    val df = planted()
    val model = VectorOps.kmeans(df, "id", "vec", k = 3, maxIters = 10)
    assert(model.iterations <= 10)
    // each planted center has exactly one recovered centroid nearby
    val centers = Seq(Seq(10.0, 0, 0, 0), Seq(0, 10.0, 0, 0), Seq(0, 0, 10.0, 10.0))
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val matched = centers.map(c => model.centroids.minBy(d2(c, _)))
    assert(matched.distinct.size == 3)
    centers.zip(matched).foreach { case (c, m) => assert(d2(c, m) < 0.1, s"$c vs $m") }

    // purity 1.0: every planted group lands in one cell
    val assigned = VectorOps.kmeansAssign(df, "id", "vec", model.centroids)
      .join(df.select(col("id"), col("g")), "id")
    val purity = assigned.groupBy("g").agg(count_distinct(col("cell")).as("nc"))
      .agg(max("nc")).collect()(0).getLong(0)
    assert(purity == 1L)
  }

  test("deterministic under any partitioning: identical model, bit for bit") {
    val df = planted()
    val a = VectorOps.kmeans(df.repartition(7), "id", "vec", k = 3, maxIters = 5)
    val b = VectorOps.kmeans(df.coalesce(1), "id", "vec", k = 3, maxIters = 5)
    assert(a.centroids == b.centroids)
    assert(a.iterations == b.iterations)
  }

  test("k larger than distinct points: empty cells keep their seed centroid") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("id", "vec")
    val model = VectorOps.kmeans(tiny, "id", "vec", k = 3, maxIters = 4)
    assert(model.centroids.size == 3)
    // all points still assign to SOME cell and the model converged
    val cells = VectorOps.kmeansAssign(tiny, "id", "vec", model.centroids)
      .select("cell").as[Int].collect().toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 3))
  }

  test("out-of-domain components fail loudly, never a silent null fold") {
    // |v| = 150 overflows the decimal(8,6) component cast: under ANSI
    // (the Spark 4 default) the cast itself throws; under ANSI-off the
    // sum comes back null and the r17 long-backed sum path throws its
    // own IllegalStateException — either way the model never silently
    // folds an overflow
    import spark.implicits._
    val big = (0 until 10).map(i => (i.toLong, Array(150.0f, 0.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      VectorOps.kmeans(big, "id", "vec", k = 2, maxIters = 2)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      t.isInstanceOf[IllegalStateException] || t.isInstanceOf[ArithmeticException] ||
        t.getClass.getSimpleName.contains("Arithmetic")),
      s"expected an overflow failure, got: $e")
  }

  test("convergence: shift reaches tolerance on stable data before maxIters") {
    val df = planted()
    val model = VectorOps.kmeans(df, "id", "vec", k = 3, maxIters = 50)
    assert(model.iterations < 50, s"did not converge: ${model.iterations}")
    assert(model.maxShift <= 1e-9)
  }
}
