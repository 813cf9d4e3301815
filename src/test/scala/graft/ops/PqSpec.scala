package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (SURVEY §2.3 L39): planted-cluster ground
  * truth for train/encode/decode/ADC-search, the determinism contract,
  * and the compression arithmetic that makes PQ the 100 TB serving
  * format.
  */
class PqSpec extends SparkSpec {

  // 4 clusters in 8-D; with m=4 two-dim subspaces each cluster owns a
  // distinct per-subspace pattern, so per-subspace k-means must
  // recover codewords near the subspace cluster means
  private def planted() = {
    import spark.implicits._
    val rows = for {
      g <- 0 until 4
      i <- 0 until 50
    } yield {
      val eps = (i % 9 - 4) * 0.03f
      val vec = (0 until 8).map(d => (if (d % 4 == g) 10.0f else 0.0f) + eps).toArray
      (s"v${g}_$i", vec, g)
    }
    rows.toDF("id", "vec", "g")
  }

  private lazy val df = planted()
  private lazy val model = Pq.train(df, "id", "vec", m = 4, k = 4, maxIters = 10)

  test("codes are m small ints in [0, k); encoding is map-side deterministic") {
    val codes = Pq.encode(df, "id", "vec", model)
    assert(model.codeBytes == 4) // 8 floats (32 B) -> 4 B
    val stats = codes.select(
      min(array_min(col("pq_codes"))).as("lo"),
      max(array_max(col("pq_codes"))).as("hi"),
      min(size(col("pq_codes"))).as("m")).head()
    assert(stats.getAs[Int]("lo") >= 0 && stats.getAs[Int]("hi") < 4 && stats.getAs[Int]("m") == 4)
    // identical codes under any partitioning (literal codebooks, no shuffle)
    val a = codes.orderBy("id").collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    val b = Pq.encode(df.repartition(7), "id", "vec", model)
      .orderBy("id").collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    assert(a.sameElements(b))
  }

  test("decode reconstructs within the planted offset scale") {
    val approx = Pq.decode(Pq.encode(df, "id", "vec", model), "id", model)
      .join(df.select(col("id"), col("vec")), "id")
    val mse = approx.select(
      avg(aggregate(zip_with(col("pq_approx"), col("vec"),
        (a, v) => (a - v) * (a - v)), lit(0.0), (s, x) => s + x) / lit(8.0)).as("mse"))
      .head().getDouble(0)
    // planted offsets are ±0.12 max; codewords sit at subspace means,
    // so per-dim squared error stays well under the cluster separation
    assert(mse < 0.05, s"per-dim quantization MSE $mse")
  }

  test("ADC top-1 lands in the query's planted cluster") {
    val codes = Pq.encode(df, "id", "vec", model)
    val queries = df.filter(col("id").endsWith("_0") || col("id").endsWith("_25"))
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val top = Pq.search(codes, "id", model, queries, k = 1, excludeSelf = true)
    val hits = top.filter(col("rk") === 1)
      .select(col("query_id"), col("nn_id")).collect()
    assert(hits.length == queries.size)
    val good = hits.count(r => r.getString(0).takeWhile(_ != '_') == r.getString(1).takeWhile(_ != '_'))
    assert(good == queries.size, s"$good/${queries.size} ADC top-1 in-cluster")
  }

  test("IVF-PQ probes a cell subset yet keeps planted top-1 recall") {
    val codes = Pq.encode(df, "id", "vec", model)
    val ivf = Ann.ivfIndex(df, "id", "vec", nCells = 8)
    val queries = df.filter(col("id").endsWith("_0") || col("id").endsWith("_25"))
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val top = Pq.searchIvf(ivf, codes, "id", model, queries, k = 1, nProbe = 2,
      excludeSelf = true)
    val hits = top.filter(col("rk") === 1).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(hits.length == queries.size, "every query must find a neighbor in its probed cells")
    val good = hits.count { case (q, n) => q.takeWhile(_ != '_') == n.takeWhile(_ != '_') }
    assert(good == queries.size, s"$good/${queries.size} IVF-PQ top-1 in-cluster")
    // and the scan really was bounded: probed members < corpus per query
    val perCell = ivf.assigned.groupBy("cell").count().collect()
      .map(r => r.getLong(1)).sorted
    assert(perCell.take(2).sum < df.count(), "cells must partition the corpus")
  }

  test("IVF-PQ recall holds across a scale-parameter grid (nCells × nProbe)") {
    import spark.implicits._
    // 20 planted clusters × 200 rows in 16-D. Centers come from a
    // deterministic hash lattice (values 0..9 per dim) whose pairwise
    // separation dwarfs the ±0.05 noise, so a query's exact-L2 top-10
    // is provably inside its own cluster — recall@10 measures against
    // cluster membership, the exact truth by construction. m=4/k=16
    // keeps codewords SCARCER than clusters (16 < 20 per subspace):
    // the compression regime real corpora run in, where only the
    // cross-subspace code tuple separates clusters.
    val rows = for {
      g <- 0 until 20
      i <- 0 until 200
    } yield {
      val eps = ((i * 31 + g * 7) % 11 - 5) * 0.01f
      val vec = (0 until 16).map(d => (((g * 131 + d * 17) % 97) % 10).toFloat + eps).toArray
      (s"c${g}_$i", vec)
    }
    val corpus = rows.toDF("id", "vec").repartition(8)
    val model = Pq.train(corpus, "id", "vec", m = 4, k = 16, maxIters = 6)
    val codes = Pq.encode(corpus, "id", "vec", model).persist()
    val queries = corpus.filter(col("id").endsWith("_0"))
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    assert(queries.size == 20)
    def recallAt10(nCells: Int, nProbe: Int, ivf: Ann.IvfIndex): Double = {
      val hits = Pq.searchIvf(ivf, codes, "id", model, queries, k = 10,
        nProbe = nProbe, excludeSelf = true)
        .select(col("query_id"), col("nn_id")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      hits.count { case (q, n) =>
        q.takeWhile(_ != '_') == n.takeWhile(_ != '_')
      }.toDouble / (queries.size * 10)
    }
    for (nCells <- Seq(16, 64)) {
      val ivf = Ann.ivfIndex(corpus, "id", "vec", nCells = nCells)
      val probes = if (nCells == 16) Seq(1, 4, 8) else Seq(2, 8, 16)
      val recalls = probes.map(p => recallAt10(nCells, p, ivf))
      // more probed cells = a candidate superset: recall must not drop
      recalls.sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a - 1e-9, s"nCells=$nCells recall fell $recalls across probes $probes")
      }
      // at the working point (half the cells would be lavish; an eighth
      // is the realistic dial) planted recall stays high
      assert(recalls.last >= 0.9,
        s"nCells=$nCells nProbe=${probes.last} recall@10=${recalls.last}")
    }
    codes.unpersist()
  }

  test("ADC distance orders same-cluster below cross-cluster") {
    val codes = Pq.encode(df, "id", "vec", model)
    val q = df.filter(col("id") === "v0_10").select("vec").head().getSeq[Float](0)
      .map(_.toDouble).toSeq
    val d = Pq.search(codes, "id", model, Seq(("probe", q)), k = 200)
      .select(col("nn_id"), col("adc_dist")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val sameMax = d.filter(_._1.startsWith("v0_")).values.max
    val crossMin = d.filterNot(_._1.startsWith("v0_")).values.min
    assert(sameMax < crossMin,
      s"same-cluster ADC max $sameMax must undercut cross-cluster min $crossMin")
  }
}
