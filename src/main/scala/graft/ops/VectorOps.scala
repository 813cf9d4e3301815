package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines: L2
  * normalization, int8 quantization (the storage/serving compression
  * step), and nearest-centroid assignment (k-means E-step / cluster
  * labeling). All are map-side column expressions over the embedding
  * array — no shuffle except where an aggregation is the point — so they
  * scale as pure scan work.
  *
  * Cross-engine exactness: float sums are order- and engine-dependent in
  * the last ulp, so the oracle-checked forms run on a FIXED-POINT view of
  * the vector — each component rounded to 1e-7 and held as a long. Sums
  * of long products are exact integers (64 · (5.3e6)² ≈ 1.8e15 ≪ 2⁶³),
  * so norms and dot products become single deterministic double
  * expressions over exact integers, identical in Spark and DuckDB.
  * The 1e-7 grid is far below the float32 resolution of the inputs, so
  * downstream consumers see the same vectors to ~7 significant digits.
  *
  * Domain: components |v| ≤ ~30 at dim ≤ 1024 keeps every fixed-point
  * square-sum below 2⁶³ (1024 · (3·10⁸)² ≈ 9.2·10¹⁸) — embeddings are
  * unit-ish by construction, orders of magnitude inside the bound.
  */
object VectorOps {

  /** Fixed-point view: each float component → round(v·1e7) as long. */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1e7)).cast("long"))

  /** Exact squared norm of a fixed-point vector (sum of long squares). */
  def normSq(vi: Column): Column =
    aggregate(vi, lit(0L), (a, x) => a + x * x)

  /** Exact dot product of two fixed-point vectors. */
  def dotFixed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** L2-normalized components, exploded to (id, pos, nv) rows with nv
    * rounded to 6 decimals — the deterministic oracle form. */
  def l2Normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), fixedPoint(col(vecCol)).as("__vi"))
      .withColumn("__ss", normSq(col("__vi")))
      .select(col(idCol), posexplode(col("__vi")).as(Seq("pos", "__v")), col("__ss"))
      .select(col(idCol), col("pos"),
        round(col("__v") / sqrt(col("__ss")), 6).as("nv"))

  /** Symmetric int8 quantization: per-vector scale = max |component|,
    * q = round(v / scale · 127) ∈ [-127, 127]. Exploded to
    * (id, pos, q, scale6) rows; all arithmetic is plain IEEE double with
    * a fixed operation order, so engines agree bit-for-bit. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val asD = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), asD.as("__v"))
      .withColumn("__scale", array_max(transform(col("__v"), x => abs(x))))
      .select(col(idCol), posexplode(col("__v")).as(Seq("pos", "__x")), col("__scale"))
      .select(col(idCol), col("pos"),
        round(col("__x") / col("__scale") * lit(127.0)).cast("int").as("q"),
        round(col("__scale"), 6).as("scale6"))
  }

  /** Nearest-centroid assignment by cosine: each vector joins the
    * (broadcast) centroid set, similarity = exact fixed-point dot over
    * the exact integer norms, winner = highest similarity with centroid
    * id as tiebreak. Map-side at any corpus size — the shuffle-free
    * k-means E-step. `centroids` must be small (it is broadcast). */
  def assignNearestCentroid(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val vecs = df.select(col(idCol), fixedPoint(col(vecCol)).as("__vi"))
      .withColumn("__vv", normSq(col("__vi")))
    val cents = centroids.select(col(cidCol), fixedPoint(col(cvecCol)).as("__ci"))
      .withColumn("__cc", normSq(col("__ci")))
    val sim = dotFixed(col("__vi"), col("__ci")) /
      (sqrt(col("__vv")) * sqrt(col("__cc")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__sim").desc, col(cidCol))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__sim", sim)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(cidCol), round(col("__sim"), 6).as("sim"))
  }


  /** Converged k-means model: final centroids, iterations run, and the
    * last iteration's max centroid L2 shift. */
  final case class KmeansModel(
      centroids: Seq[Seq[Double]], iterations: Int, maxShift: Double)

  /** Map-side cell assignment against literal centroids: minimizing
    * ||x−c||² is maximizing 2·x·c − ||c||² (||x||² is constant per
    * row), so each centroid contributes one codegen'd dot — an argmax
    * over a struct array, zero joins, zero shuffles. Ties break to the
    * LOWER cell id (struct max on (score, −cell)), keeping assignment
    * deterministic under bit-equal scores. `private[graft]`: the
    * committed-index encoder ([[graft.meta.VectorIndex]]) reuses the
    * SAME expression so sidecar codes and session encodes can never
    * diverge. */
  private[graft] def kmeansCell(cents: Seq[Seq[Double]], vec: Column): Column = {
    val scores = cents.zipWithIndex.map { case (cv, i) =>
      val c2 = cv.map(x => x * x).sum
      struct(
        (graft.functions.VecFunctions.vecDot(vec, array(cv.map(lit): _*)) * lit(2.0) - lit(c2))
          .as("score"),
        lit(-i).as("nc"))
    }
    -array_max(array(scores: _*)).getField("nc")
  }

  /** Cell id per row for a fixed centroid set (the k-means E-step as a
    * standalone operator — also the final-model apply). */
  def kmeansAssign(
      df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    df.select(col(idCol), kmeansCell(cents, col(vecCol)).cast("int").as("cell"))

  /** K-means (Lloyd) over an embedding column (SURVEY §2.3 L38) — the
    * 100 TB shape: per iteration ONE map-side assignment (centroids
    * broadcast as literals inside a codegen argmax) + ONE aggregation
    * keyed on the cell alone whose k output rows carry one decimal-
    * exact sum per dimension; only those k×dims doubles cross the
    * driver each round. r17: the per-dimension sums moved out of a
    * posexplode (which amplified every row dims× through the shuffle)
    * into dims `element_at` sum columns, and the component cast
    * narrowed decimal(27,6) → decimal(8,6) so the sum buffer
    * (decimal(18,6)) is long-backed — Spark's DecimalAggregates rule
    * rewrites it to a primitive UnscaledValue sum, 2× faster per
    * iteration and 64× fewer shuffle rows, with bit-identical sums for
    * every in-domain input (same scale-6 HALF_UP cast, exact integer
    * arithmetic either way). Domain (checked loudly, see below):
    * |component| < 100 — 3× the ~30 bound the fixed-point ops above
    * already document — and ≤ ~1e12 rows per cell (the decimal(18,6)
    * sum capacity at unit-ish components). All vectors must share one
    * dimensionality (ragged input was never meaningful: centroids are
    * fixed-dim). Deterministic end to end: the seed is the md5-ordered
    * sample (TakeOrdered — the IVF bootstrap plan, never a global
    * sort), argmax ties break low, and decimal sums are partitioning-
    * independent — identical input gives an identical model on any
    * cluster size. Empty cells keep their previous centroid. A
    * dimension whose sum comes back null (every component of a cell
    * overflowed the cast, or the sum itself overflowed) throws rather
    * than folding a silent null into the model. Stops at maxIters or
    * when every centroid moved ≤ tol (L2). */
  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIters: Int = 10, tol: Double = 1e-9): KmeansModel = {
    require(k > 0 && maxIters > 0)
    val base = df.select(col(idCol).cast("string").as("km_id"), col(vecCol).as("km_vec"))
      .where(col("km_vec").isNotNull)
      // the seed scan + every Lloyd iteration re-reads this projection:
      // persist for the run (MLlib's KMeans caches the same way),
      // released before returning
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // farthest-point (greedy max–min) seeding on an md5-deterministic
    // sample: ONE TakeOrdered scan collects a bounded candidate set
    // (max(64, 32k) rows — k×dims doubles of driver work), then the
    // classic k-center greedy picks seeds maximizing distance to the
    // nearest chosen one. Immune to the two-seeds-in-one-cluster
    // collapse a plain hash sample risks, without the k full scans a
    // distributed argmax per seed would cost at 100 TB. Deterministic:
    // the sample order is (md5, id) and ties pick the earliest sample
    // row.
    val sampleN = math.max(64, 32 * k)
    val sample: Seq[Seq[Double]] = base
      .orderBy(md5(col("km_id")), col("km_id")).limit(sampleN)
      .select("km_vec").collect()
      // element type is whatever the source column carries — array<float>
      // and array<double> embedding columns both work
      .map(_.getSeq[Number](0).map(_.doubleValue).toSeq).toSeq
    require(sample.nonEmpty, "kmeans needs at least one non-null vector")
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Seq[Seq[Double]] = Seq(sample.head)
    var minD: Array[Double] = sample.map(d2(_, cents.head)).toArray
    while (cents.size < math.min(k, sample.size)) {
      val nxt = minD.indices.maxBy(i => (minD(i), -i))
      cents = cents :+ sample(nxt)
      minD = minD.indices.map(i => math.min(minD(i), d2(sample(i), sample(nxt)))).toArray
    }
    // fewer distinct points than k: duplicate-seed cells simply stay empty
    while (cents.size < k) cents = cents :+ cents.head
    val dims = sample.head.size
    require(sample.forall(_.size == dims),
      s"kmeans needs a uniform dimensionality; sample carries sizes " +
        s"${sample.map(_.size).distinct.sorted.mkString(",")}")
    val dimSums = (0 until dims).map(i =>
      sum(element_at(col("km_vec"), i + 1).cast("decimal(8,6)")).as(s"s$i"))
    var it = 0
    var shift = Double.MaxValue
    while (it < maxIters && shift > tol) {
      val sums = base
        .select(kmeansCell(cents, col("km_vec")).cast("int").as("cell"), col("km_vec"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .collect()
      val byCell: Map[Int, Seq[Double]] = sums.map { r =>
        val n = r.getLong(1)
        r.getInt(0) -> (0 until dims).map { i =>
          val s = r.getDecimal(2 + i)
          if (s == null) throw new IllegalStateException(
            s"kmeans dimension $i sum overflowed decimal(18,6) — components must " +
              "stay under |v| < 100 and cells under ~1e12 rows (see scaladoc)")
          s.doubleValue / n
        }.toSeq
      }.toMap
      val next = cents.zipWithIndex.map { case (old, i) => byCell.getOrElse(i, old) }
      shift = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      cents = next
      it += 1
    }
    base.unpersist()
    KmeansModel(cents, it, shift)
  }
}
