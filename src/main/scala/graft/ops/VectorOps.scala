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
}
