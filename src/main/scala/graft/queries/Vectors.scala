package graft.queries

import graft.Tables
import graft.ops.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked embedding-column operators (SURVEY §2.3): L2
  * normalization, int8 quantization, nearest-centroid assignment — each
  * a map-side transform whose fixed-point formulation is bit-identical
  * across engines (see [[graft.ops.VectorOps]]). */
object Vectors {

  /** L2-normalize every embedding (SURVEY L19). */
  def qVecNorm(s: SparkSession, dir: String): DataFrame =
    VectorOps.l2Normalize(Tables.embeddings(s, dir), "vec_id", "embedding")

  /** Int8 symmetric quantization of every embedding (SURVEY L20). */
  def qVecQuantize(s: SparkSession, dir: String): DataFrame =
    VectorOps.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")

  /** Assign every embedding to its nearest of 8 fixed centroids (the
    * embeddings of vec_id 0..7) by cosine — the k-means E-step /
    * cluster-labeling pattern with broadcast centroids (SURVEY L21). */
  def qVecAssign(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    VectorOps.assignNearestCentroid(e, "vec_id", "embedding", cents, "cid", "cvec")
  }

  /** Full k-means (Lloyd) over the embeddings table (SURVEY L38):
    * farthest-point seeding, 4 iterations, k=8 — per-cell membership
    * profile of the converged model. Rows-only by design (the oracle
    * cannot express an iterative Lloyd run in one SQL statement); the
    * ground-truth contract lives in `KmeansSpec` (planted clusters
    * recovered with purity 1.0, bit-identical model under any
    * partitioning). */
  def qKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val model = VectorOps.kmeans(e, "vec_id", "embedding", k = 8, maxIters = 4)
    VectorOps.kmeansAssign(e, "vec_id", "embedding", model.centroids)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vec_norm" -> (qVecNorm _),
    "q_vec_quantize" -> (qVecQuantize _),
    "q_kmeans" -> (qKmeans _),
    "q_vec_assign" -> (qVecAssign _))

  /** Fixed-point unnested view shared by the oracles: one row per
    * (vec_id, pos) with the component as round(v·1e7) BIGINT. */
  private val fixedE =
    """SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
      |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 10000000) AS BIGINT) AS vi
      |  FROM embeddings""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_vec_norm" ->
      s"""WITH e AS ($fixedE),
         |n AS (SELECT vec_id, SUM(vi * vi) AS ss FROM e GROUP BY 1)
         |SELECT e.vec_id, e.pos, ROUND(e.vi / SQRT(n.ss), 6) AS nv
         |FROM e JOIN n USING (vec_id)""".stripMargin,
    "q_vec_quantize" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(generate_subscripts(emb, 1) - 1 AS INT) AS pos,
        |  CAST(ROUND(unnest(emb) / scale * 127.0) AS INT) AS q,
        |  ROUND(scale, 6) AS scale6
        |FROM v""".stripMargin,
    "q_vec_assign" ->
      s"""WITH e AS ($fixedE),
         |c AS (SELECT vec_id AS cid, pos, vi AS ci FROM e WHERE vec_id < 8),
         |vv AS (SELECT vec_id, SUM(vi * vi) AS vv FROM e GROUP BY 1),
         |cc AS (SELECT cid, SUM(ci * ci) AS cc FROM c GROUP BY 1),
         |d AS (
         |  SELECT e.vec_id, c.cid, SUM(e.vi * c.ci) AS dot
         |  FROM e JOIN c USING (pos) GROUP BY 1, 2),
         |s AS (
         |  SELECT d.vec_id, d.cid,
         |    d.dot / (SQRT(vv.vv) * SQRT(cc.cc)) AS sim_raw,
         |    ROW_NUMBER() OVER (PARTITION BY d.vec_id
         |      ORDER BY d.dot / (SQRT(vv.vv) * SQRT(cc.cc)) DESC, d.cid) AS rn
         |  FROM d JOIN vv USING (vec_id) JOIN cc USING (cid))
         |SELECT vec_id, cid, ROUND(sim_raw, 6) AS sim FROM s WHERE rn = 1""".stripMargin)
}
