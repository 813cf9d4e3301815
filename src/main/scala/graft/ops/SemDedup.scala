package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding space, then drop within-cluster items whose cosine
  * similarity to an earlier-id kept candidate exceeds a threshold —
  * near-duplicate SEMANTIC content (paraphrases, templated rewrites)
  * that exact/MinHash dedup (L1–L4) can't see because the surface text
  * differs. Complements [[Ann.cosineNearDup]] (L5): that op finds
  * near-IDENTICAL vectors via random-hyperplane LSH; this one prunes at
  * much looser thresholds where LSH bucket collision probability is too
  * low to be a candidate generator, using cluster membership as the
  * candidate scope instead — the published algorithm's design.
  *
  * Scale shape (the 100 TB contract): candidates are within-cluster
  * pairs, Σ|c|² — the caller sizes k so E[|c|] stays a constant
  * (`semDedup` defaults k = N/targetClusterSize), making candidate count
  * ≈ N·width, linear. One shuffle on cluster id for the self-join; the
  * drop rule ("an earlier-id neighbor above τ exists") is a one-pass
  * EXISTS, not the sequential greedy — parallel-evaluable and
  * deterministic under any partitioning (the two differ only on chains
  * a~b~c with a̸~c, where one-pass also drops c; for dedup PRUNING both
  * are accepted forms).
  *
  * Reference scope note: the reference engine (serving/cache layer,
  * src/core/cache_node.py) has no semantic dedup; this is part of the
  * §2.3 training-data surface built beyond it.
  */
object SemDedup {

  /** Deterministic projection clustering: cluster = index of the max
    * component, i.e. nearest of the d axis-aligned unit vectors — the
    * ORACLE-exact clustering (first-index ties, exact float equality,
    * reproducible in any engine). Production uses kmeans centroids via
    * [[semDedup]]; this form exists so the battery entry's cluster
    * assignment is engine-independent. */
  def axisCluster(vec: Column): Column =
    array_position(vec, array_max(vec)).cast("int")

  /** Fixed-point one-pass SemDeDup with EXACT integer threshold math
    * (the q_pq_encode treatment): components are viewed as
    * round(v·1e7) int64, so dot products and norms are exact integer
    * sums (order-independent — no float accumulation ambiguity) and
    * the cosine test `cos ≥ τ` with rational τ² = num/den becomes
    *   dot ≥ 0  AND  den·dot² ≥ num·|a|²·|b|²
    * in decimal(38,0) — engine-exact, so kept/dropped hash-matches any
    * engine that replays the arithmetic.
    *
    * @param tauSqNum/tauSqDen rational τ² (default 9/100 → τ = 0.3)
    * @return (idCol, cluster, kept) one row per input row
    */
  def markDuplicatesExact(
      df: DataFrame, idCol: String, vecCol: String, clusterCol: Column,
      tauSqNum: Int = 9, tauSqDen: Int = 100): DataFrame = {
    val fx = transform(col(vecCol), v => round(v.cast("double") * lit(1e7)).cast("long"))
    val f = df.select(col(idCol), clusterCol.as("cluster"), fx.as("fx"))
      .withColumn("n2", aggregate(col("fx"), lit(0L), (acc, x) => acc + x * x))
    val a = f.select(col(idCol).as("ida"), col("cluster"), col("fx").as("fxa"), col("n2").as("n2a"))
    val b = f.select(col(idCol).as("idb"), col("cluster"), col("fx").as("fxb"), col("n2").as("n2b"))
    val dot = aggregate(zip_with(col("fxa"), col("fxb"), _ * _), lit(0L), _ + _)
    val dec = "decimal(38,0)"
    val dropped = a.join(b, Seq("cluster"))
      .where(col("ida") < col("idb"))
      .withColumn("dot", dot)
      .where(col("dot") >= 0 &&
        lit(tauSqDen).cast(dec) * col("dot").cast(dec) * col("dot").cast(dec) >=
          lit(tauSqNum).cast(dec) * col("n2a").cast(dec) * col("n2b").cast(dec))
      .select(col("idb").as(idCol)).distinct()
    f.join(dropped.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), not(coalesce(col("is_dup"), lit(false))).as("kept"))
  }

  /** Production form: kmeans clusters sized to the corpus (k =
    * max(minK, N / targetClusterSize) keeps within-cluster pair work
    * linear in N), double-precision cosine via the codegen'd
    * [[graft.functions.VecFunctions.vecCosine]]. Returns one row per
    * input id with its cluster and kept flag; downstream keeps
    * `filter(kept)`. */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String, tau: Double,
      targetClusterSize: Int = 256, minK: Int = 16,
      maxIters: Int = 4): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1), got $tau")
    val n = df.count()
    val k = math.max(minK, (n / math.max(targetClusterSize, 1)).toInt)
    val model = VectorOps.kmeans(df, idCol, vecCol, k = k, maxIters = maxIters)
    val assigned = df.join(
      VectorOps.kmeansAssign(df, idCol, vecCol, model.centroids), Seq(idCol))
    val a = assigned.select(col(idCol).as("ida"), col("cell"), col(vecCol).as("va"))
    val b = assigned.select(col(idCol).as("idb"), col("cell"), col(vecCol).as("vb"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("ida") < col("idb") &&
        graft.functions.VecFunctions.vecCosine(col("va"), col("vb")) >= tau)
      .select(col("idb").as(idCol)).distinct()
    assigned.join(dropped.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell").as("cluster"),
        not(coalesce(col("is_dup"), lit(false))).as("kept"))
  }
}
