package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (SURVEY §2.3 L39) — the codebook compression a
  * 100 TB vector corpus actually serves from (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the IVF-PQ
  * family every large ANN deployment uses): split each d-dim vector
  * into m subspaces, k-means each subspace independently, and store a
  * vector as m small codebook indexes. A 768-dim float vector (3 KB)
  * becomes m=16 bytes — a 192× compression that turns a 100 TB
  * embedding corpus into a sub-TB code table that FITS IN CLUSTER RAM,
  * while distances remain computable straight from the codes.
  *
  * Spark-first shapes:
  *  - train: m independent [[VectorOps.kmeans]] runs over SLICED
  *    projections (each the one-agg-per-iteration Lloyd; the input
  *    projection is persisted once per subspace run). Deterministic —
  *    same corpus, same model, any partitioning.
  *  - encode: pure map-side — each subspace is a codegen'd literal
  *    argmax ([[VectorOps.kmeansCell]] over a `slice`), zero shuffles,
  *    linear in corpus, exactly the plan `q_vec_assign` proved.
  *  - search (ADC, asymmetric distance): the bounded query set turns
  *    into per-query m×k lookup tables (driver: m·k·|Q| doubles);
  *    distance to a corpus vector = m array lookups summed — no float
  *    vector is ever read again. Broadcast join against the code
  *    table, per-query top-k window. Candidates linear in corpus, the
  *    brute-force-over-codes baseline IVF cells would further bound.
  */
object Pq {

  /** Trained product quantizer: `codebooks(j)(i)` is codeword `i` of
    * subspace `j` (each `dims/m` wide). */
  final case class PqModel(dims: Int, codebooks: Seq[Seq[Seq[Double]]]) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
    def subDim: Int = dims / m
    /** Bytes per encoded vector (one small int per subspace). */
    def codeBytes: Int = m
  }

  private def dimsOf(df: DataFrame, vecCol: String): Int = {
    val row = df.select(size(col(vecCol)).as("d")).where(col("d") > 0).limit(1).collect()
    require(row.nonEmpty, s"no non-empty vectors in $vecCol")
    row(0).getInt(0)
  }

  /** Train m per-subspace codebooks of k codewords each. `dims % m == 0`
    * (pad upstream if not). m sequential kmeans runs, each over the
    * corpus projected to `dims/m` columns — train cost is m × Lloyd,
    * amortized over every later encode/search like any index build. */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, maxIters: Int = 8): PqModel = {
    val dims = dimsOf(df, vecCol)
    require(m > 0 && dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val sub = dims / m
    val codebooks = (0 until m).map { j =>
      VectorOps.kmeans(
        df.select(col(idCol), slice(col(vecCol), j * sub + 1, sub).as("__sub")),
        idCol, "__sub", k = k, maxIters = maxIters).centroids
    }
    PqModel(dims, codebooks)
  }

  /** Encode every vector to its m codebook indexes — map-side only:
    * each code is a codegen'd argmax over k literal centroids on a
    * `slice` of the vector (no shuffle, no join; the whole corpus
    * streams through one projection). */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    val sub = model.subDim
    val codes = (0 until model.m).map { j =>
      VectorOps.kmeansCell(model.codebooks(j), slice(col(vecCol), j * sub + 1, sub))
        .cast("int")
    }
    df.select(col(idCol), array(codes: _*).as("pq_codes"))
  }

  /** Reconstruct the approximate vector from codes (the decoder half of
    * the codec; also the cheapest way to audit quantization error). */
  def decode(codes: DataFrame, idCol: String, model: PqModel): DataFrame = {
    val books: Column = typedLit(model.codebooks.map(_.map(_.toArray).toArray).toArray)
    codes.select(col(idCol),
      flatten(zip_with(
        col("pq_codes"),
        books,
        (c, book) => element_at(book, c + lit(1)))).as("pq_approx"))
  }

  /** IVF-PQ (the composition serving systems actually deploy — coarse
    * cells bound WHICH codes are scored, PQ bounds the BYTES per
    * score): each query probes its `nProbe` best coarse cells
    * (driver-side — centroids are a bounded model), and only probed
    * members pay the m-lookup ADC sum. Candidates ≈ (nProbe/nCells)·N
    * per query over m-byte codes: at 100 TB neither the float vectors
    * nor the full code table is touched per query. The (cell ∪ codes)
    * join is the one-time index materialization — persist its result
    * alongside the corpus like the IVF assignment itself. */
  def searchIvf(
      ivf: Ann.IvfIndex, codes: DataFrame, idCol: String, model: PqModel,
      queries: Seq[(String, Seq[Double])], k: Int, nProbe: Int = 4,
      excludeSelf: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "IVF-PQ search needs at least one query")
    val nCells = ivf.centroids.size
    require(nProbe >= 1 && nProbe <= nCells, s"nProbe in [1,$nCells], got $nProbe")
    val spark = codes.sparkSession
    import spark.implicits._
    val sub = model.subDim
    val tabRows = queries.map { case (qid, qv) =>
      require(qv.size == model.dims, s"query $qid has ${qv.size} dims, model has ${model.dims}")
      // probe cells: same argmax-dot rule the index assigned rows with
      val cells = ivf.centroids.zipWithIndex
        .map { case (c, i) => (qv.zip(c).map { case (a, b) => a * b }.sum, i) }
        .sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
      val tab = (0 until model.m).map { j =>
        val qj = qv.slice(j * sub, (j + 1) * sub)
        model.codebooks(j).map(cw => qj.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      (qid, tab, cells)
    }
    val probes = tabRows.toDF("query_id", "qtab", "cells")
      .select(col("query_id"), col("qtab"), explode(col("cells")).as("cell"))
    val indexed = ivf.assigned.select(col("nn_id"), col("cell"))
      .join(codes.select(col(idCol).as("nn_id"), col("pq_codes")), "nn_id")
    val joined = indexed.join(broadcast(probes), Seq("cell"))
    val dist = aggregate(
      zip_with(col("pq_codes"), col("qtab"), (c, t) => element_at(t, c + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    val scored = joined.select(col("query_id"), col("nn_id"), dist.as("adc_dist"))
    val kept = if (excludeSelf) scored.filter(col("query_id") =!= col("nn_id")) else scored
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("nn_id"))
    kept.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank").cast("long").as("rk"),
        round(col("adc_dist"), 6).as("adc_dist"))
  }

  /** ADC top-k: for each (bounded) query row, distance to every encoded
    * corpus vector is m table lookups summed — squared-L2 between the
    * query's subvector and the codeword the corpus vector stored.
    * Returns (query id, neighbor id, rank, adc_dist). `queries` is
    * collected driver-side (the serving pattern: a request batch
    * against a corpus-scale index), tables ride the broadcast join. */
  def search(
      codes: DataFrame, idCol: String, model: PqModel,
      queries: Seq[(String, Seq[Double])], k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "ADC search needs at least one query")
    val spark = codes.sparkSession
    import spark.implicits._
    val sub = model.subDim
    // per-query lookup table: tab(j)(i) = ||q_j − codebook(j)(i)||²
    val tabRows = queries.map { case (qid, qv) =>
      require(qv.size == model.dims, s"query $qid has ${qv.size} dims, model has ${model.dims}")
      val tab = (0 until model.m).map { j =>
        val qj = qv.slice(j * sub, (j + 1) * sub)
        model.codebooks(j).map(cw =>
          qj.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      (qid, tab)
    }
    val tabs = tabRows.toDF("query_id", "qtab")
    val joined = codes.select(col(idCol).as("nn_id"), col("pq_codes"))
      .crossJoin(broadcast(tabs))
    val dist = aggregate(
      zip_with(col("pq_codes"), col("qtab"), (c, t) => element_at(t, c + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    val scored = joined.select(col("query_id"), col("nn_id"), dist.as("adc_dist"))
    val kept = if (excludeSelf) scored.filter(col("query_id") =!= col("nn_id")) else scored
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("nn_id"))
    kept.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank").cast("long").as("rk"),
        round(col("adc_dist"), 6).as("adc_dist"))
  }
}
