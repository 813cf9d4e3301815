package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2.3 L5–L7).
  *
  * Scale design: the brute-force path bounds cost to |queries|·N with a
  * broadcast query set (the baseline / recall oracle); the LSH path is
  * the 100 TB route — T independent random-hyperplane tables bucket the
  * corpus, queries multi-probe each table (bucket + single-bit flips),
  * and only candidates pay the exact-cosine verification. No N²
  * anywhere: corpus carries T bucket rows, queries T·(planes+1) probes.
  */
object Ann {

  val Dim = 64
  val NumPlanes = 8
  val NumTables = 4

  /** Fixed random hyperplanes (PRNG seed 7), memoized per (tables, bits)
    * geometry. The (NumTables, NumPlanes) instance is drawn in the exact
    * fill order the original fixed array used, so every default-path
    * bucket is bit-identical to before the geometry became adaptive. */
  private val planeCache =
    scala.collection.concurrent.TrieMap
      .empty[(Int, Int), IndexedSeq[IndexedSeq[IndexedSeq[Double]]]]
  private def planesFor(tables: Int, bits: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    planeCache.getOrElseUpdate((tables, bits), {
      val rnd = new scala.util.Random(7)
      IndexedSeq.fill(tables)(
        IndexedSeq.fill(bits)(IndexedSeq.fill(Dim)(rnd.nextGaussian())))
    })
  private def planes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    planesFor(NumTables, NumPlanes)

  /** Native codegen dot product (graft.functions.VecDot): identical
    * semantics to the zip_with+aggregate formulation (sequential double
    * accumulation) but compiled to a primitive loop — the HOF version is
    * interpreted and dominated every ANN profile. */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vecDot(a, b)

  def norm(a: Column): Column = graft.functions.VecFunctions.vecNorm(a)

  def cosine(a: Column, b: Column): Column = graft.functions.VecFunctions.vecCosine(a, b)

  /** Sign-bit bucket of `vec` in hash table `t`. */
  def lshBucket(vec: Column, t: Int): Column = lshBucket(vec, t, NumTables, NumPlanes)

  private def lshBucket(vec: Column, t: Int, tables: Int, nBits: Int): Column = {
    val bits = planesFor(tables, nBits)(t).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Corpus side: one (table, bucket) row per hash table. The bucket
    * array materializes as a column FIRST so each dot-product family is
    * computed once, not once per exploded struct. */
  private def withTableBuckets(
      df: DataFrame,
      vec: String,
      tables: Int = NumTables,
      nBits: Int = NumPlanes): DataFrame = {
    val withB = df.withColumn("__buckets",
      array((0 until tables).map(t => lshBucket(col(vec), t, tables, nBits)): _*))
    val entries = (0 until tables).map(t =>
      struct(lit(t).as("tbl"), col("__buckets").getItem(t).as("bucket")))
    withB.withColumn("tb", explode(array(entries: _*)))
      .withColumn("tbl", col("tb.tbl"))
      .withColumn("bucket", col("tb.bucket"))
      .drop("tb", "__buckets")
  }

  /** Query side: per table, the bucket plus all single-bit flips —
    * probes derive from the materialized bucket array (attribute refs),
    * so the hyperplane dots never re-evaluate per probe. */
  private def withTableProbes(df: DataFrame, vec: String): DataFrame = {
    val withB = df.withColumn("__buckets",
      array((0 until NumTables).map(t => lshBucket(col(vec), t)): _*))
    val entries = (0 until NumTables).flatMap { t =>
      val b = col("__buckets").getItem(t)
      struct(lit(t).as("tbl"), b.as("probe")) +:
        (0 until NumPlanes).map(i =>
          struct(lit(t).as("tbl"), b.bitwiseXOR(lit(1 << i)).as("probe")))
    }
    withB.withColumn("tp", explode(array(entries: _*)))
      .withColumn("tbl", col("tp.tbl"))
      .withColumn("probe", col("tp.probe"))
      .drop("tp", "__buckets")
  }

  /** Exact top-k by cosine for a bounded broadcast query set — the
    * baseline every approximate path is measured against (L6). */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val q = corpus.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .filter(queryPred)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    broadcast(q)
      .join(c, col("query_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nn_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
  }

  /** Multi-table multi-probe LSH top-k (L7): candidates from any table's
    * probed buckets, ranked by exact cosine. Recall comes from the table
    * count × probe schedule; precision is exact. */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int = 5): DataFrame = {
    val c = withTableBuckets(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec")), "nn_vec")
      .withColumnRenamed("tbl", "c_tbl")
      .withColumnRenamed("bucket", "c_bucket")
    val q = withTableProbes(
      corpus.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
        .filter(queryPred), "q_vec")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    // dedupe candidate id pairs BEFORE vectors are attached: the distinct
    // shuffles two longs per candidate, not two 64-float arrays
    val candidates = broadcast(q.drop("q_vec"))
      .join(c.drop("nn_vec"),
        col("tbl") === col("c_tbl") && col("probe") === col("c_bucket") &&
          col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"))
      .distinct()
    val qv = corpus.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")).filter(queryPred)
    val cv = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    candidates
      .join(broadcast(qv), "query_id")
      .join(cv, "nn_id")
      .withColumn("cos", cosine(col("q_vec"), col("nn_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
  }

  /** IVF top-k (the second scale path next to [[lshTopK]]): an
    * inverted-file index over coarse cells. The cell model is `nCells`
    * hash-chosen corpus vectors, L2-normalized driver-side (a bounded
    * nCells × Dim model, materialized like any fitted model and embedded
    * as literals — NOT a data-sized collect; k-means centroids would
    * tighten the cells but change nothing structurally). Every corpus
    * vector maps to its max-dot cell map-side; queries probe their
    * `nProbe` best cells; only probed cells' members pay the exact
    * cosine. Cost: one shuffle on cell id, candidates ≈ (nProbe/nCells)·N
    * per query — the classic recall/cost dial. Precision is exact
    * (candidates are ranked by true cosine). */
  /** Materialized IVF index: per-row coarse-cell assignment
    * (`nn_id, nn_vec, cell`) plus the unit-normalized centroid model.
    * Build once per corpus version, search many times — at 100 TB the
    * assignment is a persisted table next to the data, exactly like the
    * snapshot catalog's manifests. */
  final case class IvfIndex(assigned: DataFrame, centroids: Seq[Seq[Double]])

  private def ivfCellScores(cents: Seq[Seq[Double]], vec: Column): Seq[Column] =
    cents.zipWithIndex.map { case (cv, i) =>
      struct(dot(vec, array(cv.map(lit): _*)).as("score"), lit(i).as("cell"))
    }

  /** The centroid-bootstrap query, factored out so its PLAN is a spec
    * contract (`AnnSpec`): `orderBy(md5).limit(nCells)` must execute as
    * `TakeOrderedAndProject` — a per-partition top-k heap merged on the
    * driver, cost O(N) scan + O(nCells) result — never a global sort.
    * A Spark upgrade that regressed this to Exchange+Sort would turn
    * the bootstrap into the most expensive stage at 100 TB. */
  private[ops] def ivfCentroidQuery(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int): DataFrame =
    corpus
      .select(col(idCol).cast("string").as("cid"), col(vecCol).as("cvec"))
      .orderBy(md5(col("cid")), col("cid"))
      .limit(nCells)

  /** Build the IVF index: `nCells` hash-chosen corpus vectors become
    * unit-normalized centroids (argmax cosine == argmax dot, so cell
    * assignment is nCells codegen'd dots per row, no norms). */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 32): IvfIndex = {
    val base = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val centRows = ivfCentroidQuery(corpus, idCol, vecCol, nCells).collect()
    val cents = centRows.map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
      v.map(_ / n)
    }.toSeq
    val assigned = base.withColumn("cell",
      array_max(array(ivfCellScores(cents, col("nn_vec")): _*)).getField("cell"))
    IvfIndex(assigned, cents)
  }

  /** Search a prebuilt [[IvfIndex]]: queries probe their `nProbe` best
    * cells; only probed cells' members pay the exact cosine. Candidates
    * ≈ (nProbe/nCells)·N per query — the recall/cost dial. Precision is
    * exact (candidates rank by true cosine). */
  def ivfSearch(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4,
      excludeSelf: Boolean = false): DataFrame = {
    val nCells = index.centroids.size
    require(nProbe >= 1 && nProbe <= nCells, s"nProbe in [1,$nCells], got $nProbe")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val qp = q.select(col("query_id"),
      explode(transform(
        slice(reverse(array_sort(array(ivfCellScores(index.centroids, col("q_vec")): _*))),
          1, nProbe),
        s => s.getField("cell"))).as("cell"))
    // candidate ids dedupe BEFORE vectors re-attach, as everywhere else.
    // excludeSelf only makes sense when queries ARE corpus rows (see
    // ivfTopK); external query ids must not suppress same-id corpus hits
    val candidates0 = broadcast(qp)
      .join(index.assigned.drop("nn_vec"), Seq("cell"))
    val candidates =
      (if (excludeSelf) candidates0.filter(col("query_id") =!= col("nn_id")) else candidates0)
        .select(col("query_id"), col("nn_id"))
        .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(index.assigned.select(col("nn_id"), col("nn_vec")), "nn_id")
      .withColumn("cos", cosine(col("q_vec"), col("nn_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
  }

  /** One-shot convenience: build + search in a single call. */
  def ivfTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int = 5,
      nCells: Int = 32,
      nProbe: Int = 4): DataFrame = {
    val index = ivfIndex(corpus, idCol, vecCol, nCells)
    val q = corpus.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .filter(queryPred)
    ivfSearch(index, q, "query_id", "q_vec", k, nProbe, excludeSelf = true)
  }

  /** Embedding near-dup pairs (L5): multi-table same-bucket candidates
    * verified at exact cosine ≥ `threshold`.
    *
    * SCALE: the same-bucket SELF-join is quadratic per bucket, so fixed
    * bucket bits are a time bomb — 2^8 buckets over N vectors cost
    * N²/256 comparisons no matter how big N gets (the sf10 sweep
    * measured exactly that blowup). Bits are therefore sized to the
    * corpus for a target expected bucket width W: buckets ≈ N/W keeps
    * candidates ≈ tables·N·W/2 — LINEAR in N. Finer buckets lower
    * per-table recall for a fixed pair, so every 2 extra bits add a
    * table (the standard LSH recall repair; table cost is linear).
    * The one count() action prices the geometry, like any ANN index
    * build. */
  def cosineNearDup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      targetBucketWidth: Int = 32): DataFrame = {
    // same-bucket only (no bit-flip probes): for true near-dups
    // (cos→1) independent tables already give ~90% recall, and the
    // probe fan-out would multiply candidates 9x for marginal gain
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val n = base.count()
    val nBits = math.min(24, math.max(NumPlanes,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketWidth)) / math.log(2.0)).toInt))
    val tables = NumTables + math.max(0, (nBits - NumPlanes) / 2)
    val bucketed = withTableBuckets(base, "vec", tables, nBits).drop("vec")
    val pairs = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    pairs
      .join(base.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
