package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM-data pipelines (SURVEY §2.3 L1–L4).
  *
  * Scale design: every variant is map-side signature computation followed
  * by a shuffle on a *bucket key* (LSH band hash or simhash chunk), never
  * an N² cross join. Candidate pairs are verified with the exact metric
  * before being reported, so precision is exact and recall is the LSH
  * schedule's. At 100 TB: signatures add O(1) per row in the scan stage;
  * the bucket shuffle carries b rows per doc (b = #bands), linear in N.
  *
  * Performance note: higher-order functions (transform/aggregate) are
  * interpreted, not codegen'd, and get no common-subexpression
  * elimination — so every pipeline materializes word/hash arrays ONCE in
  * intermediate columns instead of re-deriving them inside each lambda.
  */
object Dedup {

  // ---- shingling -------------------------------------------------------

  /** Distinct n-word shingles from a pre-split word array; documents
    * shorter than n words yield their whole text as one shingle. */
  def shinglesFromWords(words: Column, n: Int = 3): Column =
    when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))

  /** Convenience: shingles straight from a text expression. */
  def shingleExpr(textExpr: String, n: Int = 3): Column =
    shinglesFromWords(split(lower(expr(textExpr)), " "), n)

  /** doc_id + shingle array, word split materialized once. */
  private def withShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("__w"))
      .select(col("id"), shinglesFromWords(col("__w")).as("sh"))

  /** (id, sh) with sh the SORTED xxhash64 shingle hashes — the
    * verification-ready form: [[verifyJaccardPairs]] consumes it, and a
    * persistent near-dup index stores it so verification joins the
    * index instead of re-reading corpus text (the T10 near-dup sink). */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withShingles(docs, idCol, textCol)
      .select(col("id"), sort_array(transform(col("sh"), s => xxhash64(s))).as("sh"))

  /** Exact-jaccard verification of LSH candidate pairs: joins each
    * side's sorted shingle hashes (co-keyed on the pair ids — cost ∝
    * candidates, never corpus²) and keeps pairs at/above `threshold`
    * with their exact jaccard. */
  def verifyJaccardPairs(cand: DataFrame, leftIdCol: String, rightIdCol: String,
                         left: DataFrame, right: DataFrame,
                         threshold: Double): DataFrame =
    cand
      .join(left.as("ba"), col(leftIdCol) === col("ba.id"))
      .join(right.as("ca"), col(rightIdCol) === col("ca.id"))
      .select(col(leftIdCol), col(rightIdCol),
        graft.functions.HashExprs.sortedIntersectCount(col("ba.sh"), col("ca.sh")).as("__i"),
        size(col("ba.sh")).as("__na"), size(col("ca.sh")).as("__nb"))
      .select(col(leftIdCol), col(rightIdCol),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Exact Jaccard given a precomputed intersection size. */
  private def jaccardFromInter(inter: Column, a: Column, b: Column): Column =
    inter / (size(a) + size(b) - inter)

  /** Exact Jaccard between two distinct-element arrays (single intersect
    * via an intermediate column is preferred in hot paths). */
  def jaccard(a: Column, b: Column): Column =
    jaccardFromInter(size(array_intersect(a, b)), a, b)

  // ---- exact dedup (L1) ------------------------------------------------

  /** Exact dedup groups by normalized-content fingerprint: keeper (min
    * id) + copy count per distinct content. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Boilerplate/template clusters (SURVEY §2.3 L30): documents that
    * share their first `k` words — the prefix-fingerprint pass web
    * pipelines run to catch templated pages (licence headers, scraper
    * banners, form letters) that full-document hashing misses because
    * the tails differ. Map-side prefix key + ONE hash groupBy, linear
    * at any corpus size; emits only clusters of >= 2 docs with the
    * lowest doc id as the keeper. Real deployments set k ~ 8-32; the
    * synthetic battery query uses a small k so the grouped path is
    * actually exercised. */
  def prefixClusters(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"prefix length must be >= 1, got $k")
    docs
      .select(col(idCol).as("__pid"),
        array_join(slice(TextAnalysis.words(col(textCol)), 1, k), " ").as("prefix"))
      // null text propagates to a null prefix; without this filter two
      // null-text docs would group into a spurious "boilerplate" cluster
      .filter(col("prefix").isNotNull)
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), min(col("__pid")).as("keeper_id"))
      .filter(col("n_docs") >= 2)
  }

  // ---- MinHash + LSH (L2) ----------------------------------------------

  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** 64-permutation MinHash signature from a materialized shingle-hash
    * array — native codegen expression (graft.functions.MinHashSig):
    * all 64 permutations in one primitive pass using seeded murmur
    * finalizer mixing. */
  def minhashSignatureFromHashes(hashes: Column): Column =
    graft.functions.HashExprs.minhashSig(hashes)

  /** (band, bandHash) rows per document: b bands of r contiguous
    * signature slots, hashed together. The LSH shuffle key. */
  def bandedSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBands: Int = NumBands): DataFrame = {
    val withSig = withShingles(docs, idCol, textCol)
      .select(col("id").as("doc_id"), transform(col("sh"), s => xxhash64(s)).as("__h"))
      .select(col("doc_id"), minhashSignatureFromHashes(col("__h")).as("sig"))
    withSig.select(col("doc_id"), explode(array(bandStructs(col("sig"), numBands): _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** The `numBands` bands of contiguous signature slots as struct
    * columns — shared by every LSH banding path. The band count is THE
    * recall/cost knob at 100 TB: more bands → higher recall at lower
    * jaccard and more candidate pairs (recall at similarity s is
    * 1-(1-s^r)^b with r = 64/b rows per band). */
  private def bandStructs(sig: Column, numBands: Int): Seq[Column] = {
    require(numBands > 0 && NumHashes % numBands == 0,
      s"numBands must divide $NumHashes, got $numBands")
    val rows = NumHashes / numBands
    (0 until numBands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((0 until rows).map(i => sig.getItem(j * rows + i)): _*)
          .as("band_hash"))
    }
  }

  /** Adversarial-skew guard for bucketed candidate generation: a bucket
    * self-join is quadratic in bucket width, so a pathological corpus
    * (10k byte-identical docs that skipped exact dedup) turns one
    * (band, band_hash) bucket into ~50M candidate pairs per band.
    * Buckets at or under `maxBucketWidth` keep the exact all-pairs join;
    * wider buckets degrade to a STAR against the bucket's min-id
    * representative — linear in width, and every member still links into
    * the duplicate group through the representative (transitive closure
    * downstream recovers the group; mass-duplicate clusters are exactly
    * the case where per-pair edges are redundant). Width + representative
    * ride the same shuffle key as the join, so AQE/ReuseExchange keeps
    * this one exchange. */
  private[ops] def boundedBucketPairs(
      bucketed: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      maxBucketWidth: Int): DataFrame = {
    require(maxBucketWidth >= 2, s"maxBucketWidth must be >= 2, got $maxBucketWidth")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val withW = bucketed
      .withColumn("__width", count(lit(1)).over(w))
      .withColumn("__rep", min(col(idCol)).over(w))
    val narrow = withW.filter(col("__width") <= maxBucketWidth)
      .select((keyCols :+ idCol).map(col): _*)
    val narrowPairs = narrow.as("l")
      .join(narrow.as("r"),
        keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"))
    val widePairs = withW
      .filter(col("__width") > maxBucketWidth && col(idCol) =!= col("__rep"))
      .select(col("__rep").as("doc_a"), col(idCol).as("doc_b"))
    narrowPairs.union(widePairs).distinct()
  }

  /** Default per-bucket width above which candidate generation degrades
    * to star pairing — comfortably above any width an honest LSH
    * schedule produces, far below quadratic blowup. */
  val MaxBucketWidth = 256

  /** Candidate pairs (docA < docB) sharing at least one LSH band, then
    * verified with exact shingle Jaccard ≥ `threshold`. Pairs are
    * deduplicated BEFORE shingle arrays are joined back, so the banded
    * shuffle carries ids only; pathologically wide buckets are
    * star-paired (see [[boundedBucketPairs]]).
    *
    * r17: the shingle pipeline (split → hash → sort) feeds THREE plan
    * consumers — the band derivation and both sides of the verify join
    * — and as a pure map-side subtree Spark recomputed it per consumer
    * (three tokenize+hash corpus passes). An id-hash exchange pinned
    * under it lets ReuseExchange compute it ONCE and replay the
    * shuffle files (the [[ngramJaccardSearchLsh]] treatment); the
    * minhash signature derives from the sorted hash array, which is
    * the same multiset, so every band hash is bit-identical. */
  def minhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      numBands: Int = NumBands,
      maxBucketWidth: Int = MaxBucketWidth): DataFrame = {
    val sh = shingleHashes(docs, idCol, textCol).repartition(col("id"))
    val banded = sh
      .select(col("id").as("doc_id"), minhashSignatureFromHashes(col("sh")).as("sig"))
      .select(col("doc_id"), explode(array(bandStructs(col("sig"), numBands): _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
    val pairs = boundedBucketPairs(banded, Seq("band", "band_hash"), "doc_id", maxBucketWidth)
    pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.id"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.HashExprs.sortedIntersectCount(col("sa.sh"), col("sb.sh")).as("__i"),
        size(col("sa.sh")).as("__na"), size(col("sb.sh")).as("__nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental ingest dedup, exact form (SURVEY §2.3 L36): annotate
    * each NEW document with the corpus document it exactly duplicates
    * (normalized-fingerprint match, lowest corpus id wins), or null when
    * novel. This is the realistic ingest shape: the corpus side reduces
    * to a (fingerprint → keeper id) index — exactly [[exactGroups]]'
    * output, maintainable incrementally as batches commit — and the
    * per-batch cost is ONE join of the (small) batch against it. At
    * 100 TB the index is ~fingerprint-count rows, not corpus bytes. */
  def exactAgainstCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val idx = corpus
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("dup_of"))
    batch
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .join(idx, Seq("fingerprint"), "left")
      .select(col(idCol), col("dup_of"), col("dup_of").isNotNull.as("is_dup"))
  }

  /** Incremental ingest dedup, near-dup form (L36): each new document's
    * BEST corpus near-match (jaccard ≥ threshold on word shingles), or
    * absent when novel. Candidates come from joining the batch's LSH
    * bands against the corpus's bands — the corpus banding is the
    * persistable index half; the batch side is small, so the band join
    * probes rather than self-joins (cost ∝ batch × bucket width, linear
    * in corpus size). Candidates are exact-verified, then one bounded
    * per-batch-doc window picks the highest-jaccard (ties: lowest id)
    * match. */
  def nearDupAgainstCorpus(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numBands: Int = NumBands): DataFrame = {
    // r17: each side's shingle pipeline feeds its band derivation AND
    // its verify-join side; the pinned id-hash exchange makes it ONE
    // tokenize+hash pass per side via ReuseExchange (the
    // [[ngramJaccardSearchLsh]] treatment — see minhashDuplicates)
    val shC = shingleHashes(corpus, idCol, textCol).repartition(col("id"))
    val shB = shingleHashes(batch, idCol, textCol).repartition(col("id"))
    def bands(sh: DataFrame, name: String): DataFrame = sh
      .select(col("id").as(name), minhashSignatureFromHashes(col("sh")).as("sig"))
      .select(col(name), explode(array(bandStructs(col("sig"), numBands): _*)).as("b"))
      .select(col(name), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
    val cand = bands(shB, "batch_id").join(bands(shC, "corpus_id"), Seq("band", "band_hash"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    val verified = verifyJaccardPairs(cand, "batch_id", "corpus_id",
      shB, shC, threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("batch_id"))
      .orderBy(col("jaccard").desc, col("corpus_id").asc)
    verified
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("batch_id"), col("corpus_id").as("dup_of"), col("jaccard"))
  }

  /** Duplicate-CLUSTER resolution: connected components over a near-dup
    * pair list, labeling every member with its cluster's min id — the
    * step that turns pairwise dedup output into one canonical keeper per
    * group (transitive closure, so A~B~C collapses even when A~C was
    * never verified).
    *
    * Spark-first mechanics: min-label propagation to fixpoint. Each
    * iteration is one join + one groupBy (shuffles on id), lineage is
    * truncated via eager localCheckpoint, and the loop ends when no
    * label changes. Iterations = cluster diameter; near-dup clusters are
    * near-cliques (diameter 2-3) and the star-paired mass clusters from
    * [[boundedBucketPairs]] have diameter exactly 2, so the loop is a
    * handful of passes even at 100 TB — the same shape GraphX's
    * connected components runs. */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var ckpt = labels
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "u").withColumnRenamed("label", "ulabel"), "u")
        .groupBy(col("v").as("id"))
        .agg(min(col("ulabel")).as("nlabel"))
      // r17: ONE job per iteration instead of two-plus-a-join — the old
      // label rides the row (no re-join to detect change), the checkpoint
      // is lazy, and the convergence count is the action that both
      // materializes every checkpoint partition (it aggregates over all
      // of them) and returns the changed-row count
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          col("label").as("__old"))
        .localCheckpoint(false)
      val changed = updated
        .agg(count(when(col("label") =!= col("__old"), 1)))
        .collect()(0).getLong(0)
      // `updated` is fully materialized (the convergence aggregate visited
      // every partition): the superseded generation's blocks release now,
      // so storage holds two label tables at any moment, not one per
      // iteration
      ckpt.unpersist()
      ckpt = updated
      labels = updated.select(col("id"), col("label"))
      converged = changed == 0
      iter += 1
    }
    // partially-propagated labels split one true component into several —
    // fail loudly instead of returning silently wrong clusters
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters did not converge in $maxIters iterations " +
        "(component diameter exceeds maxIters); raise maxIters")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_root"))
  }

  // ---- SimHash (L3) ----------------------------------------------------

  /** (doc_id, simhash): 64-bit SimHash of the word multiset — per-word
    * xxhash64 votes ±1 on each bit position, sign vector packs into a
    * bigint. Native codegen expression (graft.functions.SimHash64). */
  def simhashDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"transform(split(lower($textCol), ' '), w -> xxhash64(w))").as("__wh"))
      .select(col("doc_id"), graft.functions.HashExprs.simhash64(col("__wh")).as("simhash"))

  /** Standalone simhash of a text expression (spec/verification use). */
  def simhash(textExpr: String): Column =
    graft.functions.HashExprs.simhash64(
      expr(s"transform(split(lower($textExpr), ' '), w -> xxhash64(w))"))

  /** SimHash near-dup pairs: bucket by (maxHamming+1) bit chunks
    * (pigeonhole: a pair differing in ≤ maxHamming bits must agree on at
    * least one chunk — completeness holds for ANY partition of the 64
    * bits into maxHamming+1 pieces), verify with exact popcount distance
    * ≤ `maxHamming`. The default 3 gives the classic 4×16-bit split. */
  def simhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketWidth: Int = MaxBucketWidth): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming in [0,63], got $maxHamming")
    // r17: the simhash (split → per-word hash → bit votes) feeds the
    // chunk derivation and both verify-join sides; pin an id-hash
    // exchange under it so ReuseExchange computes it once (8 bytes per
    // doc through the shuffle) instead of re-tokenizing per consumer
    val withSim = simhashDf(docs, idCol, textCol).repartition(col("doc_id"))
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    val chunks = (0 until nChunks).map { c =>
      val lo = bounds(c)
      val w = bounds(c + 1) - lo
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("chunk_val"))
    }
    val bucketed = withSim
      .select(col("doc_id"), explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("c.chunk").as("chunk"), col("c.chunk_val").as("chunk_val"))
    // id-only candidate dedup BEFORE the 64-bit signatures re-attach,
    // with the same wide-bucket star guard as the minhash path (a mass
    // clone cluster collapses every chunk bucket onto one value)
    val pairs = boundedBucketPairs(bucketed, Seq("chunk", "chunk_val"), "doc_id", maxBucketWidth)
    pairs
      .join(withSim.as("a"), col("doc_a") === col("a.doc_id"))
      .join(withSim.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- bounded exact n-gram Jaccard (L4) -------------------------------

  /** Exact shingle-Jaccard of a bounded query set against the corpus —
    * the oracle-checkable baseline for the LSH paths. The query side is
    * broadcast; cost is |queries|·N, not N². */
  def ngramJaccardSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryPred: Column,
      threshold: Double): DataFrame = {
    // intersect 64-bit shingle hashes, not strings: same set sizes modulo
    // a ~1e-10 collision chance, and the |Q|·N intersections are the
    // whole cost of this baseline. Corpus filter is on WORD count (>= n
    // words → at least one true n-gram), matching the SQL oracle's
    // len(words) >= 3 — not on shingle count, which would also exclude
    // 3-4-word docs the oracle keeps.
    val sh = docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("id"), shinglesFromWords(col("__w")).as("sh"))
      .select(col("id"), sort_array(transform(col("sh"), s => xxhash64(s))).as("sh"))
    val q = sh.filter(queryPred).as("q")
    broadcast(q)
      .join(sh.as("c"), col("q.id") < col("c.id"))
      .select(col("q.id").as("doc_a"), col("c.id").as("doc_b"),
        graft.functions.HashExprs.sortedIntersectCount(col("q.sh"), col("c.sh")).as("__i"),
        size(col("q.sh")).as("__na"), size(col("c.sh")).as("__nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The scale path for the same search: LSH band candidates instead of
    * the |Q|·N cross — query-side bands join corpus bands on (band,
    * band_hash), candidate ids dedup BEFORE shingle arrays attach, exact
    * Jaccard verifies. Precision is exact; recall is the band schedule's
    * (high-similarity pairs near-certain, low-similarity pairs mostly
    * unprobed — the documented trade vs [[ngramJaccardSearch]], whose
    * exact form remains the oracle gate). Cost is linear in N plus
    * verified candidates, so this is the formulation that survives 100 TB.
    * `queryPred` is over column `id`, as in the exact variant. */
  def ngramJaccardSearchLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryPred: Column,
      threshold: Double,
      numBands: Int = NumBands): DataFrame = {
    // the shingle pipeline (split → hash → sort) feeds THREE consumers:
    // the band derivation and both sides of the verify join. As a pure
    // map-side plan Spark recomputes it per consumer (3 corpus scans);
    // pinning an id-hash exchange under it lets ReuseExchange compute it
    // ONCE and replay the shuffle files for the other two — one extra
    // shuffle of (id, shingle-array) rows buys back two full
    // tokenize+hash passes, the dominant cost at corpus scale
    val sh = docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("id"), shinglesFromWords(col("__w")).as("sh"))
      .select(col("id"), sort_array(transform(col("sh"), s => xxhash64(s))).as("sh"))
      .repartition(col("id"))
    val banded = sh
      .select(col("id"), minhashSignatureFromHashes(col("sh")).as("sig"))
      .select(col("id"), explode(array(bandStructs(col("sig"), numBands): _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
    val pairs = banded.filter(queryPred).as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.id"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.HashExprs.sortedIntersectCount(col("sa.sh"), col("sb.sh")).as("__i"),
        size(col("sa.sh")).as("__na"), size(col("sb.sh")).as("__nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
