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
  */
object Dedup {

  // ---- shingling -------------------------------------------------------

  /** Distinct n-word shingles of lowercase space-split text; documents
    * shorter than n words yield their whole text as one shingle. */
  def shingleExpr(textExpr: String, n: Int = 3): Column = expr(
    s"""CASE WHEN size(split(lower($textExpr), ' ')) < $n
       |  THEN array(concat_ws(' ', split(lower($textExpr), ' ')))
       |  ELSE array_distinct(transform(
       |    sequence(0, size(split(lower($textExpr), ' ')) - $n),
       |    i -> concat_ws(' ', slice(split(lower($textExpr), ' '), i + 1, $n))))
       |END""".stripMargin)

  /** Exact Jaccard between two distinct-element arrays:
    * |∩| / (|a| + |b| − |∩|), one integer-fed double division. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  // ---- exact dedup (L1) ------------------------------------------------

  /** Exact dedup groups by normalized-content fingerprint: keeper (min
    * id) + copy count per distinct content. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ---- MinHash + LSH (L2) ----------------------------------------------

  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** 64-permutation MinHash signature of a shingle array column: the
    * k-th permutation is min over shingles of xxhash64(k, xxhash64(s)) —
    * seeded re-hash rather than multiply-shift, because wrapping 64-bit
    * arithmetic trips Spark 4's ANSI overflow check. Pure expression —
    * no UDF, stays inside codegen. */
  def minhashSignature(shingles: Column): Column = {
    val hashes = transform(shingles, s => xxhash64(s))
    val sigs = (0 until NumHashes).map { k =>
      array_min(transform(hashes, x => xxhash64(lit(k), x)))
    }
    array(sigs: _*)
  }

  /** (band, bandHash) rows per document: b bands of r contiguous
    * signature slots, hashed together. The LSH shuffle key. */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("doc_id"), shingleExpr(textCol).as("sh"))
      .withColumn("sig", minhashSignature(col("sh")))
    val bands = (0 until NumBands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((0 until RowsPerBand).map(i => col("sig").getItem(j * RowsPerBand + i)): _*)
          .as("band_hash"))
    }
    withSig.select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** Candidate pairs (docA < docB) sharing at least one LSH band, then
    * verified with exact shingle Jaccard ≥ `threshold`. The join back to
    * shingle arrays keeps the banded shuffle narrow (ids only). */
  def minhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val banded = bandedSignatures(docs, idCol, textCol)
    val pairs = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sh = docs.select(col(idCol).as("id"), shingleExpr(textCol).as("sh"))
    pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash (L3) ----------------------------------------------------

  /** 64-bit SimHash of the word multiset: per-word xxhash64, each bit
    * votes ±1, sign of the vote vector packs into a bigint. */
  def simhash(textExpr: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 63), CAST(0 AS BIGINT),
       |  (acc, k) -> acc + IF(
       |    aggregate(
       |      transform(split(lower($textExpr), ' '), w -> xxhash64(w)),
       |      CAST(0 AS BIGINT),
       |      (s, h) -> s + IF(((h >> k) & 1) = 1, 1, -1)) > 0,
       |    shiftleft(CAST(1 AS BIGINT), k), CAST(0 AS BIGINT)))""".stripMargin)

  /** SimHash near-dup pairs: bucket by 4×16-bit chunks (pigeonhole: any
    * pair with hamming ≤ 3 shares a chunk; most planted near-dups share
    * several), verify with exact popcount distance ≤ `maxHamming`. */
  def simhashDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val withSim = docs.select(col(idCol).as("doc_id"), simhash(textCol).as("simhash"))
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xFFFFL)).as("chunk_val")))
    val bucketed = withSim
      .select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk").as("chunk"), col("c.chunk_val").as("chunk_val"))
    bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.chunk") === col("r.chunk") &&
        col("l.chunk_val") === col("r.chunk_val") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
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
    val sh = docs.select(col(idCol).as("id"), shingleExpr(textCol).as("sh"))
      .filter(size(col("sh")) >= 3)
    val q = sh.filter(queryPred).as("q")
    broadcast(q)
      .join(sh.as("c"), col("q.id") < col("c.id"))
      .select(col("q.id").as("doc_a"), col("c.id").as("doc_b"),
        jaccard(col("q.sh"), col("c.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
