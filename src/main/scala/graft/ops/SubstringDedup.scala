package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-substring (span-level) deduplication — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better") exact
  * substring pass, re-expressed for a distributed engine: instead of a
  * global suffix array (inherently sequential, memory ∝ corpus), every
  * k-token sliding window becomes a (doc, pos, gram) row and a gram
  * that occurs in ≥2 distinct documents marks a duplicated span. That
  * is the classic Rabin–Karp/winnowing fingerprint formulation (MOSS) —
  * windows are linear in corpus tokens, the gram aggregation is one
  * shuffle, and everything else is per-document bounded work.
  *
  * Catches what document-level dedup (L1–L5) can't: boilerplate
  * headers, license blocks, quoted passages duplicated INSIDE otherwise
  * distinct documents — the dominant residual duplication in web
  * corpora after doc-level passes.
  *
  * Scale notes (100 TB contract):
  *  - gram cardinality ≈ corpus tokens; the scale path ships
  *    `xxhash64(gram)` (8 bytes) through the shuffle instead of the
  *    k-token string (~10k× fewer shuffle bytes at k=20); the string
  *    form is the engine-exact ORACLE gate, and `SubstringDedupSpec`
  *    pins hashed == string counts (a 64-bit collision at 1e12 windows
  *    is ~1e-7 — and a collision only ever over-marks one span).
  *  - per-gram stats are computed in TWO stages — groupBy(gram, doc)
  *    then groupBy(gram) — so a boilerplate gram present in a billion
  *    docs partial-aggregates map-side in both stages; the reducer for
  *    a hot gram sees ≤ #partitions rows, never #occurrences (the
  *    q_tfidf_topterms lesson from the r8 sweep).
  *  - the mark-back join on gram is skew-prone for hot grams; AQE
  *    skew-join splits it (same treatment as tfidf's df join).
  *
  * Reference scope: the reference engine has no substring dedup; §2.3
  * training-data surface beyond it.
  */
object SubstringDedup {

  /** One row per k-token sliding window: (idCol, pos, gram). Documents
    * shorter than k tokens contribute no rows. `hashed=true` emits the
    * native rolling-hash window (array<long>, gram strings NEVER
    * materialize — the Rabin–Karp scale path); the string form slices
    * zero-copy byte spans. Both are single-byte-scan codegen
    * expressions ([[graft.functions.TokenWindows]]) — the interpreted
    * `transform`+`slice`+`array_join` formulation cost ~7× the word
    * explode at sf0.1. */
  def windowGrams(docs: DataFrame, idCol: String, textCol: String,
                  k: Int, hashed: Boolean = false): DataFrame = {
    val win =
      if (hashed) graft.functions.TokenWindows.windowHashes(col(textCol), k)
      else graft.functions.TokenWindows.windowGrams(col(textCol), k)
    docs.select(col(idCol), posexplode(win).as(Seq("pos", "gram")))
  }

  /** Per-gram occurrence profile: (gram, owner = min doc id, n_docs).
    * Two-stage aggregation — see scale notes above. */
  private def gramOwners(grams: DataFrame, idCol: String): DataFrame =
    grams.groupBy(col("gram"), col(idCol)).agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("gram"))
      .agg(min(col(idCol)).as("owner"), count(lit(1)).as("n_docs"))

  /** Per-document duplicated-span stats: (idCol, n_windows,
    * n_dup_windows) where a window is duplicated iff its gram occurs in
    * ≥2 distinct documents. Engine-exact (integer counts only).
    *
    * Plan shape: ONE pass over the windows collapses them to
    * (gram, doc, count) — everything after operates on that aggregate,
    * so the dup-status join runs at gram-doc granularity (repeated
    * in-doc grams already collapsed) instead of re-shuffling every
    * window row against the per-gram table. */
  def markDuplicated(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, hashed: Boolean = false): DataFrame = {
    // eager localCheckpoint: the window explode + first aggregation is
    // the expensive subtree and feeds BOTH consumers below; Spark's
    // ReuseExchange can't unify them (the gram-builder lambda
    // canonicalizes per-instantiation), so materialize once — the
    // checkpointed set is gram-doc-granular (≤ one row per distinct
    // gram per doc), corpus-token-bounded like the dedup-component
    // frontier this pattern is borrowed from
    val perDocGram = windowGrams(docs, idCol, textCol, k, hashed)
      .groupBy(col("gram"), col(idCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nDocs = perDocGram.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
    // gram cardinality ≈ corpus tokens, but the post-aggregation size
    // ESTIMATE can land under the broadcast threshold — at 100× the
    // planner then broadcasts a ~90M-row table and OOMs the driver
    // (caught by the r9 sf10 re-probe). Pin the gram-keyed join to
    // sort-merge: never broadcastable by estimate, and AQE still
    // skew-splits hot grams
    perDocGram.join(nDocs.hint("merge"), Seq("gram"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(0L)).as("n_dup_windows"))
  }

  /** Span removal, Lee-et-al semantics with a deterministic keeper: for
    * every gram occurring in ≥2 docs, the min-id document OWNS it; in
    * every other document, all k tokens of every window carrying that
    * gram are cut. Owner documents keep their text verbatim unless a
    * span they carry is owned elsewhere. Returns (idCol, textCol) with
    * text rebuilt from the kept tokens (original order, single-space
    * joined; a fully-cut document yields the empty string).
    *
    * Plan shape: covered-token marking is explode(sequence(pos, pos+k-1))
    * → distinct (doc, tokpos) — linear in duplicated-span tokens; the
    * rebuild is one per-document sort of its own tokens (bounded by
    * document length, never a global order). */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            k: Int, hashed: Boolean = false): DataFrame = {
    // same shared-subtree materialization as markDuplicated: grams feed
    // both the owner aggregation and the cut join
    val grams = windowGrams(docs, idCol, textCol, k, hashed).localCheckpoint(true)
    val owners = gramOwners(grams, idCol)
    // same estimate hazard as markDuplicated: owners is gram-cardinality
    val cut = grams.join(owners.hint("merge"), Seq("gram"))
      .where(col("n_docs") >= 2 && col(idCol) =!= col("owner"))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + k - 1)).as("tokpos"))
      .distinct()
    val toks = docs.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("tokpos", "tok")))
    // cut is duplicated-TOKEN-sized (corpus-order in boilerplate-heavy
    // corpora) — same no-broadcast discipline
    toks.join(cut.hint("merge").withColumn("is_cut", lit(true)), Seq(idCol, "tokpos"), "left")
      .where(col("is_cut").isNull)
      .groupBy(col(idCol))
      .agg(array_join(transform(array_sort(collect_list(struct(col("tokpos"), col("tok")))),
        s => s.getField("tok")), " ").as(textCol))
      // fully-cut docs drop out of the grouped side; restore them empty
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .na.fill("", Seq(textCol))
  }
}
