package graft.queries

import graft.Tables
import graft.ops.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators (SURVEY §2.3 extension): the
  * composition layer a 100 TB corpus pipeline actually runs —
  * deterministic sampling, class rebalancing, vocabulary stats, and the
  * filter→dedup→sample cleaning chain. Everything is hash-deterministic
  * (never `rand()`), so runs are reproducible and oracle-checkable.
  */
object TrainPrep {

  /** Stable per-row bucket in [0,100): md5-hex prefix → int. Unlike
    * `rand(seed)`, identical across engines, partitionings and runs. */
  def hashBucket(idCol: Column): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 6), 16, 10).cast("bigint") % 100).cast("int")

  /** Deterministic ~30% sample of documents. */
  def qSampleHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < 30)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))

  /** Class-balanced subsample: exactly `perClass` docs per language,
    * chosen by hash order (deterministic "random"). */
  def qBalancedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(hashBucket(col("doc_id")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 40)
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  /** Corpus vocabulary: top-100 words by frequency (explode → count →
    * deterministic top-k). Scale: the explode is map-side; the count
    * shuffles one row per distinct word per partition (partial agg). */
  def qVocabTopK(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(100)

  /** The cleaned corpus after exact dedup: keep one doc (min id) per
    * distinct normalized content. ONE scan: the keeper is a min window
    * over the fingerprint partition (the keepers-then-join-back form
    * scans and fingerprints the corpus twice). */
  def qDedupKeep(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col("text")))
    Tables.documents(s, dir)
      .withColumn("__keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__keeper"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** End-to-end cleaning chain: length filter → stopword-ratio filter →
    * exact-dedup keeper → deterministic 50% sample. The shape every
    * LLM-corpus pipeline runs, as one declarative plan — and ONE scan:
    * the dedup keeper is a min window over the fingerprint partition
    * instead of a keepers-then-join-back self-join. */
  def qCleanPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val nWords = size(split(lower(col("text")), " ")).cast("long")
    val stopHits = TextAnalysis.stopwordHits("text", TextAnalysis.EnStop)
    val w = Window.partitionBy(TextAnalysis.fingerprint(col("text")))
    d.withColumn("n_words", nWords)
      .withColumn("stop_ratio", stopHits / nWords)
      .filter(col("n_words") >= 30 && col("stop_ratio") >= 0.01)
      .withColumn("__keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__keeper"))
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < 50)
      .select(col("doc_id"), col("lang"), col("n_words"), col("stop_ratio"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * packs (the context-window fill step before tokenizer sharding).
    * Docs pack contiguously by id WITHIN a hash bucket — packs need no
    * global order, so there is no global sort: the window partitions by
    * bucket (32k+ independent partitions at 100 TB), never by the whole
    * corpus. Pack id = bucket * 1e6 + (tokens-before / budget); output
    * is per-pack doc count and token load. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val d = Tables.documents(s, dir)
    val tok = size(split(trim(col("text")), "\\s+")).cast("long")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("doc_id"), (hashBucket(col("doc_id")) % 8).cast("int").as("bucket"),
        tok.as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      // bucket rides the high bits (2^40 pack slots per bucket ≈ 2.3e15
      // tokens) so pack ids can never collide across buckets at scale
      .select(
        (col("bucket").cast("long") * lit(1L << 40) +
          floor((col("cum") - col("tok")) / lit(budget.toDouble)).cast("long")).as("pack_id"),
        col("tok"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("pack_tokens"))
  }

  /** Test-set decontamination: corpus docs sharing >= 5 distinct 3-gram
    * shingles with a benchmark set (stand-in: doc_id < 25) are flagged
    * with their overlap count. The benchmark side is broadcast (eval
    * sets are small by nature); the corpus side explodes shingles
    * map-side — one broadcast join, no shuffle of the corpus. At real
    * scale the shingles would be hashed (see Dedup); strings keep this
    * form oracle-comparable. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val sh = d
      .select(col("doc_id"), split(lower(col("text")), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shinglesFromWords(col("__w"))).as("sh"))
    val bench = sh.filter(col("doc_id") < 25).select(col("sh")).distinct()
    sh.filter(col("doc_id") >= 25)
      .join(broadcast(bench), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
      .filter(col("n_shared") >= 5)
  }

  /** Weighted mixture sampling: per-language keep rates (the dataset
    * mixing step that composes a training corpus from sources at set
    * proportions), hash-deterministic so the mix is reproducible. */
  def qMixtureSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 100)
      .when(col("lang") === "fr", 50)
      .when(col("lang") === "es", 30)
      .when(col("lang") === "de", 20)
      .otherwise(10)
    Tables.documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Stratified train/val/test split: hash-deterministic 90/5/5
    * assignment, reported per (lang, split) with doc counts and token
    * loads — the reproducible split step before training. A row's split
    * never changes as the corpus grows (pure function of doc_id). */
  def qStratifiedSplit(s: SparkSession, dir: String): DataFrame = {
    val b = hashBucket(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("split",
        when(b < 90, "train").when(b < 95, "val").otherwise("test"))
      .withColumn("tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
  }

  /** Per-document key terms: top-3 words by a tf/df importance score
    * (integer-scaled, so cross-engine exact — the tf-idf family's
    * ordering without float logarithms). ONE token-stream scan: per-
    * (doc, term) tf, then document frequency as a groupBy over those
    * SAME rows (the tf exchange is reused, not a second corpus scan)
    * joined back on term, then the per-doc top-k window.
    *
    * df was previously a `count over (partition by term)` window —
    * WindowExec materializes whole partitions, and term partitions are
    * maximally skewed (every stopword lands in one partition, ~N_docs
    * rows), which went 162× at the 100× sweep. The agg+join form
    * collapses hot terms map-side (partial aggregation) and leaves the
    * residual term join to AQE's skew splitting — the per-doc window
    * that remains is bounded by document length, never corpus shape. */
  def qTfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // top-3 per doc WITHOUT a window: row_number over (score desc,
    // term) would sort whole partitions; the agg form collects each
    // doc's (≤ doc-length) candidates, sorts that bounded array, and
    // keeps 3 — same output, hash agg instead of a partition sort
    // (r9: the sort was ~25% of this query's scaled-battery wall)
    tf.join(df, "term")
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_list(struct((-col("score")).as("ns"),
        col("term"), col("score")))), 1, 3).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("doc_id"), col("t.term").as("term"),
        col("t.score").as("score"), (col("i") + 1).as("rk"))
  }

  /** Document chunking (SURVEY L26): split each doc into overlapping
    * fixed-width word windows (width 32, stride 24 → 8-word overlap) —
    * the context-window chunker RAG indexing and pretraining tokenizer
    * sharding run before embedding/packing. Pure map-side explode of a
    * `sequence` of chunk starts: zero shuffle, linear in tokens. */
  def qChunkDocs(s: SparkSession, dir: String): DataFrame = {
    val width = 32
    val stride = 24
    Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(1), col("n"), lit(stride))).as("s"))
      .select(
        col("doc_id"),
        expr(s"(s - 1) div $stride").cast("int").as("chunk_idx"),
        least(lit(width.toLong), (col("n") - col("s") + 1).cast("long")).as("n_tok"),
        element_at(col("ws"), col("s")).as("head_word"))
  }

  /** Collocation mining (SURVEY §2.3 L31): corpus-level bigram
    * association by lift — the PMI-family signal phrase-mining and
    * tokenizer-vocabulary work runs over a corpus ("new york" is a
    * unit; "the the" is noise). Lift = P(w1,w2)/(P(w1)·P(w2)) orders
    * identically to PMI (its log) without a transcendental, so the
    * derived double is three IEEE divisions and two multiplications in
    * a fixed order — bit-identical cross-engine. Scale: bigrams via a
    * map-side `zip_with` of two slices (zero shuffle to form pairs),
    * then two linear hash aggregations (pair counts, unigram counts)
    * and a join of pair counts against the vocabulary table — the
    * vocab side is ≪ corpus; totals are 1-row cross joins. Top-30 by
    * lift with lexicographic tiebreak keeps the result bounded. */
  def qBigramLift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(split(lower(col("text")), " ").as("ws"))
    val toks = docs.select(explode(col("ws")).as("w"))
    val uc = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = docs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), " +
          "(a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // totals derive from the ALREADY-AGGREGATED sides (vocab-sized, and
    // bc pre-filter), not fresh corpus scans: 2 corpus reads, not 4
    val n = uc.agg(sum(col("c")).as("n"))
    val np = bc.agg(sum(col("c12")).as("np"))
    bc.filter(col("c12") >= 10)
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(np))
      .withColumn("lift", round(
        (col("c12") / col("np").cast("double")) *
          (col("n") / col("c1").cast("double")) *
          (col("n") / col("c2").cast("double")), 6))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(30)
      .select(col("w1"), col("w2"), col("c12"), col("lift"))
  }

  // Memoized BPE model per dir (ONE corpus scan → word counts, then
  // the driver-side merge loop) — train is the one-time build, the
  // benched path is map-side ENCODE of the whole corpus.
  private val bpeModels = scala.collection.concurrent.TrieMap.empty[String, graft.ops.Bpe.BpeModel]
  private def bpeModelFor(s: SparkSession, dir: String): graft.ops.Bpe.BpeModel =
    bpeModels.getOrElseUpdate(dir,
      graft.ops.Bpe.train(
        graft.ops.Bpe.wordCounts(Tables.documents(s, dir), "text"),
        numMerges = 200, maxWords = 50000))

  /** BPE tokenization under a corpus-trained merge table (SURVEY §2.3
    * L40 — rows-only; the merge loop is not SQL-expressible, so the
    * correctness gates live in `BpeSpec`: textbook merge sequence,
    * greedy-encode rule, naive-trainer equivalence on random corpora).
    * Per-doc subword counts + compression vs whitespace tokens — the
    * token-budget accounting a pretraining mix is planned with. */
  def qBpeTokens(s: SparkSession, dir: String): DataFrame = {
    val model = bpeModelFor(s, dir)
    graft.ops.Bpe.encode(Tables.documents(s, dir), "doc_id", "text", model)
      .select(col("doc_id").cast("long").as("doc_id"), col("n_tokens").cast("long").as("n_subwords"))
  }

  /** Deterministic shuffle-shard export assignment (L41): the final step
    * of a training-data pipeline — give every document a pseudo-random
    * but fully REPRODUCIBLE position in a sharded export. A Lehmer-style
    * multiplicative hash over the id ((id mod M) * 48271 mod M,
    * M = 2^31-1) is the permutation: pure bigint arithmetic, so any
    * engine (and any rerun) replays it bit-for-bit, unlike `rand()` or
    * engine-specific hash builtins. Shard = hash mod nShards; position =
    * row_number within the shard by (hash, id). Scale: the only data
    * movement is the nShards-way hash shuffle and a per-shard sort —
    * there is never a global sort; the export writer form is
    * `.repartition(n, shard).sortWithinPartitions(hash, id)`. */
  def shuffleShard(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val m = lit(2147483647L)
    val h = ((col(idCol) % m) * lit(48271L)) % m
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs.select(col(idCol), h.as("__h"))
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  def qShuffleShard(s: SparkSession, dir: String): DataFrame =
    shuffleShard(Tables.documents(s, dir), "doc_id", 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shuffle_shard" -> (qShuffleShard _),
    "q_bpe_tokens" -> (qBpeTokens _),
    "q_bigram_lift" -> (qBigramLift _),
    "q_chunk_docs" -> (qChunkDocs _),
    "q_stratified_split" -> (qStratifiedSplit _),
    "q_tfidf_topterms" -> (qTfidfTopTerms _),
    "q_sample_hash" -> (qSampleHash _),
    "q_balanced_sample" -> (qBalancedSample _),
    "q_vocab_topk" -> (qVocabTopK _),
    "q_dedup_keep" -> (qDedupKeep _),
    "q_clean_pipeline" -> (qCleanPipeline _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_mixture_sample" -> (qMixtureSample _))

  private val bucketSql = (id: String) =>
    s"CAST(('0x' || substring(md5(CAST($id AS VARCHAR)), 1, 6))::BIGINT % 100 AS INT)"

  val oracles: Map[String, String] = Map(
    "q_shuffle_shard" ->
      """WITH h AS (
        |  SELECT doc_id, ((doc_id % 2147483647) * 48271) % 2147483647 AS hh
        |  FROM documents)
        |SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS INT) AS pos
        |FROM h""".stripMargin,
    "q_bigram_lift" ->
      """WITH d AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS w FROM d),
        |uc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM u),
        |bp AS (
        |  SELECT unnest(list_slice(ws, 1, len(ws) - 1)) AS w1,
        |    unnest(list_slice(ws, 2, len(ws))) AS w2
        |  FROM d WHERE len(ws) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bp GROUP BY 1, 2),
        |bt AS (SELECT COUNT(*) AS np FROM bp)
        |SELECT bc.w1, bc.w2, CAST(bc.c12 AS BIGINT) AS c12,
        |  ROUND((bc.c12 / CAST(bt.np AS DOUBLE)) * (tot.n / CAST(u1.c AS DOUBLE))
        |    * (tot.n / CAST(u2.c AS DOUBLE)), 6) AS lift
        |FROM bc
        |JOIN uc u1 ON bc.w1 = u1.w
        |JOIN uc u2 ON bc.w2 = u2.w
        |CROSS JOIN tot CROSS JOIN bt
        |WHERE bc.c12 >= 10
        |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin,
    "q_chunk_docs" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws,
        |    len(string_split(lower(text), ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ws, n, unnest(generate_series(1, n, 24)) AS s
        |  FROM w WHERE n >= 1)
        |SELECT doc_id,
        |  CAST((s - 1) // 24 AS INT) AS chunk_idx,
        |  CAST(least(32, n - s + 1) AS BIGINT) AS n_tok,
        |  ws[s] AS head_word
        |FROM c""".stripMargin,
    "q_stratified_split" ->
      s"""SELECT lang,
         |  CASE WHEN ${bucketSql("doc_id")} < 90 THEN 'train'
         |       WHEN ${bucketSql("doc_id")} < 95 THEN 'val'
         |       ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY 1, 2""".stripMargin,
    "q_tfidf_topterms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term, (tf.tf * 1000000) // df.df AS score,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY (tf.tf * 1000000) // df.df DESC, tf.term) AS rk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, CAST(score AS BIGINT) AS score, CAST(rk AS INT) AS rk
        |FROM s WHERE rk <= 3""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source, ${bucketSql("doc_id")} AS bucket
         |FROM documents
         |WHERE ${bucketSql("doc_id")} < 30""".stripMargin,
    "q_balanced_sample" ->
      s"""SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY ${bucketSql("doc_id")}, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= 40""".stripMargin,
    "q_vocab_topk" ->
      """SELECT w, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) t
        |GROUP BY w
        |ORDER BY n DESC, w
        |LIMIT 100""".stripMargin,
    "q_dedup_keep" ->
      """SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |JOIN (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) k
        |USING (doc_id)""".stripMargin,
    "q_clean_pipeline" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, text,
         |    len(string_split(lower(text), ' ')) AS n_words,
         |    len(list_filter(string_split(lower(text), ' '),
         |        w -> w IN ('the','and','of','to','a','in','is','that','it','for')))
         |      / len(string_split(lower(text), ' ')) AS stop_ratio
         |  FROM documents),
         |ff AS (SELECT * FROM f WHERE n_words >= 30 AND stop_ratio >= 0.01),
         |k AS (
         |  SELECT MIN(doc_id) AS doc_id FROM ff
         |  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         |SELECT ff.doc_id, ff.lang, ff.n_words, ff.stop_ratio
         |FROM ff JOIN k USING (doc_id)
         |WHERE ${bucketSql("ff.doc_id")} < 50""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
         |    ${bucketSql("doc_id")} % 8 AS bucket
         |  FROM documents),
         |c AS (
         |  SELECT bucket, tok,
         |    SUM(tok) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT CAST(bucket AS BIGINT) * 1099511627776 +
         |    CAST(FLOOR((cum - tok) / 2048.0) AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS pack_tokens
         |FROM c GROUP BY 1""".stripMargin,
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(string_split(lower(text), ' ')) - 2),
        |    i -> string_split(lower(text), ' ')[i] || ' ' ||
        |         string_split(lower(text), ' ')[i+1] || ' ' ||
        |         string_split(lower(text), ' ')[i+2]))) AS sh
        |  FROM documents
        |  WHERE len(string_split(lower(text), ' ')) >= 3),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25),
        |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 25)
        |SELECT c.doc_id, COUNT(*) AS n_shared
        |FROM corpus c JOIN bench b USING (sh)
        |GROUP BY 1 HAVING COUNT(*) >= 5""".stripMargin,
    "q_mixture_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${bucketSql("doc_id")} <
         |  CASE lang WHEN 'en' THEN 100 WHEN 'fr' THEN 50 WHEN 'es' THEN 30
         |    WHEN 'de' THEN 20 ELSE 10 END""".stripMargin)
}
