package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering (SURVEY §2.3 L44).
  *
  * The CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data") filters web text
  * by LM perplexity; at corpus scale the practical model is the
  * distributed count-based n-gram LM with STUPID BACKOFF of Brants et
  * al. 2007 ("Large Language Models in Machine Translation"):
  * S(w|v) = c(v,w)/c(v) when the bigram was seen, else α·c(w)/N — an
  * unnormalized score that needs only count tables, no discounting
  * pass, which is exactly what keeps training to ONE corpus scan.
  *
  * Reference scope: the reference engine has no text-quality surface
  * at all — this is a beyond-reference training-pipeline operator.
  *
  * Scale shape:
  * - `train` is one scan → two hash aggregations; outputs are
  *   vocabulary- and bigram-vocabulary-sized (Zipf ≪ corpus), and the
  *   unigram table partial-aggregates map-side so a billion "the"
  *   tokens reach the reducer as ≤ #partitions rows.
  * - `score` forms bigram rows map-side from the token array (an
  *   array-lambda transform — no self-join, no window) and resolves
  *   counts with co-keyed joins against the model tables. The model
  *   side holds ONE row per key, so probe-side frequency skew is
  *   harmless hash-probe traffic; Spark's threshold/AQE decides
  *   broadcast-vs-shuffle from the model's actual size (a 100 TB-corpus
  *   vocabulary outgrows a broadcast; the plan flips on its own).
  * - the corpus-total token count rides a one-row broadcast, the same
  *   scalar-subquery shape as the battery's threshold queries.
  */
object LmScore {

  /** Count tables of a bigram LM: `unigrams(t1, u_cnt)`,
    * `bigrams(t1, t2, b_cnt)`. Plain DataFrames — persistable through
    * the catalog like any table, so a model trained once can score
    * many batches (the CCNet deployment shape). */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame)

  private def words(textCol: String): Column = split(lower(col(textCol)), " ")

  /** Map-side (t1, t2) bigram rows from the token array: adjacent
    * pairs via an indexed array transform — zero shuffles before the
    * model joins. Docs with <2 tokens contribute no bigrams. */
  private def bigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), words(textCol).as("__w"))
      .select(col("__id"), explode(expr(
        "transform(slice(__w, 1, size(__w) - 1), (x, i) -> struct(x AS t1, __w[i + 1] AS t2))"))
        .as("__bi"))
      .select(col("__id"), col("__bi.t1").as("t1"), col("__bi.t2").as("t2"))

  /** ONE corpus scan → unigram + bigram count tables. */
  def train(docs: DataFrame, idCol: String, textCol: String): Model = {
    val toks = docs.select(col(idCol).as("__id"), explode(words(textCol)).as("t1"))
    val uni = toks.groupBy(col("t1")).agg(count(lit(1)).as("u_cnt"))
    val bi = bigramRows(docs, idCol, textCol)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("b_cnt"))
    Model(uni, bi)
  }

  /** Per-doc LM statistics under `model` with stupid backoff:
    * `(id, n_bigrams, n_known, logprob_sum, ppl)` where `n_known`
    * counts bigrams present in the model, `logprob_sum` is
    * Σ log S(w|v) and `ppl = exp(-logprob_sum / n_bigrams)` (the
    * filtering statistic — lower is more in-domain). An OOV
    * continuation token scores α·1/N (count floor 1), the standard
    * open-vocabulary treatment. */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            alpha: Double = 0.4): DataFrame = {
    val total = model.unigrams.agg(sum(col("u_cnt")).as("n_total"))
    val uniBack = model.unigrams
      .select(col("t1").as("t2"), col("u_cnt").as("u2_cnt"))
    val scored = bigramRows(docs, idCol, textCol)
      .join(model.bigrams, Seq("t1", "t2"), "left")
      .join(model.unigrams, Seq("t1"), "left")
      .join(uniBack, Seq("t2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__known", col("b_cnt").isNotNull)
      .withColumn("__logS",
        when(col("__known"), log(col("b_cnt").cast("double") / col("u_cnt")))
          .otherwise(log(lit(alpha) *
            greatest(coalesce(col("u2_cnt"), lit(0L)), lit(1L)).cast("double") /
            col("n_total"))))
    scored.groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__known").cast("long")).as("n_known"),
        sum(col("__logS")).as("logprob_sum"),
        exp(-sum(col("__logS")) / count(lit(1))).as("ppl"))
  }
}
