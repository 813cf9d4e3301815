package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed tf-idf features (SURVEY §2.3
  * L45) — the GPT-3-style document-quality filter (Brown et al. 2020,
  * appendix A: a logistic-regression classifier scoring documents
  * against a curated positive corpus, applied with Pareto-sampled
  * keeps so the cut is soft, not a hard threshold; the same
  * linear-over-bag-of-features shape as fastText classification,
  * Joulin et al. 2016).
  *
  * Spark-first mechanics — this is the canonical distributed-ML
  * workload, so the implementation IS spark.ml:
  * - features: `HashingTF` (hashing trick — vocabulary-free, so the
  *   feature space is fixed-size regardless of corpus scale and no
  *   driver-side dictionary exists) + `IDF` (one corpus pass whose
  *   aggregate is numFeatures-sized);
  * - training: `LogisticRegression` (L-BFGS with tree-aggregated
  *   gradients — each iteration is one map-reduce over the corpus,
  *   coefficients live driver-side at numFeatures scale);
  * - scoring: broadcast coefficients, pure map-side transform.
  *
  * Reference scope: no ML surface in the reference; beyond-reference
  * training-pipeline operator like L40/L44.
  */
object QualityClassifier {

  /** Fitted feature + classifier stages (spark.ml models — broadcast
    * to executors by `transform`). */
  final case class Model(idf: IDFModel, lr: LogisticRegressionModel, numFeatures: Int)

  private def withFeatures(docs: DataFrame, textCol: String, numFeatures: Int,
                           idf: Option[IDFModel]): (DataFrame, HashingTF) = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__tf")
      .setNumFeatures(numFeatures)
    val tfed = tf.transform(docs.withColumn("__toks", split(lower(col(textCol)), " ")))
    (tfed, tf)
  }

  /** Fit tf-idf + logistic regression on labeled docs (`labelCol` ∈
    * {0.0, 1.0}; 1 = quality/positive). One IDF pass + `maxIter`
    * L-BFGS passes over the corpus. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 50): Model = {
    val (tfed, _) = withFeatures(docs, textCol, numFeatures, None)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__feat").fit(tfed)
    val lr = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(1e-4).setStandardization(false)
      .fit(idf.transform(tfed))
    Model(idf, lr, numFeatures)
  }

  /** Per-doc quality probability under `model`: `(…, quality_prob)` —
    * map-side once the (numFeatures-sized) stages broadcast. */
  def score(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val (tfed, _) = withFeatures(docs, textCol, model.numFeatures, None)
    model.lr.transform(model.idf.transform(tfed))
      .withColumn("quality_prob", vector_to_array(col("probability"))(1))
      .drop("__toks", "__tf", "__feat", "rawPrediction", "probability", "prediction")
  }

  /** GPT-3's Pareto-sampled keep, made DETERMINISTIC: keep a doc iff
    * `pareto(alpha) > 1 − score`, with the Pareto draw derived from a
    * uniform that is a pure hash of the id (`u^(-1/α) − 1`, inverse
    * CDF) — bit-reproducible on any cluster/rerun, the same
    * engine-independent-sampling discipline as `q_sample_hash`. High
    * scores almost always keep; low scores keep with small probability
    * (soft cut preserves tail diversity, the reason GPT-3 sampled
    * instead of thresholding). */
  def paretoKeep(scored: DataFrame, idCol: String,
                 probCol: String = "quality_prob", alpha: Double = 9.0): DataFrame = {
    val u = (pmod(xxhash64(col(idCol)), lit(1000000000L)) + 1).cast("double") / 1000000001.0
    scored.withColumn("kept",
      pow(u, lit(-1.0 / alpha)) - 1.0 > lit(1.0) - col(probCol))
  }
}
