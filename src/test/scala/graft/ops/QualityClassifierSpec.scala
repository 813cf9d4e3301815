package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import scala.util.Random

class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def synthetic(n: Int, vocab: Seq[String], seed: Long, label: Double,
                        idBase: Long): Seq[(Long, String, Double)] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val words = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (idBase + i, words.mkString(" "), label)
    }
  }

  private val goodVocab = Seq("research", "analysis", "method", "result",
    "clean", "informative", "study", "data", "evidence", "review")
  private val junkVocab = Seq("zzz", "buy", "click", "xxx", "free",
    "winner", "prize", "spam", "cheap", "deal")

  test("separable corpora separate: held-out probabilities split cleanly") {
    val train = (synthetic(150, goodVocab, 1L, 1.0, 0) ++
      synthetic(150, junkVocab, 2L, 0.0, 10000)).toDF("doc_id", "text", "label")
    val test = (synthetic(50, goodVocab, 3L, 1.0, 20000) ++
      synthetic(50, junkVocab, 4L, 0.0, 30000)).toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(train, "text", "label", numFeatures = 1 << 14)
    val scored = QualityClassifier.score(test, "text", m)
      .select(col("label"), col("quality_prob")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
    val posProbs = scored.filter(_._1 == 1.0).map(_._2)
    val negProbs = scored.filter(_._1 == 0.0).map(_._2)
    assert(posProbs.count(_ > 0.5) >= 48, s"pos held-out misclassified: ${posProbs.count(_ <= 0.5)}")
    assert(negProbs.count(_ < 0.5) >= 48, s"neg held-out misclassified: ${negProbs.count(_ >= 0.5)}")
  }

  test("scoring under a fixed model is deterministic across partitionings") {
    val docs = Tables.documents(spark, sfDir).limit(200).cache()
    val labeled = docs.withColumn("label", (col("lang") === "en").cast("double"))
    val m = QualityClassifier.train(labeled, "text", "label", numFeatures = 1 << 14)
    def probs(d: org.apache.spark.sql.DataFrame) =
      QualityClassifier.score(d, "text", m)
        .select(col("doc_id"), col("quality_prob")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probs(labeled) == probs(labeled.repartition(13, col("doc_id"))))
  }

  test("paretoKeep is deterministic, monotone in score, and soft at the tail") {
    val scored = (1L to 2000L).map(i => (i, i / 2000.0)).toDF("doc_id", "quality_prob")
    val kept = QualityClassifier.paretoKeep(scored, "doc_id").cache()
    val k1 = kept.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = QualityClassifier.paretoKeep(scored.repartition(7), "doc_id")
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2, "keep set must be a pure function of (id, score)")
    // the Pareto(9) acceptance P(keep | score s) = (2−s)^(−9): ~0.645
    // at s=0.95, ~0.003 at s=0.1 — the cut is soft and monotone, NOT a
    // near-certain keep even at high scores (the GPT-3 paper's actual
    // arithmetic; an implementation that thresholds would show 1.0/0.0)
    val hi = kept.filter(col("quality_prob") > 0.9)
    val lo = kept.filter(col("quality_prob") < 0.1)
    val hiRate = hi.filter(col("kept")).count().toDouble / hi.count()
    val loRate = lo.filter(col("kept")).count().toDouble / lo.count()
    assert(hiRate > 0.45 && hiRate < 1.0, s"hi-score keep rate $hiRate outside Pareto band")
    assert(loRate < 0.05, s"low-score keep rate $loRate too high")
    assert(hiRate > loRate + 0.4, "keep rate must rise steeply with score")
  }
}
