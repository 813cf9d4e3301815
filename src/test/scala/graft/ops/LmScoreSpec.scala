package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {

  import spark.implicits._

  private val eps = 1e-9

  test("hand-computed stupid-backoff scores on a tiny corpus") {
    // corpus: d1 = "a b a b c", d2 = "a b c"
    // unigrams: a:3 b:3 c:2, N=8
    // bigrams:  (a,b):3 (b,a):1 (b,c):2
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val m = LmScore.train(corpus, "doc_id", "text")

    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 2L))
    val bi = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 2L))

    // score d2: (a,b) known S=3/3=1; (b,c) known S=2/3
    val s2 = LmScore.score(corpus.filter($"doc_id" === 2L), "doc_id", "text", m)
      .collect().head
    assert(s2.getAs[Long]("n_bigrams") == 2L)
    assert(s2.getAs[Long]("n_known") == 2L)
    assert(math.abs(s2.getAs[Double]("logprob_sum") - math.log(2.0 / 3.0)) < eps)
    assert(math.abs(s2.getAs[Double]("ppl") - math.sqrt(3.0 / 2.0)) < eps)
  }

  test("backoff and OOV paths score as alpha-weighted unigram mass") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val m = LmScore.train(corpus, "doc_id", "text")

    // "c a": bigram unseen, unigram a:3 known → S = 0.4 * 3/8
    val back = LmScore.score(Seq((10L, "c a")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    assert(back.getAs[Long]("n_known") == 0L)
    assert(math.abs(back.getAs[Double]("logprob_sum") - math.log(0.4 * 3.0 / 8.0)) < eps)

    // "z q": both OOV → floor count 1 → S = 0.4 * 1/8, ppl = 20
    val oov = LmScore.score(Seq((11L, "z q")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    assert(oov.getAs[Long]("n_known") == 0L)
    assert(math.abs(oov.getAs[Double]("ppl") - 20.0) < eps)
  }

  test("matches a naive driver-side reimplementation on real docs") {
    val docs = Tables.documents(spark, sfDir).limit(60).cache()
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq).toMap

    // naive model over the same 60 docs
    val uni = rows.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val big = rows.values.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = uni.values.sum.toDouble

    def naive(ws: Seq[String]): (Long, Long, Double) = {
      val pairs = ws.zip(ws.drop(1))
      val logs = pairs.map { case (v, w) =>
        big.get((v, w)) match {
          case Some(c) => math.log(c.toDouble / uni(v))
          case None => math.log(0.4 * math.max(uni.getOrElse(w, 0L), 1L) / n)
        }
      }
      (pairs.size.toLong, pairs.count(p => big.contains(p)).toLong, logs.sum)
    }

    val m = LmScore.train(docs, "doc_id", "text")
    val got = LmScore.score(docs, "doc_id", "text", m).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_known"), r.getAs[Double]("logprob_sum")))
      .toMap

    val expected = rows.filter(_._2.size >= 2).view.mapValues(naive).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (nb, nk, ls)) =>
      val (gb, gk, gl) = got(id)
      assert(gb == nb && gk == nk, s"counts for doc $id")
      assert(math.abs(gl - ls) < 1e-6, s"logprob for doc $id: $gl vs $ls")
    }
  }

  test("score is deterministic under repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val m = LmScore.train(docs, "doc_id", "text")
    def stats(d: org.apache.spark.sql.DataFrame) =
      LmScore.score(d, "doc_id", "text", m)
        .select("doc_id", "n_bigrams", "n_known")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats(docs) == stats(docs.repartition(17, col("doc_id"))))
  }
}
