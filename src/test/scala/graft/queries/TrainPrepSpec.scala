package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants the DuckDB oracle can't express directly: pack-budget
  * bounds and mixture-rate composition. */
class TrainPrepSpec extends SparkSpec {

  test("bigram lift matches driver-side ground truth (counts exact, lift to 1e-6)") {
    val texts = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).toSeq)
    val uni = texts.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n = texts.map(_.size.toLong).sum
    val bi = texts.filter(_.size >= 2)
      .flatMap(ws => ws.init.zip(ws.tail))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val np = bi.values.sum
    val wantAll = bi.collect { case ((w1, w2), c12) if c12 >= 10 =>
      val lift = (c12 / np.toDouble) * (n / uni(w1).toDouble) * (n / uni(w2).toDouble)
      (w1, w2) -> ((c12, math.rint(lift * 1e6) / 1e6))
    }
    val wantTop = wantAll.toSeq
      .sortBy { case ((w1, w2), (_, l)) => (-l, w1, w2) }.take(30).toMap
    val got = TrainPrep.qBigramLift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == wantTop.size)
    assert(got.keySet == wantTop.keySet,
      s"missing=${wantTop.keySet -- got.keySet} extra=${got.keySet -- wantTop.keySet}")
    got.foreach { case (p, (c12, l)) =>
      assert(c12 == wantTop(p)._1, s"pair $p count")
      assert(math.abs(l - wantTop(p)._2) < 1e-6, s"pair $p lift $l vs ${wantTop(p)._2}")
    }
  }

  test("sequence packs respect the token budget modulo one boundary document") {
    val budget = 2048L
    val maxDocTok = Tables.documents(spark, sfDir)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("t"))
      .agg(max("t")).head().getLong(0)
    val packs = TrainPrep.qPackSequences(spark, sfDir).collect()
    assert(packs.nonEmpty)
    packs.foreach { r =>
      val tokens = r.getLong(2)
      // contiguous fill: a pack's docs START below the budget line, so the
      // last doc can overflow by at most its own length
      assert(tokens <= budget + maxDocTok,
        s"pack ${r.getLong(0)} holds $tokens tokens (budget $budget, maxDoc $maxDocTok)")
    }
    // every document is packed exactly once
    val total = packs.map(_.getLong(2)).sum
    val expected = Tables.documents(spark, sfDir)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(total == expected)
  }

  test("mixture sample keeps every en document and the configured fraction of others") {
    val docs = Tables.documents(spark, sfDir)
    val sampled = TrainPrep.qMixtureSample(spark, sfDir)
    // en rate is 100%: every en doc survives
    assert(sampled.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
    // zh rate is 10%: the kept fraction is binomial around 0.10
    val zhAll = docs.filter(col("lang") === "zh").count().toDouble
    val zhKept = sampled.filter(col("lang") === "zh").count().toDouble
    assert(zhKept / zhAll < 0.35, s"zh keep rate ${zhKept / zhAll} far above 10%")
  }
}
