package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants the DuckDB oracle can't express directly: pack-budget
  * bounds and mixture-rate composition. */
class TrainPrepSpec extends SparkSpec {

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
