package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-quality guards: the properties that keep these operators viable
  * at 100 TB, asserted against the actual physical plans so regressions
  * fail loudly (SURVEY §5).
  */
class PlanSpec extends SparkSpec {

  test("selective filters reach the parquet scan (pushdown)") {
    val plan = Relational.qFilterPushdown(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filters in:\n${plan.take(2000)}")
  }

  test("projection prunes the scan schema to referenced columns") {
    val plan = Relational.qScanProject(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"),
      s"scan reads too many columns:\n${plan.take(2000)}")
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"))
  }

  test("dimension joins broadcast (no shuffle of the fact side's dims)") {
    val plan = Relational.q5MultiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in Q5 plan")
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(Relational.qSemiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(Relational.qAntiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("co-bucketed join plans with no Exchange below the join (pre-shuffled at write)") {
    // at test scale the small side would broadcast (also exchange-free,
    // but not the claim): force the big-side plan shape both sides take
    // at 100 TB, where neither fact table fits a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Engine.qBucketedJoin(spark, sfDir)
        .queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join of bucketed tables:\n${plan.take(1500)}")
      // everything BELOW the join (its inputs) must be exchange-free; the
      // groupBy above it still shuffles (that one is the point of an agg)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join inputs still shuffle:\n${belowJoin.take(1500)}")
      assert(plan.contains("SelectedBucketsCount"), "scan is not bucket-aware")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("r9 TPC-H shapes read each table once (no correlated-subquery re-scans)") {
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size
    // Q14/Q19/Q17: lineitem + part only — the conditional-agg ratio,
    // the derived-predicate OR, and the windowed correlated AVG each
    // fold what is classically a second lineitem pass into one scan
    assert(scans(Relational.qTpchQ14(spark, sfDir)) == 2)
    assert(scans(Relational.qTpchQ19(spark, sfDir)) == 2)
    assert(scans(Relational.qTpchQ17(spark, sfDir)) == 2)
    // Q4: orders + key-only lineitem semi side
    assert(scans(Relational.qTpchQ4(spark, sfDir)) == 2)
    // Q13: orders aggregated before the customer join
    assert(scans(Relational.qTpchQ13(spark, sfDir)) == 2)
    // Q18: ONE lineitem aggregation serves filter + output (classic
    // form joins lineitem a second time for the SELECT-list sum)
    assert(scans(Relational.qTpchQ18(spark, sfDir)) == 3)
  }

  test("r9 TPC-H completions: Q6 one pushed-down scan; Q12/Q16 one scan per table; Q11 reuses the per-part exchange") {
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size
    // Q6: the pure scan query — one lineitem pass with ALL predicates
    // at the parquet reader
    val q6 = Relational.qTpchQ6(spark, sfDir)
    assert(scans(q6) == 1)
    // toString truncates PushedFilters; assert via the full DataFilters
    // expressions instead (same predicates, scan-level)
    val q6plan = q6.queryExecution.executedPlan.toString
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(q6plan).isDefined &&
      "l_discount#\\d+ >= 0\\.05".r.findFirstIn(q6plan).isDefined,
      s"Q6 predicates must reach the scan:\n${q6plan.take(1200)}")
    assert(scans(Relational.qTpchQ12(spark, sfDir)) == 2)
    assert(scans(Relational.qTpchQ16(spark, sfDir)) == 3)
    // Q11: the grand-total branch must REUSE the per-part aggregate
    // exchange at runtime (AQE stage reuse) — one lineitem scan feeds
    // both the rows and the threshold. sf0.01: at sf0.001 NATION_7 has
    // zero suppliers and AQE (correctly) short-circuits the whole plan
    // to EmptyRelation, which proves propagation, not reuse
    val q11 = Relational.qTpchQ11(spark, "/root/testdata/sf0.01")
    q11.collect()
    val q11plan = q11.queryExecution.executedPlan.toString
    assert(q11plan.contains("ReusedExchange"),
      s"Q11 total must reuse the per-part exchange:\n${q11plan.take(2000)}")
  }

  test("no query in the battery plans a CartesianProduct") {
    // brute-force ANN legitimately uses BroadcastNestedLoopJoin over a
    // bounded query set; an unbounded CartesianProduct is always a bug
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("zipf profile's top-k is a TakeOrdered, never a global sort of the vocabulary") {
    val plan = Analytics.qZipfProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 must plan as top-k:\n${plan.take(2000)}")
    // the 50-row rank/cumsum window is the ONLY single-partition stage
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "corpus total must broadcast, not shuffle")
  }

  test("decontamination broadcasts the benchmark side (corpus never shuffles for the join)") {
    val plan = TrainPrep.qDecontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast:\n${plan.take(2000)}")
  }

  test("sequence packing windows by bucket, not a single global partition") {
    val plan = TrainPrep.qPackSequences(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"),
      s"pack window must partition by bucket (no global sort):\n${plan.take(2000)}")
    assert(!plan.contains("SinglePartition"),
      "pack assignment must not funnel the corpus through one partition")
  }

  test("aggregations combine map-side before the shuffle") {
    // partial_sum under the Exchange = map-side combine: the shuffle
    // carries one row per (group × task), not per input row
    val plan = Relational.q1Agg(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), "Q1 must partial-aggregate before the exchange")
    assert(plan.indexOf("partial_sum") > plan.indexOf("Exchange"),
      "partial aggregate must sit below the exchange")
  }
}
