package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AdvancedSpec extends SparkSpec {

  test("approx stats stay within sketch tolerance of exact values") {
    val approx = Advanced.qApproxStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (d, m)) =>
      val (ad, am) = approx(flag)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$flag HLL off >5%: $ad vs $d")
      assert(math.abs(am - m) / m < 0.05, s"$flag quantile off >5%: $am vs $m")
    }
  }

  test("approx profile matches exact profile within HLL tolerance, no Expand in plan") {
    // exact and approx forms agree on everything but n_distinct, where
    // the HLL estimate must land within the sketch's default rsd band
    val exact = Advanced.qProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Advanced.qProfileApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getLong(1) == e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$c n_null")
      assert(a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5),
        s"$c min/max")
      val (ad, ed) = (a.getLong(3), e.getLong(3))
      assert(math.abs(ad - ed).toDouble / math.max(ed, 1L) < 0.10,
        s"$c HLL distinct off >10%: $ad vs exact $ed")
    }
    // neither form may amplify rows through a multi-distinct Expand:
    // the approx form merges sketches in one aggregate, and the r17
    // exact form runs each distinct count as its own single-column
    // two-phase hash aggregate (the pre-r17 combined aggregate planned
    // a 5× Expand whose rows then paid full SortAggregate sorts)
    val exactPlan = Advanced.qProfile(spark, sfDir).queryExecution.executedPlan.toString
    val approxPlan = Advanced.qProfileApprox(spark, sfDir).queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"), s"exact profile must not Expand:\n$exactPlan")
    assert(!approxPlan.contains("Expand"), s"approx profile must not Expand:\n$approxPlan")
    // and the only sort-based aggregates left in the exact plan are the
    // keyless stats pass (string min/max buffers), which needs no Sort
    assert(!exactPlan.contains("+- Sort "), s"exact profile must not sort rows:\n$exactPlan")
  }

  test("salted aggregation equals direct group-by exactly") {
    val salted = Advanced.qSaltedAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(15,4)")).cast("double"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("as-of join: purchases before any click have null last_click_us") {
    val rows = Advanced.qAsofJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getLong(3) <= r.getLong(2),
        "as-of match must not be after the purchase")
    }
  }

  test("entry() flagship query returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
