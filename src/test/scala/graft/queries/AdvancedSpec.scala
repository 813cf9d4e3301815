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
