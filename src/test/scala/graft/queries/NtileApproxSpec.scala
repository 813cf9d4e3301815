package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-safe quartile split (R47's 100 TB twin): q_ntile_approx must
  * produce near-equal buckets WITHOUT the exact form's global window —
  * ground truth is the exact qNtile on the same data, with the
  * value-boundary tolerance documented on the operator. */
class NtileApproxSpec extends SparkSpec {

  test("approx quartiles bucket within 10% of the exact ntile and cover every row") {
    val exact = Relational.qNtile(spark, sfDir).orderBy("bucket").collect()
    val approx = Relational.qNtileApprox(spark, sfDir).orderBy("bucket").collect()
    assert(approx.length == 4, s"expected 4 buckets, got ${approx.length}")
    val totalExact = exact.map(_.getLong(1)).sum
    val totalApprox = approx.map(_.getLong(1)).sum
    assert(totalApprox == totalExact, "approx buckets must cover every row exactly once")
    exact.zip(approx).foreach { case (e, a) =>
      val (ne, na) = (e.getLong(1), a.getLong(1))
      assert(math.abs(na - ne) <= math.max(1L, (0.10 * ne).toLong),
        s"bucket ${a.getInt(0)}: approx count $na vs exact $ne drifts >10%")
    }
    // value-boundary semantics: bucket ranges are disjoint and ordered
    // (strict > comparisons put all ties in one bucket)
    approx.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(3) <= hi.getDouble(2),
          s"bucket ranges overlap: max(${lo.getInt(0)})=${lo.getDouble(3)} > min(${hi.getInt(0)})=${hi.getDouble(2)}")
      case _ =>
    }
  }

  test("the approx plan has no global window and no single-partition funnel") {
    val plan = Relational.qNtileApprox(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale twin must not plan a WindowExec:\n${plan.take(1500)}")
    // the one-row boundary sketch broadcasts; the corpus itself never
    // funnels through a single partition
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "quartile boundaries must broadcast")
    val corpusSide = plan.substring(0, plan.indexOf("Broadcast"))
    assert(!corpusSide.contains("Exchange SinglePartition"),
      s"corpus must not single-partition before the broadcast join:\n${corpusSide.take(1500)}")
  }

  test("tpch q21 single-scan form: exactly one lineitem scan, one pre-window exchange") {
    val plan = Relational.qTpchQ21(spark, sfDir).queryExecution.executedPlan.toString
    val lineitemScans = "Scan parquet".r.findAllIn(plan).size
    // lineitem + orders + supplier + nation = 4 scans total; the old
    // semi+anti shape read lineitem three times (6 scans total)
    assert(lineitemScans == 4, s"expected 4 scans (lineitem read ONCE), got $lineitemScans")
  }
}
