package graft.queries

import graft.{SparkSpec, Tables}

/** Driver-side ground-truth checks for the behavioral/distribution
  * analytics battery (the oracle gate re-proves these vs DuckDB at
  * sf0.01; here each result is recomputed independently in plain Scala
  * on the sf0.001 corpus). */
class AnalyticsSpec extends SparkSpec {

  private lazy val events: Seq[(Long, String, java.sql.Timestamp)] =
    Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "ts")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))

  test("funnel stage counts match a driver-side replay") {
    val byUser = events.groupBy(_._1)
    def firstAfter(evs: Seq[(Long, String, java.sql.Timestamp)], tpe: String,
        after: Option[java.sql.Timestamp]): Option[java.sql.Timestamp] = {
      val c = evs.filter(e => e._2 == tpe && after.forall(a => e._3.after(a)))
      if (c.isEmpty) None else Some(c.minBy(_._3.getTime)._3)
    }
    var nV = 0; var nC = 0; var nP = 0
    byUser.values.foreach { evs =>
      val t1 = firstAfter(evs, "view", None)
      if (t1.isDefined) {
        nV += 1
        val t2 = firstAfter(evs, "click", t1)
        if (t2.isDefined) {
          nC += 1
          if (firstAfter(evs, "purchase", t2).isDefined) nP += 1
        }
      }
    }
    val got = Analytics.qFunnel(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("view" -> nV.toLong,
      "click_after_view" -> nC.toLong, "purchase_after_click" -> nP.toLong))
    assert(nV >= nC && nC >= nP && nP > 0, s"funnel must narrow: $nV/$nC/$nP")
  }

  test("cohort retention: week-0 cell equals cohort size; replay matches") {
    val day = (t: java.sql.Timestamp) => (t.getTime / 86400000L).toInt
    val week = (d: Int) => d / 7
    val firstWeek = events.groupBy(_._1).map { case (u, evs) =>
      u -> week(evs.map(e => day(e._3)).min)
    }
    val expected = events
      .map(e => (firstWeek(e._1), week(day(e._3)) - firstWeek(e._1), e._1))
      .distinct
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    val got = Analytics.qRetentionCohort(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    val cohortSizes = firstWeek.groupBy(_._2).map { case (w, m) => w -> m.size.toLong }
    cohortSizes.foreach { case (w, n) =>
      assert(got((w, 0)) == n, s"week-0 retention of cohort $w must be the full cohort")
    }
  }

  test("active users: DAU/WAU match a driver-side sliding window") {
    val day = (t: java.sql.Timestamp) => (t.getTime / 86400000L).toInt
    val pairs = events.map(e => (day(e._3), e._1)).distinct
    val lo = pairs.map(_._1).min
    val hi = pairs.map(_._1).max
    val expected = (lo to hi).flatMap { d =>
      val window = pairs.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.size
      if (window == 0) None
      else Some(d -> ((pairs.filter(_._1 == d).map(_._2).distinct.size.toLong, window.toLong)))
    }.toMap
    val got = Analytics.qActiveUsers(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // WAU dominates DAU everywhere
    got.values.foreach { case (d, w) => assert(w >= d) }
  }

  test("zipf profile: ranked prefix of the true frequency table, exact cumsums") {
    val counts = Tables.documents(spark, sfDir).selectExpr("lower(text) AS t")
      .collect().flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, l) => w -> l.length.toLong }
    val want = counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(50)
    val total = counts.values.sum
    val got = Analytics.qZipfProfile(spark, sfDir).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the synthetic corpus vocabulary is smaller than the top-k cap
    assert(got.length == math.min(50, counts.size))
    var cum = 0L
    got.zip(want).zipWithIndex.foreach { case (((rk, w, n, cumN, tot), (ww, wn)), i) =>
      cum += wn
      assert(rk == i + 1 && w == ww && n == wn && cumN == cum && tot == total,
        s"rank ${i + 1}: got ($rk,$w,$n,$cumN,$tot) want ($ww,$wn,cum=$cum,total=$total)")
    }
  }

  test("source overlap: one pair verified against driver-side vocabulary sets") {
    val vocab = Tables.documents(spark, sfDir).selectExpr("source", "lower(text) AS t")
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.flatMap(_.getString(1).split(" ").filter(_.nonEmpty)).toSet
      }
    val rows = Analytics.qSourceOverlap(spark, sfDir).collect()
    assert(rows.length == vocab.size * (vocab.size - 1) / 2,
      "one row per unordered source pair")
    rows.take(5).foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val inter = vocab(s1).intersect(vocab(s2)).size.toLong
      val union = vocab(s1).union(vocab(s2)).size.toLong
      assert(r.getLong(2) == inter && r.getLong(3) == union)
      assert(r.getDouble(4) == inter.toDouble / union)
    }
  }

  test("intersect/except: tagged sets match driver-side set algebra") {
    val orders = Tables.orders(spark, sfDir).selectExpr("o_custkey", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val f = orders.filter(_._2 == "F").map(_._1).toSet
    val p = orders.filter(_._2 == "P").map(_._1).toSet
    val got = Analytics.qIntersectExcept(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = f.intersect(p).map(_ -> "both") ++ f.diff(p).map(_ -> "f_only")
    assert(got == want && want.nonEmpty)
  }

  test("argmax: per-nation top customer matches a driver-side scan") {
    val cust = Tables.customer(spark, sfDir)
      .selectExpr("c_nationkey", "c_custkey", "c_name", "c_acctbal")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val want = cust.groupBy(_._1).map { case (nk, rows) =>
      val top = rows.maxBy(r => (math.round(r._4 * 100) * 100000000L - r._2))
      nk -> ((top._3, rows.map(_._4).max, rows.length.toLong))
    }
    val got = Analytics.qArgmax(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got == want)
  }
}
