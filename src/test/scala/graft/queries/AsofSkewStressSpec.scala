package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key stress for the as-of join (VERDICT r5 #6).
  *
  * `asofLastClick` partitions its window by `user_id`, so one
  * pathological user serializes a single task: an O(n log n) sort of
  * that user's rows followed by one O(n) running-frame pass. This spec
  * plants a user holding ~97% of all events and measures the curve at
  * 4x growth. The contract is NEAR-LINEAR degradation (a super-linear
  * blowup — pair explosion, repeated frame scans — would show as >>4x
  * here), plus exact correctness on the skewed partition.
  *
  * Decision recorded in SURVEY §6: at these measured rates a 10M-event
  * hot user costs single-digit seconds in one task — tolerable tail
  * latency at 100 TB — so the range-bucketed pre-partition (SURVEY §7)
  * stays unbuilt until a real corpus exceeds that.
  */
class AsofSkewStressSpec extends SparkSpec {

  /** ~97% of rows land on user 0; the rest spread over 31 users. */
  private def skewedEvents(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(100)) < 97, 0L)
        .otherwise(pmod(col("id"), lit(31)) + 1).as("user_id"),
      timestamp_micros(col("id") * 1000L + 1L).as("ts"),
      when(pmod(col("id"), lit(3)) === 0, "purchase").otherwise("click")
        .as("event_type"))

  /** Times the as-of with the window column FORCED: a bare `count()`
    * would let Catalyst prune the unused window expression and measure
    * only the filtered row count. */
  private def time(df: DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = df.agg(count(col("last_click_us")), count(lit(1)).as("n"))
      .head().getLong(1)
    ((System.nanoTime() - t0) / 1e9, n)
  }

  test("hot key (97% of events on one user) degrades near-linearly, stays correct") {
    time(Advanced.asofLastClick(skewedEvents(20000))) // warm-up: codegen + plan
    val (t1, n1) = time(Advanced.asofLastClick(skewedEvents(200000)))
    val (t4, n4) = time(Advanced.asofLastClick(skewedEvents(800000)))
    assert(n1 > 0 && n4 > 0)
    info(f"hot-key curve: 200k rows -> $t1%.2f s ($n1 purchases); 800k rows -> $t4%.2f s ($n4 purchases); ratio ${t4 / t1}%.2f (linear = 4.0)")
    // generous 3x-over-linear band absorbs JIT/GC jitter while still
    // failing on quadratic pair explosion (which would be ~16x)
    assert(t4 <= t1 * 12 + 2.0,
      f"as-of hot key degraded super-linearly: $t1%.2f s -> $t4%.2f s at 4x rows")

    // correctness on the skewed partition: every purchase by user 0
    // carries the genuinely-latest prior click timestamp. With the
    // planted layout (id%3==0 purchase, everything else click, ts
    // monotone in id) user 0's last click before purchase id=k is the
    // largest non-multiple-of-3 id < k that lands on user 0.
    val got = Advanced.asofLastClick(skewedEvents(200000))
      .filter(col("user_id") === 0L && col("event_id") < 1000L)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val events = (0L until 1000L)
      .filter(id => id % 100 < 97) // user 0's rows
      .map(id => (id, id % 3 == 0, id * 1000L + 1L)) // (id, isPurchase, us)
    events.filter(_._2).foreach { case (id, _, _) =>
      val want = events.filter(e => !e._2 && e._1 < id).map(_._3).maxOption.getOrElse(-1L)
      assert(got(id) == want, s"purchase $id: got ${got(id)}, want $want")
    }
  }
}
