package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Proves the shared transforms run under Structured Streaming — same
  * code as the batch (oracle-checked) queries, driven here through
  * MemoryStream micro-batches with watermarks/state (SURVEY §2.4).
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("stream-static enrichment: LM scoring over a document stream equals batch (T9)") {
    // model trains BATCH-side (count tables are static relations); the
    // SAME LmScore.score then runs over a readStream source — its count
    // joins become stream-static joins, the corpus-total broadcast a
    // stream-static cross join, the per-doc rollup a streaming
    // aggregation in update mode. This is the deploy shape: score
    // incoming documents against a fixed reference model.
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c"), (3L, "b c a"))
      .toDF("doc_id", "text")
    val model = graft.ops.LmScore.train(corpus, "doc_id", "text")
    val expected = graft.ops.LmScore.score(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.ops.LmScore
      .score(mem.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("lmstream")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((1L, "a b a b c"), (2L, "a b c"))
      q.processAllAvailable()
      mem.addData((3L, "b c a"))
      q.processAllAvailable()
      val got = spark.table("lmstream")
        .groupBy("doc_id").agg(
          last("n_bigrams").as("nb"), last("n_known").as("nk"), last("ppl").as("p"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == expected.keySet)
      expected.foreach { case (id, (nb, nk, ppl)) =>
        val (gb, gk, gp) = got(id)
        assert(gb == nb && gk == nk, s"counts for doc $id")
        assert(math.abs(gp - ppl) < 1e-9, s"ppl for doc $id")
      }
    } finally q.stop()
  }

  test("hourly windowed agg: streaming (complete mode) equals batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")

    val stream = EventStreams.hourlyWindowedBatch(df.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("hw").outputMode(OutputMode.Complete()).start()

    val data = Seq(
      (ts(5), "click", 1.5), (ts(20), "click", 2.0), (ts(61), "click", 4.0),
      (ts(62), "view", 1.0), (ts(130), "view", 8.25))
    mem.addData(data: _*)
    stream.processAllAvailable()

    val got = spark.table("hw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = EventStreams.hourlyWindowedBatch(data.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    stream.stop()
    assert(got == want)
    assert(got.size == 4) // 3 distinct hours, hour 1 has two types
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val stream = EventStreams.dedupStream(df, Seq("event_id"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts(1)), (2L, ts(2)), (1L, ts(3)), (3L, ts(4)), (2L, ts(5)))
    stream.processAllAvailable()
    // append-mode dedup emits as rows arrive; force watermark ahead to flush
    mem.addData((99L, ts(600)))
    stream.processAllAvailable()
    val ids = spark.table("dd").select("event_id").as[Long].collect().toSet
    stream.stop()
    assert(ids.intersect(Set(1L, 2L, 3L)) == Set(1L, 2L, 3L))
    assert(spark.table("dd").groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("stateful streaming sessionization closes sessions on gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val stream = EventStreams.sessionizeStream(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()

    // user 7: two events 5 min apart (one session), then a 90-min gap event
    mem.addData(
      StreamEvent(1, 7, ts(0)), StreamEvent(2, 7, ts(5)))
    stream.processAllAvailable()
    mem.addData(StreamEvent(3, 7, ts(95))) // gap > 30 min → closes session 1
    stream.processAllAvailable()
    // push watermark far ahead so the open session times out
    mem.addData(StreamEvent(4, 99, ts(600)))
    stream.processAllAvailable()
    mem.addData(StreamEvent(5, 99, ts(1200)))
    stream.processAllAvailable()

    val sessions = spark.table("sess").as[SessionOut].collect()
      .filter(_.user_id == 7).sortBy(_.start_us)
    stream.stop()
    assert(sessions.length >= 1)
    val first = sessions.head
    assert(first.n_events == 2)
    assert(first.start_us == ts(0).getTime * 1000 && first.end_us == ts(5).getTime * 1000)
    if (sessions.length > 1) {
      assert(sessions(1).n_events == 1)
      assert(sessions(1).start_us == ts(95).getTime * 1000)
    }
  }

  test("stream-stream interval join: attribution pairs match batch; late views evicted") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val pMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val cols = Seq("event_id", "user_id", "ts", "value")
    val views = vMem.toDF().toDF(cols: _*)
    val purchases = pMem.toDF().toDF(cols: _*)

    val stream = EventStreams.viewPurchaseJoin(views, purchases)
      .writeStream.format("memory").queryName("vpj").outputMode(OutputMode.Append()).start()

    // user 1: view at t=10 and t=25, purchase at t=30 → both views join;
    // user 2: view at t=0, purchase at t=45 → outside the 30-min window;
    // user 3: purchase with no view → no row
    vMem.addData((101L, 1L, ts(10), 0.0), (102L, 1L, ts(25), 0.0), (201L, 2L, ts(0), 0.0))
    pMem.addData((901L, 1L, ts(30), 9.5), (902L, 2L, ts(45), 3.0), (903L, 3L, ts(40), 1.0))
    stream.processAllAvailable()
    // advance both watermarks so buffered state can be evicted
    vMem.addData((999L, 98L, ts(600), 0.0))
    pMem.addData((998L, 99L, ts(600), 0.0))
    stream.processAllAvailable()

    val got = spark.table("vpj")
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    assert(got == Set((901L, 101L), (901L, 102L)))

    // batch parity: the same transform over static frames equals a plain
    // SQL interval join
    val vb = Seq((101L, 1L, ts(10), 0.0), (102L, 1L, ts(25), 0.0), (201L, 2L, ts(0), 0.0))
      .toDF(cols: _*)
    val pb = Seq((901L, 1L, ts(30), 9.5), (902L, 2L, ts(45), 3.0), (903L, 3L, ts(40), 1.0))
      .toDF(cols: _*)
    val batch = EventStreams.viewPurchaseJoin(vb, pb)
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    assert(batch == got)
    stream.stop()
  }

  test("streaming funnel: stage advances match the batch state machine; state removed on completion") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val stream = EventStreams.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("fnl").outputMode(OutputMode.Append()).start()

    // user 1 completes across micro-batches; user 2 stalls at view;
    // user 3's click PRECEDES its view (strictly-after gate must hold it
    // at stage 1); user 4's purchase arrives without a click (no skip)
    mem.addData(
      TypedEvent(1, 1, "view", ts(0)), TypedEvent(2, 1, "click", ts(5)),
      TypedEvent(3, 2, "view", ts(1)),
      TypedEvent(4, 3, "click", ts(2)), TypedEvent(5, 3, "view", ts(3)),
      TypedEvent(6, 4, "view", ts(4)), TypedEvent(7, 4, "purchase", ts(6)))
    stream.processAllAvailable()
    mem.addData(
      TypedEvent(8, 1, "purchase", ts(10)),
      TypedEvent(9, 3, "click", ts(12)))
    stream.processAllAvailable()

    val got = spark.table("fnl").as[FunnelOut].collect()
    val byUser = got.groupBy(_.user_id).view.mapValues(_.map(_.stage).sorted.toSeq).toMap
    assert(byUser(1L) == Seq(1, 2, 3), "user 1 walks all three stages")
    assert(byUser(2L) == Seq(1))
    assert(byUser(3L) == Seq(1, 2), "pre-view click must not count; later click advances")
    assert(byUser(4L) == Seq(1), "purchase without click must not skip a stage")
    // stage timestamps are the qualifying events'
    val u1 = got.filter(_.user_id == 1).sortBy(_.stage)
    assert(u1.map(_.at_us).toSeq ==
      Seq(ts(0), ts(5), ts(10)).map(_.getTime * 1000))
    assert(u1.map(_.stage_name).toSeq ==
      Seq("view", "click_after_view", "purchase_after_click"))
    stream.stop()
  }

  test("funnel stages are a parameter: a 4-stage definition runs the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val stream = EventStreams.funnelStream(mem.toDS(),
        stages = Seq("signup", "view", "click", "purchase"))
      .writeStream.format("memory").queryName("fnl4").outputMode(OutputMode.Append()).start()
    mem.addData(
      TypedEvent(1, 9, "signup", ts(0)), TypedEvent(2, 9, "view", ts(1)),
      TypedEvent(3, 9, "click", ts(2)), TypedEvent(4, 9, "purchase", ts(3)),
      // no signup → never enters the funnel
      TypedEvent(5, 8, "view", ts(1)), TypedEvent(6, 8, "purchase", ts(2)))
    stream.processAllAvailable()
    val got = spark.table("fnl4").as[FunnelOut].collect()
    stream.stop()
    assert(got.filter(_.user_id == 9).map(_.stage).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(got.filter(_.user_id == 9).maxBy(_.stage).stage_name == "purchase_after_click")
    assert(!got.exists(_.user_id == 8), "no signup, no funnel entry")
  }
}
