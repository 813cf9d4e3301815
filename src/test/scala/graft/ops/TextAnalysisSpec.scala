package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("token counts on known strings") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "  spaced   out  "),
      (3L, "a-b c.d e!"),
      (4L, "one")).toDF("id", "text")
    val byId = df.select(col("id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == ((2L, 2L)))
    assert(byId(2L) == ((2L, 2L)))
    // "a-b c.d e!": ws=3; bpeish: a,-,b,c,.,d,e,! = 8
    assert(byId(3L) == ((3L, 8L)))
    assert(byId(4L) == ((1L, 1L)))
  }

  test("language id picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el gato y la casa de los perros"),
      (3L, "le chat et les maisons des chiens"),
      (4L, "der hund und die katze von dem haus"),
      (5L, "xyzzy plugh qwerty")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId("text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de", 5L -> "und"))
  }

  test("fingerprint is whitespace/case insensitive, content sensitive") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello  world "),
      (4L, "hello mars")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(2L) != fps(4L))
    // trailing space normalizes to a trailing single space — distinct content
    assert(fps(3L) != fps(2L))
  }

  test("lexical diversity matches driver-side ground truth") {
    val got = TextAnalysis.lexicalDiversity(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val want = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map { r =>
        val counts = r.getString(1).toLowerCase.split(" ", -1)
          .groupBy(identity).map { case (_, g) => g.length }
        val nWords = counts.sum.toLong
        val nTypes = counts.size.toLong
        val nHapax = counts.count(_ == 1).toLong
        def r6(x: Double) = math.rint(x * 1e6) / 1e6 // assert-tolerance only
        r.getLong(0) -> ((nWords, nTypes, nHapax,
          r6(nTypes.toDouble / nWords), r6(nHapax.toDouble / nTypes)))
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nw, nt, nh, ttr, hr)) =>
      val (wnw, wnt, wnh, wttr, whr) = want(id)
      assert((nw, nt, nh) == ((wnw, wnt, wnh)), s"doc $id counts")
      assert(math.abs(ttr - wttr) < 1e-6 && math.abs(hr - whr) < 1e-6, s"doc $id ratios")
    }
  }

  test("quality features are sane on the corpus") {
    val feats = TextAnalysis.qualityFeatures("text")
    val df = Tables.documents(spark, sfDir)
      .select(feats.map { case (n, c) => c.as(n) }: _*)
    val row = df.agg(
      min("stop_ratio"), max("stop_ratio"),
      min("punct_ratio"), max("punct_ratio"),
      min("quality_score")).head()
    assert(row.getDouble(0) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(3) <= 1.0)
    assert(row.getDouble(4) > 0.0)
  }
}
