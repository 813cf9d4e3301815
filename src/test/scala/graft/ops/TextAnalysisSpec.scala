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
