package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ground truth for PII redaction + text normalization on planted
  * strings (the oracle checks cross-engine hash equality; this checks
  * the semantics a human expects). */
class PiiRedactSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.piiRedact(col("t")).as("r"))
      .collect().head.getString(0)
  }

  test("redacts emails, IPv4s and phones; leaves lookalikes alone") {
    assert(redactOne("mail a.b+c@sub.example.org now") == "mail [EMAIL] now")
    assert(redactOne("host 192.168.254.3 up") == "host [IP] up")
    assert(redactOne("call 555-867-5309 today") == "call [PHONE] today")
    assert(redactOne("e x@y.io ip 10.0.0.1 tel 555-123-4567") ==
      "e [EMAIL] ip [IP] tel [PHONE]")
    // non-PII survives: bare @, version strings, short digit runs
    assert(redactOne("v1.2.3 at @home 12-34") == "v1.2.3 at @home 12-34")
  }

  test("counts audit the redaction") {
    import spark.implicits._
    val r = Seq("a@b.co c@d.io 10.1.1.1").toDF("t").select(
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailRe).as("e"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.Ipv4Re).as("i"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.PhoneRe).as("p")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 0L)))
  }

  test("normalizeText lowercases, collapses whitespace runs, trims") {
    import spark.implicits._
    val got = Seq("  Mixed \t CASE\n\n text  ").toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n")).collect().head.getString(0)
    assert(got == "mixed case text")
  }
}
