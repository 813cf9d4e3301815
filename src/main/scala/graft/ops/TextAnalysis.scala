package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.3 L8–L11).
  *
  * All pure column expressions (whole-stage-codegen friendly, no UDFs):
  * at 100 TB these run map-side inside the scan stage with zero shuffle.
  * Formulas restrict themselves to ints and single/fixed-order double
  * operations so results are bit-identical to the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens (trim + split on runs of whitespace). */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish tokens: letter runs, digit runs, single punctuation. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Words for ratio features: lowercase, space-split. */
  def words(text: Column): Column = split(lower(text), " ")

  /** Stopword profiles for language ID / quality features. */
  val EnStop = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
  val EsStop = Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los")
  val FrStop = Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une")
  val DeStop = Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im")

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("(", ",", ")")

  /** Count of words of `text` present in `stop`. */
  def stopwordHits(textExpr: String, stop: Seq[String]): Column =
    expr(s"size(filter(split(lower($textExpr), ' '), w -> w IN ${inList(stop)}))").cast("long")

  /** Language ID by stopword-profile vote with fixed priority
    * en > es > fr > de, 'und' when no profile matches (SURVEY §2.3 L8). */
  def langId(textExpr: String): Column = {
    val en = stopwordHits(textExpr, EnStop)
    val es = stopwordHits(textExpr, EsStop)
    val fr = stopwordHits(textExpr, FrStop)
    val de = stopwordHits(textExpr, DeStop)
    when(en === 0 && es === 0 && fr === 0 && de === 0, "und")
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Punctuation count (.,!?;). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;]", ""))).cast("long")

  /** Quality score: fixed-order combination of stopword ratio, mean word
    * length and punctuation density (SURVEY §2.3 L9). Deterministic:
    * integer features, three double divisions, one fixed expression tree. */
  def qualityFeatures(textExpr: String): Seq[(String, Column)] = {
    val text = expr(textExpr)
    val nChars = length(text).cast("long")
    val nWords = size(split(lower(text), " ")).cast("long")
    val stopHits = stopwordHits(textExpr, EnStop)
    val meanWordLen = length(regexp_replace(text, " ", "")).cast("long") / nWords
    val stopRatio = stopHits / nWords
    val punctRatio = punctCount(text) / nChars
    val score = stopRatio * 0.5 + punctRatio * 0.2 + meanWordLen * 0.06
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "stop_hits" -> stopHits,
      "mean_word_len" -> meanWordLen,
      "stop_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio,
      "quality_score" -> score)
  }

  /** Document fingerprint: md5 of lowercase, whitespace-collapsed text
    * (SURVEY §2.3 L11) — the rolling-hash analogue with a cross-engine
    * stable hash. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Email / IPv4 / US-phone regexes, written in the common subset of
    * Java regex and RE2 so the SAME pattern runs in Spark's codegen'd
    * regexp_replace and a DuckDB/Trino oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII redaction (SURVEY §2.3 L34): emails, IPv4s and phone numbers
    * replaced by typed placeholder tokens. Pure codegen'd column
    * expressions — three regexp passes inside the scan stage, zero
    * shuffles, linear at 100 TB. Email first (its local-part may embed
    * digits a later pass would half-eat), then IP, then phone. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Count of matches for `re` in `text` (the redaction audit column). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Canonical text normalization (SURVEY §2.3 L35): lowercase,
    * whitespace runs (spaces/tabs/newlines) collapsed to single spaces,
    * ends trimmed — the shared preprocessing step the dedup fingerprint
    * already bakes in, exposed as its own operator so downstream
    * tokenization sees one canonical form. Map-side expressions only. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** URL host pattern, in the Java-regex ∩ RE2 common subset (the same
    * discipline as the PII rules, so an external oracle extracts the
    * identical host). */
  val UrlHostRe = "https?://([A-Za-z0-9.-]+)"

  /** Host part of a URL column (empty string when not a URL). */
  def urlHost(url: Column): Column = regexp_extract(url, UrlHostRe, 1)

  /** Registrable-ish domain: the host with a leading `www.` stripped —
    * the grouping key web-corpus pipelines aggregate quality/dedup
    * signals on (SURVEY §2.3 L37). A full public-suffix-list walk is a
    * table lookup on top of this, not a different plan shape. */
  def urlDomain(url: Column): Column =
    regexp_replace(urlHost(url), "^www\\.", "")

  /** Last DNS label of the domain (`com`, `org`, ...). */
  def urlTld(url: Column): Column =
    regexp_extract(urlDomain(url), "\\.([A-Za-z]+)$", 1)

  /** Per-document lexical diversity (SURVEY §2.3 L29): type-token
    * ratio and hapax-legomenon rate — the vocabulary-richness signals
    * pretraining quality filters gate on alongside [[repetitionProfile]]
    * (a doc whose TTR collapses is template spam; one whose hapax ratio
    * spikes is OCR noise). Same linear shape as the repetition profile:
    * one map-side explode, per-(doc,word) counts, one per-doc aggregate;
    * per-doc groups are tiny so no skew at 100 TB. */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_words"), col("n_types"), col("n_hapax"),
        round(col("n_types") / col("n_words").cast("double"), 6).as("ttr"),
        round(col("n_hapax") / col("n_types").cast("double"), 6).as("hapax_ratio"))
  }

  /** Per-document repetition profile (SURVEY §2.3 L25) — the
    * boilerplate/low-diversity quality signal pretraining filters gate
    * on: word count, distinct-word count, repetition ratio
    * (1 − distinct/total), and the most frequent word with its count
    * (ties broken lexicographically). Scale: one explode (map-side) +
    * two aggregations partitioned by doc — linear in tokens, and the
    * per-doc groups are tiny so no skew. */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
    // single pass over the (doc, word) counts: rank the top word in a
    // window, then fold everything in ONE per-doc aggregate (the
    // join-back formulation scans and aggregates the token stream twice)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("c").desc, col("w"))
    counts.withColumn("rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_freq"),
        max(when(col("rn") === 1, col("w"))).as("top_word"))
      .select(col(idCol), col("n_words"), col("n_distinct"),
        round(lit(1) - col("n_distinct") / col("n_words").cast("double"), 6).as("rep_ratio"),
        col("top_freq"), col("top_word"))
  }
}
