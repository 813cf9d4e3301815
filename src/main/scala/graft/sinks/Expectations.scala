package graft.sinks

import graft.meta.{SnapshotCatalog, SnapshotMeta}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A data-quality expectation evaluated over a table state — the audit
  * half of write-audit-publish (Delta Live Tables "expectations" /
  * Great-Expectations-style checks, run as ONE Spark aggregate). Each
  * rule reports a VIOLATION COUNT; zero means the expectation holds. */
sealed trait Expectation { def name: String }

/** Violation: the column is null. */
final case class NotNull(column: String) extends Expectation {
  def name: String = s"not_null:$column"
}

/** Violation: a NON-NULL value outside [lo, hi] (nulls are [[NotNull]]'s
  * job — one rule, one failure mode). */
final case class InRange(column: String, lo: Double, hi: Double) extends Expectation {
  def name: String = s"in_range:$column"
}

/** Violation: a non-null value not fully matching `pattern`. Write the
  * pattern in the Java-regex ∩ RE2 common subset when an external
  * oracle must agree (same discipline as the PII redaction rules). */
final case class MatchesRegex(column: String, pattern: String) extends Expectation {
  def name: String = s"regex:$column"
}

/** Violation: the SQL predicate is not TRUE for the row (null counts as
  * a violation — an unknown check result must not pass an audit). */
final case class SqlCheck(label: String, predicate: String) extends Expectation {
  def name: String = s"check:$label"
}

/** Violation count: rows beyond the first per distinct key tuple —
  * `count(*) - count(distinct key)`. Aggregate-shaped, but it rides the
  * SAME single-scan aggregate as the row-level rules. */
final case class UniqueKey(columns: Seq[String]) extends Expectation {
  require(columns.nonEmpty, "UniqueKey needs at least one column")
  def name: String = s"unique:${columns.mkString(",")}"
}

/** Expectation evaluation + the expectation-gated WAP publish (SURVEY §2
  * S45). Scale: `check` is ONE aggregate over one scan regardless of the
  * rule count — row-level rules fold to conditional sums map-side;
  * [[UniqueKey]] adds a distinct count in the same Aggregate. The report
  * is rule-count-sized, never data-sized. */
object Expectations {

  private def rowViolation(e: Expectation): Column = e match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) => col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case MatchesRegex(c, p) => col(c).isNotNull && !col(c).rlike("^(?:" + p + ")$")
    case SqlCheck(_, pred) => !coalesce(expr(pred), lit(false))
    case u: UniqueKey =>
      throw new IllegalArgumentException(s"${u.name} is not row-level")
  }

  /** Violation counts for every rule, as a `(rule, violations)` frame —
    * one declarative plan: single aggregate, then a rule-count-sized
    * explode to long form. */
  def check(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    val aggs = rules.map {
      case u: UniqueKey =>
        (count(lit(1)) - count_distinct(struct(u.columns.map(col): _*)))
          .cast("long").as(u.name)
      case r =>
        coalesce(sum(when(rowViolation(r), 1L).otherwise(0L)), lit(0L))
          .cast("long").as(r.name)
    }
    // rule names are free text (a SqlCheck label may carry dots/spaces,
    // even backticks): backtick-quote so col() never dot-splits them,
    // doubling embedded backticks — Spark's identifier escape — so a
    // label like check:`k` > 'a' still round-trips
    val pairs = rules.map(r =>
      struct(lit(r.name).as("rule"),
        col(s"`${r.name.replace("`", "``")}`").as("violations")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("e.violations").as("violations"))
  }

  /** `check` over the PROSPECTIVE state of a staged append (current
    * visible rows ∪ staged files) — the audit step between stage and
    * publish. */
  def auditStaged(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      table: String,
      stagedId: String,
      rules: Seq[Expectation]): DataFrame =
    check(Writers.readStaged(catalog, spark, table, stagedId), rules)

  /** The expectation-gated publish: audit the prospective state, publish
    * iff EVERY rule has zero violations. On failure the staged entry is
    * LEFT IN PLACE (inspect with `readStaged`, then fix-and-restage or
    * `discardStaged`) and the violation report is returned — an audit
    * must never destroy the evidence it failed on. */
  def publishStagedIfClean(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      table: String,
      stagedId: String,
      rules: Seq[Expectation]): Either[Map[String, Long], SnapshotMeta] = {
    val report = auditStaged(spark, catalog, table, stagedId, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (report.valuesIterator.forall(_ == 0L))
      Right(catalog.publishStaged(spark, table, stagedId))
    else Left(report)
  }
}
