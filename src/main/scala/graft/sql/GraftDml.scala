package graft.sql

import graft.meta.SnapshotCatalog
import graft.sinks.Writers
import org.apache.spark.sql.{GraftColumnShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}

/** SQL DML over catalog tables through pure `SparkSessionExtensions` —
  * the write half of the SQL-only deployment story (S50 gave it reads +
  * time travel; this gives it writes):
  *
  *   INSERT INTO t SELECT ... / VALUES ...        -- snapshot append
  *   INSERT INTO t (c1, c2) VALUES ...            -- missing cols → NULL
  *   INSERT OVERWRITE t SELECT ...                -- full-table replace
  *   DELETE FROM t WHERE <cond>                   -- MoR position delete
  *   MERGE INTO t USING s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *             -- key upsert
  *
  * Spark-first mechanics: the parser already produces
  * [[InsertIntoStatement]] / [[DeleteFromTable]] / [[MergeIntoTable]];
  * a hint-batch rule claims the statement when its target is a catalog
  * table (so the builtin v2 analyzer never sees it and can't reject it
  * as "not a v2 table") and swaps in a [[LeafRunnableCommand]] that
  * routes to the SAME writer code paths the Scala API uses —
  * [[Writers.writeSnapshot]] / [[Writers.replaceSnapshot]] /
  * [[Writers.deleteWhereMoR]] / [[Writers.mergeInto]] — so SQL writes
  * get identical commit semantics: optimistic serializable intents,
  * CDC-exact feeds, sticky bloom/sketch maintenance.
  *
  * The captured source/query subplan is NOT a child of the command
  * (LeafRunnableCommand), so the outer analyzer leaves it alone; the
  * command analyzes it at RUN time on the live session, where catalog
  * tables inside it resolve through the injected read rules (an
  * `INSERT INTO t SELECT * FROM other_catalog_table` works end-to-end
  * in SQL).
  *
  * Scale notes: DELETE routes to the MERGE-ON-READ path — a WHERE whose
  * literal conjuncts translate to prune filters bounds the marking scan
  * to the files that could match (GDPR-sized deletes stay metadata-
  * sized at 100 TB); MERGE's rewrite set is key-range-bounded by the
  * source (Writers.mergeInto's keyBoundFilters). A DELETE whose
  * predicate matches most of the table should use the COW API instead —
  * same trade the Scala surface documents. */
object GraftDml {
  /** Data files written by SQL DML land under `<root>/<table>/data`
    * unless `spark.graft.catalog.dataDir` overrides the base. */
  val DataDirConf = "spark.graft.catalog.dataDir"

  /** Opaque expression holder: a command's constructor fields of type
    * `Expression` are scanned by CheckAnalysis, which rejects the (by
    * design) unresolved DML condition — the holder hides it from the
    * QueryPlan product scan; the command resolves it itself at run
    * time against the live table scan. */
  final case class Cond(e: Expression) {
    override def toString: String = e.sql
  }

  private[sql] def dataDirFor(session: SparkSession, root: String, table: String): String =
    session.conf.getOption(DataDirConf).filter(_.nonEmpty)
      .map(base => java.nio.file.Paths.get(base, table).toString)
      .getOrElse(java.nio.file.Paths.get(root, table, "data").toString)

  /** Strip qualifiers that refer to the target relation (its name or
    * alias) so the condition can resolve against a bare scan of it. */
  private[sql] def unqualify(e: Expression, quals: Set[String]): Expression =
    e.transform {
      case a: UnresolvedAttribute
          if a.nameParts.size == 2 && quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }

  /** The equi-join key columns of a canonical MERGE condition: a
    * conjunction of `t.k = s.k` equalities over same-named columns. */
  private[sql] def mergeKeyCols(cond: Expression): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new UnsupportedOperationException(
        "MERGE INTO through SQL supports ON conditions that are conjunctions of " +
          s"target.k = source.k equalities over same-named columns; got: ${other.sql}")
    }.distinct
  }
}

/** Claims INSERT / DELETE / MERGE statements whose target is a catalog
  * table. Injected in the hint batch (pre-`ResolveRelations`) so the
  * statement is rewritten before builtin resolution rejects the name. */
class GraftDmlRule(val session: SparkSession) extends Rule[LogicalPlan] {
  import GraftSqlResolution._

  /** The claimed table of a DML target, with its alias qualifiers. */
  private def target(p: LogicalPlan, cat: SnapshotCatalog): Option[(String, Set[String])] =
    p match {
      case u: UnresolvedRelation =>
        claimedTable(u.multipartIdentifier, cat).map(t => (t, Set(t.toLowerCase)))
      case SubqueryAlias(ident, u: UnresolvedRelation) =>
        claimedTable(u.multipartIdentifier, cat)
          .map(t => (t, Set(t.toLowerCase, ident.name.toLowerCase)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = rootOf(session) match {
    case None => plan
    case Some(root) =>
      val cat = catalogFor(root)
      plan.resolveOperatorsDown {
        case ins @ InsertIntoStatement(t, partSpec, userCols, query, overwrite, _, byName)
            if target(t, cat).isDefined =>
          val (table, _) = target(t, cat).get
          if (partSpec.nonEmpty) throw new UnsupportedOperationException(
            "INSERT with a PARTITION spec is not supported on graft catalog tables")
          GraftInsertCommand(root, table, userCols, query, overwrite, byName)
        case DeleteFromTable(t, cond) if target(t, cat).isDefined =>
          val (table, quals) = target(t, cat).get
          GraftDeleteCommand(root, table, GraftDml.Cond(cond), quals)
        case MergeIntoTable(t, source, cond, matched, notMatched, bySource, withSchemaEvo)
            if target(t, cat).isDefined =>
          val (table, _) = target(t, cat).get
          if (withSchemaEvo) throw new UnsupportedOperationException(
            "MERGE WITH SCHEMA EVOLUTION is not supported on graft catalog tables")
          val okMatched = matched match {
            case Seq(UpdateStarAction(None)) => true
            case _ => false
          }
          val okNotMatched = notMatched match {
            case Seq(InsertStarAction(None)) => true
            case _ => false
          }
          if (!okMatched || !okNotMatched || bySource.nonEmpty)
            throw new UnsupportedOperationException(
              "MERGE INTO through SQL supports exactly WHEN MATCHED THEN UPDATE SET * " +
                "and WHEN NOT MATCHED THEN INSERT * (no conditions, no " +
                "NOT MATCHED BY SOURCE); use the Scala API for other shapes")
          // key extraction at ANALYSIS time: an unsupported ON shape
          // fails the statement before anything runs
          GraftMergeCommand(root, table, source, GraftDml.mergeKeyCols(cond))
      }
  }
}

/** `INSERT INTO` → snapshot append; `INSERT OVERWRITE` → full replace.
  * Columns map positionally (SQL INSERT semantics) and cast to the
  * target schema; an explicit column list fills unnamed columns with
  * NULL. */
case class GraftInsertCommand(
    root: String,
    table: String,
    userCols: Seq[String],
    query: LogicalPlan,
    overwrite: Boolean,
    byName: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftSqlResolution.catalogFor(root)
    val schema = cat.schema(table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots for table $table"))
    val src = GraftColumnShim.ofRows(session, query)
    val projected =
      if (byName) {
        val missing = schema.fieldNames.filterNot(src.columns.contains)
        require(missing.isEmpty,
          s"INSERT BY NAME into $table is missing columns: ${missing.mkString(", ")}")
        src.select(schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)
      } else if (userCols.nonEmpty) {
        require(userCols.size == src.columns.size,
          s"INSERT column list has ${userCols.size} columns but the query produced ${src.columns.size}")
        val bad = userCols.filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(bad.isEmpty, s"unknown columns in INSERT list for $table: ${bad.mkString(", ")}")
        val byPos = userCols.map(_.toLowerCase).zip(src.columns).toMap
        src.select(schema.fields.map { f =>
          byPos.get(f.name.toLowerCase) match {
            case Some(srcCol) => col(srcCol).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }.toIndexedSeq: _*)
      } else {
        require(src.columns.size == schema.size,
          s"INSERT into $table needs ${schema.size} columns, query produced ${src.columns.size}")
        src.select(src.columns.zip(schema.fields).map { case (c, f) =>
          col(c).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      }
    val dataDir = GraftDml.dataDirFor(session, root, table)
    if (overwrite) Writers.replaceSnapshot(cat, table, projected, dataDir)
    else Writers.writeSnapshot(cat, table, projected, dataDir)
    Seq.empty
  }
}

/** `DELETE FROM t WHERE cond` → MoR position delete; the WHERE's
  * literal conjuncts also prune the marking scan's file set. */
case class GraftDeleteCommand(
    root: String,
    table: String,
    cond: GraftDml.Cond,
    qualifiers: Set[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftSqlResolution.catalogFor(root)
    val schema = cat.schema(table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots for table $table"))
    val prune = GraftSqlResolution.pruneFiltersFrom(cond.e, schema, qualifiers)
    val deleteCol = GraftColumnShim.column(GraftDml.unqualify(cond.e, qualifiers))
    Writers.deleteWhereMoR(session, cat, table, deleteCol, prune,
      GraftDml.dataDirFor(session, root, table))
    Seq.empty
  }
}

/** Canonical SQL upsert (`UPDATE SET *` / `INSERT *`) → the key-merge
  * writer: matched keys' files are rewritten without them, the source
  * is appended, rewrite set bounded by the source's key range. */
case class GraftMergeCommand(
    root: String,
    table: String,
    source: LogicalPlan,
    keyCols: Seq[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftSqlResolution.catalogFor(root)
    val src = GraftColumnShim.ofRows(session, source)
    // cast to the target schema so a literal-typed SQL source (INT keys
    // against a BIGINT table) can't drift the table's column types
    val schema = cat.schema(table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots for table $table"))
    val aligned = src.select(src.columns.map { c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)) match {
        case Some(f) => col(c).cast(f.dataType).as(f.name)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    Writers.mergeInto(session, cat, table, aligned, keyCols,
      GraftDml.dataDirFor(session, root, table))
    Seq.empty
  }
}
