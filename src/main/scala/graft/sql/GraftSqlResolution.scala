package graft.sql

import graft.meta.SnapshotCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL-level access to the snapshot catalog via pure
  * `SparkSessionExtensions` — the Iceberg-parity time-travel syntax for
  * SQL-only users (reference: src/iceberg_management/metadata.py:222
  * `time_travel_scan`, reachable there only through the Python API):
  *
  *   SELECT ... FROM <table> VERSION AS OF 3          -- snapshot id
  *   SELECT ... FROM <table> VERSION AS OF 'prod'     -- tag or branch
  *   SELECT ... FROM <table> TIMESTAMP AS OF '2026-01-01 00:00:00'
  *
  * plus plain `SELECT ... FROM <table>` resolution for any committed
  * catalog table that is not already a temp view. Activated by setting
  * `spark.graft.catalog.root` (the catalog directory) on any session
  * running with `spark.sql.extensions=graft.GraftExtensions` — no code
  * access needed, the shared-cluster deployment story.
  *
  * Spark-first mechanics: the parser already produces
  * [[RelationTimeTravel]] for the `AS OF` syntax; the time-travel rule
  * is injected into the HINT-resolution batch, which runs BEFORE the
  * analyzer's `ResolveRelations` — so graft resolves the `AS OF` even
  * when the same name is registered as a temp view (Spark itself
  * refuses time travel over temp views; the catalog is what holds the
  * history). The substituted subtree is the ANALYZED plan of the
  * pruned snapshot read — Catalyst then pushes filters/projections
  * into its parquet scan like any view expansion. Plain-name fallback
  * is a normal resolution rule, so real temp views and session-catalog
  * tables always win for un-suffixed names. */
object GraftSqlResolution {
  /** Session conf key holding the catalog root directory. */
  val RootConf = "spark.graft.catalog.root"

  // one catalog instance per root: SnapshotCatalog memoizes manifest
  // parses, and a fresh instance per query would defeat that
  private val catalogs = new java.util.concurrent.ConcurrentHashMap[String, SnapshotCatalog]()
  def catalogFor(root: String): SnapshotCatalog =
    catalogs.computeIfAbsent(root, r => new SnapshotCatalog(r))

  private[sql] def rootOf(session: SparkSession): Option[String] =
    session.conf.getOption(RootConf).filter(_.nonEmpty)

  /** The name parts this rule claims: a bare `t`, or an explicit
    * `graft.t` that bypasses any same-named temp view. */
  private[sql] def claimedTable(parts: Seq[String], cat: SnapshotCatalog): Option[String] =
    parts match {
      case Seq(t) if cat.tables().contains(t) => Some(t)
      case Seq(ns, t) if ns.equalsIgnoreCase("graft") && cat.tables().contains(t) => Some(t)
      case _ => None
    }

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis: cast to
    * timestamp in the session zone, require foldability (the grammar
    * only admits literals/simple exprs), eval to micros. */
  private[sql] def evalAsOfMillis(session: SparkSession, e: Expression): Long = {
    val cast = Cast(e, TimestampType, Some(session.sessionState.conf.sessionLocalTimeZone))
    require(cast.foldable, s"TIMESTAMP AS OF expression must be foldable: ${e.sql}")
    cast.eval() match {
      case micros: java.lang.Long => micros / 1000L
      case other => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF did not evaluate to a timestamp: $other")
    }
  }
}

/** Resolves `FROM t VERSION/TIMESTAMP AS OF ...` against the snapshot
  * catalog. Injected as a hint-resolution rule (pre-`ResolveRelations`)
  * so the catalog — the component that actually HAS history — wins the
  * name even when a temp view shadows it. */
class GraftTimeTravelRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftSqlResolution._

  override def apply(plan: LogicalPlan): LogicalPlan = rootOf(session) match {
    case None => plan
    case Some(root) =>
      val cat = catalogFor(root)
      plan.resolveOperatorsUp {
        case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
            if claimedTable(u.multipartIdentifier, cat).isDefined =>
          val table = claimedTable(u.multipartIdentifier, cat).get
          val df = (ts, ver) match {
            case (Some(expr), None) =>
              cat.read(session, table, asOfTimestampMs = Some(evalAsOfMillis(session, expr)))
            case (None, Some(v)) =>
              v.toLongOption match {
                case Some(id) => cat.read(session, table, snapshotId = Some(id))
                case None =>
                  // a named ref: tag first (immutable pin), then branch head
                  cat.snapshotByTag(table, v) match {
                    case Some(snap) => cat.read(session, table, snapshotId = Some(snap.snapshotId))
                    case None if cat.branches(table).contains(v) =>
                      cat.read(session, cat.branchRef(table, v))
                    case None => throw new IllegalArgumentException(
                      s"VERSION AS OF '$v': no snapshot id, tag or branch of that name on $table")
                  }
              }
            case _ => throw new IllegalArgumentException(
              "time travel needs exactly one of VERSION AS OF / TIMESTAMP AS OF")
          }
          df.queryExecution.analyzed
      }
  }
}

/** Plain-name fallback: `FROM t` (or `FROM graft.t`) resolves to the
  * catalog's CURRENT snapshot when nothing else claimed the name —
  * injected in the normal resolution batch, so builtin temp-view /
  * session-catalog resolution has already had its chance. */
class GraftCatalogRelationRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftSqlResolution._

  override def apply(plan: LogicalPlan): LogicalPlan = rootOf(session) match {
    case None => plan
    case Some(root) =>
      val cat = catalogFor(root)
      plan.resolveOperatorsUp {
        case u: UnresolvedRelation if claimedTable(u.multipartIdentifier, cat).isDefined =>
          cat.read(session, claimedTable(u.multipartIdentifier, cat).get)
            .queryExecution.analyzed
      }
  }
}
