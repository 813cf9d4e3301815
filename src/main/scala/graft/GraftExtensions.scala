package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: activates graft's native
  * functions on any session via
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment-config
  * route for clusters where code can't call
  * `VecFunctions.register` (e.g. SQL-only users on a shared cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_dot requires exactly 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }))
    // SQL time travel + catalog-table resolution over the snapshot
    // catalog (activated by spark.graft.catalog.root — see
    // graft.sql.GraftSqlResolution). Hint batch: BEFORE builtin
    // ResolveRelations, so `VERSION AS OF` wins even over a same-named
    // temp view; plain names resolve in the normal batch, after
    // builtins had their chance.
    ext.injectHintResolutionRule(session => new graft.sql.GraftTimeTravelRule(session))
    // metadata-only COUNT folding must precede the relation rule: once
    // the scan subtree is substituted the count shape is gone — and it
    // sits in the normal batch so temp views still win plain names
    ext.injectResolutionRule(session => new graft.sql.GraftMetaCountRule(session))
    ext.injectResolutionRule(session => new graft.sql.GraftCatalogRelationRule(session))
    // SQL DML (INSERT/DELETE/MERGE) on catalog tables — claimed in the
    // hint batch so the builtin v2 analyzer never rejects the target;
    // routed to the same Writers paths the Scala API uses.
    ext.injectHintResolutionRule(session => new graft.sql.GraftDmlRule(session))
  }
}
