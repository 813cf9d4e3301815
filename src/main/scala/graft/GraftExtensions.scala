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
  }
}
