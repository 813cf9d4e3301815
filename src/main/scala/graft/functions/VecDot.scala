package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native Catalyst dot product over float/double array columns, WITH
  * whole-stage codegen (`doGenCode` emits a primitive loop).
  *
  * Why a custom expression (SURVEY §2.3 L5–L7 hot path): the
  * `zip_with`+`aggregate` formulation is a higher-order function —
  * interpreted, boxed, no codegen — and profiling showed it dominating
  * every ANN query. This is the preferred extension order from the
  * build brief: compose built-ins first, then a native `Expression`
  * before ever reaching for UDFs.
  *
  * Semantics match the HOF version bit-for-bit: elements widen to
  * double, products accumulate sequentially in index order — INCLUDING
  * the null cases: mismatched lengths or a null element yield NULL,
  * exactly as `aggregate(zip_with(a, b, (x, y) -> x * y), ...)` does
  * (zip_with pads the shorter side with nulls), instead of silently
  * truncating to the common prefix.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on length mismatch / null element, regardless of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (bb.numElements() != n) return null
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

/** Column-API + SQL-registry surface for the native vector functions. */
object VecFunctions {

  def vecDot(a: Column, b: Column): Column =
    GraftColumnShim.column(VecDot(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Runtime SQL registration (`SELECT vec_dot(a, b)`): usable on any
    * session, including driver-created ones where
    * `SparkSessionExtensions` config isn't available. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("vec_dot")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_dot requires exactly 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      })
    }
  }
}
