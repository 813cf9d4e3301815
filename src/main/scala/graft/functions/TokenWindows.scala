package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token sliding-window extraction for the substring-dedup hot
  * path (SURVEY §2.3 L42). The interpreted formulation —
  * `transform(sequence(...), i -> array_join(slice(words, i, k)))` —
  * costs ~7× the codegen'd word explode at sf0.1 (higher-order
  * functions are interpreted per-element with no CSE; the r1 lesson
  * that produced [[VecDot]] and [[HashExprs]]). These expressions do
  * one byte scan per document instead.
  *
  * [[TokenWindowGrams]] exploits the delimiter structure: tokens split
  * on a single space are CONTIGUOUS in the source bytes, so the k-token
  * window joined with single spaces is exactly the original byte span
  * from the start of token i to the end of token i+k−1 —
  * `UTF8String.fromBytes` wraps that span with zero copying or string
  * building (a 0x20 byte never occurs inside a UTF-8 multi-byte
  * sequence, so the byte scan is UTF-8-safe). Semantically identical to
  * the interpreted form, including empty tokens under repeated spaces.
  *
  * [[TokenWindowHashes]] is the true Rabin–Karp form: gram STRINGS never
  * materialize anywhere — per-token FNV-1a→fmix64 hashes combine into a
  * per-window polynomial hash in one pass. Hand-emitted arithmetic
  * wraps freely (Catalyst `*`/`+` would trip ANSI overflow checks).
  */
object TokenWindows {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Token start offsets (byte positions) of `b` split on 0x20; returns
    * null when there are fewer than k tokens (no windows). */
  private def tokenStarts(b: Array[Byte], k: Int): Array[Int] = {
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n - k + 1 < 1) return null
    val starts = new Array[Int](n)
    var t = 1
    i = 0
    while (i < b.length) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts
  }

  /** All k-token window grams of `text` as zero-copy byte-span slices. */
  def grams(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes
    val starts = tokenStarts(b, k)
    if (starts == null) return Empty
    val n = starts.length
    val wins = n - k + 1
    val out = new Array[Any](wins)
    var w = 0
    while (w < wins) {
      val s = starts(w)
      val e = if (w + k == n) b.length else starts(w + k) - 1
      out(w) = UTF8String.fromBytes(b, s, e - s)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** All k-token window hashes: per-token FNV-1a 64 → fmix64, combined
    * per window with a wrapping polynomial, finalized with fmix64. */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    val wins = n - k + 1
    if (wins < 1) return Empty
    val th = new Array[Long](n)
    var t = 0
    var h = 0xCBF29CE484222325L
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        th(t) = HashExprs.fmix64(h); t += 1; h = 0xCBF29CE484222325L
      } else h = (h ^ (b(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    val out = new Array[Long](wins)
    var w = 0
    while (w < wins) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = acc * 0x9E3779B97F4A7C15L + th(w + j); j += 1 }
      out(w) = HashExprs.fmix64(acc)
      w += 1
    }
    new GenericArrayData(out)
  }

  def windowGrams(text: Column, k: Int): Column =
    GraftColumnShim.column(TokenWindowGrams(GraftColumnShim.expression(text), k))

  def windowHashes(text: Column, k: Int): Column =
    GraftColumnShim.column(TokenWindowHashes(GraftColumnShim.expression(text), k))
}

private[functions] trait StringInput { self: Expression =>
  protected def checkString(t: DataType): TypeCheckResult =
    if (t == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
}

case class TokenWindowGrams(child: Expression, k: Int)
    extends UnaryExpression with StringInput {
  require(k >= 2, s"window must be >= 2 tokens, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)

  override def nullSafeEval(input: Any): Any =
    TokenWindows.grams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindows.grams($c, $k);")

  override protected def withNewChildInternal(c: Expression): TokenWindowGrams =
    copy(child = c)
  override def prettyName: String = "token_window_grams"
}

case class TokenWindowHashes(child: Expression, k: Int)
    extends UnaryExpression with StringInput {
  require(k >= 2, s"window must be >= 2 tokens, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)

  override def nullSafeEval(input: Any): Any =
    TokenWindows.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindows.hashes($c, $k);")

  override protected def withNewChildInternal(c: Expression): TokenWindowHashes =
    copy(child = c)
  override def prettyName: String = "token_window_hashes"
}
