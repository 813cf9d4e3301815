package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen hash/sketch expressions for the dedup hot paths
  * (SURVEY §2.3 L2–L4). Like [[VecDot]], these replace interpreted
  * higher-order formulations with primitive loops; as hand-emitted Java
  * they may also use wrapping 64-bit arithmetic freely (Catalyst-level
  * `*`/`+` would trip ANSI overflow checks).
  */
object HashExprs {

  /** Murmur3 64-bit finalizer — the mixing primitive for seeded
    * re-hashing (public-domain constants). */
  @inline def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  val FmixJava: String =
    """h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL;
      |h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L;
      |h ^= h >>> 33;""".stripMargin

  /** Per-permutation seeds, fixed for the life of the format. */
  val MinHashSeeds: Array[Long] =
    Array.tabulate(64)(k => fmix64(0x9E3779B97F4A7C15L * (k + 1)))

  def simhash64(wordHashes: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(wordHashes)))

  def minhashSig(hashes: Column): Column =
    GraftColumnShim.column(MinHashSig(GraftColumnShim.expression(hashes)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnShim.column(SortedLongIntersectCount(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}

private[functions] trait LongArrayInput { self: Expression =>
  protected def checkLongArray(types: DataType*): TypeCheckResult =
    if (types.forall(_ == ArrayType(LongType, containsNull = false)) ||
        types.forall { case ArrayType(LongType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint> inputs")
}

/** 64-bit SimHash of a word-hash array: each hash votes ±1 per bit
  * position; the sign vector packs into a long. One primitive pass,
  * O(64·n) adds with no allocation beyond the vote buffer. */
case class SimHash64(child: Expression) extends UnaryExpression with LongArrayInput {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = checkLongArray(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 64; $k++) if ($votes[$k] > 0) $out |= (1L << $k);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** 64-permutation MinHash signature of a hash array: sig[k] = min over
  * hashes of fmix64(h ^ seed[k]) — all permutations in one pass. */
case class MinHashSig(child: Expression) extends UnaryExpression with LongArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkLongArray(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(64)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 = arr.getLong(i)
      var k = 0
      while (k < 64) {
        val v = HashExprs.fmix64(h0 ^ HashExprs.MinHashSeeds(k))
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", HashExprs.MinHashSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[64];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    long h = $h ^ $seedsRef[$k];
         |    ${HashExprs.FmixJava}
         |    if (h < $sig[$k]) $sig[$k] = h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Intersection size of two SORTED long arrays via a merge walk —
  * O(n+m), no hashing, no allocation. Callers must pre-sort
  * (`sort_array`); results equal `size(array_intersect(a,b))` on
  * distinct inputs. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayInput {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (aa.numElements(), bb.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = aa.getLong(i); val y = bb.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}
