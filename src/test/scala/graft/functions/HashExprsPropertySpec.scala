package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native codegen expressions: several hundred
  * ScalaCheck-generated cases evaluated through REAL Spark plans (one
  * job per property), compared against independent Scala references.
  */
class HashExprsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[Seq[A]], n: Int): Seq[Seq[A]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val longArrays: Gen[Seq[Long]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  test("property: sorted_intersect_count == distinct-set intersection size") {
    val cases = sample(longArrays, 150).zip(sample(longArrays, 150)).zipWithIndex
      .map { case ((a, b), i) =>
        // share some elements so intersections are non-trivial
        val shared = a.take(i % 10)
        (i.toLong, (a ++ shared).distinct.sorted, (b ++ shared).distinct.sorted)
      }
    val got = cases.toDF("i", "a", "b")
      .select(col("i"), HashExprs.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (i, a, b) =>
      assert(got(i) == a.toSet.intersect(b.toSet).size, s"case $i")
    }
  }

  test("property: simhash64 matches reference vote-and-pack") {
    def ref(hs: Seq[Long]): Long = {
      val votes = Array.fill(64)(0)
      hs.foreach(h => (0 until 64).foreach(k =>
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1))
      (0 until 64).foldLeft(0L)((acc, k) => if (votes(k) > 0) acc | (1L << k) else acc)
    }
    val cases = sample(longArrays, 150).zipWithIndex.map { case (a, i) => (i.toLong, a) }
    val got = cases.toDF("i", "a")
      .select(col("i"), HashExprs.simhash64(col("a")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (i, a) => assert(got(i) == ref(a), s"case $i") }
  }

  test("property: minhash_sig matches reference seeded-fmix minima and is permutation-invariant") {
    def ref(hs: Seq[Long]): Seq[Long] =
      (0 until 64).map { k =>
        if (hs.isEmpty) Long.MaxValue
        else hs.map(h => HashExprs.fmix64(h ^ HashExprs.MinHashSeeds(k))).min
      }
    val base = sample(longArrays, 80).zipWithIndex.map { case (a, i) => (i.toLong, a) }
    val cases = base ++ base.map { case (i, a) =>
      (i + 1000, scala.util.Random.javaRandomToRandom(new java.util.Random(i)).shuffle(a))
    }
    val got = cases.toDF("i", "a")
      .select(col("i"), HashExprs.minhashSig(col("a")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    base.foreach { case (i, a) =>
      assert(got(i) == ref(a), s"case $i vs reference")
      assert(got(i) == got(i + 1000), s"case $i not permutation-invariant")
    }
  }

  test("property: vec_dot matches reference double accumulation") {
    val floatArrays: Gen[Seq[Float]] =
      Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100f, 100f)))
    val cases = sample(floatArrays, 120).zip(sample(floatArrays, 120)).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val got = cases.toDF("i", "a", "b")
      .select(col("i"), VecFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (i, a, b) =>
      var acc = 0.0
      a.zip(b).foreach { case (x, y) => acc += x.toDouble * y.toDouble }
      assert(got(i) == acc, s"case $i")
    }
  }
}
