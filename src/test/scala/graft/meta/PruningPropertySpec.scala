package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pruning soundness as a property: a file that CONTAINS a matching row
  * must never be skipped, for every filter kind and any stats/partition
  * metadata shape. (Completeness — skipping as much as possible — is
  * covered by the targeted specs; soundness is the side where a bug
  * silently loses data, so it gets the generative treatment. Pure JVM:
  * no Spark jobs, hundreds of cases per run.)
  */
class PruningPropertySpec extends AnyFunSuite {

  private val cat = new SnapshotCatalog("/tmp/unused-prop")

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val values: Gen[Seq[Double]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))

  test("property: RangeNum never skips a file whose rows intersect the range") {
    sample(values, 300, 7L).zipWithIndex.foreach { case (vs, i) =>
      val f = FileMeta("/f", vs.size.toLong, 0L,
        stats = Map("c" -> ColStats(minD = Some(vs.min), maxD = Some(vs.max))))
      // pick a row the file really contains, and a range around it
      val v = vs(i % vs.size)
      val (lo, hi) = (v - math.abs(v) * 0.1 - 1, v + math.abs(v) * 0.1 + 1)
      assert(cat.fileMatches(f, Seq(RangeNum("c", lo, hi))), s"case $i skipped v=$v")
      assert(cat.fileMatches(f, Seq(RangeNum("c", v, v))), s"case $i skipped point $v")
    }
  }

  private val strings: Gen[Seq[String]] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12))))

  test("property: EqString / RangeString never skip a file containing the value") {
    sample(strings, 300, 11L).zipWithIndex.foreach { case (vs0, i) =>
      val vs = vs0.map(s => if (s.isEmpty) "x" else s)
      val f = FileMeta("/f", vs.size.toLong, 0L,
        stats = Map("c" -> ColStats(minS = Some(vs.min), maxS = Some(vs.max))))
      val v = vs(i % vs.size)
      assert(cat.fileMatches(f, Seq(EqString("c", v))), s"case $i Eq skipped $v")
      assert(cat.fileMatches(f, Seq(RangeString("c", v, v))), s"case $i point-range skipped $v")
      assert(cat.fileMatches(f, Seq(RangeString("c", vs.min, vs.max))), s"case $i full-range skipped")
    }
  }

  test("property: partition-value pruning is exact in both directions") {
    sample(Gen.chooseNum(0L, 999L), 200, 13L).zipWithIndex.foreach { case (pv, i) =>
      val f = FileMeta("/f", 1L, 0L, partitionValues = Map("p" -> pv.toString))
      assert(cat.fileMatches(f, Seq(EqString("p", pv.toString))))
      assert(!cat.fileMatches(f, Seq(EqString("p", (pv + 1).toString))), s"case $i kept wrong partition")
      assert(cat.fileMatches(f, Seq(RangeNum("p", pv.toDouble, pv.toDouble))))
      assert(!cat.fileMatches(f, Seq(RangeNum("p", pv + 1.0, pv + 2.0))), s"case $i range kept wrong partition")
    }
  }

  test("property: files with NO stats for the filtered column are always kept") {
    sample(strings, 100, 17L).foreach { vs =>
      val f = FileMeta("/f", vs.size.toLong, 0L, stats = Map.empty)
      assert(cat.fileMatches(f, Seq(
        EqString("absent", "anything"),
        RangeNum("absent", -1, 1),
        RangeString("absent", "a", "b"))))
    }
  }

  test("property: transform-mapped filters never skip the partition holding the value") {
    // truncate: a file whose partition is trunc(v) must survive every
    // filter shape mentioning v; prefix truncation must stay monotone
    val tr = TruncateTransform("c", 3)
    sample(strings, 200, 19L).zipWithIndex.foreach { case (vs0, i) =>
      val vs = vs0.map(s => if (s.isEmpty) "x" else s)
      val v = vs(i % vs.size)
      val f = FileMeta("/f", 1L, 0L, partitionValues = Map(tr.partCol -> tr.truncOf(v)))
      assert(cat.fileMatches(f, PartitionTransforms.mapFilters(Seq(tr), Seq(EqString("c", v)))),
        s"case $i truncate Eq skipped $v")
      assert(cat.fileMatches(f,
        PartitionTransforms.mapFilters(Seq(tr), Seq(RangeString("c", vs.min, vs.max))) ++
          Nil) || !(vs.min <= v && v <= vs.max),
        s"case $i truncate range skipped $v")
      assert(cat.fileMatches(f, PartitionTransforms.mapFilters(Seq(tr), Seq(InString("c", vs)))),
        s"case $i truncate IN skipped $v")
      // monotonicity of the mapped range itself
      assert(tr.truncOf(vs.min) <= tr.truncOf(v) && tr.truncOf(v) <= tr.truncOf(vs.max))
    }
    // bucket: the file in bucketOf(v) must survive Eq/IN on v
    val b = BucketTransform("c", 7)
    sample(strings, 200, 23L).zipWithIndex.foreach { case (vs0, i) =>
      val vs = vs0.map(s => if (s.isEmpty) "y" else s)
      val v = vs(i % vs.size)
      val f = FileMeta("/f", 1L, 0L, partitionValues = Map(b.partCol -> b.bucketOf(v)))
      assert(cat.fileMatches(f, PartitionTransforms.mapFilters(Seq(b), Seq(EqString("c", v)))),
        s"case $i bucket Eq skipped $v")
      assert(cat.fileMatches(f, PartitionTransforms.mapFilters(Seq(b), Seq(InString("c", vs)))),
        s"case $i bucket IN skipped $v")
    }
    // days: a file whose partition is the day of any ms in [lo, hi] must
    // survive the mapped range
    val d = DaysTransform("ts")
    sample(Gen.chooseNum(0L, 3_000_000_000_000L), 200, 29L).zipWithIndex.foreach { case (ms, i) =>
      val f = FileMeta("/f", 1L, 0L,
        partitionValues = Map(d.partCol -> d.dayOfMillis(ms.toDouble)))
      val lo = math.max(0L, ms - 86400000L * 3)
      val hi = ms + 86400000L * 2
      assert(cat.fileMatches(f,
        PartitionTransforms.mapFilters(Seq(d), Seq(RangeNum("ts", lo.toDouble, hi.toDouble)))),
        s"case $i days skipped ms=$ms")
    }
  }
}
