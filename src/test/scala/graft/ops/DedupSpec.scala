package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  /** Ground-truth near-dup pairs by exact all-pairs shingle jaccard
    * (driver-side, test only — fine at sf0.001's 500 docs). */
  private lazy val truePairs: Set[(Long, Long, Double)] = {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").sliding(3).map(_.mkString(" ")).toSet)
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.5
    } yield (ia, ib, j)).toSet
  }

  test("minhash LSH finds every true pair with jaccard >= 0.8 (high-recall band)") {
    val found = Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mustFind = truePairs.filter(_._3 >= 0.8).map(t => (t._1, t._2))
    assert(mustFind.nonEmpty, "test data should contain planted near-dups")
    assert(mustFind.subsetOf(found),
      s"missed: ${mustFind.diff(found)}")
  }

  test("incremental dedup against a corpus: exact clones resolve, novels pass, near-dups match") {
    import spark.implicits._
    // batch: 10 exact clones, 10 uniquely-suffixed novels
    val clones = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val novels = docs.filter(col("doc_id").between(10, 19))
      .select((col("doc_id") + 2000L).as("doc_id"),
        concat(col("text"), lit(" qz"), col("doc_id"), lit("qz unique tail marker")).as("text"))
    val batch = clones.unionByName(novels)

    val exact = Dedup.exactAgainstCorpus(batch, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    (0 until 10).foreach { i =>
      val dup = exact(i + 1000L)
      assert(dup.isDefined, s"clone of doc $i not matched")
      // keeper is the min-id member of doc i's exact-dup group
      val fp = docs.filter(col("doc_id") === i)
        .select(TextAnalysis.fingerprint(col("text"))).head().getString(0)
      val keeper = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"))
        .filter(col("f") === fp).agg(min(col("doc_id"))).head().getLong(0)
      assert(dup.contains(keeper))
    }
    (10 until 20).foreach(i => assert(exact(i + 2000L).isEmpty, s"novel $i misflagged"))

    // near-dup form: a lightly-edited clone (one word changed) must still
    // find its source with high jaccard; the unique-tail novels must not
    val edited = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 3000L).as("doc_id"),
        concat(lit("zzz "), substring(col("text"), 5, 100000)).as("text"))
    val near = Dedup.nearDupAgainstCorpus(
      edited.unionByName(novels), docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { i =>
      assert(near.get(i + 3000L).nonEmpty, s"edited clone of doc $i not matched")
    }
  }

  test("minhash LSH reports exact jaccard for reported pairs (precision exact)") {
    val reported = Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = truePairs.map(t => (t._1, t._2) -> t._3).toMap
    reported.foreach { case (a, b, j) =>
      assert(truth.contains((a, b)), s"false positive ($a,$b)")
      assert(math.abs(truth((a, b)) - j) < 1e-9)
    }
  }

  test("simhash bucketing is COMPLETE for hamming <= 3 (pigeonhole over 4x16-bit chunks)") {
    // ground truth: all pairs within hamming 3 of the collected simhashes
    val sims = docs.select(col("doc_id"), Dedup.simhash("text").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sims; (ib, sb) <- sims
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val found = Dedup.simhashDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "corpus should contain simhash-close pairs")
    assert(found == want, s"missed: ${want.diff(found)}; extra: ${found.diff(want)}")
  }

  test("simhash is deterministic across runs") {
    val a = Dedup.simhashDuplicates(docs, "doc_id", "text", 3).collect().toSet
    val b = Dedup.simhashDuplicates(docs, "doc_id", "text", 3).collect().toSet
    assert(a == b)
  }

  test("exact dedup groups cover all docs with no content collisions") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.agg(sum("n_copies")).head().getLong(0) == docs.count())
  }

  test("prefix clusters match driver-side ground truth and respect k") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
    def want(k: Int): Map[String, (Long, Long)] = texts
      .groupBy { case (_, ws) => ws.take(k).mkString(" ") }
      .collect { case (p, g) if g.size >= 2 => p -> ((g.size.toLong, g.map(_._1).min)) }
    for (k <- Seq(2, 3)) {
      val got = Dedup.prefixClusters(docs, "doc_id", "text", k)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want(k), s"k=$k")
    }
    assert(want(2).nonEmpty, "corpus should form prefix clusters at k=2")
  }

  test("ngram jaccard search matches driver-side ground truth") {
    val got = Dedup.ngramJaccardSearch(docs, "doc_id", "text", col("id") < 100, 0.15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = {
      val rows = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").sliding(3).map(_.mkString(" ")).toSet)
      (for {
        (ia, sa) <- rows if ia < 100
        (ib, sb) <- rows if ia < ib
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.15
      } yield (ia, ib)).toSet
    }
    assert(got == want)
  }

  test("planted-pair recall gates: minhash catches ALL jaccard>=0.97 pairs; simhash quantified") {
    val planted = truePairs.filter(_._3 >= 0.97).map(t => (t._1, t._2))
    assert(planted.nonEmpty, "test data should contain planted near-dup pairs")
    val mh = Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhRecall = planted.count(mh.contains).toDouble / planted.size
    val sh = Dedup.simhashDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shRecall = planted.count(sh.contains).toDouble / planted.size
    val lsh = Dedup.ngramJaccardSearchLsh(docs, "doc_id", "text", lit(true), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = planted.count(lsh.contains).toDouble / planted.size
    info(f"planted=${planted.size} minhashRecall=$mhRecall%.3f " +
      f"simhashRecall=$shRecall%.3f ngramLshRecall=$lshRecall%.3f")
    // 16 bands x 4 rows at s=0.97: per-band hit 0.885, miss-all 3e-15
    assert(mhRecall == 1.0, f"minhash recall $mhRecall%.3f")
    assert(lshRecall == 1.0, f"ngram-LSH recall $lshRecall%.3f")
    // SimHash's end-to-end recall on jaccard-planted pairs is bounded by
    // the HASH's locality, not the bucketing: a 0.97-jaccard edit can
    // still flip >maxHamming sign bits (each token shifts all 64 bit
    // sums). The bucketing itself is COMPLETE for hamming<=maxHamming
    // (pigeonhole, spec'd above) — proven again here: every planted pair
    // simhash missed is OUTSIDE the operator's contract radius, so
    // conditional recall (pairs within radius) is exactly 1.0. The 0.9
    // floor is the measured deterministic locality of this corpus.
    assert(shRecall >= 0.9, f"simhash recall $shRecall%.3f")
    val hashes = docs.select(col("doc_id"), Dedup.simhash("text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missed = planted.filterNot(sh.contains)
    missed.foreach { case (a, b) =>
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(d > 3, s"pair ($a,$b) at hamming $d <= 3 was missed: bucketing incomplete")
    }
  }

  test("band schedule is a real parameter: wider banding keeps exactness and planted recall") {
    val planted = truePairs.filter(_._3 >= 0.97).map(t => (t._1, t._2))
    // 32 bands x 2 rows: higher recall at lower jaccard, same exact verify
    val found = Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.5, numBands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = truePairs.map(t => (t._1, t._2) -> t._3).toMap
    found.foreach { case (a, b, j) =>
      assert(truth.contains((a, b)) && math.abs(truth((a, b)) - j) < 1e-9)
    }
    assert(planted.subsetOf(found.map(r => (r._1, r._2)).toSet))
    intercept[IllegalArgumentException] {
      Dedup.minhashDuplicates(docs, "doc_id", "text", 0.5, numBands = 7)
    }
  }

  test("simhash pigeonhole completeness holds for non-default maxHamming") {
    val sims = docs.select(col("doc_id"), Dedup.simhash("text").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (h <- Seq(1, 4)) { // 2 chunks of 32 bits; 5 chunks of 12-13 bits
      val want = (for {
        (ia, sa) <- sims; (ib, sb) <- sims
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= h
      } yield (ia, ib)).toSet
      val found = Dedup.simhashDuplicates(docs, "doc_id", "text", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found == want, s"maxHamming=$h: missed ${want.diff(found)}, extra ${found.diff(want)}")
    }
  }

  test("adversarial 10k-clone corpus: candidates bounded, run completes, non-clone recall intact") {
    import spark.implicits._
    val cloneText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    val clones = (1L to 10000L).map(id => (id, cloneText))
    // planted near-dup pairs on vocabularies disjoint from the clones
    val pairTexts = Seq(
      "red orange yellow green blue indigo violet crimson maroon teal navy coral amber jade",
      "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
      "north south east west spring summer autumn winter morning evening noon midnight dawn dusk")
    val planted = pairTexts.zipWithIndex.flatMap { case (t, i) =>
      val a = 20001L + 2 * i
      Seq((a, t), (a + 1, t + " extra"))
    }
    val corpus = spark.createDataset(clones ++ planted).toDF("doc_id", "text")

    // candidate generation stays linear: one wide bucket per band star-pairs
    // (~10k candidates), not the ~50M-per-band all-pairs blowup (n^2/2 = 5e7)
    val banded = Dedup.bandedSignatures(corpus, "doc_id", "text")
    val cands = Dedup.boundedBucketPairs(
      banded, Seq("band", "band_hash"), "doc_id", Dedup.MaxBucketWidth).count()
    assert(cands < 50000L, s"$cands candidates for a 10k-clone corpus; star guard failed")

    val found = Dedup.minhashDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every clone links into the duplicate group via the representative
    val cloneLinks = found.filter(p => p._1 <= 10000L && p._2 <= 10000L)
    assert(cloneLinks.length == 9999, s"${cloneLinks.length} clone links, want 9999")
    assert(cloneLinks.forall(p => p._1 == 1L && p._3 == 1.0))
    // planted non-clone pairs are in narrow buckets: recall unchanged
    pairTexts.indices.foreach { i =>
      val a = 20001L + 2 * i
      assert(found.exists(p => p._1 == a && p._2 == a + 1),
        s"planted pair ($a, ${a + 1}) lost to the skew guard")
    }
  }

  test("duplicate clusters: transitive closure labels every member with the min id") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val alt = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    // a chain where the endpoints are BELOW the pair threshold: only the
    // transitive closure merges them into one cluster
    // adjacent jaccard 12/16 = 0.75 >= 0.7; endpoints 10/18 = 0.56 < 0.7
    val chain0 = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16"
    val chain1 = chain0.replace("c15 c16", "d15 d16")
    val chain2 = chain1.replace("c1 c2", "d1 d2")
    val corpus = Seq(
      (1L, base), (2L, base), (3L, base), (4L, base),
      (10L, alt), (11L, alt), (12L, alt),
      (20L, chain0), (21L, chain1), (22L, chain2),
      (30L, "solo unique text nothing like the others at all here end")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashDuplicates(corpus, "doc_id", "text", threshold = 0.7)
    // endpoints are not a direct pair (jaccard ~0.56 < 0.7)...
    assert(!pairs.collect().exists(r => r.getLong(0) == 20L && r.getLong(1) == 22L))
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(clusters(_) == 10L))
    // ...but the closure still collapses the chain to one root
    assert(Seq(20L, 21L, 22L).forall(clusters(_) == 20L))
    assert(!clusters.contains(30L), "singletons must not appear in the cluster map")
  }

  test("minhash plan has no cartesian product (scale guard)") {
    val plan = Dedup.minhashDuplicates(docs, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }
}
