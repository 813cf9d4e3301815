package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** BPE training + encoding (SURVEY §2.3 L40): the classic
  * hand-computable merge sequence, the greedy encode rule, determinism
  * under partitioning, and an equivalence gate proving the incremental
  * pair-maintenance trainer matches a naive recount-everything
  * implementation on random corpora. */
class BpeSpec extends SparkSpec {

  // Sennrich et al. 2016's worked example
  private val classic = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("classic corpus yields the textbook merge sequence") {
    val model = Bpe.trainFromCounts(classic, numMerges = 5)
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o"), ("lo", "w")))
  }

  test("greedy encode applies merges in rank order: lowest -> low + est</w>") {
    val model = Bpe.trainFromCounts(classic, numMerges = 5)
    assert(Bpe.encodeWord("lowest", model.ranks) == Seq("low", s"est${Bpe.Eow}"))
    assert(Bpe.encodeWord("newest", model.ranks) == Seq("n", "e", "w", s"est${Bpe.Eow}"))
    // an unseen word degrades to characters + marker, never fails
    assert(Bpe.encodeWord("zq", model.ranks) == Seq("z", "q", Bpe.Eow))
  }

  test("train from a DataFrame equals trainFromCounts; encode is partition-independent") {
    import spark.implicits._
    val texts = classic.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .grouped(3).map(_.mkString(" ")).toSeq.zipWithIndex
      .map { case (t, i) => (i.toString, t) }
    val df = texts.toDF("id", "text")
    val model = Bpe.train(Bpe.wordCounts(df, "text"), numMerges = 5)
    assert(model.merges == Bpe.trainFromCounts(classic, 5).merges)
    val a = Bpe.encode(df, "id", "text", model).orderBy("id")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val b = Bpe.encode(df.repartition(5), "id", "text", model).orderBy("id")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(a.sameElements(b))
    // token counts tally with a driver-side replay
    val replay = texts.map { case (_, t) =>
      t.split("\\s+").flatMap(w => Bpe.encodeWord(w.toLowerCase, model.ranks)).length
    }.sum
    val total = Bpe.encode(df, "id", "text", model)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(total == replay)
  }

  test("incremental pair maintenance matches a naive recount trainer on random corpora") {
    // naive trainer: recount EVERY pair each step (quadratic, obviously
    // correct); the production trainer must match merge-for-merge
    def naive(wc: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
      var words = wc.map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.Eow, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      var stop = false
      while (i < n && !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) stop = true
        else {
          val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
          out += best
          words = words.map { case (syms, c) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                merged += syms(j) + syms(j + 1); j += 2
              } else { merged += syms(j); j += 1 }
            }
            (merged.toVector, c)
          }
          i += 1
        }
      }
      out.toSeq
    }
    val rnd = new Random(77)
    (1 to 5).foreach { trial =>
      val words = (1 to 40).map { _ =>
        val len = 2 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
        (w, 1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.sorted
      val fast = Bpe.trainFromCounts(words, numMerges = 25).merges
      val slow = naive(words, 25)
      assert(fast == slow, s"trial $trial diverged: $fast vs $slow")
    }
  }
}
