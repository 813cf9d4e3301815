package graft

import graft.functions.Exact._
import graft.ops.{Ann, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: expands the sf tables in-plan (id-shifted
  * unions, so key cardinalities scale with the data) and times the
  * headline operators on ~10M lineitem rows / 100k docs / 20k vectors.
  * Empirical evidence for SURVEY §5's "would this survive a scale-up"
  * claims — run manually: `sbt "runMain graft.Stress"`.
  */
object Stress {

  private def replicate(df: DataFrame, idCols: Seq[String], copies: Int): DataFrame =
    (0 until copies).map { i =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) * copies + i))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-stress", GraftSession.cpus)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val l = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 16)
    val o = replicate(Tables.orders(spark, sfDir), Seq("o_orderkey", "o_custkey"), 16)
    val d = replicate(Tables.documents(spark, sfDir), Seq("doc_id"), 20)
    val e = replicate(Tables.embeddings(spark, sfDir), Seq("vec_id"), 10)

    val (nl, tAgg) = time {
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sumMoney(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
        .collect()
      l.count()
    }
    val (nj, tJoin) = time {
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sumMoney(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
        .collect().map(_.getLong(2)).sum
    }
    val (nd, tDedup) = time {
      Dedup.minhashDuplicates(d, "doc_id", "text", threshold = 0.9).count()
    }
    val (na, tAnn) = time {
      Ann.lshTopK(e, "vec_id", "embedding", col("query_id") < 10, 5).count()
    }
    val (ni, tIvf) = time {
      Ann.ivfTopK(e, "vec_id", "embedding", col("query_id") < 10, 5).count()
    }
    // adversarial skew: 200k byte-identical docs through the band join —
    // linear star pairing, not a 2e10-candidate self-join
    val (nc, tClones) = time {
      import spark.implicits._
      val clones = spark.range(200000)
        .select(col("id").as("doc_id"),
          lit("alpha beta gamma delta epsilon zeta eta theta iota kappa").as("text"))
      Dedup.minhashDuplicates(clones, "doc_id", "text", threshold = 0.9).count()
    }
    val (np, tPack) = time {
      graft.queries.TrainPrep.qPackSequences(spark, sfDir).count()
    }
    // as-of join with one pathological user holding 5M of 5.15M events:
    // the hot partition is ONE task (sort + running frame) — this is
    // the measured single-task rate behind SURVEY §6's "a 10M-event
    // hot key costs single-digit seconds" claim
    val (nasof, tAsof) = time {
      val ev = spark.range(5150000).select(
        col("id").as("event_id"),
        when(pmod(col("id"), lit(103)) < 100, 0L)
          .otherwise(pmod(col("id"), lit(31)) + 1).as("user_id"),
        timestamp_micros(col("id") * 1000L + 1L).as("ts"),
        when(pmod(col("id"), lit(3)) === 0, "purchase").otherwise("click")
          .as("event_type"))
      // aggregate OVER the as-of output column: a bare count() would let
      // Catalyst prune the unused window and time only the row count
      graft.queries.Advanced.asofLastClick(ev)
        .agg(count(col("last_click_us")).as("n"), max(col("last_click_us")))
        .head().getLong(0)
    }
    // composed IVF×PQ at 500k vectors (the serving-scale index): train
    // on a bounded sample (the fitted-model pattern — training never
    // scans the corpus), encode map-side to m-byte codes, coarse-assign
    // to cells, then a probe-bounded ADC search. Build is the one-time
    // linear pass; search must touch ~nProbe/nCells of the CODES only.
    val (nIvfPq, tPqBuild, tPqSearch) = {
      val corpus = replicate(Tables.embeddings(spark, sfDir), Seq("vec_id"), 250)
        .select(col("vec_id"), col("embedding")) // 2000 × 250 = 500k vectors
      val model = graft.ops.Pq.train(
        corpus.limit(20000), "vec_id", "embedding", m = 8, k = 16, maxIters = 4)
      val ((codes, ivf), tb) = time {
        val c = graft.ops.Pq.encode(corpus, "vec_id", "embedding", model)
          .localCheckpoint(true)
        val ix = graft.ops.Ann.ivfIndex(corpus, "vec_id", "embedding", nCells = 64)
        // persist the assignment WITHOUT vectors: the materialized index
        // a 100 TB corpus stores next to its data is (id, cell) + codes
        val assigned = ix.assigned.drop("nn_vec").localCheckpoint(true)
        (c, graft.ops.Ann.IvfIndex(assigned, ix.centroids))
      }
      val queries = corpus.filter(pmod(col("vec_id"), lit(50000)) === 0).collect()
        .map(r => (r.getLong(0).toString, r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
      val (n, ts) = time {
        graft.ops.Pq.searchIvf(ivf, codes, "vec_id", model, queries,
          k = 10, nProbe = 8).count()
      }
      (n, tb, ts)
    }
    // metadata layer at streaming scale: a 200-file table (200 commits),
    // then a MERGE whose key range touches a small slice, then a full
    // compaction. Merge cost must track the AFFECTED slice, not the
    // table; compaction must be one read + one O(touched) commit.
    val (nm, tMerge, nBsFiles, tBySource, tCompact, nCdc, tCdc) = {
      val cat = new graft.meta.SnapshotCatalog(
        java.nio.file.Files.createTempDirectory("graft-stress-meta-").toString)
      val dataDir = java.nio.file.Files.createTempDirectory("graft-stress-data-").toString
      val keyed = o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      // commits carry DISJOINT key ranges (the realistic ingest layout),
      // so the merge's key-bound pruning has real ranges to exclude
      val maxKey = keyed.agg(max(col("o_orderkey"))).head().getLong(0)
      val width = maxKey / 200 + 1
      (0 until 200).foreach { i =>
        graft.sinks.Writers.writeRangedSnapshot(cat, "ord",
          keyed.filter(col("o_orderkey") >= i * width &&
            col("o_orderkey") < (i + 1) * width).coalesce(1), dataDir,
          "o_orderkey", 1)
      }
      // materialize the source first: the measured cost is the MERGE
      // machinery (prune + anti-join + commit), not re-evaluating the
      // 16-way-union source plan
      val src = keyed.filter(col("o_orderkey") < 5000)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        .localCheckpoint(true)
      val (m, t1) = time {
        graft.sinks.Writers.mergeInto(spark, cat, "ord", src, Seq("o_orderkey"), dataDir)
      }
      // by-source merge with a PRUNABLE clause condition on the ranged
      // layout: the full-sync sweep must rewrite only the files the
      // condition's manifest filters keep (plus the source key range) —
      // never the whole 200-file table
      val (bsFiles, tBs) = {
        val src2 = keyed.filter(col("o_orderkey") < 5000).localCheckpoint(true)
        val (_, tb) = time {
          graft.sinks.Writers.mergeApply(spark, cat, "ord", src2, Seq("o_orderkey"),
            matched = Seq(graft.sinks.Writers.MergeUpdateAll()),
            notMatched = Nil,
            dataDir = dataDir,
            notMatchedBySource = Seq(graft.sinks.Writers.BySourceDelete(
              Some(col("o_orderkey").between(10000, 15000)))),
            bySourcePrune = Seq(Seq(graft.meta.RangeNum("o_orderkey", 10000, 15000))))
        }
        val swept = cat.currentSnapshot("ord").get
          .props(graft.meta.SnapshotCatalog.RewrittenFromProp)
          .split(",").count(_.nonEmpty)
        (swept, tb)
      }
      val (_, t2) = time {
        graft.sinks.Writers.compact(spark, cat, "ord", dataDir).get
      }
      // the NET change feed across the WHOLE 202-commit chain (200
      // ranged appends + merge + compaction): the chain walk must
      // collapse the range into one file-level diff plus row-level
      // parts bounded by the merge's rewritten slice — cost tracks the
      // table's bytes once, never per-commit
      val (cRows, t3) = time {
        cat.changesBetween(spark, "ord", 1L, None).count()
      }
      (m.totalRows, t1, bsFiles, tBs, t2, cRows, t3)
    }
    // merge-on-read deletes at scale: the GDPR-row case. A 2.4M-row
    // ranged table takes (a) a zero-scan equality delete of ONE key —
    // cost must be driver milliseconds, independent of table bytes;
    // (b) a masked full scan — the broadcast anti-join's overhead over
    // the bare scan; (c) a materialization — bounded by the ONE file
    // the mask's dataPaths scope touches, not the table.
    val (tEqDel, tBaseRead, tMaskRead, tMat) = {
      import spark.implicits._
      val cat = new graft.meta.SnapshotCatalog(
        java.nio.file.Files.createTempDirectory("graft-stress-mor-").toString)
      val dataDir = java.nio.file.Files.createTempDirectory("graft-stress-mord-").toString
      val keyed = o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sinks.Writers.writeRangedSnapshot(cat, "ord", keyed, dataDir,
        "o_orderkey", 8)
      val (_, tb) = time { cat.read(spark, "ord").count() }
      val (_, td) = time {
        graft.sinks.Writers.deleteByKeys(spark, cat, "ord",
          Seq(4242L).toDF("o_orderkey"), Seq("o_orderkey"), dataDir)
      }
      val (_, tr) = time { cat.read(spark, "ord").count() }
      val (_, tm) = time { graft.sinks.Writers.materializeDeletes(spark, cat, "ord", dataDir).get }
      (td, tb, tr, tm)
    }
    // commit contention: 32 appenders racing one table (the
    // 1000-executor ingest-fleet pattern at spec scale). Every append
    // must survive reconciliation (S49); wall-clock is the serialized
    // publish loop on ONE snapshot log — per-commit metadata cost ×
    // 32, not data cost (each appender's write job ran in parallel).
    val (nCommits, nRowsAfter, tRace) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val cat = new graft.meta.SnapshotCatalog(
        java.nio.file.Files.createTempDirectory("graft-stress-race-").toString)
      val dataDir = java.nio.file.Files.createTempDirectory("graft-stress-raced-").toString
      val keyed = o.select(col("o_orderkey"), col("o_totalprice"))
      // no seed commit: the 32 racers include the table-creating one
      // (basis = empty table), the hardest reconciliation case
      val width = 2000
      val (_, t) = time {
        val fs = (0 until 32).map { i =>
          Future(graft.sinks.Writers.writeSnapshot(cat, "ord",
            keyed.filter(col("o_orderkey") >= i * width && col("o_orderkey") < (i + 1) * width)
              .coalesce(1), dataDir))
        }
        Await.result(Future.sequence(fs), 600.seconds)
      }
      val head = cat.currentSnapshot("ord").get
      (cat.snapshots("ord").size, head.totalRows, t)
    }
    // r11 probes: (a) sticky-index backfill over a 200-file table — ONE
    // metadata commit, executor-side sidecars, cost tracks scanning the
    // missing files once; (b) partition-aware sorted rewrite over a
    // bucket(8, o_custkey)-partitioned 2.4M-row layout — the bucket
    // point-lookup prune must survive the rewrite (prune ratios printed
    // before/after) with cost in compact's envelope.
    val (tIdxBackfill, nIdxFiles, tRwsPart, rwsPruneBefore, rwsPruneAfter) = {
      val cat = new graft.meta.SnapshotCatalog(
        java.nio.file.Files.createTempDirectory("graft-stress-idx-").toString)
      val dataDir = java.nio.file.Files.createTempDirectory("graft-stress-idxd-").toString
      val keyed = o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxKey = keyed.agg(max(col("o_orderkey"))).head().getLong(0)
      val width = maxKey / 200 + 1
      (0 until 200).foreach { i =>
        graft.sinks.Writers.writeRangedSnapshot(cat, "idx",
          keyed.filter(col("o_orderkey") >= i * width &&
            col("o_orderkey") < (i + 1) * width).coalesce(1), dataDir,
          "o_orderkey", 1)
      }
      val (idxSnap, ti) = time {
        cat.indexColumns(spark, "idx", bloomColumns = Seq("o_custkey"))
      }
      val nIdx = idxSnap.files.count(_.blooms.contains("o_custkey"))
      val b = graft.meta.BucketTransform("o_custkey", 8)
      (0 until 3).foreach { i =>
        graft.sinks.Writers.writeTransformedSnapshot(cat, "part",
          keyed.filter(pmod(col("o_orderkey"), lit(3)) === i).repartition(4),
          s"$dataDir/part$i", Seq(b))
      }
      val pf = Seq(graft.meta.EqString(b.partCol, b.bucketOf("4242")))
      val before =
        (cat.planFiles("part", pf).size, cat.currentSnapshot("part").get.files.size)
      val (_, tr) = time {
        graft.sinks.Writers.rewriteSorted(spark, cat, "part", dataDir,
          Seq("o_totalprice"), nFiles = 24)
      }
      val after =
        (cat.planFiles("part", pf).size, cat.currentSnapshot("part").get.files.size)
      (ti, nIdx, tr, s"${before._1}/${before._2}", s"${after._1}/${after._2}")
    }
    // T10 streaming ingest-dedup at scale: 100k docs arrive in 5 exact
    // batches (each probed against the growing fingerprint index) and
    // 20k docs in 5 near-dup batches (LSH probe + shingle-index verify).
    // Per-batch cost must track the BATCH (plus candidates), not the
    // accumulated corpus — the steady-state ingest contract.
    val (exDocs, tExIngest, ndDocs, tNdIngest) = {
      val cat = new graft.meta.SnapshotCatalog(
        java.nio.file.Files.createTempDirectory("graft-stress-ing-").toString)
      val dataDir = java.nio.file.Files.createTempDirectory("graft-stress-ingd-").toString
      val ckpt = "stress-ingest"
      val (_, tEx) = time {
        (0 until 5).foreach { i =>
          val b = d.filter(pmod(col("doc_id"), lit(5)) === i)
          graft.streaming.IngestDedupSink.ingestBatch(
            cat, "ing", "doc_id", "text", dataDir, ckpt)(b, i.toLong)
        }
      }
      val nEx = cat.currentSnapshot("ing").get.totalRows
      val dnd = replicate(Tables.documents(spark, sfDir), Seq("doc_id"), 4)
      val (_, tNd) = time {
        (0 until 5).foreach { i =>
          val b = dnd.filter(pmod(col("doc_id"), lit(5)) === i)
          graft.streaming.IngestDedupSink.nearDupIngestBatch(
            cat, "ingnd", "doc_id", "text", dataDir, ckpt, 0.8,
            Dedup.NumBands)(b, i.toLong)
        }
      }
      (nEx, tEx, cat.currentSnapshot("ingnd").get.totalRows, tNd)
    }
    println(s"""{"stress":{"lineitem_rows":$nl,"agg_sec":$tAgg,"join_rows":$nj,"join_sec":$tJoin,"dedup_pairs":$nd,"dedup_sec":$tDedup,"ann_rows":$na,"ann_sec":$tAnn,"ivf_rows":$ni,"ivf_sec":$tIvf,"clone_pairs":$nc,"clone_sec":$tClones,"packs":$np,"pack_sec":$tPack,"asof_hot_rows":$nasof,"asof_hot_sec":$tAsof,"merge_rows":$nm,"merge_sec":$tMerge,"bysource_files":$nBsFiles,"bysource_sec":$tBySource,"compact_sec":$tCompact,"cdc_rows":$nCdc,"cdc_sec":$tCdc,"mor_eqdel_sec":$tEqDel,"mor_base_read_sec":$tBaseRead,"mor_masked_read_sec":$tMaskRead,"mor_materialize_sec":$tMat,"race_commits":$nCommits,"race_rows":$nRowsAfter,"race_sec":$tRace,"ivfpq_hits":$nIvfPq,"ivfpq_build_sec":$tPqBuild,"ivfpq_search_sec":$tPqSearch,"ingest_exact_docs":$exDocs,"ingest_exact_sec":$tExIngest,"ingest_neardup_docs":$ndDocs,"ingest_neardup_sec":$tNdIngest,"idx_backfill_sec":$tIdxBackfill,"idx_files":$nIdxFiles,"rws_part_sec":$tRwsPart,"rws_prune_before":"$rwsPruneBefore","rws_prune_after":"$rwsPruneAfter"}}""")
    spark.stop()
  }
}
