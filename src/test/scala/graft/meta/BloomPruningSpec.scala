package graft.meta

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruningSpec extends SparkSpec {

  test("bloom filter skips files that cannot contain an equality value") {
    val data = Files.createTempDirectory("graft-bloom-").toString
    val n = Tables.nation(spark, sfDir)
    n.filter(col("n_nationkey") < 12).coalesce(1).write.parquet(s"$data/a")
    n.filter(col("n_nationkey") >= 12).coalesce(1).write.parquet(s"$data/b")
    def one(sub: String) = new java.io.File(s"$data/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val (fa, fb) = (one("a"), one("b"))

    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cat-").toString)
    val snap = cat.commit(spark, "nation", Seq(fa, fb),
      bloomColumns = Seq("n_name"), bloomExpectedItems = 1000)
    assert(snap.files.forall(_.blooms.contains("n_name")))

    // NATION_20 only lives in file b; lexicographic min/max can't prune
    // (NATION_2 < NATION_20 < NATION_9 in both files) — bloom must.
    val planned = cat.planFiles("nation", Seq(EqString("n_name", "NATION_20")))
    assert(planned.map(_.path) == Seq(fb))

    // a value in neither file prunes everything (modulo fpp on 2 files)
    val none = cat.planFiles("nation", Seq(EqString("n_name", "NATION_9999")))
    assert(none.isEmpty)

    // and the surviving read still returns the right row
    val df = cat.read(spark, "nation", Seq(EqString("n_name", "NATION_20")))
      .filter(col("n_name") === "NATION_20")
    assert(df.count() == 1)
  }
}
