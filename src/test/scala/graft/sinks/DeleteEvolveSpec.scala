package graft.sinks

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.meta.{RangeNum, SnapshotCatalog}
import org.apache.spark.sql.functions._

class DeleteEvolveSpec extends SparkSpec {

  test("copy-on-write delete rewrites only affected files; untouched metadata reused") {
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-cow-").toString)
    val dataDir = Files.createTempDirectory("graft-cow-data-").toString
    val c = Tables.customer(spark, sfDir)
    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey") <= 75), dataDir)
    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey") > 75), dataDir)
    val before = cat.currentSnapshot("cust").get
    val lowFile = before.files.minBy(_.stats("c_custkey").minD.get)

    // delete custkeys 10..20: only the low file's range overlaps
    val after = Writers.deleteWhere(cat, "cust",
      rowPredicate = df => df.filter(!(col("c_custkey") >= 10 && col("c_custkey") <= 20)),
      pruneFilters = Seq(RangeNum("c_custkey", 10, 20)),
      dataDir = dataDir)

    assert(cat.read(spark, "cust")
      .filter(col("c_custkey") >= 10 && col("c_custkey") <= 20).count() == 0)
    assert(cat.read(spark, "cust").count() == c.count() - 11)
    // high file untouched: same path AND same FileMeta carried forward
    val highBefore = before.files.find(_.path != lowFile.path).get
    assert(after.files.exists(f => f.path == highBefore.path && f == highBefore))
    assert(!after.files.exists(_.path == lowFile.path))
    // time travel still sees the pre-delete state
    assert(cat.read(spark, "cust", snapshotId = Some(before.snapshotId)).count() == c.count())
  }

  test("schema evolution: appended column surfaces, old files read as null") {
    val cat = new SnapshotCatalog(Files.createTempDirectory("graft-evo-").toString)
    val dataDir = Files.createTempDirectory("graft-evo-data-").toString
    val c = Tables.customer(spark, sfDir)
    Writers.writeSnapshot(cat, "cust", c.filter(col("c_custkey") <= 75), dataDir)
    val v2 = c.filter(col("c_custkey") > 75)
      .withColumn("c_tier", when(col("c_acctbal") > 5000, "gold").otherwise("std"))
    Writers.writeSnapshot(cat, "cust", v2, dataDir)

    val snap2 = cat.currentSnapshot("cust").get
    assert(snap2.schema.fieldNames.contains("c_tier"))
    val all = cat.read(spark, "cust")
    assert(all.count() == c.count())
    // old-file rows: c_tier null; new-file rows: populated
    assert(all.filter(col("c_custkey") <= 75 && col("c_tier").isNotNull).count() == 0)
    assert(all.filter(col("c_custkey") > 75 && col("c_tier").isNull).count() == 0)
    // snapshot 1 keeps its own (old) schema
    assert(!cat.snapshotById("cust", 1L).get.schema.fieldNames.contains("c_tier"))
  }
}
