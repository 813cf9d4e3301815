package graft.sinks

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.meta.SnapshotCatalog
import org.apache.spark.sql.functions._

/** Incremental aggregate views: after every refresh the view must equal
  * a from-scratch recompute of the source's current snapshot —
  * bit-identical, including keys that drop to zero. */
class MaterializedAggSpec extends SparkSpec {

  private val keys = Seq("o_orderstatus")
  private val sums = Seq("o_totalprice")

  private def recompute(cat: SnapshotCatalog): Set[(String, Long, java.math.BigDecimal)] =
    cat.read(spark, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(28,6)")).as("sum_o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

  private def viewState(cat: SnapshotCatalog): Set[(String, Long, java.math.BigDecimal)] =
    cat.read(spark, "orders_by_status")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).setScale(6))).toSet

  test("build, then refresh across append / delete / merge — always equals recompute") {
    val base = Files.createTempDirectory("graft-mv-").toString
    val cat = new SnapshotCatalog(s"$base/cat")
    val o = Tables.orders(spark, sfDir)
    Writers.writeSnapshot(cat, "orders", o.filter(col("o_orderkey") <= 900), s"$base/data")

    MaterializedAgg.build(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(viewState(cat) == recompute(cat))

    // append: refresh folds only the delta
    Writers.writeSnapshot(cat, "orders", o.filter(col("o_orderkey") > 900), s"$base/data")
    MaterializedAgg.refresh(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(viewState(cat) == recompute(cat))

    // COW delete: retractions subtract
    Writers.deleteWhere(spark, cat, "orders",
      df => df.filter(col("o_orderkey") % 3 =!= 0), Nil, s"$base/data")
    MaterializedAgg.refresh(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(viewState(cat) == recompute(cat))

    // merge upsert: old versions retract, new versions add
    val src = o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
    Writers.mergeInto(spark, cat, "orders", src, Seq("o_orderkey"), s"$base/data")
    MaterializedAgg.refresh(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(viewState(cat) == recompute(cat))
  }

  test("a key whose rows all vanish leaves the view; no-op refresh commits nothing") {
    val base = Files.createTempDirectory("graft-mv2-").toString
    val cat = new SnapshotCatalog(s"$base/cat")
    val o = Tables.orders(spark, sfDir)
    Writers.writeSnapshot(cat, "orders", o, s"$base/data")
    MaterializedAgg.build(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    val statuses = viewState(cat).map(_._1)
    assert(statuses.contains("P"))

    // delete EVERY P row — the key must disappear, not linger at 0
    Writers.deleteWhere(spark, cat, "orders",
      df => df.filter(col("o_orderstatus") =!= "P"), Nil, s"$base/data")
    MaterializedAgg.refresh(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(!viewState(cat).map(_._1).contains("P"))
    assert(viewState(cat) == recompute(cat))

    // source unmoved → refresh is a no-op: same watermark, no new commit
    val before = cat.currentSnapshot("orders_by_status").get.snapshotId
    val wm = MaterializedAgg.refresh(spark, cat, "orders", "orders_by_status",
      keys, sums, s"$base/view")
    assert(cat.currentSnapshot("orders_by_status").get.snapshotId == before)
    assert(wm == cat.currentSnapshot("orders").get.snapshotId)
  }
}
