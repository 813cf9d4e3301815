package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {

  import spark.implicits._

  test("vec_dot matches the interpreted zip_with formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")).limit(5))
    val rows = pairs.select(col("ia"), col("ib"),
        VecFunctions.vecDot(col("a"), col("b")).as("native"), hof.as("interp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) == r.getDouble(3),
      s"bit mismatch at (${r.getLong(0)},${r.getLong(1)})"))
  }

  test("vec_dot handles double arrays and mixed float/double") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0, 0.5, 1.0))).toDF("f", "d")
    val r = df.select(
      VecFunctions.vecDot(col("f"), col("d")).as("fd"),
      VecFunctions.vecDot(col("d"), col("d")).as("dd")).head()
    assert(r.getDouble(0) == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
    assert(r.getDouble(1) == 4.0 + 0.25 + 1.0)
  }

  test("vec_dot null propagation and type check") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(VecFunctions.vecDot(col("a"), col("b"))).head().isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").select(VecFunctions.vecDot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("vec_dot") || err.getMessage.contains("DATATYPE"))
  }

  test("vec_dot yields null on length mismatch and null elements, like zip_with") {
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val rows = df.select(
      VecFunctions.vecDot(col("a"), col("b")).as("native"), hof.as("interp")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // length mismatch
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // null element
    assert(rows(2).getDouble(0) == 11.0 && rows(2).getDouble(1) == 11.0)
  }

  test("vec_dot is SQL-registered and usable from the engine") {
    VecFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
    VecFunctions.register(spark) // idempotent
  }

  test("vec_cosine of a vector with itself is 1") {
    val emb = Tables.embeddings(spark, sfDir).limit(20)
    emb.select(VecFunctions.vecCosine(col("embedding"), col("embedding")).as("c"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
