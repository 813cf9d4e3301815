package graft

import graft.SparkSpec
import org.apache.spark.sql.{GraftColumnShim, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects vec_dot into a session function registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = FunctionRegistry.builtin.clone()
    assert(!registry.functionExists(FunctionIdentifier("vec_dot")))
    GraftColumnShim.registerExtensionFunctions(ext, registry)
    assert(registry.functionExists(FunctionIdentifier("vec_dot")))
  }

  test("registered vec_dot resolves and evaluates through SQL") {
    graft.functions.VecFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 1.0D, 1.0D)) AS d").head()
    assert(r.getDouble(0) == 6.0)
  }
}
