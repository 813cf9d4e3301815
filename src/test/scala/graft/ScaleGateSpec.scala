package graft

import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

/** Gate-rule unit tests — the 3-minute two-scale run itself is a
  * `runMain graft.ScaleGate` command, not a spec; here we pin the
  * breach algebra it applies. */
class ScaleGateSpec extends AnyFunSuite {

  test("linear growth under the bound passes") {
    val rows = ScaleGate.evaluate(
      Map("a" -> 1.0, "b" -> 0.5), Map("a" -> 3.0, "b" -> 2.4),
      bound = 6.0, floor = 0.2)
    assert(rows.forall(!_.breach))
    assert(rows.find(_.name == "b").get.ratio === 4.8 +- 1e-9)
  }

  test("super-linear growth past the bound breaches") {
    val rows = ScaleGate.evaluate(
      Map("a" -> 1.0), Map("a" -> 7.5), bound = 6.0, floor = 0.2)
    assert(rows.head.breach && rows.head.ratio === 7.5 +- 1e-9)
  }

  test("tiny base times are floored so fixed overhead is not a breach") {
    // 0.03 s -> 0.9 s is 30x raw but overhead-dominated; floored ratio
    // 0.9/0.2 = 4.5 stays under the bound
    val rows = ScaleGate.evaluate(
      Map("t" -> 0.03), Map("t" -> 0.9), bound = 6.0, floor = 0.2)
    assert(!rows.head.breach)
    assert(rows.head.ratio === 4.5 +- 1e-9)
  }

  test("documented super-linear queries breach only past their override bound") {
    val ok = ScaleGate.evaluate(
      Map("q_embed_neardup" -> 1.0), Map("q_embed_neardup" -> 11.0),
      bound = 8.0, floor = 0.2)
    assert(!ok.head.breach) // 11x is within the documented N·W·t model (18x, r17)
    val bad = ScaleGate.evaluate(
      Map("q_embed_neardup" -> 1.0), Map("q_embed_neardup" -> 30.0),
      bound = 8.0, floor = 0.2)
    assert(bad.head.breach) // past even the model bound — a real regression
  }

  test("a query that fails at either scale is a breach with ratio -1") {
    val rows = ScaleGate.evaluate(
      Map("dead" -> -1.0, "dies10x" -> 0.4, "missing" -> 0.4),
      Map("dead" -> 0.5, "dies10x" -> -1.0),
      bound = 6.0, floor = 0.2)
    assert(rows.forall(r => r.breach && r.ratio == -1.0))
  }
}
