package graft

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.functions._
import graft.engine.Exact

/** Order-independence of the decimal-exact aggregation helpers — the
  * property every oracle-compared float aggregate rests on. Seeded
  * random trials stand in for property tests (scalatest+scalacheck
  * bridge not in the offline cache). */
class ExactSpec extends SparkSpec {

  private def reference(xs: Seq[Double]): Double =
    xs.foldLeft(JBigDecimal.ZERO) { (acc, x) =>
      acc.add(new JBigDecimal(x, MathContext.UNLIMITED)
        .setScale(6, RoundingMode.HALF_UP))
    }.doubleValue

  test("xsum equals sequential decimal sum for any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val xs = List.fill(200)((rnd.nextDouble() - 0.5) * 2e6)
      val nPart = 1 + rnd.nextInt(16)
      val got = xs.toDF("x").repartition(nPart)
        .agg(Exact.xsum($"x").as("s")).collect()(0).getDouble(0)
      assert(got === reference(xs))
    }
  }

  test("xsum is invariant to row order and partition count") {
    import spark.implicits._
    val xs = (1 to 1000).map(i => math.sin(i.toDouble) * 1e5)
    val a = xs.toDF("x").agg(Exact.xsum($"x")).collect()(0).getDouble(0)
    val b = new scala.util.Random(7).shuffle(xs).toDF("x").repartition(13)
      .agg(Exact.xsum($"x")).collect()(0).getDouble(0)
    assert(a === b)
  }

  test("xavg = xsum / count") {
    import spark.implicits._
    val xs = Seq(1.25, -2.5, 3.75, 0.125)
    val row = xs.toDF("x")
      .agg(Exact.xavg($"x").as("m"), Exact.xsum($"x").as("s")).collect()(0)
    assert(row.getDouble(0) === row.getDouble(1) / xs.size)
  }
}
