package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Fleet-wide plan guard #2: NO registered query may plan a
  * CartesianProductExec. A cartesian product shuffles BOTH sides and
  * materializes |L|×|R| work with no key to parallelize over — at
  * 100 TB it is not slow, it is unrunnable. The house pattern for
  * deliberate small cross joins (the broadcast 1-row aggregate, the
  * bounded triangular self-join) is `crossJoin(broadcast(...))`,
  * which plans BroadcastNestedLoopJoin: one side stays tiny by
  * construction and travels to the data. This sweep makes the
  * distinction structural: a future query that crosses two
  * distributed relations fails here, not on a cluster.
  *
  * Allowlist: queries whose cartesian product is over PROVABLY
  * bounded inputs, with the reason. */
class CartesianGuardSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val allowlist = Map(
    "q_cf_als" -> ("MLlib recommendForAllUsers: the library's own " +
      "blocked factor cross join — each side is (blocks × rank) " +
      "factor rows, the intended block-matrix algorithm, not a " +
      "planning accident"),
    "q_cf_als_implicit" -> "same as q_cf_als")

  test("no registered query plans a CartesianProductExec") {
    // q_stream_* excluded for the same reason as WindowGuardSpec:
    // building their DataFrames runs a full streaming replay, and the
    // post-sink results are bounded by the replayed fixture anyway.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
    val offenders = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val carts = collectWithSubqueries(df.queryExecution.executedPlan) {
        case c: CartesianProductExec => c
      }
      if (carts.nonEmpty && !allowlist.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
    // allowlist honesty: entries must actually plan one
    allowlist.keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val carts = collectWithSubqueries(df.queryExecution.executedPlan) {
        case c: CartesianProductExec => c
      }
      assert(carts.nonEmpty, s"allowlist entry $name no longer plans a " +
        "cartesian product — remove it")
    }
  }
}
