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

  // (q_cf_als / q_cf_als_implicit used to be allowlisted for MLlib
  // recommendForAllUsers' deliberate blocked factor cross join; since
  // r14 the rec executes inside the iterative-tuning wrapper's
  // localCheckpoint, so the registered frame's plan is a checkpoint
  // scan and the library-internal cartesian is no longer visible to
  // this sweep — the algorithm itself is unchanged.)
  private val allowlist = Map.empty[String, String]

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

  test("streaming keys: no condition-less inner join in the pre-sink " +
      "logical plan") {
    // the q_stream_* keys are swept STRUCTURALLY: StreamOps'
    // plan-capture mode aborts each op at its sink point with the
    // analyzed pre-sink logical plan — no replay executes, so the
    // old blanket exemption is gone. A condition-less inner/cross
    // Join in the logical plan is the thing that would become a
    // CartesianProductExec once run — UNLESS a side carries the
    // house `broadcast(...)` hint (those plan BroadcastNestedLoop:
    // the physical sweep above distinguishes them for free, the
    // logical sweep must do it explicitly) or is a global aggregate
    // (≤ 1 row by construction).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join,
      LogicalPlan, ResolvedHint}
    import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
    def bounded(p: LogicalPlan): Boolean =
      p.exists {
        case h: ResolvedHint => h.hints.strategy.exists(
          _.toString.contains("BROADCAST"))
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _ => false
      }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("q_stream_"))
    assert(names.size >= 20, s"expected the full streaming family, got $names")
    graft.streaming.StreamOps.planCaptureMode.set(true)
    try {
      val offenders = names.flatMap { name =>
        val plans =
          try { SparkEntry.queries(name)(spark, sf); Nil }
          catch {
            case graft.streaming.StreamOps.PlanCapture(ps) => ps
          }
        assert(plans.nonEmpty,
          s"$name never reached a sink capture point — add .sinkGuard")
        val bad = plans.flatMap(_.collect {
          case j: Join if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross) &&
            !bounded(j.left) && !bounded(j.right) => j
        })
        if (bad.nonEmpty) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"condition-less joins in streaming plans: ${offenders.mkString(", ")}")
    } finally graft.streaming.StreamOps.planCaptureMode.set(false)
  }
}
