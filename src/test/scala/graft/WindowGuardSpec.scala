package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}

/** Fleet-wide plan guard: NO registered query may plan a WindowExec
  * with an empty partitionSpec over unbounded input. An unpartitioned
  * window funnels every row through ONE task — the classic silent
  * scale-killer (fine on a fixture, fatal on 100 TB). The guard makes
  * the whole bug class structurally unrepresentable: any future query
  * that sneaks one in fails this sweep, not a production cluster.
  *
  * "Bounded input" = the window's subtree contains a limit operator
  * (GlobalLimit / LocalLimit / CollectLimit / TakeOrderedAndProject):
  * a single-partition window over a limit-bounded result (e.g.
  * q_text_zipf's rank/cumulate over its global top-100) is O(limit)
  * at any corpus scale and explicitly fine.
  *
  * Allowlist: queries whose unpartitioned window input is bounded by
  * construction rather than by a limit operator, with the reason —
  * currently only q_win_frame_range (its RANGE window runs over the
  * per-DAY pre-aggregate, ≤ #days rows at any corpus scale; see the
  * doc comment at WindowOps.frameRange). */
class WindowGuardSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val allowlist = Map(
    "q_win_frame_range" -> "input is the per-day pre-aggregate (≤ #days rows)",
    "q_txn_files" -> ("the LAG runs over the $files METADATA table — " +
      "one row per data file (manifest-scale at any table size), " +
      "served by a driver-side LocalScan; see TxnOps.txnFiles"),
    "q_txn_ivm" -> ("the running sum is over the PER-VERSION aggregate " +
      "— ≤ #versions rows (metadata-scale, same class as $history); " +
      "the table-shaped work is the per-KEY window, which IS " +
      "partitioned; see TxnOps.txnIvm"))

  private def boundedBelow(w: SparkPlan): Boolean =
    w.find {
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _ => false
    }.isDefined

  test("no registered query plans an unpartitioned window over unbounded input") {
    // q_stream_* excluded: building their DataFrames RUNS a full
    // streaming replay (minutes of wall clock for zero coverage —
    // their batch results are memory-sink/scratch-dir reads bounded
    // by the replayed fixture, and any window in the POST-sink result
    // is over that bounded sink).
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
    val offenders = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val unpartitioned = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      val unbounded = unpartitioned.filterNot(boundedBelow)
      if (unbounded.nonEmpty && !allowlist.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input in: ${offenders.mkString(", ")}")
    // the allowlist must stay honest: its entries actually HAVE an
    // unpartitioned window (else the entry is stale and should go)
    allowlist.keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(wins.nonEmpty, s"allowlist entry $name no longer plans an " +
        "unpartitioned window — remove it")
    }
  }

  test("streaming keys: no unpartitioned window in the pre-sink " +
      "logical plan") {
    // swept structurally via StreamOps' plan-capture mode (the op
    // aborts at its sink point with the analyzed logical plan — no
    // replay executes), replacing the old blanket q_stream_*
    // exemption. Streaming plans rarely contain window FUNCTIONS
    // (the engine forbids most), but a sneaked-in one with an empty
    // partitionSpec would be the same single-task funnel.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("q_stream_"))
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
          case w: LWindow if w.partitionSpec.isEmpty => w
        })
        if (bad.nonEmpty) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"unpartitioned windows in streaming plans: ${offenders.mkString(", ")}")
    } finally graft.streaming.StreamOps.planCaptureMode.set(false)
  }
}
