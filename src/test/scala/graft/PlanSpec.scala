package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import graft.operators._

/** Physical-plan shape assertions (SURVEY.md §5.2(2)): the engine's
  * scale story is that filters/projections reach the parquet reader,
  * small dims broadcast, and top-k never runs a total sort. These
  * are the properties that survive a 1000× scale-up — asserted here
  * so a regression is a test failure, not a slow cluster. */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan
  }

  test("filter predicates are pushed to the parquet scan") {
    val df = FilterOps.filterPred(spark, sf)
    val scanStr = df.queryExecution.executedPlan.toString
    assert(scanStr.contains("PushedFilters: ["),
      "expected PushedFilters on the parquet scan")
    assert(scanStr.contains("IsNotNull") || scanStr.contains("GreaterThan"),
      s"expected real pushed predicates, got:\n$scanStr")
  }

  test("projection prunes the parquet read schema to selected columns") {
    val df = ScanOps.scanProjection(spark, sf)
    val scanStr = df.queryExecution.executedPlan.toString
    val readSchema = scanStr.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"read schema not pruned: $readSchema")
  }

  test("dimension join uses broadcast hash join") {
    val plan = executedPlan(JoinOps.joinBroadcast(spark, sf))
    assert(collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, s"expected BroadcastHashJoinExec in:\n$plan")
  }

  test("orderBy + limit compiles to TakeOrderedAndProject (no full sort)") {
    val plan = executedPlan(WindowOps.limitTopK(spark, sf))
    assert(collectWithSubqueries(plan) {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProjectExec in:\n$plan")
  }

  test("flagship aggregation has exactly one shuffle (partial+final agg)") {
    val plan = executedPlan(AggOps.multiKeyPricing(spark, sf))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    // one for the groupBy, one for the output orderBy — never more
    assert(shuffles.size <= 2, s"unexpected extra shuffles:\n$plan")
  }

  test("partitioned layout prunes to the matching partition directory") {
    val df = ScanOps.scanPartitionPruning(spark, sf)
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"expected partition filters on the scan:\n${df.queryExecution.executedPlan}")
  }

  test("bucketed join runs with no exchange under the join") {
    val plan = executedPlan(JoinOps.joinBucketed(spark, sf))
    assert(plan.toString.contains("Bucketed: true"),
      s"expected bucketed scans:\n$plan")
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a join operator:\n$plan")
    // co-located layout ⇒ no shuffle between the scans and the join
    // (AQE may pick broadcast for a tiny side — also shuffle-free)
    val shufflesUnderJoin = joins.flatMap(j => collectWithSubqueries(j) {
      case s: ShuffleExchangeExec => s
    })
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join still shuffles its inputs:\n$plan")
  }

  test("IN subquery decorrelates to a semi join, not a per-row probe") {
    val plan = executedPlan(SqlOps.subqueryIn(spark, sf))
    val s = plan.toString
    assert(s.contains("LeftSemi") || s.contains("SemiJoin"),
      s"expected a semi join in:\n$s")
  }

  test("bucketed interval join plans as an equi-join, not a nested loop") {
    val plan = executedPlan(JoinOps.joinIntervalBucketed(spark, sf))
    val nested = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(nested.isEmpty,
      s"bucket keys should make this a hash/merge join:\n$plan")
    val equi = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.nonEmpty => j
    }
    assert(equi.nonEmpty, s"expected an equi-join on (user, bucket):\n$plan")
  }

  test("windowed distinct count plans one exchange for both windows") {
    val plan = executedPlan(WindowOps.winCountDistinct(spark, sf))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    // one exchange on o_orderpriority feeding both window operators,
    // plus the final presentation orderBy — never a third
    assert(shuffles.size <= 2,
      s"windows should share the o_orderpriority exchange:\n$plan")
  }

  test("hash sample is a scan-side filter — no exchange at all") {
    val plan = executedPlan(SampleOps.sampleHash(spark, sf))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    // only the final total-order sort may shuffle
    assert(shuffles.size <= 1, s"sampling filter must not shuffle:\n$plan")
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    val df = ScanOps.scanDpp(spark, sf)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .DynamicPruningExpression]))),
      s"expected a DynamicPruningExpression partition filter:\n" +
        df.queryExecution.executedPlan)
  }

  test("sessionization shares one user_id exchange across lag, running sum, and agg") {
    val plan = executedPlan(WindowOps.winSession(spark, sf))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    // one exchange on user_id feeding both windows AND the session
    // aggregation, plus the final presentation orderBy — never a third
    assert(shuffles.size <= 2,
      s"session windows + agg should share the user_id exchange:\n$plan")
  }

  test("CDC latest-wins compaction is one shuffle + per-key sort") {
    val plan = executedPlan(SnapshotOps.upsertLatest(spark, sf))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    // one exchange on user_id for both window functions, one output sort
    assert(shuffles.size <= 2,
      s"compaction must not shuffle beyond the key exchange:\n$plan")
  }

  test("tpch q5 broadcasts every dimension (one big-big shuffle pair at most)") {
    val plan = executedPlan(WorkloadOps.tpchQ5(spark, sf))
    val bhj = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3,
      s"region/nation/customer/supplier joins should broadcast:\n$plan")
  }

  test("tpch q18 pre-aggregates lineitem below the join and top-100s without a full sort") {
    val plan = executedPlan(WorkloadOps.tpchQ18(spark, sf))
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"expected joins in:\n$plan")
    // the quantity aggregation must sit BELOW the joins (fact collapses
    // to |orders| rows before any probe — the 100 TB shape), never after
    val aggUnderJoin = joins.exists(j => collectWithSubqueries(j) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty)
    assert(aggUnderJoin, s"lineitem aggregation did not stay below the join:\n$plan")
    assert(collectWithSubqueries(plan) {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProjectExec for ORDER BY+LIMIT 100:\n$plan")
  }

  test("selective big-big join injects a runtime bloom filter on the fact scan") {
    // Runtime row-level filtering is the non-partition-key complement of
    // DPP at 100 TB: the filtered dim side builds a bloom filter that
    // prunes fact rows BEFORE the shuffle. The size thresholds are
    // cluster-scale knobs (app side ≥ 10 GB by default), so the test
    // pins the capability by lowering them — the join shape itself is
    // exactly q_join_shuffle's.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = graft.engine.Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val l = graft.engine.Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_quantity")
      val joined = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("BloomFilter"),
        s"expected an injected runtime bloom filter in:\n$optimized")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot-shingle exclusion is a broadcast anti-join, not a shuffle of the index") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val df = graft.operators.DedupOps.informativeShingles(docs)
    // pre-AQE physical plan: the exclusion must PLAN as a broadcast
    // LeftAnti (the index side is never shuffled for it)
    val planned = df.queryExecution.sparkPlan
    val antiJoins = collectWithSubqueries(planned) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType.toString.contains("LeftAnti") => j
    }
    assert(antiJoins.nonEmpty,
      s"expected the hot-list exclusion as a broadcast LeftAnti join:\n$planned")
    // at runtime the fixture hot list is EMPTY, and AQE's empty-relation
    // propagation should erase the join completely — zero cost when the
    // ceiling has nothing to do. Either the eliminated form or the
    // broadcast anti join is acceptable; a shuffled anti join is not.
    df.collect()
    val finalPlan = df.queryExecution.executedPlan
    val shuffledAnti = collectWithSubqueries(finalPlan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType.toString.contains("LeftAnti") => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if j.joinType.toString.contains("LeftAnti") => j
    }
    assert(shuffledAnti.isEmpty,
      s"hot-list exclusion fell back to a shuffled anti join:\n$finalPlan")
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    val plan = executedPlan(FilterOps.filterPred(spark, sf))
    val spans = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"hot path fell out of whole-stage codegen:\n$plan")
  }

  test("contamination scoring broadcasts the benchmark shingle set") {
    val plan = executedPlan(TextOps.textContamination(spark, sf))
    val bhj = collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.toString.contains("shingle")) => j
    }
    assert(bhj.nonEmpty,
      s"benchmark set did not broadcast onto the corpus shingle stream:\n$plan")
    val smjOnShingle = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("shingle")) => j
    }
    assert(smjOnShingle.isEmpty,
      "corpus shingle stream got shuffled for the benchmark join")
  }

  test("rank-filter window pushes down as WindowGroupLimit (bounded per-key state)") {
    // Spark 4's own partial top-k: a row_number() <= k filter plans a
    // WindowGroupLimitExec BELOW the exchange, pruning each map
    // partition to k rows per key before the shuffle — the built-in
    // sibling of graft.plans.TopKPerKey, and the reason the window
    // formulation is also 100 TB-safe for small k.
    val plan = executedPlan(WindowOps.rankTopN(spark, sf))
    val limits = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty,
      s"expected WindowGroupLimitExec pushdown in:\n$plan")
  }

  test("popularity baseline: bounded top-N heap + broadcast fan-out, no global sort") {
    val plan = executedPlan(CfOps.predictPopular(spark, sf))
    // the popular list is orderBy+limit → TakeOrderedAndProject
    // (bounded heaps), never a total sort of the item aggregate
    assert(collectWithSubqueries(plan) {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProject for the popular list:\n$plan")
    // the N-row list fans out by broadcast (nested-loop is fine for a
    // 5-row side) — the user set must never shuffle for it
    val bcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: BroadcastHashJoinExec => b
    }
    assert(bcast.nonEmpty, s"popular list did not broadcast:\n$plan")
  }

  test("custom top-k operator plans partial→exchange→final with no window sort") {
    val df = WindowOps.rankTopNNative(spark, sf)
    val plan = executedPlan(df)
    val partials = collectWithSubqueries(plan) {
      case p: graft.plans.PartialTopKPerKeyExec => p
    }
    val finals = collectWithSubqueries(plan) {
      case f: graft.plans.TopKPerKeyExec => f
    }
    assert(partials.size == 1 && finals.size == 1,
      s"expected one partial + one final TopKPerKey:\n$plan")
    // the map-side heap must sit BELOW the key exchange (that's the
    // point: the shuffle moves ≤ k rows per key per map partition);
    // the output orderBy adds a separate rangepartitioning exchange
    val keyExchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec
        if e.find(_.isInstanceOf[graft.plans.PartialTopKPerKeyExec]).isDefined => e
    }
    assert(keyExchanges.size == 1,
      s"expected the partial heap below exactly one key exchange:\n$plan")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "custom operator still planned a Window")
    // value-equivalence with the window formulation
    assert(df.collect().toSeq == WindowOps.rankTopN(spark, sf).collect().toSeq,
      "native top-k disagrees with the window top-k")
  }

  test("z-order box query prunes to the covering tile directories") {
    val df = ScanOps.scanZorder(spark, sf)
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("zb"))),
      s"expected a zb partition filter:\n${df.queryExecution.executedPlan}")
    // the 40..80 × 70..120 box covers tiles (1..2, 2..3) → 4 of the
    // 64 directories; one file per directory (repartition-by-tile
    // write shaping), so the pruned scan reads exactly 4 files
    val nFiles = scans.map(_.selectedPartitions.totalNumberOfFiles).max
    assert(nFiles == 4, s"expected 4 pruned tile files, read $nFiles")
  }

  test("TPC-DS composites: partition-average broadcasts, both top-k bounded") {
    val devPlan = executedPlan(WorkloadOps.tpcdsBrandDev(spark, sf))
    // the brand-average join-back must broadcast (#brands rows), so
    // the monthly aggregate is never re-shuffled for it
    assert(collectWithSubqueries(devPlan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, s"brand-average join-back did not broadcast:\n$devPlan")
    assert(collectWithSubqueries(devPlan) {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, s"top-50 deviation must be TakeOrderedAndProject:\n$devPlan")
    val yoyPlan = executedPlan(WorkloadOps.tpcdsYoy(spark, sf))
    assert(collectWithSubqueries(yoyPlan) {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, s"bottom-25 YoY must be TakeOrderedAndProject:\n$yoyPlan")
  }

  test("seqmine reads the corpus exactly once (one window pass, bounded joins after)") {
    val df = SnapshotOps.eventsSeqmine(spark, sf)
    df.collect()
    // the ONLY pass over events is the rank window; everything after
    // runs on localCheckpointed per-user tables. The executed plan
    // therefore contains no parquet scan of events at all (checkpoint
    // RDDs replace them) — the corpus cannot be re-read per candidate
    // family.
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"expected checkpointed inputs only:\n${df.queryExecution.executedPlan}")
  }
}
