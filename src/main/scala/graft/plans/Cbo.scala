package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

import graft.engine.FooterStats

/** Cost-based join planning grounded in the ENGINE'S OWN metadata:
  * ANALYZE reads a transactional table's footer stats (row count,
  * on-disk bytes, per-column min/max/nulls — the same numbers
  * `$files`/`$partitions` serve) and the join planner uses them to
  * decide broadcast-vs-shuffle instead of relying on hints or
  * Spark's file-size session estimate. This is the feedback loop a
  * lakehouse runs at scale: the manifest already knows how big each
  * side is; the planner should ask it. The decision is made at PLAN
  * time from O(files) footer metadata — no data is read to decide.
  *
  * Scale note (100 TB): broadcasting is a function of the BUILD
  * side's true size, which Spark's `autoBroadcastJoinThreshold`
  * estimates from raw file bytes — fine for full scans, misleading
  * after pruning/filters. A stats-backed decision from the table's
  * own manifest row counts is strictly better information, and the
  * threshold compares DECOMPRESSED estimated width, not compressed
  * parquet bytes. */
object Cbo {

  /** ANALYZE output for one table: totals plus per-column stats.
    * `ndv` (per-column distinct counts) is OPTIONAL and comes from
    * [[withNdv]], not the footer pass — parquet footers carry no
    * distinct counts, so NDV is the one statistic that costs a data
    * scan (the `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
    * split every warehouse makes). */
  final case class TableStats(nRows: Long, sizeBytes: Long,
      cols: Map[String, FooterStats.ColStat],
      ndv: Map[String, Long] = Map.empty) {
    /** Decompressed in-memory size estimate: 8 bytes per long cell.
      * Parquet's encoded bytes under-estimate the hash-table cost of
      * a broadcast build by the compression ratio. */
    def estBroadcastBytes: Long = nRows * 8L * math.max(cols.size, 1)
  }

  /** Per-(path, column) NDV cache: fixture/lake files are immutable,
    * so a distinct-count never changes for a given path — pay the
    * scan once per session, not once per plan. */
  private val ndvCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Enrich footer stats with per-column NDV — one
    * approx_count_distinct aggregate over the table (a single
    * partial-aggregated job; HLL error ~2 % is far inside the
    * margins a join-order decision needs). Cached per (path, col). */
  def withNdv(stats: TableStats, spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String]): TableStats = {
    val missing = cols.filterNot(c => ndvCache.contains((path, c)))
    if (missing.nonEmpty) {
      import org.apache.spark.sql.functions.approx_count_distinct
      val row = spark.read.parquet(path)
        .agg(approx_count_distinct(missing.head),
          missing.tail.map(approx_count_distinct(_)): _*)
        .head()
      missing.zipWithIndex.foreach { case (c, i) =>
        ndvCache((path, c)) = row.getLong(i)
      }
    }
    stats.copy(ndv = stats.ndv ++
      cols.map(c => c -> ndvCache((path, c))))
  }

  /** ANALYZE TABLE: one footer pass over the latest snapshot. */
  def analyze(root: String): TableStats =
    fromFiles(FooterStats.latestSnapshot(root))

  /** ANALYZE for a plain parquet table (single file or directory) —
    * the fixture tables and any non-transactional input. */
  def analyzePath(path: String): TableStats =
    fromFiles(FooterStats.read(new java.io.File(path)))

  private def fromFiles(files: Seq[FooterStats.FileStat]): TableStats = {
    val cols = files.flatMap(_.cols.keys).distinct.map { c =>
      val sts = files.flatMap(_.cols.get(c))
      c -> FooterStats.ColStat(
        sts.flatMap(_.min) match { case Nil => None; case ms => Some(ms.min) },
        sts.flatMap(_.max) match { case Nil => None; case ms => Some(ms.max) },
        sts.map(_.nulls).sum)
    }.toMap
    TableStats(files.map(_.nRows).sum, files.map(_.bytes).sum, cols)
  }

  /** Stats-driven equi-join of `left` against the transactional
    * table at `rightRoot` (already loaded as `right`): broadcast the
    * right side iff ANALYZE says its decompressed estimate fits
    * under `broadcastBytes`; otherwise leave the shuffle join. The
    * threshold deliberately defaults to Spark's own 10 MB so the
    * flip is about WHERE the size estimate comes from, not a
    * different policy. */
  def join(left: DataFrame, right: DataFrame, rightRoot: String,
      keys: Seq[String],
      broadcastBytes: Long = USE_CONF_BUDGET): DataFrame = {
    val stats = analyze(rightRoot)
    val budget = resolveBudget(left, broadcastBytes)
    val buildSide =
      if (stats.estBroadcastBytes <= budget) broadcast(right)
      // stats say too big to build: pin the scalable shuffle join
      // (merge) so Spark's file-size estimate cannot re-broadcast
      // what the manifest knows is large
      else right.hint("merge")
    left.join(buildSide, keys)
  }

  /** Session override for the broadcast budget used by EVERY
    * stats-driven join decision here ([[join]], [[joinDerived]],
    * [[reorderJoin]], [[reorderJoinBushy]]) — one knob, so a spec (or
    * an operator) forcing the shuffle fallback steers every code
    * path, not just one. Unset → Spark's own default threshold. An
    * explicit `broadcastBytes` argument still wins over the conf. */
  val BROADCAST_BYTES_CONF = "graft.cbo.broadcastBytes"

  /** Sentinel default for broadcastBytes parameters: resolve from the
    * session conf at call time. */
  val USE_CONF_BUDGET: Long = -1L

  def broadcastBudget(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(BROADCAST_BYTES_CONF)
      .map(_.toLong).getOrElse(10L << 20)

  private def resolveBudget(anyFrame: DataFrame, explicit: Long): Long =
    if (explicit >= 0L) explicit else broadcastBudget(anyFrame.sparkSession)

  /** Stats-driven broadcast-vs-shuffle for a DERIVED build side — a
    * frame with no manifest of its own (a grouped shingle universe, a
    * distinct pair set), whose size the CALLER estimates from the
    * footer stats of the base table it derives from. This replaces
    * the bare `broadcast()` hint on such frames: the hint never
    * self-degrades, so the first corpus that outgrows the driver
    * turns it into an OOM; here the same estimate that would have
    * justified the hint instead FEEDS the decision, and an oversized
    * side degrades to the scalable shuffle join (hint("merge"), so
    * Spark's file-size estimate cannot re-broadcast it) with no
    * semantic change. */
  def joinDerived(left: DataFrame, right: DataFrame, keys: Seq[String],
      estBytes: Double, joinType: String = "inner"): DataFrame = {
    val spark = left.sparkSession
    val buildSide =
      if (estBytes <= broadcastBudget(spark).toDouble) broadcast(right)
      else right.hint("merge")
    left.join(buildSide, keys, joinType)
  }

  // ------------------------------------------------------------------
  // JOIN-ORDER CBO: greedy multi-way reorder with filter-selectivity
  // propagation through the footer stats — the decision that matters
  // at 100 TB TPC-H shapes is not just HOW each join runs
  // (broadcast/merge, above) but in WHAT ORDER the dimensions hit the
  // fact: the most selective dimension must shrink the intermediate
  // first, because every later join pays for the rows the earlier
  // ones let through. Estimates come from the same O(files) footer
  // metadata ANALYZE reads — no data is scanned to decide.
  // ------------------------------------------------------------------

  /** One reorderable join input: the dimension frame, its ANALYZE
    * stats, the equi-join column names (shared with the side already
    * joined — rename in the frame; a dim-dim edge is expressed by
    * keying on a column another DIMENSION exposes, which makes this a
    * join GRAPH: snowflake branches like supplier→nation route
    * through the availability constraint), and an optional `[lo, hi]`
    * range predicate on a stats-covered column. The predicate is BOTH
    * applied to the frame and fed to the cardinality estimate — the
    * "selectivity propagation" that plain table-size ordering lacks.
    * `pred` overrides the APPLIED form when the filter column is not
    * directly long-comparable (timestamps: estimate from the footer
    * micros range, apply the native timestamp predicate so pushdown
    * survives). `selOverride` feeds the estimate for predicates
    * footer ranges cannot see (string LIKE '%x%' — the default-match
    * magic constant every production CBO carries, or a
    * caller-measured fraction); it multiplies any range estimate.
    * `eqFilter` is an EQUALITY predicate col = v: estimated as 1/NDV
    * when the stats carry the column's NDV (see [[withNdv]]) — the
    * most common BI filter shape, which the range estimator cannot
    * see at all (a point predicate has no [lo, hi] span; without NDV
    * it used to default to 1.0 and could mis-order a chain). Falls
    * back to 1/(max−min+1) for an integer-ranged column, else 1.0.
    * All three estimate sources compose multiplicatively. */
  final case class Input(df: DataFrame, stats: TableStats,
      keys: Seq[String], filter: Option[(String, Long, Long)] = None,
      pred: Option[org.apache.spark.sql.Column] = None,
      selOverride: Option[Double] = None,
      eqFilter: Option[(String, Any)] = None)

  /** Uniform-assumption fraction of rows with `col` ∈ [lo, hi],
    * from the column's footer [min, max]. Unknown stats → 1.0 (the
    * conservative "doesn't shrink anything" estimate). */
  def selectivity(stats: TableStats, col: String, lo: Long,
      hi: Long): Double =
    stats.cols.get(col) match {
      case Some(FooterStats.ColStat(Some(mn), Some(mx), _)) =>
        val span = (mx - mn + 1).toDouble
        val keep =
          math.max(0L, math.min(hi, mx) - math.max(lo, mn) + 1).toDouble
        math.min(1.0, keep / span)
      case _ => 1.0
    }

  /** Uniform-assumption selectivity of `col = v`: 1/NDV when the
    * stats carry a distinct count, else 1/(max−min+1) from the footer
    * range of an integer column, else the conservative 1.0. */
  def eqSelectivity(stats: TableStats, col: String): Double =
    stats.ndv.get(col).filter(_ > 0).map(1.0 / _).getOrElse(
      stats.cols.get(col) match {
        case Some(FooterStats.ColStat(Some(mn), Some(mx), _)) if mx >= mn =>
          1.0 / (mx - mn + 1).toDouble
        case _ => 1.0
      })

  /** Estimated post-filter cardinality of one input. */
  def estRows(in: Input): Double =
    in.stats.nRows.toDouble * in.filter.map { case (c, lo, hi) =>
      selectivity(in.stats, c, lo, hi)
    }.getOrElse(1.0) * in.selOverride.getOrElse(1.0) *
      in.eqFilter.map { case (c, _) => eqSelectivity(in.stats, c) }
        .getOrElse(1.0)

  /** GREEDY JOIN-ORDER with CONNECTIVITY: at each step join the
    * smallest-estimated dimension whose join keys are already
    * available in the accumulated frame — a star picks purely by
    * estimated post-filter cardinality, a chain (fact→orders→
    * customer→nation) is ordered correctly by the availability
    * constraint. Each step reuses the stats-driven broadcast-vs-merge
    * decision (the broadcast estimate is also selectivity-scaled — a
    * 10% filter makes a 10×-too-big dimension broadcastable, which
    * file-size thresholds never see). Returns the joined frame plus
    * the chosen order (dim labels) so plan specs can pin that
    * inverting the stats flips the order. */
  def reorderJoin(fact: DataFrame, dims: Seq[(String, Input)],
      broadcastBytes: Long = USE_CONF_BUDGET): (DataFrame, Seq[String]) = {
    val budget = resolveBudget(fact, broadcastBytes)
    var acc = fact
    var remaining = dims
    val chosen = scala.collection.mutable.ListBuffer.empty[String]
    while (remaining.nonEmpty) {
      val available = acc.columns.toSet
      val eligible = remaining.filter(_._2.keys.forall(available))
      require(eligible.nonEmpty,
        s"join graph disconnected: none of " +
          s"${remaining.map(_._1)} joins on $available")
      val (label, in) = eligible.minBy { case (_, i) => estRows(i) }
      val applied = applyPredicates(in)
      val estBytes =
        estRows(in) * 8.0 * math.max(in.stats.cols.size, 1)
      val side =
        if (estBytes <= budget.toDouble) broadcast(applied)
        else applied.hint("merge")
      acc = acc.join(side, in.keys)
      chosen += label
      remaining = remaining.filterNot(_._1 == label)
    }
    (acc, chosen.toSeq)
  }

  /** The APPLIED form of one input's predicates: the native `pred`
    * if given (pushdown-preserving), else the long-range filter,
    * then any equality predicate on top. Shared by the linear
    * greedy and the bushy branch pre-join. */
  def applyPredicates(in: Input): DataFrame = {
    val ranged = in.pred.map(in.df.filter).getOrElse(
      in.filter.fold(in.df) { case (c, lo, hi) =>
        in.df.filter(org.apache.spark.sql.functions.col(c) >= lo &&
          org.apache.spark.sql.functions.col(c) <= hi)
      })
    in.eqFilter.fold(ranged) { case (c, v) =>
      ranged.filter(org.apache.spark.sql.functions.col(c) ===
        org.apache.spark.sql.functions.lit(v))
    }
  }

  /** A dependent-dim BRANCH hanging off one head dimension: the tail
    * dims join the HEAD (directly or chained), not the fact — Q8's
    * orders→customer→nation→region is the canonical shape. */
  final case class Branch(head: String, tail: Seq[String])

  /** BUSHY JOIN TREES: decide per branch whether to PRE-JOIN the
    * branch into one composite subtree before it touches the fact
    * (bushy) or feed its dims one at a time into the left-deep
    * greedy (linear). The left-deep greedy alone cannot express the
    * winning Q8-class plan: when a branch's TAIL is selective (region
    * = 'AMERICA' prunes nation, which prunes customer, which prunes
    * orders), joining the branch internally first means the expensive
    * fact join meets an already-pruned stream — at 100 TB the
    * difference between probing lineitem×(all orders) and
    * lineitem×(orders of one region's customers), i.e. the shuffle
    * volume of the dominant exchange. When the tail is NOT selective,
    * pre-joining buys nothing and costs an extra shuffle, so the
    * decision is stats-driven: pre-join iff the tail's combined
    * FK-selectivity — Π estRows(tail)/nRows(tail), the uniform
    * foreign-key assumption every textbook CBO uses — clears
    * `bushyThreshold`. The composite subtree re-enters the linear
    * greedy as ONE input whose cardinality estimate carries the
    * branch pruning, so broadcast-vs-merge and its position in the
    * join order both see the real (post-branch) size.
    *
    * Returns (joined frame, chosen linear order, bushy branch heads)
    * so specs can pin the stats→shape flip. */
  def reorderJoinBushy(fact: DataFrame, dims: Seq[(String, Input)],
      branches: Seq[Branch], broadcastBytes: Long = USE_CONF_BUDGET,
      bushyThreshold: Double = 0.5)
      : (DataFrame, Seq[String], Seq[String]) = {
    val byLabel = dims.toMap
    // branch sanity up front: a typo'd label or a dim claimed by two
    // branches would otherwise surface as an unkeyed lookup failure
    // or a silently duplicated join downstream
    val claimed = branches.flatMap(b => b.head +: b.tail)
    require(claimed.forall(byLabel.contains),
      s"branch labels ${claimed.filterNot(byLabel.contains)} not in " +
        s"dims ${dims.map(_._1)}")
    require(claimed.distinct.size == claimed.size,
      s"a dim may belong to at most one branch, got duplicates in " +
        s"$claimed")
    val taken = scala.collection.mutable.Set.empty[String]
    val bushyHeads = scala.collection.mutable.ListBuffer.empty[String]
    val composites = branches.flatMap { b =>
      val head = byLabel(b.head)
      val tail = b.tail.map(l => l -> byLabel(l))
      val tailSel = tail.map { case (_, t) =>
        estRows(t) / math.max(1.0, t.stats.nRows.toDouble) }.product
      if (tailSel > bushyThreshold) None
      else {
        val (sub, _) =
          reorderJoin(applyPredicates(head), tail, broadcastBytes)
        taken += b.head; taken ++= b.tail
        bushyHeads += b.head
        val estN = math.max(1L, (estRows(head) * tailSel).toLong)
        // synthetic stats for the composite: branch-pruned row count,
        // full joined width (the broadcast decision must price the
        // composite's actual columns, not just the head's)
        val cols = head.stats.cols ++ tail.flatMap { case (l, t) =>
          t.stats.cols.map { case (c, cs) => s"$l.$c" -> cs } }
        Some(b.head -> Input(sub,
          TableStats(estN, estN * 8L * math.max(cols.size, 1), cols),
          head.keys))
      }
    }
    val rest = dims.filterNot { case (l, _) => taken(l) }
    val (joined, order) =
      reorderJoin(fact, rest ++ composites, broadcastBytes)
    (joined, order, bushyHeads.toList)
  }
}
