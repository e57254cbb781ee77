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

  /** ANALYZE output for one table: totals plus per-column stats. */
  final case class TableStats(nRows: Long, sizeBytes: Long,
      cols: Map[String, FooterStats.ColStat]) {
    /** Decompressed in-memory size estimate: 8 bytes per long cell.
      * Parquet's encoded bytes under-estimate the hash-table cost of
      * a broadcast build by the compression ratio. */
    def estBroadcastBytes: Long = nRows * 8L * math.max(cols.size, 1)
  }

  /** ANALYZE TABLE: one footer pass over the latest snapshot. */
  def analyze(root: String): TableStats = {
    val files = FooterStats.latestSnapshot(root)
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
      broadcastBytes: Long = 10L << 20): DataFrame = {
    val stats = analyze(rightRoot)
    val buildSide =
      if (stats.estBroadcastBytes <= broadcastBytes) broadcast(right)
      // stats say too big to build: pin the scalable shuffle join
      // (merge) so Spark's file-size estimate cannot re-broadcast
      // what the manifest knows is large
      else right.hint("merge")
    left.join(buildSide, keys)
  }
}
