package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Projection / filter / predicates (SURVEY.md §2.2).
  *
  * Scale notes: filters are declared before any shuffle so Catalyst
  * pushes them into the parquet scan (PushedFilters — asserted in
  * PlanShapeSpec); per-row arithmetic is IEEE-double and deterministic,
  * so it needs no decimal discipline (only cross-row sums do).
  */
object FilterOps {

  /** Computed projection (MR: map). Per-row double arithmetic is
    * bit-identical in Spark and DuckDB. */
  def projectExpr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net"),
        ($"l_quantity" * $"l_extendedprice").as("gross"))
      .orderBy($"l_orderkey", $"l_linenumber", $"net", $"gross")
  }

  val projectExprSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net,
      |  l_quantity * l_extendedprice AS gross
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, net, gross""".stripMargin

  /** Conjunctive/disjunctive predicates with pushdown (MR: map-side
    * filter). */
  def filterPred(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= to_timestamp(lit("1998-01-01")) &&
        ($"l_returnflag" === "R" || $"l_discount" > 0.05))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_discount", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_discount", $"l_shipdate")
  }

  val filterPredSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND (l_returnflag = 'R' OR l_discount > 0.05)
      |ORDER BY ALL""".stripMargin

  /** Three-valued-logic edge: NOT IN over a NULLable expression drops
    * NULL rows in both engines (fixtures have no physical NULLs, so we
    * manufacture them with NULLIF). */
  def filterNullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val prio = nullif($"o_orderpriority", lit("3-MEDIUM"))
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", prio.as("prio_n"))
      .filter(!col("prio_n").isin("1-URGENT", "2-HIGH"))
      .orderBy($"o_orderkey")
  }

  val filterNullSemanticsSql: String =
    """SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS prio_n
      |FROM orders
      |WHERE NULLIF(o_orderpriority, '3-MEDIUM') NOT IN ('1-URGENT', '2-HIGH')
      |ORDER BY o_orderkey""".stripMargin
}
