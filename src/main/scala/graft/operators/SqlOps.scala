package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Exact, Tables}

/** SQL-text entry-point queries exercising Catalyst's subquery
  * rewrites (SURVEY.md §4.1: RewriteCorrelatedScalarSubquery and
  * IN-to-semi-join conversion — rewrites a MapReduce pipeline would
  * have to hand-build as extra jobs).
  *
  * Scale notes (100 TB): both subqueries decorrelate into joins —
  * the correlated scalar becomes an aggregate + equi-join (one
  * shuffle, partial agg map-side) and the IN becomes a left-semi
  * join, so neither executes per-row; plans are asserted in
  * PlanSpec. The scalar comparison is decimal-exact on both engines
  * so the predicate can never flip on a float ulp.
  */
object SqlOps {
  import Exact._

  /** Orders priced above their customer's decimal-exact average order
    * price — correlated scalar subquery, decorrelated by Catalyst. */
  def subqueryScalar(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(subqueryScalarSql)
  }

  val subqueryScalarSql: String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice
       |FROM orders o
       |WHERE o_totalprice > (
       |  SELECT ${sqlXavg("o2.o_totalprice")}
       |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
       |ORDER BY o_orderkey""".stripMargin

  /** Customers with at least one urgent order — IN subquery, planned
    * as a left-semi join. */
  def subqueryIn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(subqueryInSql)
  }

  val subqueryInSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS with a correlated predicate — null-safe anti-join
    * planning (the three-valued-logic hazard of NOT IN is avoided by
    * EXISTS semantics; suppliers with no lineitem shipped after a
    * date). */
  def subqueryNotExists(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(subqueryNotExistsSql)
  }

  val subqueryNotExistsSql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier s
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_suppkey = s.s_suppkey
      |    AND l.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
      |ORDER BY s_suppkey""".stripMargin
}
