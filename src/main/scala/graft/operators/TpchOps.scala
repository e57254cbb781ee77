package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** The rest of the TPC-H workload family (Q3/Q5/Q10/Q18 live in
  * [[WorkloadOps]]). The fixture carries a subset of the TPC-H columns
  * — no partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no
  * p_container, no c_phone — so each query documents its adaptation:
  * the JOIN/SUBQUERY/AGGREGATION shape is the original's, the missing
  * column is replaced by the nearest fixture column with the same role.
  *
  * Scale notes (100 TB), common to the family:
  * - Selective predicates are declared on the base table before any
  *   join, so they reach the parquet scan as PushedFilters and the
  *   joins see the filtered minority.
  * - Every aggregate a join consumes is pre-aggregated BELOW the join
  *   where the grouping key is the join key (Q13's per-customer counts,
  *   Q15's per-supplier revenue): the shuffle moves |groups| rows, not
  *   |lineitem| rows.
  * - Correlated scalar subqueries (Q17's per-part average) are written
  *   as an explicit aggregate-then-join — the same decorrelation
  *   Catalyst performs, stated directly so the plan is visible in the
  *   code. The aggregate side shuffles once on the correlation key.
  * - Money sums go through DECIMAL ([[Exact.xsum]]) — order-independent
  *   bytes under retries/repartitioning.
  */
object TpchOps {
  import Exact._

  /** TPC-H Q6 (forecast revenue change) — unmodified; the purest
    * pushdown demonstration: three range predicates, zero joins, one
    * global sum. At 100 TB this reads only the row groups whose
    * min/max stats overlap the shipdate year. */
  def tpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
        $"l_shipdate" < to_timestamp(lit("1998-01-01")) &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
      .agg(xsum($"l_extendedprice" * $"l_discount").as("revenue"))
  }

  val tpchQ6Sql: String =
    s"""SELECT ${sqlXsum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24.0""".stripMargin

  /** TPC-H Q4 (order priority checking), adapted: the fixture has no
    * l_commitdate/l_receiptdate, so "late" is l_shipdate more than 30
    * days after o_orderdate. The shape is the point: an EXISTS
    * decorrelated to a LEFT SEMI join whose condition mixes the equi
    * key with a non-equi date predicate (hash-join on the key, the
    * range residual filters matches). */
  def tpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= to_timestamp(lit("1997-07-01")) &&
        $"o_orderdate" < to_timestamp(lit("1997-10-01")))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority".asc)
  }

  val tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC""".stripMargin

  /** TPC-H Q13 (customer distribution), adapted: the filtered-out
    * order class is o_orderpriority = '5-LOW' (the fixture has no
    * o_comment to regex). Two aggregations at different grain: orders
    * per customer (outer join preserves zero-order customers), then
    * the histogram of those counts. The first groupBy keys on the join
    * key, so at scale the count can fold into the join's own shuffle;
    * the second aggregates ≤ |customers| rows. */
  def tpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val tpchQ13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 (promotion effect) — the fixture's p_type is a single
    * word, so PROMO is an exact match rather than a prefix. One month
    * of lineitem joined to part (broadcast at any scale: part is the
    * small side after pruning to two columns), conditional revenue
    * ratio. Numerator and denominator are both exact decimal sums; the
    * final division is a single deterministic double op. */
  def tpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= to_timestamp(lit("1997-09-01")) &&
        $"l_shipdate" < to_timestamp(lit("1997-10-01")))
      .select($"l_partkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    val p = Tables.part(spark, sfDir).select($"p_partkey", $"p_type")
    l.join(p, $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) *
        xsum(when($"p_type" === "PROMO", $"rev").otherwise(0.0)) /
        xsum($"rev")).as("promo_revenue"))
  }

  val tpchQ14Sql: String =
    s"""SELECT 100.0 *
       |  ${sqlXsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
       |  ${sqlXsum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue), adapted: p_container
    * becomes a p_size band (< 10). The correlated scalar subquery
    * (per-part average quantity) is decorrelated to an aggregate on
    * the correlation key joined back — one shuffle on l_partkey for
    * the averages, and the probe side is pre-filtered by the selective
    * brand/size predicate before it ever meets lineitem. */
  def tpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lim = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey")
      .agg((xavg($"l_quantity") * 0.2).as("qty_lim"))
      .withColumnRenamed("l_partkey", "lim_partkey")
    val p = Tables.part(spark, sfDir)
      .filter($"p_brand" === "Brand#23" && $"p_size" < 10)
      .select($"p_partkey")
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(p, $"l_partkey" === $"p_partkey")
      .join(lim, $"l_partkey" === $"lim_partkey")
      .filter($"l_quantity" < $"qty_lim")
      .agg((xsum($"l_extendedprice") / 7.0).as("avg_yearly"))
  }

  val tpchQ17Sql: String =
    s"""SELECT ${sqlXsum("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#23' AND p_size < 10
       |  AND l_quantity < (SELECT (${sqlXavg("l_quantity")}) * 0.2
       |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin
}
