package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables

/** Typed Dataset surface (SURVEY.md §1.2: case-class cores where type
  * safety helps, DataFrame at API boundaries).
  *
  * `mapGroups` is the typed escape hatch for genuinely imperative
  * per-group logic — it runs the shuffle like any keyed aggregation
  * but evaluates the closure outside whole-stage codegen, so the
  * declarative `agg()` path is preferred wherever the computation is
  * expressible (SCALE.md §1). This operator exists to keep the typed
  * path exercised and oracle-checked: count and max are order-exact,
  * so the fold is deterministic at any parallelism.
  */
object TypedOps {

  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

  /** Per-customer order count and max price via the typed
    * KeyValueGroupedDataset API. */
  def typedMapGroups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .mapGroups { (k, it) =>
        var n = 0L
        var mx = Double.NegativeInfinity
        it.foreach { o => n += 1; mx = math.max(mx, o.o_totalprice) }
        (k, n, mx)
      }
      .toDF("user_id", "n_orders", "max_price")
      .orderBy($"user_id")
  }

  val typedMapGroupsSql: String =
    """SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
      |  MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY user_id""".stripMargin

  case class CustRow(c_custkey: Long, c_mktsegment: String)

  /** Typed join surface: `joinWith` keeps BOTH sides as case classes
    * (a Dataset[(CustRow, OrderRow)], no Row juggling, no column-name
    * collisions), then a typed groupByKey folds per market segment.
    * Same physical plan as the DataFrame join — joinWith is API
    * surface, not a different engine path — so broadcast/shuffle
    * planning and codegen apply unchanged; the typed fold sticks to
    * order-exact measures (count, max) so parallelism can't change
    * bytes. */
  def typedJoinWith(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment").as[CustRow]
    val ords = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").as[OrderRow]
    cust.joinWith(ords, cust("c_custkey") === ords("o_custkey"))
      .groupByKey(_._1.c_mktsegment)
      .mapGroups { (seg, it) =>
        var n = 0L
        var mx = Double.NegativeInfinity
        it.foreach { case (_, o) => n += 1; mx = math.max(mx, o.o_totalprice) }
        (seg, n, mx)
      }
      .toDF("c_mktsegment", "n_orders", "max_price")
      .orderBy($"c_mktsegment")
  }

  val typedJoinWithSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  MAX(o_totalprice) AS max_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin
}
