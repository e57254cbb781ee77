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

  /** Custom typed [[org.apache.spark.sql.expressions.Aggregator]]
    * (the Dataset-native UDAF surface): a reusable, composable
    * (count, min, max) fold with a case-class-free tuple buffer,
    * attached via `toColumn` inside `groupByKey.agg`. Unlike
    * `mapGroups`, an Aggregator declares `merge`, so Spark runs it
    * as a REAL two-phase aggregation — partial folds per partition,
    * merge on the reduce side — no per-group row buffering, the
    * same partial/final shape as a built-in agg (that is the scale
    * argument for preferring Aggregator over mapGroups whenever the
    * computation folds). All-Long measures keep the fold order-exact
    * at any parallelism. */
  object OrderSpan
      extends org.apache.spark.sql.expressions.Aggregator[
        OrderRow, (Long, Long, Long), (Long, Long, Long)] {
    override def zero: (Long, Long, Long) = (0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: (Long, Long, Long), o: OrderRow)
        : (Long, Long, Long) =
      (b._1 + 1, math.min(b._2, o.o_orderkey), math.max(b._3, o.o_orderkey))
    override def merge(a: (Long, Long, Long), b: (Long, Long, Long))
        : (Long, Long, Long) =
      (a._1 + b._1, math.min(a._2, b._2), math.max(a._3, b._3))
    override def finish(b: (Long, Long, Long)): (Long, Long, Long) = b
    override def bufferEncoder
        : org.apache.spark.sql.Encoder[(Long, Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
    override def outputEncoder
        : org.apache.spark.sql.Encoder[(Long, Long, Long)] = bufferEncoder
  }

  /** Per-customer order count and orderkey span through the typed
    * Aggregator — partial/final aggregation, not group buffering. */
  def typedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .agg(OrderSpan.toColumn.name("span"))
      .map { case (k, (n, lo, hi)) => (k, n, lo, hi) }
      .toDF("user_id", "n_orders", "min_ok", "max_ok")
      .orderBy($"user_id")
  }

  val typedAggSql: String =
    """SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
      |  MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok
      |FROM orders GROUP BY 1 ORDER BY user_id""".stripMargin
}
