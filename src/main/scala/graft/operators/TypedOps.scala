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
}
