package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** Aggregation operators (SURVEY.md §2.4).
  *
  * Scale notes: every groupBy here compiles to HashAggregateExec with
  * automatic partial (map-side) + final aggregation — the MapReduce
  * "combiner" for free. Group keys are low-cardinality (flags, users),
  * so the final shuffle moves only #groups × #partitions rows; this
  * holds at 100 TB as long as keys stay bounded (they do: flags,
  * priorities, users, dates).
  */
object AggOps {
  import Exact._

  /** Flagship: TPC-H Q1 shape — scan → filter → 8-measure grouped agg
    * → total-order sort. Exercises pushdown, partial agg, and the
    * decimal-exact float discipline end-to-end.
    */
  def multiKeyPricing(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= to_timestamp(lit("2001-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        xsum($"l_quantity").as("sum_qty"),
        xsum($"l_extendedprice").as("sum_base_price"),
        xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        xsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        xavg($"l_quantity").as("avg_qty"),
        xavg($"l_extendedprice").as("avg_price"),
        xavg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val multiKeyPricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlXsum("l_quantity")} AS sum_qty,
       |  ${sqlXsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlXsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlXsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlXavg("l_quantity")} AS avg_qty,
       |  ${sqlXavg("l_extendedprice")} AS avg_price,
       |  ${sqlXavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
