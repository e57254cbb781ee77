package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the CF pair-moments build (test scope, not shipped):
  * decimal vs long moment sums, and AQE coalesce parallelism. One JVM,
  * alternating runs, so host noise hits all variants equally.
  * Run: sbt "Test/runMain graft.ProfilePairs /root/testdata/sf0.1"
  */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val ratings = graft.engine.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey")
      .join(graft.engine.Tables.lineitem(spark, sfDir)
        .select($"l_orderkey", $"l_partkey", $"l_quantity"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey".as("user_id"), $"l_partkey".as("item_id"))
      .agg(graft.engine.Exact.xsumFast($"l_quantity").as("rating"))
      .persist()
    ratings.count()

    val capW = Window.partitionBy($"user_id")
      .orderBy($"rating".desc, $"item_id".asc)
    def capped: DataFrame = ratings
      .withColumn("urk", row_number().over(capW))
      .filter($"urk" <= 32)
      .select($"user_id", $"item_id", $"rating")

    def momentsDecimal(): DataFrame = {
      val r = capped
      val a = r.select($"user_id", $"item_id".as("item_a"), $"rating".as("ra"))
      val b = r.select($"user_id".as("ub"), $"item_id".as("item_b"), $"rating".as("rb"))
      a.join(b, $"user_id" === $"ub" && $"item_a" < $"item_b")
        .groupBy($"item_a", $"item_b")
        .agg(count(lit(1)).as("n_common"),
          graft.engine.Exact.xsumFast($"ra" * $"rb").as("dot"),
          graft.engine.Exact.xsumFast($"ra").as("sx"),
          graft.engine.Exact.xsumFast($"rb").as("sy"),
          graft.engine.Exact.xsumFast($"ra" * $"ra").as("sxx"),
          graft.engine.Exact.xsumFast($"rb" * $"rb").as("syy"))
        .filter($"n_common" >= 2)
    }

    def momentsLong(): DataFrame = {
      val r = capped.select($"user_id", $"item_id",
        $"rating".cast("bigint").as("lr"))
      val a = r.select($"user_id", $"item_id".as("item_a"), $"lr".as("ra"))
      val b = r.select($"user_id".as("ub"), $"item_id".as("item_b"), $"lr".as("rb"))
      a.join(b, $"user_id" === $"ub" && $"item_a" < $"item_b")
        .groupBy($"item_a", $"item_b")
        .agg(count(lit(1)).as("n_common"),
          sum($"ra" * $"rb").cast("double").as("dot"),
          sum($"ra").cast("double").as("sx"),
          sum($"rb").cast("double").as("sy"),
          sum($"ra" * $"ra").cast("double").as("sxx"),
          sum($"rb" * $"rb").cast("double").as("syy"))
        .filter($"n_common" >= 2)
    }

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[ab] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    for (round <- 1 to 3) {
      time(s"r$round decimal")(momentsDecimal())
      time(s"r$round long")(momentsLong())
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      time(s"r$round long noCoalesce")(momentsLong())
      time(s"r$round decimal noCoalesce")(momentsDecimal())
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    spark.stop()
  }
}
