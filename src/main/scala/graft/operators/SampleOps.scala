package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Deterministic sampling — the training-data-pipeline primitives for
  * cutting corpora down to budget. Spark's `sample()`/`TABLESAMPLE` are
  * seeded-RNG-per-partition: resplitting the input changes the sample,
  * and no external engine can reproduce it — useless for auditable
  * pipelines and untestable against an oracle. Both operators below
  * instead derive the sampling decision from the ROW KEY with pure
  * integer arithmetic (a Knuth multiplicative scatter), so the sample
  * is (a) stable under any repartitioning/retry, (b) reproducible by
  * any engine, (c) pushdown-friendly — the predicate evaluates in the
  * scan, no shuffle, no state.
  *
  * At 100 TB: `sampleHash` is embarrassingly parallel (scan-side
  * filter, zero shuffle). `sampleStratified`'s per-stratum top-N
  * shuffles once on the stratum key; for heavy strata the rank is a
  * windowed top-N (partial top-N per map task via
  * TakeOrderedAndProject would need a custom operator — the window
  * form is the portable one and AQE handles stratum skew). The
  * multiplicative constants assume keys < ~2^33 so products stay in
  * int64; at larger key domains mod the key down first (documented
  * here rather than silently wrapping).
  */
object SampleOps {

  /** key-scatter expression shared by both operators: Knuth's
    * 2654435761 times the primary key plus a line salt, mod 1000. */
  private val scatterExpr =
    "pmod(l_orderkey * 2654435761 + l_linenumber * 40503, 1000)"
  private val scatterSql =
    "((l_orderkey * 2654435761 + l_linenumber * 40503) % 1000 + 1000) % 1000"

  /** 10 % deterministic sample of `lineitem`: scatter < 100. */
  def sampleHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(expr(scatterExpr) < 100)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
      // (l_orderkey, l_linenumber) is NOT unique in the fixture —
      // order by every output column so the order is total up to
      // full-row duplicates (which hash identically).
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
  }

  val sampleHashSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
       |FROM lineitem
       |WHERE $scatterSql < 100
       |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin

  /** Stratified sample: exactly min(500, stratum size) rows per
    * (l_returnflag, l_linestatus) stratum, chosen in scatter order —
    * a per-class quota, the class-balanced dataset builder. */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_returnflag", $"l_linestatus")
      .orderBy(expr(scatterExpr).asc, $"l_orderkey".asc, $"l_linenumber".asc)
    Tables.lineitem(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 500)
      .select($"l_returnflag", $"l_linestatus", $"rn",
        $"l_orderkey", $"l_linenumber")
      .orderBy($"l_returnflag", $"l_linestatus", $"rn")
  }

  val sampleStratifiedSql: String =
    s"""WITH ranked AS (
       |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
       |    row_number() OVER (PARTITION BY l_returnflag, l_linestatus
       |      ORDER BY $scatterSql ASC, l_orderkey ASC, l_linenumber ASC)
       |      AS rn
       |  FROM lineitem)
       |SELECT l_returnflag, l_linestatus, rn, l_orderkey, l_linenumber
       |FROM ranked WHERE rn <= 500
       |ORDER BY l_returnflag, l_linestatus, rn""".stripMargin

  /** Weighted deterministic Bernoulli sample: row kept iff
    * scatter(key) < weight · WEIGHT_GAIN, i.e. P(keep) ∝ l_quantity
    * (a quantity-50 line is 50× likelier than a quantity-1 line).
    * This is the importance-sampling primitive of training-data mix
    * construction — upweight rare-but-valuable rows without a shuffle.
    * Pure integer comparison against the same key scatter as
    * [[sampleHash]]: repartition/retry-stable, engine-reproducible,
    * and the predicate evaluates inside the scan (zero shuffle,
    * filter pushed to the parquet reader at any scale). */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(expr(scatterExpr) < $"l_quantity" * 15)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
  }

  val sampleWeightedSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       |FROM lineitem
       |WHERE $scatterSql < l_quantity * 15
       |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin
}
