package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Exact

/** Queries over the custom DataSourceV2 source ([[graft.sources.SynthSource]]).
  *
  * The table is a deterministic generator (id, bucket = id % 32,
  * value = Knuth-hash fraction), so the DuckDB oracle reproduces it
  * from `range(0, 60000)` with the identical integer arithmetic —
  * exact to the bit, no rounding needed. The generator size is FIXED
  * (independent of sfDir): what is under test is the connector's
  * pushdown/pruning machinery, not data volume.
  *
  * Scale note (100 TB): `q_source_synth` pushes `bucket = 3 AND id
  * BETWEEN …` INTO the source — the scan plans 1 of 32 partitions and
  * generates only the id range, the DSv2 contract that turns a custom
  * storage system into a prunable table. `q_source_synth_agg` prunes
  * columns instead (id is never materialized) and feeds the standard
  * partial/final hash aggregate. SourceSpec pins both plans (kept
  * partitions, pushed filters, read schema, no residual FilterExec).
  */
object SourceOps {
  import Exact._

  private val ROWS = 60000L
  private val BUCKETS = 32

  // format() by class name: the short name "graft-synth" resolves via
  // the META-INF/services registry, which is only on the classpath when
  // the resources are packaged (sbt test does; the harness's bare
  // classes-dir classpath does not) — SourceSpec covers the short name.
  private def synth(spark: SparkSession): DataFrame =
    spark.read.format(classOf[graft.sources.SynthSource].getName)
      .option("rows", ROWS.toString).option("buckets", BUCKETS.toString)
      .load()

  /** The oracle's reconstruction of the generator (DuckDB `range`). */
  private val synthCte: String =
    s"""synth AS (
       |  SELECT id, CAST(id % $BUCKETS AS INTEGER) AS bucket,
       |    ((id * 2654435761) % 1000003) / 1000003.0 AS value
       |  FROM range(0, $ROWS) t(id))""".stripMargin

  /** Point-lookup shape: bucket equality + id range, both pushed into
    * the source (1 of 32 partitions planned, bounded generation). */
  def sourceSynth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    synth(spark)
      .filter($"bucket" === 3 && $"id" >= 1000L && $"id" < 20000L)
      .orderBy($"id")
  }

  val sourceSynthSql: String =
    s"""WITH $synthCte
       |SELECT id, bucket, value FROM synth
       |WHERE bucket = 3 AND id >= 1000 AND id < 20000
       |ORDER BY id""".stripMargin

  /** Aggregate shape: per-bucket sums over an id range — the id
    * column is pruned out of the scan (only bucket/value generated)
    * and the range bound is still pushed. */
  def sourceSynthAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    synth(spark)
      .filter($"id" < 30000L)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), xsum($"value").as("sum_value"))
      .orderBy($"bucket")
  }

  val sourceSynthAggSql: String =
    s"""WITH $synthCte
       |SELECT bucket, COUNT(*) AS n, ${sqlXsum("value")} AS sum_value
       |FROM synth WHERE id < 30000
       |GROUP BY bucket ORDER BY bucket""".stripMargin
}
