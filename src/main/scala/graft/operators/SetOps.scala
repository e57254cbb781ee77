package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Set operations (SURVEY.md §2.7).
  *
  * Scale notes: union is metadata-only (no shuffle); distinct /
  * intersect / except each hash-shuffle on the full row — at 100 TB
  * prefer pre-aggregated keys (as here: user_id only) over wide rows.
  */
object SetOps {

  /** Bag union of two filtered slices (MR: multi-input job). Rows with
    * equal keys are byte-identical duplicates, so the key-only ORDER BY
    * is still a total content order. */
  def unionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val hi = o.filter($"o_totalprice" > 150000.0)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    hi.unionByName(urgent).orderBy($"o_orderkey")
  }

  val unionAllSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_totalprice > 150000.0
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderpriority = '1-URGENT'
      |) ORDER BY o_orderkey""".stripMargin

  /** Set (distinct) union: users who clicked ∪ users who purchased. */
  def unionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "click").select($"user_id")
      .union(e.filter($"event_type" === "purchase").select($"user_id"))
      .distinct()
      .orderBy($"user_id")
  }

  val unionDistinctSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  /** Intersection: users with clicks ∩ users with errors. */
  def intersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "click").select($"user_id")
      .intersect(e.filter($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }

  val intersectSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** Difference: users with HIGH-VALUE views ∖ users with high-value
    * purchases (the CF train/test-split shape — "window-shoppers" for
    * expensive items). The value > 95 slice makes the difference
    * provably non-empty at the test fixtures' density (23 users at
    * sf0.01, 164 at sf0.1): every user has every event type in the
    * dense fixture, so an unsliced user-set difference would pass
    * vacuously with 0 rows. */
  def except(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "view" && $"value" > 95.0).select($"user_id")
      .except(e.filter($"event_type" === "purchase" && $"value" > 95.0).select($"user_id"))
      .orderBy($"user_id")
  }

  val exceptSql: String =
    """SELECT user_id FROM events WHERE event_type = 'view' AND value > 95.0
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95.0
      |ORDER BY user_id""".stripMargin

  /** Bag difference: each view event minus one per purchase of the
    * same user — multiplicities matter (EXCEPT ALL), unlike the set
    * form above. Catalyst rewrites this to a multiplicity join
    * (RewriteExceptAll). */
  def exceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "view").select($"user_id")
      .exceptAll(e.filter($"event_type" === "purchase").select($"user_id"))
      .orderBy($"user_id")
  }

  val exceptAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'view'
      |EXCEPT ALL
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  /** Bag intersection: per-user min(views, purchases) copies survive. */
  def intersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "view").select($"user_id")
      .intersectAll(e.filter($"event_type" === "purchase").select($"user_id"))
      .orderBy($"user_id")
  }

  val intersectAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'view'
      |INTERSECT ALL
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  /** Schema-evolving union: `unionByName(allowMissingColumns = true)`
    * aligns two frames with DIFFERENT column sets by NAME (positional
    * union would mis-bind or reject), null-filling each side's missing
    * columns — the heterogeneous-batch append every long-lived ingest
    * pipeline hits when a field is added mid-stream. Pure map-side
    * concatenation: no shuffle beyond the output sort. The oracle
    * spells the alignment out column-by-column, which is exactly the
    * contract the API implements. */
  def unionByName(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"value")
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id", $"user_id",
        dayofmonth($"ts").as("signup_day"))
    clicks.unionByName(signups, allowMissingColumns = true)
      .orderBy($"event_id")
  }

  val unionByNameSql: String =
    """SELECT event_id, user_id, value,
      |  CAST(NULL AS INTEGER) AS signup_day
      |FROM events WHERE event_type = 'click'
      |UNION ALL
      |SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value,
      |  CAST(day(ts) AS INTEGER) AS signup_day
      |FROM events WHERE event_type = 'signup'
      |ORDER BY event_id""".stripMargin
}
