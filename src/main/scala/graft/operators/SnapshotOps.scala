package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Changelog → snapshot operators: CDC latest-wins compaction (the
  * MERGE/upsert every lakehouse pipeline runs) and SCD2 validity
  * intervals (the warehouse-history form). The `events` purchase stream
  * plays the changelog: key = user_id, each event is an update carrying
  * a new `value`.
  *
  * Scale notes (100 TB):
  * - Both are ONE shuffle on the key followed by a per-key sort — the
  *   window's partitionBy. That is the minimum any keyed compaction can
  *   do; engines that MERGE row-at-a-time (transactional upsert) pay
  *   random I/O instead, which is why bulk CDC compaction is always the
  *   windowed form.
  * - Latest-wins keeps max-(ts, event_id) per key; at scale this is the
  *   compaction step of every incremental table format (Delta/Hudi/
  *   Iceberg MoR) — Spark plans it as window + filter, with partial
  *   row_number short-circuit (a top-1-per-key never materializes the
  *   full sorted partition when AQE's window-group-limit kicks in).
  * - SCD2's lead() needs the same sort; valid_to of the last version is
  *   NULL = "current". Ties on ts are broken by event_id so the version
  *   chain is total — nondeterministic version order would corrupt
  *   history on rerun.
  */
object SnapshotOps {

  /** CDC latest-wins upsert compaction: collapse the purchase
    * changelog to one current row per user (newest ts, event_id
    * tiebreak), carrying the number of superseded updates. */
  def upsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    val wAll = Window.partitionBy($"user_id")
    Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_updates", count(lit(1)).over(wAll))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"ts".as("last_ts"), $"value".as("last_value"), $"n_updates")
      .orderBy($"user_id")
  }

  val upsertLatestSql: String =
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |  value AS last_value, n_updates
      |FROM (
      |  SELECT user_id, event_id, ts, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_updates
      |  FROM events WHERE event_type = 'purchase')
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** SCD2 history build: every update becomes a version row with
    * [valid_from, valid_to) bounds; the open (current) version has
    * valid_to NULL and is_current = 1. */
  def scd2Versions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"version", $"event_id", $"value",
        $"ts".as("valid_from"), $"valid_to",
        when($"valid_to".isNull, 1).otherwise(0).as("is_current"))
      .orderBy($"user_id", $"version")
  }

  val scd2VersionsSql: String =
    """SELECT user_id, version, event_id, value, valid_from, valid_to,
      |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM (
      |  SELECT user_id, event_id, ts AS valid_from, value,
      |    row_number() OVER w AS version,
      |    lead(ts, 1) OVER w AS valid_to
      |  FROM events WHERE event_type = 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      |ORDER BY user_id, version""".stripMargin

  /** Point-in-time (temporal) join: each click joined to the SCD2
    * purchase-dimension version VALID AT the click's timestamp — the
    * "what did the dimension say when the fact happened" join that
    * every warehouse with slowly-changing dimensions runs, and the
    * batch twin of stream–stream event-time joins. Clicks before a
    * user's first version drop (inner semantics).
    *
    * Equi-join on user_id with the validity range as a residual
    * predicate: hash-joinable, ONE shuffle pair, and the per-key
    * fan-out is bounded by that user's version count (version chains
    * are short by construction — this is NOT the unbounded range-join
    * blowup, because each fact matches exactly one version). At 100 TB
    * bucket both sides by the key and the join is exchange-free. */
  def temporalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    val dim = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id".as("d_user"), $"version",
        $"value".as("dim_value"), $"ts".as("valid_from"), $"valid_to")
    val clicks = Tables.events(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    clicks.join(dim,
      $"user_id" === $"d_user" && $"valid_from" <= $"ts" &&
        ($"valid_to".isNull || $"ts" < $"valid_to"))
      .select($"click_id", $"user_id", $"ts", $"version", $"dim_value")
      .orderBy($"click_id")
  }

  val temporalJoinSql: String =
    """WITH dim AS (
      |  SELECT user_id, value AS dim_value,
      |    row_number() OVER w AS version,
      |    ts AS valid_from, lead(ts, 1) OVER w AS valid_to
      |  FROM events WHERE event_type = 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click')
      |SELECT c.click_id, c.user_id, c.ts, d.version, d.dim_value
      |FROM clicks c JOIN dim d
      |  ON c.user_id = d.user_id AND d.valid_from <= c.ts
      |  AND (d.valid_to IS NULL OR c.ts < d.valid_to)
      |ORDER BY c.click_id""".stripMargin

  /** Cohort retention: users grouped by first-activity week, counted
    * in each subsequent activity week — the product-analytics matrix
    * behind every "week-4 retention" number. Two aggregations on
    * user_id (cohort assignment + distinct activity weeks) and one
    * join that reuses the same key partitioning; all counts exact
    * integers, week arithmetic in whole days / 7 so both engines
    * agree on the bucket. */
  def eventsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"user_id", date_trunc("WEEK", $"ts").cast("date").as("wk"))
    val cohort = e.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    val activity = e.distinct()
    activity.join(cohort, "user_id")
      .select($"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("int").as("weeks_since"))
      .groupBy($"cohort_week", $"weeks_since")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"weeks_since")
  }

  val eventsRetentionSql: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY user_id)
      |SELECT c.cohort_week,
      |  CAST(date_diff('day', c.cohort_week, e.wk) // 7 AS INTEGER)
      |    AS weeks_since,
      |  COUNT(*) AS n_users
      |FROM e JOIN cohort c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Snapshot boundary for [[snapshotDiff]]: state of the world as of
    * this instant vs the final state. */
  private val DIFF_CUTOFF = "2024-01-15 00:00:00"

  /** Snapshot diff: compare the latest-wins state at [[DIFF_CUTOFF]]
    * against the final state and emit what changed — `added` keys
    * (first update after the cutoff) and `changed` keys (newer value
    * superseded the cutoff-time one), with old/new values side by
    * side. The table-versioning diff primitive (what changed between
    * yesterday's and today's snapshot?) that drives incremental
    * downstream recompute; the changelog is append-only, so `removed`
    * cannot occur and unchanged keys are filtered out.
    *
    * Both snapshots are the same one-shuffle latest-wins compaction
    * ([[upsertLatest]]'s shape) over prefixes of the changelog, and
    * the diff itself is a full-outer join on the key — at 100 TB all
    * three steps shuffle on the same key, so the whole diff is ONE
    * logical repartition of the changelog (Spark reuses the exchange
    * across the two window subtrees and the join). */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def snap(df: DataFrame): DataFrame = {
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      df.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"value")
    }
    val base = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
    val before = snap(base.filter($"ts" < lit(DIFF_CUTOFF).cast("timestamp")))
      .select($"user_id", $"value".as("old_value"))
    val after = snap(base).select($"user_id", $"value".as("new_value"))
    after.join(before, Seq("user_id"), "left")
      .withColumn("change",
        when($"old_value".isNull, lit("added"))
          .when($"old_value" =!= $"new_value", lit("changed"))
          .otherwise(lit("unchanged")))
      .filter($"change" =!= "unchanged")
      .select($"user_id", $"change", $"old_value", $"new_value")
      .orderBy($"user_id")
  }

  val snapshotDiffSql: String =
    s"""WITH base AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase'),
       |before AS (
       |  SELECT user_id, value AS old_value FROM (
       |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM base WHERE ts < TIMESTAMP '$DIFF_CUTOFF')
       |  WHERE rn = 1),
       |after AS (
       |  SELECT user_id, value AS new_value FROM (
       |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM base)
       |  WHERE rn = 1)
       |SELECT a.user_id,
       |  CASE WHEN b.old_value IS NULL THEN 'added'
       |       WHEN b.old_value <> a.new_value THEN 'changed'
       |       ELSE 'unchanged' END AS change,
       |  b.old_value, a.new_value
       |FROM after a LEFT JOIN before b USING (user_id)
       |WHERE b.old_value IS NULL OR b.old_value <> a.new_value
       |ORDER BY a.user_id""".stripMargin
}
