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

  /** Batch boundary for [[scd2Merge]] — mid-January, the middle of
    * the events fixture's actual span (2024-01-01 … 2024-01-30), so
    * BOTH the standing dimension and the change batch are non-trivial
    * and the close-open-versions path really fires. (An out-of-range
    * cutoff would make the batch empty and the differential proof
    * vacuous.) */
  private val SCD2_CUTOFF = "2024-01-16"

  /** SCD2 INCREMENTAL apply — type-2 dimension maintenance without
    * rebuilding history: the pre-cutoff purchases form the standing
    * versioned dimension; the post-cutoff batch then (1) CLOSES each
    * affected key's open version at the key's first batch timestamp,
    * (2) APPENDS the batch rows as chained new versions numbered from
    * the key's standing max (new keys start at 1), and (3) leaves
    * every other row byte-untouched. The oracle is the FULL REBUILD
    * over all purchases — hash equality is the differential proof
    * that incremental apply ≡ rebuild, which is the invariant a
    * warehouse relies on to maintain a 100 TB dimension with
    * batch-sized work: every step here touches only base-current ⋈
    * batch-keys rows and the batch itself, one user_id exchange end
    * to end. */
  def scd2Merge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit(SCD2_CUTOFF).cast("timestamp")
    val p = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val base = p.filter($"ts" < cutoff)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"ts", 1).over(w))
    val batch = p.filter($"ts" >= cutoff)
    val firstBatch = batch.groupBy($"user_id").agg(min($"ts").as("fb_ts"))
    val maxV = base.groupBy($"user_id").agg(max($"version").as("v0"))
    // close affected open versions; everything else passes untouched
    val baseAdj = base.join(firstBatch, Seq("user_id"), "left")
      .withColumn("valid_to",
        when($"valid_to".isNull && $"fb_ts".isNotNull, $"fb_ts")
          .otherwise($"valid_to"))
      .select($"user_id", $"version", $"event_id", $"ts", $"value",
        $"valid_to")
    val newV = batch
      .withColumn("bv", row_number().over(w))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .join(maxV, Seq("user_id"), "left")
      .select($"user_id", (coalesce($"v0", lit(0)) + $"bv").as("version"),
        $"event_id", $"ts", $"value", $"valid_to")
    baseAdj.unionAll(newV)
      .select($"user_id", $"version", $"event_id", $"value",
        $"ts".as("valid_from"), $"valid_to",
        when($"valid_to".isNull, 1).otherwise(0).as("is_current"))
      .orderBy($"user_id", $"version")
  }

  /** Oracle: the full-history rebuild — identical output proves the
    * incremental path loses nothing. */
  val scd2MergeSql: String = scd2VersionsSql

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

  /** Marketing attribution: credit every purchase to the FIRST and
    * LAST touch (click/view) the user made strictly before it, then
    * roll conversions and revenue up by (first, last) channel pair —
    * the first-touch/last-touch report in one pass. Purchases with no
    * prior touch attribute to 'direct'.
    *
    * Scale shape: one shuffle on user_id; both touch lookups are
    * ignoreNulls navigation functions over the SAME per-user window
    * sort (strictly-preceding ROWS frame — the purchase itself and
    * later events can't self-attribute), so Spark evaluates them in a
    * single WindowExec on a per-user-bounded partition. The rollup is
    * a #channels²-sized aggregate. Revenue sums are exact decimals. */
  def eventsAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .withColumn("touch",
        when($"event_type".isin("click", "view"), $"event_type"))
      .withColumn("first_touch",
        coalesce(first($"touch", ignoreNulls = true).over(w), lit("direct")))
      .withColumn("last_touch",
        coalesce(last($"touch", ignoreNulls = true).over(w), lit("direct")))
      .filter($"event_type" === "purchase")
      .groupBy($"first_touch", $"last_touch")
      .agg(count(lit(1)).as("n_conversions"),
        rnd6(sum($"value".cast("decimal(38,6)")).cast("double"))
          .as("revenue"))
      .orderBy($"first_touch", $"last_touch")
  }

  val eventsAttributionSql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH touched AS (
       |  SELECT event_type, value,
       |    COALESCE(first_value(CASE WHEN event_type IN ('click', 'view')
       |        THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      'direct') AS first_touch,
       |    COALESCE(last_value(CASE WHEN event_type IN ('click', 'view')
       |        THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      'direct') AS last_touch
       |  FROM events)
       |SELECT first_touch, last_touch, COUNT(*) AS n_conversions,
       |  ${sqlRnd6("CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)")}
       |    AS revenue
       |FROM touched WHERE event_type = 'purchase'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** RFM segmentation: each user scored on Recency (days since last
    * event, vs the corpus-max day), Frequency (event count), and
    * Monetary (exact-decimal value total), then bucketed high/low
    * against the across-users average of each metric and rolled up
    * per segment ('RFM' = above-average on all three … 'rfm' = below
    * on all) — the classic customer-base health matrix.
    *
    * Scale shape: one groupBy(user_id) builds the per-user triple; the
    * three thresholds are ONE 1-row aggregate over it, broadcast back
    * via crossJoin — no window over the user population, no sort, so
    * nothing funnels through a single task at any user count.
    * Threshold comparisons use rnd6'd doubles of exact sums on both
    * sides — a user sitting exactly on a boundary lands in the same
    * bucket in both engines. */
  def eventsRfm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val perUser = Tables.events(spark, sfDir)
      .crossJoin(broadcast(
        Tables.events(spark, sfDir).agg(max($"ts").as("max_ts"))))
      .groupBy($"user_id")
      .agg(datediff(max($"max_ts"), max($"ts")).cast("long").as("recency_d"),
        count(lit(1)).as("frequency"),
        rnd6(sum($"value".cast("decimal(38,6)")).cast("double"))
          .as("monetary"))
    val thresholds = perUser.agg(
      rnd6(sum($"recency_d".cast("decimal(38,6)")).cast("double") /
        count(lit(1))).as("avg_r"),
      rnd6(sum($"frequency".cast("decimal(38,6)")).cast("double") /
        count(lit(1))).as("avg_f"),
      rnd6(sum($"monetary".cast("decimal(38,6)")).cast("double") /
        count(lit(1))).as("avg_m"))
    perUser.crossJoin(broadcast(thresholds))
      .withColumn("segment", concat(
        when($"recency_d" <= $"avg_r", lit("R")).otherwise(lit("r")),
        when($"frequency" >= $"avg_f", lit("F")).otherwise(lit("f")),
        when($"monetary" >= $"avg_m", lit("M")).otherwise(lit("m"))))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_users"),
        rnd6(sum($"recency_d".cast("decimal(38,6)")).cast("double") /
          count(lit(1))).as("seg_avg_recency"),
        rnd6(sum($"monetary".cast("decimal(38,6)")).cast("double") /
          count(lit(1))).as("seg_avg_monetary"))
      .orderBy($"segment")
  }

  val eventsRfmSql: String = {
    import graft.functions.Udfs.sqlRnd6
    def decAvg(c: String) =
      sqlRnd6(s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)")
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    CAST(date_diff('day', CAST(MAX(ts) AS DATE),
       |      CAST((SELECT MAX(ts) FROM events) AS DATE)) AS BIGINT)
       |      AS recency_d,
       |    COUNT(*) AS frequency,
       |    ${sqlRnd6("CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)")}
       |      AS monetary
       |  FROM events GROUP BY user_id),
       |thresholds AS (
       |  SELECT ${decAvg("recency_d")} AS avg_r,
       |    ${decAvg("frequency")} AS avg_f,
       |    ${decAvg("monetary")} AS avg_m
       |  FROM per_user),
       |seg AS (
       |  SELECT
       |    (CASE WHEN recency_d <= avg_r THEN 'R' ELSE 'r' END)
       |    || (CASE WHEN frequency >= avg_f THEN 'F' ELSE 'f' END)
       |    || (CASE WHEN monetary >= avg_m THEN 'M' ELSE 'm' END)
       |      AS segment,
       |    recency_d, monetary
       |  FROM per_user, thresholds)
       |SELECT segment, COUNT(*) AS n_users,
       |  ${decAvg("recency_d")} AS seg_avg_recency,
       |  ${decAvg("monetary")} AS seg_avg_monetary
       |FROM seg GROUP BY segment ORDER BY segment""".stripMargin
  }

  /** Kaplan-Meier survival estimator over time-to-first-purchase — the
    * churn/conversion-latency curve every retention dashboard plots,
    * with users who never purchase RIGHT-CENSORED at their last
    * observed event (the estimator's whole point: dropping censored
    * users biases the curve; KM keeps them at risk until they leave).
    *
    * Shape: per-user (duration, converted) in one user_id shuffle; the
    * corpus then COLLAPSES to one row per distinct duration-day —
    * bounded by calendar, not users — and the at-risk counts and the
    * product-limit Π(1 − d/n) both come from triangular self-joins on
    * that bounded table (the [[TsOps.tsCusum]] prefix discipline; the
    * product is exp of a prefix sum of rnd6'd ln terms). No window, no
    * driver loop, corpus-size-independent tail.
    *
    * Determinism: ln(1 − d/n) is rnd6'd per step before the exact-
    * decimal prefix sum and exp is rnd6'd after ([[MlOps.mlLogreg]]'s
    * libm discipline). The d = n boundary step (everyone at risk
    * converts) is NOT sent through ln — Spark's log(0) is NULL while
    * DuckDB's is -inf — it sets an explicit zero flag instead. */
  def eventsSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.engine.Exact.xsum
    import graft.functions.Udfs.rnd6
    val perUser = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        min(when($"event_type" === "purchase", $"ts")).as("first_buy"))
      .select(
        datediff(coalesce($"first_buy", $"last_ts"), $"first_ts")
          .cast("long").as("t"),
        $"first_buy".isNotNull.cast("long").as("evt"))
    // localCheckpoint (eager): byT and stepped are O(#distinct
    // durations) rows but feed both sides of triangular joins — the
    // corpus-sized per-user aggregation would otherwise run once per
    // join side (the TsOps.tsCusum discipline).
    val byT = perUser.groupBy($"t")
      .agg(sum($"evt").as("d"), sum(lit(1) - $"evt").as("c"))
      .localCheckpoint(true)
    val n1 = byT.agg(sum($"d" + $"c").as("n_users"))
    // pass 1: at-risk count = users minus everyone who left earlier
    val atRisk = byT.as("a")
      .join(broadcast(byT.as("b")), $"b.t" <= $"a.t")
      .groupBy($"a.t".as("t"), $"a.d".as("d"), $"a.c".as("c"))
      .agg(sum(when($"b.t" < $"a.t", $"b.d" + $"b.c")
        .otherwise(lit(0L))).as("gone"))
      .crossJoin(broadcast(n1))
      .select($"t", $"d", $"c", ($"n_users" - $"gone").as("n_risk"))
    // pass 2: per-step ln term (d < n_risk) or the explicit zero flag
    val stepped = atRisk
      .withColumn("lnterm", when($"d" < $"n_risk",
        rnd6(log(lit(1.0) - $"d".cast("double") / $"n_risk".cast("double"))))
        .otherwise(lit(0.0)))
      .withColumn("zero", ($"d" === $"n_risk").cast("int"))
      .localCheckpoint(true)
    // pass 3: prefix-accumulate the product in log space
    stepped.as("a")
      .join(broadcast(stepped.as("b")), $"b.t" <= $"a.t")
      .groupBy($"a.t".as("t"), $"a.n_risk".as("n_risk"),
        $"a.d".as("d"), $"a.c".as("c"))
      .agg(xsum($"b.lnterm").as("cumln"), max($"b.zero").as("anyzero"))
      .select($"t", $"n_risk", $"d", $"c",
        when($"anyzero" === 1, lit(0.0))
          .otherwise(rnd6(exp($"cumln"))).as("survival"))
      .orderBy($"t")
  }

  val eventsSurvivalSql: String = {
    import graft.functions.Udfs.sqlRnd6
    import graft.engine.Exact.sqlXsum
    val lnterm = sqlRnd6("ln(CAST(1.0 AS DOUBLE)" +
      " - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))")
    s"""WITH per_user AS (
       |  SELECT datediff('day', MIN(ts),
       |      COALESCE(MIN(CASE WHEN event_type = 'purchase' THEN ts END),
       |        MAX(ts))) AS t,
       |    CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN ts END)
       |      IS NOT NULL THEN 1 ELSE 0 END AS evt
       |  FROM events GROUP BY user_id),
       |by_t AS (
       |  SELECT t, CAST(SUM(evt) AS BIGINT) AS d,
       |    CAST(SUM(1 - evt) AS BIGINT) AS c
       |  FROM per_user GROUP BY 1),
       |n1 AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n_users FROM by_t),
       |at_risk AS (
       |  SELECT a.t AS t, a.d AS d, a.c AS c,
       |    n_users - CAST(SUM(CASE WHEN b.t < a.t THEN b.d + b.c
       |      ELSE 0 END) AS BIGINT) AS n_risk
       |  FROM by_t a JOIN by_t b ON b.t <= a.t, n1
       |  GROUP BY 1, 2, 3, n_users),
       |stepped AS (
       |  SELECT t, d, c, n_risk,
       |    CASE WHEN d < n_risk THEN $lnterm ELSE CAST(0.0 AS DOUBLE)
       |      END AS lnterm,
       |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zero
       |  FROM at_risk)
       |SELECT a.t AS t, a.n_risk AS n_risk, a.d AS d, a.c AS c,
       |  CASE WHEN MAX(b.zero) = 1 THEN CAST(0.0 AS DOUBLE)
       |    ELSE ${sqlRnd6(s"exp(${sqlXsum("b.lnterm")})")} END AS survival
       |FROM stepped a JOIN stepped b ON b.t <= a.t
       |GROUP BY 1, 2, 3, 4 ORDER BY t""".stripMargin
  }

  /** Growth accounting — the weekly user-lifecycle ledger every
    * product-analytics stack reports: each active (user, week) is
    * `new` (first-ever week), `retained` (also active the week
    * before) or `resurrected` (active, but gap ≥ 2 weeks), and a user
    * active in week w but not w+1 counts as `churned` in w+1. The four
    * series reconcile: actives_w = new + retained + resurrected, and
    * actives_w − retained_{w+1} = churned_{w+1}.
    *
    * Scale shape: the corpus collapses FIRST to distinct (user, week)
    * — one map-side-combined shuffle, output bounded by users ×
    * calendar weeks. Week-over-week presence is a SELF-EQUI-JOIN on
    * (user, week − 7) — no per-user window sort — and churn is the
    * anti-join of the shifted set against the actual set, capped at
    * the stream's own max week (broadcast 1-row bound). Everything
    * after the first distinct shuffles the same (user_id)-keyed rows. */
  def eventsLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val act = Tables.events(spark, sfDir)
      .select($"user_id", date_trunc("WEEK", $"ts").cast("date").as("wk"))
      .distinct()
    val first = act.groupBy($"user_id").agg(min($"wk").as("fw"))
    val shifted = act.select($"user_id", date_add($"wk", 7).as("wk"),
      lit(1).as("prev_hit"))
    val states = act.join(first, "user_id")
      .join(shifted, Seq("user_id", "wk"), "left")
      .withColumn("state",
        when($"wk" === $"fw", lit("new"))
          .when($"prev_hit".isNotNull, lit("retained"))
          .otherwise(lit("resurrected")))
    val core = states.groupBy($"wk").agg(
      sum(when($"state" === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when($"state" === "retained", 1L).otherwise(0L)).as("n_retained"),
      sum(when($"state" === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    val bounds = act.agg(max($"wk").as("maxwk"))
    val churn = shifted.select($"user_id", $"wk")
      .join(act, Seq("user_id", "wk"), "left_anti")
      .crossJoin(broadcast(bounds))
      .filter($"wk" <= $"maxwk")
      .groupBy($"wk").agg(count(lit(1)).as("n_churned"))
    core.join(churn, Seq("wk"), "left")
      .select($"wk", $"n_new", $"n_retained", $"n_resurrected",
        coalesce($"n_churned", lit(0L)).as("n_churned"))
      .orderBy($"wk")
  }

  val eventsLifecycleSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |fw AS (SELECT user_id, MIN(wk) AS fw FROM act GROUP BY 1),
      |st AS (
      |  SELECT a.user_id, a.wk,
      |    CASE WHEN a.wk = f.fw THEN 'new'
      |         WHEN p.user_id IS NOT NULL THEN 'retained'
      |         ELSE 'resurrected' END AS state
      |  FROM act a JOIN fw f USING (user_id)
      |  LEFT JOIN act p ON p.user_id = a.user_id AND p.wk + 7 = a.wk),
      |core AS (
      |  SELECT wk,
      |    CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_resurrected
      |  FROM st GROUP BY 1),
      |mx AS (SELECT MAX(wk) AS maxwk FROM act),
      |ch AS (
      |  SELECT s.wk + 7 AS wk, COUNT(*) AS n_churned
      |  FROM act s LEFT JOIN act n
      |    ON n.user_id = s.user_id AND n.wk = s.wk + 7, mx
      |  WHERE n.user_id IS NULL AND s.wk + 7 <= mx.maxwk
      |  GROUP BY 1)
      |SELECT core.wk, n_new, n_retained, n_resurrected,
      |  CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
      |FROM core LEFT JOIN ch ON ch.wk = core.wk
      |ORDER BY core.wk""".stripMargin

  /** Change rows with a final value below this act as DELETEs in
    * [[upsertMerge]] (~p10 of purchase values — a meaningful but
    * minority delete share). */
  private val MERGE_DELETE_BELOW = 5.0

  /** [[upsertMerge]] snapshot boundary — late in the fixture's
    * single-month event window so a real share of keys sees no
    * change after it (the `kept` branch) at every SF. */
  private val MERGE_CUTOFF = "2024-01-28 00:00:00"

  /** Full MERGE INTO semantics — the three-way CDC apply every
    * lakehouse table maintenance job runs: a base snapshot (latest-wins
    * state before [[MERGE_CUTOFF]]) merged with a compacted change feed
    * (updates after the cutoff), where a change whose final value is
    * below [[MERGE_DELETE_BELOW]] is a DELETE. Outcomes:
    * WHEN MATCHED AND del → row removed; WHEN MATCHED → `updated`;
    * WHEN NOT MATCHED AND NOT del → `inserted`; base rows never touched
    * by the feed stay `kept`. The output is the post-merge table with
    * each row's action — deletions are observable as absent keys.
    *
    * Scale shape: both snapshots are the one-shuffle latest-wins
    * compaction ([[upsertLatest]]) over changelog prefixes, and the
    * merge itself is a full-outer join on the SAME key — one logical
    * repartition end to end, the bulk-merge plan that beats
    * row-at-a-time MERGE at any scale. Compacting the feed BEFORE the
    * join (not applying changes in arrival order) is what makes the
    * apply idempotent under replay: re-delivering the feed yields the
    * same post-merge table byte for byte. */
  def upsertMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def latest(df: DataFrame): DataFrame =
      df.select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
        .filter($"rn" === 1)
        .drop("rn", "event_id")
    val purch = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val cut = lit(MERGE_CUTOFF).cast("timestamp")
    val base = latest(purch.filter($"ts" < cut))
      .select($"user_id", $"ts".as("b_ts"), $"value".as("b_value"))
    val delta = latest(purch.filter($"ts" >= cut))
      .select($"user_id", $"ts".as("c_ts"), $"value".as("c_value"),
        ($"value" < MERGE_DELETE_BELOW).as("del"))
    base.join(delta, Seq("user_id"), "full_outer")
      .filter(!coalesce($"del", lit(false)))
      .select($"user_id",
        when($"c_ts".isNull, lit("kept"))
          .when($"b_ts".isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"),
        coalesce($"c_ts", $"b_ts").as("ts"),
        coalesce($"c_value", $"b_value").as("value"))
      .orderBy($"user_id")
  }

  val upsertMergeSql: String =
    s"""WITH purch AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase'),
       |base AS (
       |  SELECT user_id, ts AS b_ts, value AS b_value FROM (
       |    SELECT user_id, ts, value, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM purch WHERE ts < TIMESTAMP '$MERGE_CUTOFF')
       |  WHERE rn = 1),
       |delta AS (
       |  SELECT user_id, ts AS c_ts, value AS c_value,
       |    value < $MERGE_DELETE_BELOW AS del FROM (
       |    SELECT user_id, ts, value, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM purch WHERE ts >= TIMESTAMP '$MERGE_CUTOFF')
       |  WHERE rn = 1)
       |SELECT COALESCE(b.user_id, d.user_id) AS user_id,
       |  CASE WHEN d.c_ts IS NULL THEN 'kept'
       |       WHEN b.b_ts IS NULL THEN 'inserted'
       |       ELSE 'updated' END AS action,
       |  COALESCE(d.c_ts, b.b_ts) AS ts,
       |  COALESCE(d.c_value, b.b_value) AS value
       |FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
       |WHERE NOT COALESCE(d.del, FALSE)
       |ORDER BY user_id""".stripMargin

  /** Sequence-pattern matching over per-user event streams — the
    * poor-man's MATCH_RECOGNIZE: each user's history collapses to a
    * one-char-per-event string (total order (ts, event_id) — event_id
    * is unique, so the encoding is deterministic under any partition
    * count), and behavioral patterns become REGEXES over that string:
    * direct conversion funnels `vc*p` (view → clicks → purchase with
    * nothing between), the longest click burst `c+`, and
    * error-then-purchase recovery `ep`. Per-user event counts are
    * bounded (sessions, not the corpus), so the collect_list is a
    * per-group bounded buffer, never a corpus-sized window; the regex
    * pass is map-side over one row per user. Patterns stay inside the
    * RE2 ∩ Java common subset (literal classes + greedy star — both
    * engines match leftmost, non-overlapping, identically). */
  def eventsPattern(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        expr("""CASE event_type WHEN 'view' THEN 'v'
                | WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                | WHEN 'signup' THEN 's' ELSE 'e' END""".stripMargin)
          .as("code"))
      .groupBy($"user_id")
      .agg(expr("""array_join(transform(
                  |  array_sort(collect_list(struct(ts, event_id, code))),
                  |  x -> x.code), '')""".stripMargin).as("seq"))
      .select($"user_id",
        length($"seq").cast("long").as("n_events"),
        expr("cast(size(regexp_extract_all(seq, 'vc*p', 0)) as bigint)")
          .as("n_funnels"),
        expr("""cast(coalesce(array_max(transform(
                |  regexp_extract_all(seq, 'c+', 0), x -> length(x))), 0)
                |  as bigint)""".stripMargin).as("max_click_run"),
        expr("cast(size(regexp_extract_all(seq, 'ep', 0)) as bigint)")
          .as("n_error_recovery"))
      .orderBy($"user_id")
  }

  val eventsPatternSql: String =
    """WITH coded AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'view' THEN 'v'
      |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
      |      WHEN 'signup' THEN 's' ELSE 'e' END AS code
      |  FROM events),
      |seqs AS (
      |  SELECT user_id, string_agg(code, '' ORDER BY ts, event_id) AS seq
      |  FROM coded GROUP BY user_id)
      |SELECT user_id,
      |  CAST(length(seq) AS BIGINT) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels,
      |  CAST(COALESCE(list_max(list_transform(
      |    regexp_extract_all(seq, 'c+'), x -> length(x))), 0) AS BIGINT)
      |    AS max_click_run,
      |  CAST(len(regexp_extract_all(seq, 'ep')) AS BIGINT)
      |    AS n_error_recovery
      |FROM seqs ORDER BY user_id""".stripMargin

  /** [[eventsPattern]] promoted to the reusable MATCH_RECOGNIZE
    * operator ([[graft.plans.MatchRecognize]]): the view→clicks→
    * purchase funnel as DEFINE variables + PATTERN `V C* P` with
    * AFTER MATCH SKIP PAST LAST ROW, emitting ONE ROW PER MATCH with
    * positional and per-variable measures — match number, 1-based
    * first/last row positions in the user's (ts, event_id) order,
    * matched-row count, and CLASSIFIER() counts per variable. The
    * oracle reconstructs every match position in SQL from the
    * regexp-split/extract pair (separator-length prefix sums), so
    * the operator's leftmost-greedy, non-overlapping walk is checked
    * match-by-match, position-by-position. Overlap mode (SKIP TO
    * NEXT ROW) is spec-pinned on crafted sequences. */
  def matchRecognize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.plans.MatchRecognize(
      Tables.events(spark, sfDir),
      partitionBy = "user_id",
      orderBy = Seq("ts", "event_id"),
      define = Seq(
        "V" -> ($"event_type" === "view"),
        "C" -> ($"event_type" === "click"),
        "P" -> ($"event_type" === "purchase")),
      pattern = "V C* P",
      measuresFor = Seq("event_id"))
      .orderBy($"user_id", $"match_no")
  }

  val matchRecognizeSql: String =
    """WITH coded AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'view' THEN 'a' WHEN 'click' THEN 'b'
      |      WHEN 'purchase' THEN 'c' ELSE '0' END AS code
      |  FROM events),
      |seqs AS (
      |  SELECT user_id, string_agg(code, '' ORDER BY ts, event_id) AS seq,
      |    list(event_id ORDER BY ts, event_id) AS ids
      |  FROM coded GROUP BY user_id),
      |split AS (
      |  SELECT user_id, ids,
      |    regexp_extract_all(seq, 'ab*c') AS ms,
      |    regexp_split_to_array(seq, 'ab*c') AS seps
      |  FROM seqs),
      |idx AS (
      |  SELECT user_id, ids, ms, seps, CAST(i.range AS INTEGER) AS match_no
      |  FROM split, range(1, 1001) i WHERE i.range <= len(ms)),
      |pos AS (
      |  SELECT user_id, ids, match_no, ms[match_no] AS mt,
      |    CAST(COALESCE(list_sum(list_transform(seps[1:match_no],
      |        x -> length(x))), 0)
      |      + COALESCE(list_sum(list_transform(ms[1:match_no - 1],
      |        x -> length(x))), 0) + 1 AS INTEGER) AS first_row
      |  FROM idx)
      |SELECT user_id, match_no, first_row,
      |  CAST(first_row + length(mt) - 1 AS INTEGER) AS last_row,
      |  CAST(length(mt) AS INTEGER) AS n_rows,
      |  CAST(length(mt) - length(replace(mt, 'a', '')) AS INTEGER) AS n_v,
      |  CAST(length(mt) - length(replace(mt, 'b', '')) AS INTEGER) AS n_c,
      |  CAST(length(mt) - length(replace(mt, 'c', '')) AS INTEGER) AS n_p,
      |  ids[first_row] AS first_event_id,
      |  ids[first_row + length(mt) - 1] AS last_event_id
      |FROM pos ORDER BY user_id, match_no""".stripMargin

  /** Interval length each event projects: 30 minutes, in µs. */
  private val IV_DUR_US = 30L * 60 * 1000000

  /** Overlapping-interval coalescing (the classic "merge intervals"
    * operator): every event projects a [ts, ts+30 min) activity
    * interval; per user, overlapping/touching intervals merge into
    * maximal spans. The union is computed with the running-max-of-
    * previous-ends trick — an interval starts a NEW span iff its
    * start exceeds max(end) over ALL previous intervals (not just the
    * immediate predecessor: a long interval can swallow several later
    * ones, the bug in naive lag-based merging) — two window passes
    * sharing ONE user_id exchange, all arithmetic integer µs. Output
    * is the per-user coverage summary (raw intervals, merged spans,
    * covered seconds, largest merged span) — the utilization shape
    * billing/capacity pipelines compute over lease/session/booking
    * intervals. */
  def eventsIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val strictPast = w.rowsBetween(Window.unboundedPreceding, -1)
    val iv = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("prev_max_end",
        max($"us" + IV_DUR_US).over(strictPast))
      .withColumn("new_span",
        when($"prev_max_end".isNull || $"us" > $"prev_max_end", 1L)
          .otherwise(0L))
      .withColumn("span", sum($"new_span").over(w))
    val spans = iv.groupBy($"user_id", $"span")
      .agg(count(lit(1)).as("n_events"), min($"us").as("s"),
        max($"us" + IV_DUR_US).as("e"))
    spans.groupBy($"user_id")
      .agg(sum($"n_events").as("n_raw"),
        count(lit(1)).as("n_merged"),
        (sum($"e" - $"s") / lit(1000000L)).cast("long")
          .as("covered_secs"),
        max($"n_events").as("max_span_events"))
      .orderBy($"user_id")
  }

  val eventsIntervalsSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    max(epoch_us(ts) + $IV_DUR_US) OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_max_end
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_max_end IS NULL OR us > prev_max_end
       |    THEN 1 ELSE 0 END AS new_span
       |  FROM iv),
       |numbered AS (
       |  SELECT *, SUM(new_span) OVER (
       |    PARTITION BY user_id ORDER BY us ASC, event_id ASC
       |    ROWS UNBOUNDED PRECEDING) AS span
       |  FROM flagged),
       |spans AS (
       |  SELECT user_id, span, COUNT(*) AS n_events,
       |    min(us) AS s, max(us + $IV_DUR_US) AS e
       |  FROM numbered GROUP BY 1, 2)
       |SELECT user_id, CAST(SUM(n_events) AS BIGINT) AS n_raw,
       |  COUNT(*) AS n_merged,
       |  CAST(SUM(e - s) // 1000000 AS BIGINT) AS covered_secs,
       |  CAST(MAX(n_events) AS BIGINT) AS max_span_events
       |FROM spans GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Early-journey horizon for [[eventsSeqmine]]: patterns are mined
    * over each user's first 5 events — the onboarding window, where
    * paths actually differ (over a whole 30-day history every pattern
    * trivially appears for every active user). */
  private val SEQ_HORIZON = 5

  /** Minimum user support for a reported pattern. */
  private val SEQ_MIN_SUPPORT = 0.05

  /** GSP-style sequential pattern mining (Srikant & Agrawal '96,
    * length ≤ 3) over the early user journey: for every ordered
    * type pair a→b and triple a→b→c, the share of users whose first-
    * [[SEQ_HORIZON]]-event prefix CONTAINS it as a subsequence —
    * the population-mining complement of [[eventsPattern]] (which
    * MATCHES a given regex per user) and the sequence-rule sibling of
    * the FPGrowth basket rules. Containment is the greedy criterion:
    * a→b ⟺ first(a) < last(b); a→b→c ⟺ (first b after first a) <
    * last(c) — evaluated on per-user ROW RANKS (row_number over
    * (ts, event_id)), so every comparison is integer.
    *
    * Scale shape: events collapse to per-(user, type) first/last
    * ranks in one user-partitioned window pass (the only pass over
    * the corpus — the 100 TB cost is one shuffle of (user, type,
    * rank)); all joins afterwards are per-user with fan-out bounded
    * by |types| ≤ 5 (25 pair rows, 125 triple rows per user, the
    * candidate lattice of the GSP paper pruned to the type alphabet),
    * and supports partial-aggregate to ≤ 150 output rows. */
  def eventsSeqmine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Udfs.rnd6
    val seq = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type",
        row_number().over(Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)).as("rn"))
      .filter($"rn" <= SEQ_HORIZON)
      .localCheckpoint(true) // feeds firsts AND the b-after-a join
    val firsts = seq.groupBy($"user_id", $"event_type")
      .agg(min($"rn").as("mn"), max($"rn").as("mx"))
      .localCheckpoint(true) // three consumers below
    val nUsers = seq.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_total"))
    val pairHits = firsts.as("a").join(firsts.as("b"), "user_id")
      .filter($"a.mn" < $"b.mx")
      .select(concat($"a.event_type", lit(">"), $"b.event_type")
        .as("pattern"), $"user_id")
      .groupBy($"pattern").agg(count(lit(1)).as("n_users"))
      .withColumn("plen", lit(2))
    val t2 = seq.as("s").join(firsts.as("a"), "user_id")
      .filter($"s.rn" > $"a.mn")
      .groupBy($"user_id", $"a.event_type".as("ta"),
        $"s.event_type".as("tb"))
      .agg(min($"s.rn").as("t2"))
    val tripleHits = t2.join(firsts.as("c"), "user_id")
      .filter($"t2" < $"c.mx")
      .select(concat($"ta", lit(">"), $"tb", lit(">"), $"c.event_type")
        .as("pattern"), $"user_id")
      .groupBy($"pattern").agg(count(lit(1)).as("n_users"))
      .withColumn("plen", lit(3))
    pairHits.unionByName(tripleHits)
      .crossJoin(broadcast(nUsers))
      .select($"pattern", $"plen", $"n_users",
        rnd6($"n_users".cast("double") / $"n_total".cast("double"))
          .as("support"))
      .filter($"support" >= SEQ_MIN_SUPPORT)
      .orderBy($"plen", $"pattern")
  }

  val eventsSeqmineSql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH seq AS (
       |  SELECT user_id, event_type, rn FROM (
       |    SELECT user_id, event_type, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
       |    FROM events) WHERE rn <= $SEQ_HORIZON),
       |firsts AS (
       |  SELECT user_id, event_type, min(rn) AS mn, max(rn) AS mx
       |  FROM seq GROUP BY 1, 2),
       |tot AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM seq),
       |pair_hits AS (
       |  SELECT a.event_type || '>' || b.event_type AS pattern,
       |    COUNT(*) AS n_users, 2 AS plen
       |  FROM firsts a JOIN firsts b USING (user_id)
       |  WHERE a.mn < b.mx GROUP BY 1),
       |t2 AS (
       |  SELECT s.user_id, a.event_type AS ta, s.event_type AS tb,
       |    min(s.rn) AS t2
       |  FROM seq s JOIN firsts a USING (user_id)
       |  WHERE s.rn > a.mn GROUP BY 1, 2, 3),
       |triple_hits AS (
       |  SELECT t2.ta || '>' || t2.tb || '>' || c.event_type AS pattern,
       |    COUNT(*) AS n_users, 3 AS plen
       |  FROM t2 JOIN firsts c USING (user_id)
       |  WHERE t2.t2 < c.mx GROUP BY 1),
       |unioned AS (
       |  SELECT * FROM pair_hits UNION ALL SELECT * FROM triple_hits)
       |SELECT pattern, CAST(plen AS INTEGER) AS plen, n_users,
       |  ${sqlRnd6("CAST(n_users AS DOUBLE) / CAST(n_total AS DOUBLE)")}
       |    AS support
       |FROM unioned, tot
       |WHERE ${sqlRnd6("CAST(n_users AS DOUBLE) / CAST(n_total AS DOUBLE)")}
       |  >= $SEQ_MIN_SUPPORT
       |ORDER BY plen, pattern""".stripMargin
  }

  /** DAU / WAU / MAU active-user series with stickiness — the
    * product-analytics staple beside retention and growth accounting:
    * per calendar day, distinct actives that day, in the trailing 7
    * days, and in the trailing 30, plus DAU/MAU stickiness. The
    * corpus collapses FIRST to distinct (user, day) — the only pass
    * that touches events — and every rolling count is a
    * day-spine ⋈ user-days range join bounded by window × actives
    * (NOT a distinct-over-window, which Spark would run as one state
    * per (day, user) through a single sort): trailing windows over a
    * CALENDAR spine grow with days, never with event volume.
    * Stickiness is an exact-integer ratio rnd6'd once. */
  def eventsActives(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val ud = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val spine = ud.select($"d").distinct()
    def rolling(days: Int, name: String): DataFrame =
      spine.select($"d".as("sd"))
        .join(ud, $"d" <= $"sd" && $"d" >= date_sub($"sd", days - 1))
        .groupBy($"sd").agg(countDistinct($"user_id").as(name))
        .withColumnRenamed("sd", s"d_$name")
    val dau = ud.groupBy($"d").agg(countDistinct($"user_id").as("dau"))
    dau
      .join(rolling(7, "wau"), $"d" === $"d_wau")
      .join(rolling(30, "mau"), $"d" === $"d_mau")
      .select($"d", $"dau", $"wau", $"mau",
        rnd6($"dau".cast("double") / $"mau".cast("double"))
          .as("stickiness"))
      .orderBy($"d")
  }

  val eventsActivesSql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       |spine AS (SELECT DISTINCT d FROM ud),
       |dau AS (
       |  SELECT d, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY d),
       |wau AS (
       |  SELECT s.d AS sd, COUNT(DISTINCT u.user_id) AS wau
       |  FROM spine s JOIN ud u
       |    ON u.d <= s.d AND u.d >= s.d - 6
       |  GROUP BY s.d),
       |mau AS (
       |  SELECT s.d AS sd, COUNT(DISTINCT u.user_id) AS mau
       |  FROM spine s JOIN ud u
       |    ON u.d <= s.d AND u.d >= s.d - 29
       |  GROUP BY s.d)
       |SELECT dau.d, dau.dau, wau.wau, mau.mau,
       |  ${sqlRnd6(
        "CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE)")}
       |    AS stickiness
       |FROM dau
       |JOIN wau ON dau.d = wau.sd
       |JOIN mau ON dau.d = mau.sd
       |ORDER BY dau.d""".stripMargin
  }

  /** Conversion-latency distribution — "how long from last click to
    * purchase": each purchase pairs with the LATEST preceding click
    * within 1 h by the same user (bounded interval join, ≤1 output
    * row per purchase), the µs delta floors to whole seconds — a
    * DOMAIN BOUNDED BY THE JOIN WINDOW (0..3600), which is what makes
    * the percentiles scale: latencies collapse to a ≤3601-row
    * histogram, and p50/p90/p99 are SELECTION by cumulative crossing
    * over that broadcast-sized table with integer cross-multiplied
    * ranks (cum·2 ≥ n, cum·10 ≥ 9n, cum·100 ≥ 99n) — no corpus
    * window, no interpolation ulp, nothing single-task at any event
    * volume. The mean is the one float, an exact-BIGINT ratio rnd6'd
    * once. */
  def eventsFunnelLatency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id",
        expr("unix_micros(ts)").as("us"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"us".as("p_us"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"us".as("c_us"))
    val lat = p.join(c,
        $"user_id" === $"cu" && $"c_us" <= $"p_us" &&
          $"c_us" >= $"p_us" - 3600000000L)
      .groupBy($"pid", $"p_us").agg(max($"c_us").as("mc_us"))
      .select(expr("(p_us - mc_us) div 1000000").as("lat_s"))
    val hist = lat.groupBy($"lat_s").agg(count(lit(1)).as("nk"))
    val tot = lat.agg(count(lit(1)).as("n_pairs"),
      sum($"lat_s").as("sum_s"), max($"lat_s").as("max_s"))
    val cum = hist.as("a").join(broadcast(hist.as("b")),
        $"b.lat_s" <= $"a.lat_s")
      .groupBy($"a.lat_s").agg(sum($"b.nk").as("cum"))
    def sel(num: Int, den: Int, name: String) =
      cum.crossJoin(broadcast(tot))
        .filter($"cum" * den >= $"n_pairs" * num)
        .agg(min($"lat_s").as(name))
    tot.crossJoin(broadcast(sel(1, 2, "p50_s")))
      .crossJoin(broadcast(sel(9, 10, "p90_s")))
      .crossJoin(broadcast(sel(99, 100, "p99_s")))
      .select($"n_pairs",
        rnd6($"sum_s".cast("double") / $"n_pairs".cast("double"))
          .as("mean_s"),
        $"p50_s", $"p90_s", $"p99_s", $"max_s")
  }

  val eventsFunnelLatencySql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH p AS (
       |  SELECT user_id, event_id AS pid, epoch_us(ts) AS p_us
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT user_id AS cu, epoch_us(ts) AS c_us
       |  FROM events WHERE event_type = 'click'),
       |lat AS (
       |  SELECT (p_us - max(c_us)) // 1000000 AS lat_s
       |  FROM p JOIN c ON user_id = cu
       |    AND c_us <= p_us AND c_us >= p_us - 3600000000
       |  GROUP BY pid, p_us),
       |hist AS (SELECT lat_s, count(*) AS nk FROM lat GROUP BY 1),
       |tot AS (SELECT count(*) AS n_pairs,
       |  CAST(sum(lat_s) AS BIGINT) AS sum_s, max(lat_s) AS max_s
       |  FROM lat),
       |cum AS (SELECT a.lat_s, CAST(sum(b.nk) AS BIGINT) AS cum
       |  FROM hist a JOIN hist b ON b.lat_s <= a.lat_s GROUP BY a.lat_s),
       |p50 AS (SELECT min(lat_s) AS p50_s FROM cum, tot
       |  WHERE cum * 2 >= n_pairs * 1),
       |p90 AS (SELECT min(lat_s) AS p90_s FROM cum, tot
       |  WHERE cum * 10 >= n_pairs * 9),
       |p99 AS (SELECT min(lat_s) AS p99_s FROM cum, tot
       |  WHERE cum * 100 >= n_pairs * 99)
       |SELECT n_pairs,
       |  ${sqlRnd6("CAST(sum_s AS DOUBLE) / CAST(n_pairs AS DOUBLE)")}
       |    AS mean_s,
       |  p50_s, p90_s, p99_s, max_s
       |FROM tot, p50, p90, p99""".stripMargin
  }
}
