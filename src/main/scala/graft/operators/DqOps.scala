package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** Data-quality operators: column profiling and declarative constraint
  * audit — the pre-flight checks a 100 TB ingest runs before letting a
  * batch into the lake (schema drift, orphaned keys, duplicate PKs,
  * out-of-range measures).
  *
  * Scale notes: profiling melts the table to (column, value) pairs and
  * reduces in ONE partially-aggregated shuffle — linear in rows ×
  * columns with no driver loop and no per-column scan (the naive
  * profiler scans once per column; this scans once, period). The
  * constraint audit is a union of independent 1-row aggregates; the
  * only data-sized moves are the two FK left-joins and the
  * ship-after-order join, each a standard shuffle join on the key
  * Spark would pick anyway (AQE broadcasts the dim side when small).
  */
object DqOps {

  /** Tail threshold x_min for the Hill fit ([[dqPowerlaw]]). */
  private val POWERLAW_XMIN = 5

  /** (name, Spark string-image expr, DuckDB string-image expr).
    * Values are profiled through a CANONICAL STRING IMAGE so one melted
    * column can carry every type: integers/strings/timestamps cast
    * directly (both engines print `2024-03-01 00:00:00` style), doubles
    * go through DECIMAL(18,6) first because Java and DuckDB disagree on
    * raw double formatting (`1.2E7` vs `12000000.0`) while both print a
    * scale-6 decimal as `12000000.000000`. min/max are therefore
    * lexicographic on those images — documented profile semantics, not
    * numeric bounds (the moments family covers numeric ranges).
    */
  private val PROF_COLS: Seq[(String, String, String)] = Seq(
    ("o_orderkey", "CAST(o_orderkey AS STRING)",
      "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS STRING)",
      "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS STRING)",
      "CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR)"),
    ("o_orderdate", "CAST(o_orderdate AS STRING)",
      "CAST(o_orderdate AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"))

  /** Per-column profile of `orders`: row/null/distinct counts and
    * lexicographic min/max of the canonical string image (see
    * [[PROF_COLS]]) — 6 rows out whatever the input size. Implemented
    * as melt (array-of-structs explode) → single groupBy, so the table
    * is read exactly once. */
  def dqProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val melted = Tables.orders(spark, sfDir)
      .select(explode(array(PROF_COLS.map { case (n, e, _) =>
        struct(lit(n).as("col"), expr(e).as("v"))
      }: _*)).as("c"))
      .select($"c.col".as("col"), $"c.v".as("v"))
    melted.groupBy($"col")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"v")).as("n_nulls"),
        countDistinct($"v").as("n_distinct"),
        min($"v").as("min_s"), max($"v").as("max_s"))
      .orderBy($"col")
  }

  val dqProfileSql: String =
    PROF_COLS.map { case (n, _, duck) =>
      s"""SELECT '$n' AS col, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT(v) AS n_nulls,
         |  COUNT(DISTINCT v) AS n_distinct,
         |  MIN(v) AS min_s, MAX(v) AS max_s
         |FROM (SELECT $duck AS v FROM orders)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col")

  /** Declarative constraint audit over the star schema: one output row
    * per rule with (checked, violations) counts — FK orphans, PK
    * duplicates, measure ranges, temporal consistency. Rules are
    * independent aggregates unioned at the end; a real deployment
    * gates the batch on `violations = 0` per rule. The fixture is
    * deliberately NOT all-clean: (l_orderkey, l_linenumber) is known
    * non-unique (SampleOps.scala documents it), so `lineitem_pk_dup`
    * exercises the non-zero path. */
  def dqConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)

    def fkRule(name: String, fact: DataFrame, factKey: String,
               dim: DataFrame, dimKey: String): DataFrame =
      fact.join(dim.select(col(dimKey)).distinct(),
          fact(factKey) === col(dimKey), "left")
        .agg(count(lit(1)).as("checked"),
          count(when(col(dimKey).isNull, 1)).as("violations"))
        .select(lit(name).as("rule"), $"checked", $"violations")

    val ordersFk =
      fkRule("orders_custkey_fk", orders, "o_custkey", customer, "c_custkey")
    val lineitemFk =
      fkRule("lineitem_orderkey_fk", lineitem, "l_orderkey", orders,
        "o_orderkey")
    val customerPk = customer
      .agg(count(lit(1)).as("checked"),
        (count(lit(1)) - countDistinct($"c_custkey")).as("violations"))
      .select(lit("customer_pk_dup").as("rule"), $"checked", $"violations")
    val lineitemPk = lineitem
      .groupBy($"l_orderkey", $"l_linenumber").agg(count(lit(1)).as("c"))
      .agg(sum($"c").as("checked"), sum($"c" - 1).as("violations"))
      .select(lit("lineitem_pk_dup").as("rule"), $"checked", $"violations")
    val qtyRange = lineitem
      .agg(count(lit(1)).as("checked"),
        count(when($"l_quantity" <= 0, 1)).as("violations"))
      .select(lit("lineitem_qty_positive").as("rule"), $"checked",
        $"violations")
    val discRange = lineitem
      .agg(count(lit(1)).as("checked"),
        count(when($"l_discount" < 0 || $"l_discount" > 1, 1))
          .as("violations"))
      .select(lit("lineitem_discount_range").as("rule"), $"checked",
        $"violations")
    val dateBounds = orders
      .agg(count(lit(1)).as("checked"),
        count(when($"o_orderdate".isNull ||
          $"o_orderdate" < lit("1990-01-01").cast("timestamp") ||
          $"o_orderdate" >= lit("2031-01-01").cast("timestamp"), 1))
          .as("violations"))
      .select(lit("orders_date_bounds").as("rule"), $"checked",
        $"violations")
    val shipAfterOrder = lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .agg(count(lit(1)).as("checked"),
        count(when($"l_shipdate" < $"o_orderdate", 1)).as("violations"))
      .select(lit("lineitem_ship_after_order").as("rule"), $"checked",
        $"violations")

    Seq(ordersFk, lineitemFk, customerPk, lineitemPk, qtyRange, discRange,
      dateBounds, shipAfterOrder).reduce(_.unionAll(_))
      .orderBy($"rule")
  }

  val dqConstraintsSql: String =
    """SELECT 'orders_custkey_fk' AS rule, COUNT(*) AS checked,
      |  COUNT(CASE WHEN d.k IS NULL THEN 1 END) AS violations
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) d
      |  ON o.o_custkey = d.k
      |UNION ALL
      |SELECT 'lineitem_orderkey_fk', COUNT(*),
      |  COUNT(CASE WHEN d.k IS NULL THEN 1 END)
      |FROM lineitem l
      |LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) d
      |  ON l.l_orderkey = d.k
      |UNION ALL
      |SELECT 'customer_pk_dup', COUNT(*),
      |  COUNT(*) - COUNT(DISTINCT c_custkey)
      |FROM customer
      |UNION ALL
      |SELECT 'lineitem_pk_dup', CAST(SUM(c) AS BIGINT),
      |  CAST(SUM(c - 1) AS BIGINT)
      |FROM (SELECT COUNT(*) AS c FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber)
      |UNION ALL
      |SELECT 'lineitem_qty_positive', COUNT(*),
      |  COUNT(CASE WHEN l_quantity <= 0 THEN 1 END)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_discount_range', COUNT(*),
      |  COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders_date_bounds', COUNT(*),
      |  COUNT(CASE WHEN o_orderdate IS NULL
      |    OR o_orderdate < TIMESTAMP '1990-01-01'
      |    OR o_orderdate >= TIMESTAMP '2031-01-01' THEN 1 END)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_ship_after_order', COUNT(*),
      |  COUNT(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 END)
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |ORDER BY rule""".stripMargin

  /** Benford's-law leading-digit audit of order totals — the classic
    * fabricated-or-truncated-data smell test (natural multi-scale
    * amounts follow P(d) = log10(1 + 1/d); synthetic or clipped data
    * doesn't, and a large χ² flags the batch for review). One map-side
    * digit extraction + a ≤9-group shuffle at any corpus size.
    *
    * Determinism: NO log10-of-value digit extraction (log10 is not
    * correctly-rounded in every libm, and a value like exactly 1000.0
    * can land on either side of the boundary per engine) — the digit
    * is the first character of the integer CENTS string, where cents =
    * floor(v·100 + 0.5) is the same IEEE double op in both engines.
    * Expected probabilities use rnd6'd ln ratios; χ² terms are rnd6'd
    * before the exact-decimal sum. A 1..9 digit spine left-join keeps
    * absent digits as explicit zero rows. */
  def dqBenford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.engine.Exact.xsum
    import graft.functions.Udfs.rnd6
    val obs = Tables.orders(spark, sfDir)
      .select(substring(
        expr("cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) as string)"),
        1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val n1 = obs.agg(sum($"n_obs").as("n"))
    val spine = spark.range(1, 10).select($"id".cast("int").as("digit"))
    val full = spine.join(obs, Seq("digit"), "left")
      .select($"digit", coalesce($"n_obs", lit(0L)).as("n_obs"))
      .crossJoin(broadcast(n1))
      .withColumn("p_exp",
        rnd6(log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0))))
      .withColumn("p_obs",
        rnd6($"n_obs".cast("double") / $"n".cast("double")))
      .withColumn("chi2_term", rnd6(
        ($"n_obs" - $"n" * $"p_exp") * ($"n_obs" - $"n" * $"p_exp") /
          ($"n" * $"p_exp")))
    val chi2 = full.agg(rnd6(xsum($"chi2_term")).as("chi2"))
    full.crossJoin(broadcast(chi2))
      .select($"digit", $"n_obs", $"p_obs", $"p_exp", $"chi2")
      .orderBy($"digit")
  }

  val dqBenfordSql: String = {
    import graft.functions.Udfs.sqlRnd6
    // CAST to DOUBLE before dividing: a bare 1.0/digit is DECIMAL ÷
    // INTEGER in DuckDB (decimal result), not the IEEE division Spark
    // runs — the [[graft.functions.Udfs]] double-literal discipline.
    val pExp = sqlRnd6("ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)" +
      " / digit) / ln(CAST(10.0 AS DOUBLE))")
    s"""WITH obs AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    COUNT(*) AS n_obs
       |  FROM orders GROUP BY 1),
       |n1 AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
       |full_t AS (
       |  SELECT CAST(s.digit AS INTEGER) AS digit,
       |    COALESCE(o.n_obs, 0) AS n_obs, n
       |  FROM range(1, 10) AS s(digit)
       |  LEFT JOIN obs o ON o.digit = CAST(s.digit AS INTEGER), n1),
       |terms AS (
       |  SELECT digit, n_obs, n, $pExp AS p_exp,
       |    ${sqlRnd6("CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)")}
       |      AS p_obs,
       |    ${sqlRnd6("(n_obs - n * p_exp) * (n_obs - n * p_exp)" +
      " / (n * p_exp)")} AS chi2_term
       |  FROM full_t),
       |chi AS (SELECT ${sqlRnd6(Exact.sqlXsum("chi2_term"))} AS chi2
       |  FROM terms)
       |SELECT digit, n_obs, p_obs, p_exp, chi2
       |FROM terms, chi ORDER BY digit""".stripMargin
  }

  /** Ingestion-completeness gate: per event type, how many calendar
    * HOURS inside the stream's own [min, max] envelope have zero rows
    * — the "did a feed silently stop landing" check that runs before
    * accepting any incremental snapshot (a gap is a pipeline outage or
    * an upstream retention bug, not a data property).
    *
    * Scale shape: the corpus collapses FIRST to distinct
    * (type, hour) — ONE map-side-combined shuffle, output bounded by
    * types × calendar hours regardless of row count; the expected
    * spine is a broadcast 1-row min/max aggregate exploded into the
    * hour sequence × the distinct type list, so the gap join runs on
    * two calendar-bounded sides. At 100 TB only the first distinct
    * touches data. */
  def dqGaps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"event_type", date_trunc("HOUR", $"ts").as("h"))
    val hours = e.agg(min($"h").as("h0"), max($"h").as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val types = e.select($"event_type").distinct()
    val present = e.distinct().withColumn("hit", lit(1))
    types.crossJoin(hours)
      .join(present, Seq("event_type", "h"), "left")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(when($"hit".isNotNull, 1L).otherwise(0L)).as("n_present"),
        sum(when($"hit".isNull, 1L).otherwise(0L)).as("n_missing"))
      .orderBy($"event_type")
  }

  val dqGapsSql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h FROM events),
      |b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e),
      |hrs AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM b),
      |ty AS (SELECT DISTINCT event_type FROM e),
      |pres AS (SELECT DISTINCT event_type, h FROM e)
      |SELECT ty.event_type, COUNT(*) AS n_hours,
      |  CAST(SUM(CASE WHEN p.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_present,
      |  CAST(SUM(CASE WHEN p.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing
      |FROM ty CROSS JOIN hrs
      |LEFT JOIN pres p ON p.event_type = ty.event_type AND p.h = hrs.h
      |GROUP BY 1 ORDER BY ty.event_type""".stripMargin

  /** Candidate-key discovery — "what can this table be keyed on":
    * for each candidate column set, distinct-count vs row-count, the
    * uniqueness ratio, and the worst duplication depth. Each
    * candidate costs one partially-aggregated count-distinct pass;
    * the verdicts are exact, not sampled — the profiling step that
    * decides upsert keys and bucketing columns before a 100 TB table
    * is laid out. The fixture's own quirk makes this non-trivial:
    * (l_orderkey, l_linenumber) is NOT unique (SampleOps documents
    * it), and this report states that as data instead of letting the
    * assumption corrupt a MERGE downstream. */
  def dqKeyDiscovery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6

    def cand(name: String, df: DataFrame, cols: Seq[String]): DataFrame = {
      val grouped = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      grouped.agg(count(lit(1)).as("n_distinct"),
          sum($"cnt").as("n_rows"), max($"cnt").as("max_dup"))
        .select(lit(name).as("candidate"), $"n_rows", $"n_distinct",
          rnd6($"n_distinct".cast("double") / $"n_rows".cast("double"))
            .as("uniqueness"),
          ($"max_dup" === 1).as("is_key"))
    }

    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    cand("orders:o_orderkey", o, Seq("o_orderkey"))
      .unionAll(cand("lineitem:l_orderkey", li, Seq("l_orderkey")))
      .unionAll(cand("lineitem:l_orderkey+l_linenumber", li,
        Seq("l_orderkey", "l_linenumber")))
      .unionAll(cand("lineitem:l_orderkey+l_linenumber+l_partkey", li,
        Seq("l_orderkey", "l_linenumber", "l_partkey")))
      .orderBy($"candidate")
  }

  val dqKeyDiscoverySql: String = {
    import graft.functions.Udfs.sqlRnd6
    def block(name: String, tbl: String, cols: String) =
      s"""SELECT '$name' AS candidate,
         |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  ${sqlRnd6(
          "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)")}
         |    AS uniqueness,
         |  MAX(cnt) = 1 AS is_key
         |FROM (SELECT $cols, COUNT(*) AS cnt FROM $tbl GROUP BY $cols)"""
    s"""${block("orders:o_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${block("lineitem:l_orderkey", "lineitem", "l_orderkey")}
       |UNION ALL
       |${block("lineitem:l_orderkey+l_linenumber", "lineitem",
        "l_orderkey, l_linenumber")}
       |UNION ALL
       |${block("lineitem:l_orderkey+l_linenumber+l_partkey", "lineitem",
        "l_orderkey, l_linenumber, l_partkey")}
       |ORDER BY candidate""".stripMargin
  }

  /** Join-key skew report — "which key needs salting/AQE before the
    * big join": for each candidate join key, the per-key count
    * distribution summarized as n_keys / n_rows / max / median / p99
    * plus the hot-key traffic share and max÷median skew ratio. The
    * quantiles are SELECTION (never interpolation — engines can differ
    * in the last ulp on interpolation, never on selection) found by
    * cumulative crossing over the COUNT HISTOGRAM: per key column, the
    * corpus collapses to per-key counts in one partially-aggregated
    * shuffle, the counts collapse again to a (cnt, n_keys) histogram
    * whose size is bounded by the distinct multiplicities (≪ keys, ≪
    * rows), and the crossing ranks are integer cross-multiplied
    * comparisons (cum·2 ≥ n, cum·100 ≥ 99·n) over the broadcast-sized
    * histogram — no window over the key population, nothing
    * single-task at any key cardinality. */
  def dqSkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6

    def keySkew(df: DataFrame, keyCol: String): DataFrame = {
      val cnts = df.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("cnt"))
      val hist = cnts.groupBy($"cnt").agg(count(lit(1)).as("nk"))
      val tot = cnts.agg(count(lit(1)).as("n_keys"),
        sum($"cnt").as("n_rows"), max($"cnt").as("max_cnt"))
      val cum = hist.as("a").join(broadcast(hist.as("b")),
          $"b.cnt" <= $"a.cnt")
        .groupBy($"a.cnt").agg(sum($"b.nk").as("cum"))
      val med = cum.crossJoin(broadcast(tot))
        .filter($"cum" * 2 >= $"n_keys")
        .agg(min($"cnt").as("med_cnt"))
      val p99 = cum.crossJoin(broadcast(tot))
        .filter($"cum" * 100 >= $"n_keys" * 99)
        .agg(min($"cnt").as("p99_cnt"))
      tot.crossJoin(broadcast(med)).crossJoin(broadcast(p99))
        .select(lit(keyCol).as("key_col"), $"n_keys", $"n_rows",
          $"max_cnt", $"med_cnt", $"p99_cnt",
          rnd6($"max_cnt" / $"n_rows").as("top1_share"),
          rnd6($"max_cnt" / $"med_cnt").as("skew_ratio"))
    }

    val li = Tables.lineitem(spark, sfDir)
    keySkew(li, "l_partkey")
      .unionAll(keySkew(li, "l_suppkey"))
      .unionAll(keySkew(Tables.orders(spark, sfDir), "o_custkey"))
      .orderBy($"key_col")
  }

  val dqSkewReportSql: String = {
    import graft.functions.Udfs.sqlRnd6
    def block(tbl: String, colName: String): String =
      s"""SELECT '$colName' AS key_col, n_keys, n_rows, max_cnt,
         |  med_cnt, p99_cnt,
         |  ${sqlRnd6("max_cnt / n_rows")} AS top1_share,
         |  ${sqlRnd6("max_cnt / med_cnt")} AS skew_ratio
         |FROM (
         |  WITH cnts AS (
         |    SELECT $colName AS k, count(*) AS cnt FROM $tbl GROUP BY 1),
         |  hist AS (SELECT cnt, count(*) AS nk FROM cnts GROUP BY cnt),
         |  tot AS (SELECT count(*) AS n_keys,
         |    CAST(sum(cnt) AS BIGINT) AS n_rows,
         |    max(cnt) AS max_cnt FROM cnts),
         |  cum AS (SELECT a.cnt, CAST(sum(b.nk) AS BIGINT) AS cum
         |    FROM hist a JOIN hist b ON b.cnt <= a.cnt GROUP BY a.cnt),
         |  med AS (SELECT min(cnt) AS med_cnt FROM cum, tot
         |    WHERE cum * 2 >= n_keys),
         |  p99 AS (SELECT min(cnt) AS p99_cnt FROM cum, tot
         |    WHERE cum * 100 >= n_keys * 99)
         |  SELECT * FROM tot, med, p99)""".stripMargin
    s"""${block("lineitem", "l_partkey")}
       |UNION ALL
       |${block("lineitem", "l_suppkey")}
       |UNION ALL
       |${block("orders", "o_custkey")}
       |ORDER BY key_col""".stripMargin
  }

  /** Power-law tail fit of the per-user activity distribution — the
    * Hill/Clauset MLE for the exponent: α = 1 + n / Σ ln(cᵤ/x_min)
    * over users with event count cᵤ ≥ x_min. The one-number answer to
    * "how heavy-tailed is my key distribution", which is what decides
    * salting/AQE-skew strategy before a big join ([[dqSkewReport]]
    * reports the symptoms; this fits the law behind them). α ≈ 2–3 is
    * the classic heavy-tail regime where a single hot key can carry a
    * constant fraction of the corpus.
    *
    * Determinism: each ln term divides a BIGINT count by the integer
    * x_min — identical doubles both engines — and is rnd6'd before the
    * exact decimal sum, so libm's last-ulp freedom never reaches the
    * hash (the [[AggOps.eventsEntropy]] discipline). One aggregation
    * pass over (user, count) — at 100 TB the fit costs one
    * partial-combined shuffle of the key histogram, nothing more. */
  def dqPowerlaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val per = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    val tot = per.agg(count(lit(1)).as("n_users"))
    val tail = per.filter($"cnt" >= POWERLAW_XMIN)
      .select(rnd6(log($"cnt".cast("double") / POWERLAW_XMIN.toDouble))
        .as("lterm"))
    val t = tail.agg(count(lit(1)).as("n_tail"), Exact.xsum($"lterm").as("s"))
    t.crossJoin(broadcast(tot))
      .select($"n_users", $"n_tail",
        rnd6(lit(1.0) + $"n_tail".cast("double") / $"s").as("alpha"),
        rnd6($"n_tail".cast("double") / $"n_users".cast("double"))
          .as("tail_share"))
  }

  val dqPowerlawSql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH per AS (
       |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_users FROM per),
       |tail AS (
       |  SELECT ${sqlRnd6(s"ln(CAST(cnt AS DOUBLE) / $POWERLAW_XMIN.0)")}
       |    AS lterm
       |  FROM per WHERE cnt >= $POWERLAW_XMIN),
       |t AS (SELECT COUNT(*) AS n_tail, ${Exact.sqlXsum("lterm")} AS s
       |  FROM tail)
       |SELECT n_users, n_tail,
       |  ${sqlRnd6("1.0 + CAST(n_tail AS DOUBLE) / s")} AS alpha,
       |  ${sqlRnd6("CAST(n_tail AS DOUBLE) / CAST(n_users AS DOUBLE)")}
       |    AS tail_share
       |FROM t, tot""".stripMargin
  }

  /** Order-independent CONTENT FINGERPRINT per table — the
    * cross-environment reconciliation primitive ("is the replica
    * byte-identical to prod?") that compares two 100 TB tables by
    * exchanging three numbers instead of rows: n_rows, an exact SUM
    * and an XOR of a per-row content hash. Both reductions are
    * commutative/associative, so partitioning, task retries and row
    * order cannot change the fingerprint — and any single-row
    * difference almost surely changes both. The row hash is the
    * md5-prefix integer of a CANONICAL STRING IMAGE ([[dqProfile]]'s
    * discipline: doubles through DECIMAL(18,6)), because engine-native
    * hash functions (xxhash64 vs duckdb hash) share no
    * implementation; md5 bytes do. */
  def dqChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val P61 = (1L << 61) - 1 // Mersenne prime keeps the sum in range
    val tables = Seq(
      ("orders",
        "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
          "CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS STRING), " +
          "CAST(o_orderdate AS STRING), o_orderpriority)",
        Tables.orders(spark, sfDir)),
      ("lineitem",
        "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, " +
          "CAST(CAST(l_quantity AS DECIMAL(18,6)) AS STRING), " +
          "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS STRING), " +
          "l_returnflag, l_linestatus)",
        Tables.lineitem(spark, sfDir)))
    tables.map { case (name, img, df) =>
      df.select(expr(
          s"CAST(conv(substring(md5($img), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
        .agg(count(lit(1)).as("n_rows"),
          // h < 2^60, so a LONG sum overflows past ~8 rows: sum in
          // DECIMAL(38,0) exactly, fold back mod P61 at the end
          expr(s"CAST(SUM(CAST(h AS DECIMAL(38,0))) % $P61 AS BIGINT)")
            .as("content_sum"),
          expr("bit_xor(h)").as("content_xor"))
        .select(lit(name).as("table_name"), $"n_rows", $"content_sum",
          $"content_xor")
    }.reduce(_.unionAll(_)).orderBy($"table_name")
  }

  val dqChecksumSql: String = {
    val P61 = (1L << 61) - 1
    def block(name: String, img: String, table: String): String =
      s"""SELECT '$name' AS table_name, COUNT(*) AS n_rows,
         |  CAST(SUM(h) % $P61 AS BIGINT) AS content_sum,
         |  CAST(bit_xor(h) AS BIGINT) AS content_xor
         |FROM (SELECT CAST('0x' || substring(md5($img), 1, 15) AS BIGINT)
         |        AS h FROM $table)""".stripMargin
    block("orders",
      "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR), " +
        "CAST(o_orderdate AS VARCHAR), o_orderpriority)", "orders") +
      "\nUNION ALL\n" +
      block("lineitem",
        "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, " +
          "CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR), " +
          "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR), " +
          "l_returnflag, l_linestatus)", "lineitem") +
      "\nORDER BY table_name"
  }

  /** Per-rule cap for the [[dqQuarantine]] report. */
  private val QUAR_TOP = 100

  /** Row-level quarantine report — the actionable companion of the
    * [[dqConstraints]] aggregate audit: not "rule X has N violations"
    * but WHICH rows, worst first, capped at [[QUAR_TOP]] per rule so
    * the report stays human-sized however bad the batch is. Rules
    * with row-level evidence in this fixture: duplicate
    * (l_orderkey, l_linenumber) groups (severity = copy count) and
    * ship-before-order lines (severity = days shipped early).
    * Violations deduplicate to their key grain, then a PARTITIONED
    * window ranks within each rule — Spark prunes it to per-key
    * top-k state (WindowGroupLimit), so the quarantine never sorts
    * the violation stream globally. */
  def dqQuarantine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    val dup = li.groupBy($"l_orderkey", $"l_linenumber")
      .agg(count(lit(1)).as("c")).filter($"c" > 1)
      .select(lit("pk_dup").as("rule"), $"l_orderkey".as("k1"),
        $"l_linenumber".cast("long").as("k2"), $"c".as("severity"))
    val ship = li.join(Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" < $"o_orderdate")
      .select(lit("ship_before_order").as("rule"),
        $"l_orderkey".as("k1"), $"l_linenumber".cast("long").as("k2"),
        datediff($"o_orderdate", $"l_shipdate").cast("long").as("severity"))
      .distinct()
    dup.unionByName(ship)
      .withColumn("rk", row_number().over(Window.partitionBy($"rule")
        .orderBy($"severity".desc, $"k1".asc, $"k2".asc)))
      .filter($"rk" <= QUAR_TOP)
      .orderBy($"rule", $"rk")
  }

  val dqQuarantineSql: String =
    s"""WITH dup AS (
       |  SELECT 'pk_dup' AS rule, l_orderkey AS k1,
       |    CAST(l_linenumber AS BIGINT) AS k2, COUNT(*) AS severity
       |  FROM lineitem GROUP BY 2, 3 HAVING COUNT(*) > 1),
       |ship AS (
       |  SELECT DISTINCT 'ship_before_order' AS rule, l_orderkey AS k1,
       |    CAST(l_linenumber AS BIGINT) AS k2,
       |    CAST(CAST(o_orderdate AS DATE) - CAST(l_shipdate AS DATE)
       |      AS BIGINT) AS severity
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_shipdate < o_orderdate),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY rule
       |    ORDER BY severity DESC, k1 ASC, k2 ASC) AS rk
       |  FROM (SELECT * FROM dup UNION ALL SELECT * FROM ship))
       |SELECT rule, k1, k2, severity, rk FROM ranked
       |WHERE rk <= $QUAR_TOP ORDER BY rule, rk""".stripMargin

  /** PSI bin width over `value` (range ≈ 0–490 ⇒ 10 bins, capped). */
  private val PSI_BIN_W = 50.0
  private val PSI_BINS = 10

  /** Population Stability Index between the month's two halves of the
    * `value` distribution — the scorecard-industry drift metric beside
    * the χ² ([[AggOps.eventsDrift]]) and KL ([[AggOps.eventsEntropy]])
    * monitors: PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b). The conventional
    * read (< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted) is what
    * makes it the go/no-go gate before refreshing a model on a new
    * snapshot. Bins are fixed-width integer buckets (value div 50,
    * capped at the last bin — engine-identical arithmetic); +1 Laplace
    * smoothing keeps empty bins finite, mirrored exactly in the
    * shares' denominators. The bin axis is DENSIFIED over the full
    * 0..bins−1 spine before totals are taken, so every unit of
    * smoothing mass in a denominator belongs to a bin that also emits
    * a psi_term and the smoothed shares sum to exactly 1 per cohort
    * (without the spine, a bin empty in both cohorts would inflate
    * the denominators while contributing no term, understating PSI).
    * Per-term rnd6 before any comparison (the entropy discipline);
    * one partial-aggregated shuffle of (bin, cohort counts) — ≤ 10
    * rows after it at any corpus size. */
  def dqPsi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val spine = spark.range(0, PSI_BINS.toLong)
      .select($"id".cast("int").as("bin"))
    val binned = spine.join(
        Tables.events(spark, sfDir)
          .select(least(lit(PSI_BINS - 1),
            floor($"value" / PSI_BIN_W).cast("int")).as("bin"),
            (dayofmonth($"ts") <= 15).cast("long").as("in_a"))
          .groupBy($"bin")
          .agg(sum($"in_a").as("n_a"), sum(lit(1L) - $"in_a").as("n_b")),
        Seq("bin"), "left")
      .select($"bin", coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"))
    val totals = binned.agg(
      (sum($"n_a") + PSI_BINS).as("tot_a"),
      (sum($"n_b") + PSI_BINS).as("tot_b"))
    val pa = ($"n_a" + 1).cast("double") / $"tot_a".cast("double")
    val pb = ($"n_b" + 1).cast("double") / $"tot_b".cast("double")
    binned.crossJoin(broadcast(totals))
      .select($"bin", $"n_a", $"n_b",
        rnd6(pa).as("p_a"), rnd6(pb).as("p_b"),
        rnd6((pa - pb) * log(pa / pb)).as("psi_term"))
      .orderBy($"bin")
  }

  val dqPsiSql: String = {
    import graft.functions.Udfs.sqlRnd6
    val pa = "(CAST(n_a + 1 AS DOUBLE) / CAST(tot_a AS DOUBLE))"
    val pb = "(CAST(n_b + 1 AS DOUBLE) / CAST(tot_b AS DOUBLE))"
    s"""WITH raw AS (
       |  SELECT least(${PSI_BINS - 1},
       |      CAST(floor(value / $PSI_BIN_W) AS INTEGER)) AS bin,
       |    CAST(SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(SUM(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_b
       |  FROM events GROUP BY 1),
       |binned AS (
       |  SELECT CAST(s.bin AS INTEGER) AS bin,
       |    COALESCE(r.n_a, 0) AS n_a, COALESCE(r.n_b, 0) AS n_b
       |  FROM range(0, $PSI_BINS) s(bin) LEFT JOIN raw r ON s.bin = r.bin),
       |totals AS (
       |  SELECT CAST(SUM(n_a) + $PSI_BINS AS BIGINT) AS tot_a,
       |    CAST(SUM(n_b) + $PSI_BINS AS BIGINT) AS tot_b
       |  FROM binned)
       |SELECT bin, n_a, n_b,
       |  ${sqlRnd6(pa)} AS p_a, ${sqlRnd6(pb)} AS p_b,
       |  ${sqlRnd6(s"($pa - $pb) * ln($pa / $pb)")} AS psi_term
       |FROM binned, totals
       |ORDER BY bin""".stripMargin
  }
}
