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

  /** Bootstrap replica count. 32 replicas give a usable SE estimate
    * while the exploded shuffle stays B rows per map partition. */
  private val BOOT_B = 32

  /** Poisson(1) CDF × 10⁶ as integer thresholds: a uniform integer
    * draw u ∈ [0, 10⁶) maps to the replica weight by comparing
    * against these cut points — pure int comparisons, identical in
    * any engine (no float CDF inversion). */
  private val BOOT_CDF = Seq(367879, 735759, 919699, 981012, 996340, 999406)

  /** Poisson bootstrap of the mean of `events.value` — uncertainty
    * quantification for a 100 TB aggregate in ONE pass. The classic
    * resample-n-rows bootstrap needs n draws per replica from a
    * global index (impossible distributed); the Poisson bootstrap
    * replaces each replica's multinomial with independent per-row
    * Poisson(1) weights, so every replica is a weighted aggregate
    * computed in the SAME scan: explode each row into (replica b,
    * weight w_b) pairs, partial-aggregate map-side, shuffle B groups.
    *
    * Determinism: the per-(row, replica) weight derives from the
    * [[scatterExpr]] Knuth scatter of (event_id, b) mapped through
    * integer CDF thresholds ([[BOOT_CDF]]) — retry/repartition-stable
    * and engine-reproducible, unlike any seeded RNG. Replica means
    * are exact-decimal sums; the normal-approximation CI assembles
    * from the B rnd6'd means via exact moments (same discipline as
    * [[MlOps.mlLinreg]]).
    *
    * Output: one row per replica (b, n_eff, boot_mean) plus the
    * broadcast 1-row summary columns (est, se, lo, hi) — the whole
    * diagnostic a metrics pipeline materializes. */
  def sampleBootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.engine.Exact.xsum
    import graft.functions.Udfs.rnd6
    val wCase = BOOT_CDF.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${BOOT_CDF.size} END")
    val exploded = Tables.events(spark, sfDir)
      .select($"event_id", $"value",
        explode(sequence(lit(1), lit(BOOT_B))).as("b"))
      .withColumn("u",
        expr("pmod(event_id * 2654435761 + b * 40503, 1000000)"))
      .withColumn("w", expr(wCase))
    val perReplica = exploded.groupBy($"b")
      .agg(sum($"w").as("n_eff"),
        xsum($"w" * $"value").as("wsum"))
      .select($"b", $"n_eff",
        rnd6($"wsum" / $"n_eff".cast("double")).as("boot_mean"))
    val est = Tables.events(spark, sfDir)
      .agg(rnd6(xsum($"value") / count(lit(1))).as("est"))
    val bd = lit(BOOT_B.toDouble)
    val seCol = sqrt((bd * $"smm" - $"sm" * $"sm") /
      (bd * (bd - 1.0)))
    val summary = perReplica
      .agg(xsum($"boot_mean").as("sm"),
        xsum($"boot_mean" * $"boot_mean").as("smm"))
      .crossJoin(broadcast(est))
      .select($"est", rnd6(seCol).as("se"),
        rnd6($"est" - lit(1.96) * rnd6(seCol)).as("lo"),
        rnd6($"est" + lit(1.96) * rnd6(seCol)).as("hi"))
    perReplica.crossJoin(broadcast(summary))
      .select($"b", $"n_eff", $"boot_mean", $"est", $"se", $"lo", $"hi")
      .orderBy($"b")
  }

  val sampleBootstrapSql: String = {
    import graft.functions.Udfs.sqlRnd6
    import graft.engine.Exact.sqlXsum
    val wCase = BOOT_CDF.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${BOOT_CDF.size} END")
    val se = s"sqrt(($BOOT_B.0 * smm - sm * sm)" +
      s" / ($BOOT_B.0 * ($BOOT_B.0 - 1.0)))"
    s"""WITH exploded AS (
       |  SELECT event_id, value, CAST(r.b AS INTEGER) AS b,
       |    ((event_id * 2654435761 + CAST(r.b AS INTEGER) * 40503)
       |      % 1000000 + 1000000) % 1000000 AS u
       |  FROM events CROSS JOIN range(1, ${BOOT_B + 1}) AS r(b)),
       |weighted AS (SELECT b, value, $wCase AS w FROM exploded),
       |per_replica AS (
       |  SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
       |    ${sqlRnd6(s"${sqlXsum("w * value")} / CAST(SUM(w) AS DOUBLE)")}
       |      AS boot_mean
       |  FROM weighted GROUP BY 1),
       |est AS (
       |  SELECT ${sqlRnd6(s"${sqlXsum("value")} / COUNT(*)")} AS est
       |  FROM events),
       |summary AS (
       |  SELECT est, ${sqlRnd6(se)} AS se,
       |    ${sqlRnd6(s"est - 1.96 * ${sqlRnd6(se)}")} AS lo,
       |    ${sqlRnd6(s"est + 1.96 * ${sqlRnd6(se)}")} AS hi
       |  FROM (SELECT ${sqlXsum("boot_mean")} AS sm,
       |      ${sqlXsum("boot_mean * boot_mean")} AS smm
       |    FROM per_replica), est)
       |SELECT b, n_eff, boot_mean, est, se, lo, hi
       |FROM per_replica, summary ORDER BY b""".stripMargin
  }

  /** Global token budget for [[mixSources]]: ~80 % of the sf0.01
    * corpus, a true subsample at every larger SF. */
  private val MIX_BUDGET = 20000L

  /** Training-mix construction: apportion a global TOKEN budget across
    * document sources with temperature-scaled weights (w_s ∝ √tokens_s,
    * the α = 0.5 mixing rule that upweights small sources relative to
    * proportional sampling), then fill each source's quota greedily in
    * key-scatter order. The budget split is LARGEST-REMAINDER
    * apportionment in exact integers: quota_s = ⌊T·u_s/U⌋ with the
    * leftover T − Σ quotas handed out by descending remainder
    * (source name as the tie-break) — the textbook way to make shares
    * sum exactly to the budget with no float in sight. ⌊√n⌋ is exact
    * cross-engine (IEEE sqrt is correctly rounded; the floor can only
    * disagree at perfect squares, where sqrt is exact).
    *
    * Scale shape: token counting is map-side; per-source totals are one
    * map-side-combined shuffle to a #sources-row table; ALL apportionment
    * arithmetic (including the remainder rank, a broadcast triangular
    * count — no unpartitioned window) runs on that constant-size table.
    * Selection is one per-source window (rank + EXCLUSIVE running token
    * total, so the doc that crosses the quota line is the last one in).
    * With few huge sources the per-source sort is the 100 TB hot spot —
    * the same two-level fix as [[graft.operators.TextOps text_pack]]
    * applies verbatim: scatter each source into shards and apportion
    * each source's quota over its shards with this SAME largest-remainder
    * machinery (it nests losslessly because the shares are exact).
    * Docs selected per source ≈ quota/mean-doc-length, so the output is
    * budget-bounded regardless of corpus size. */
  def mixSources(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("ntok"))
    val srcTok = toks.groupBy($"source").agg(sum($"ntok").as("src_tok"))
    val w = srcTok.select($"source",
      expr("cast(floor(sqrt(cast(src_tok as double))) as bigint)").as("u"))
    val tot = w.agg(sum($"u").as("uu"))
    val q0 = w.crossJoin(broadcast(tot))
      .select($"source", $"u",
        expr(s"($MIX_BUDGET * u) div uu").as("q0"),
        expr(s"$MIX_BUDGET * u - (($MIX_BUDGET * u) div uu) * uu").as("rem"))
    val lft = q0.agg((lit(MIX_BUDGET) - sum($"q0")).as("l"))
    val other = q0.select($"source".as("s2"), $"rem".as("rem2"))
    val rkd = q0.join(broadcast(other),
        $"rem2" > $"rem" || ($"rem2" === $"rem" && $"s2" < $"source"), "left")
      .groupBy($"source", $"q0", $"rem")
      .agg((count($"s2") + 1).as("rk"))
    val quota = rkd.crossJoin(broadcast(lft))
      .select($"source",
        ($"q0" + when($"rk" <= $"l", 1L).otherwise(0L)).as("tok_quota"))
    val ord = Window.partitionBy($"source")
      .orderBy(expr("pmod(doc_id * 2654435761, 1000000007)").asc,
        $"doc_id".asc)
    val ranked = toks
      .withColumn("pick", row_number().over(ord))
      .withColumn("excl", coalesce(
        sum($"ntok").over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    ranked.join(broadcast(quota), "source")
      .filter($"excl" < $"tok_quota")
      .select($"source", $"pick", $"doc_id", $"ntok", $"tok_quota")
      .orderBy($"source", $"pick")
  }

  val mixSourcesSql: String = {
    val h = "(doc_id * 2654435761) % 1000000007"
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
       |  FROM documents),
       |srcw AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS src_tok
       |  FROM toks GROUP BY 1),
       |w AS (SELECT source,
       |  CAST(FLOOR(SQRT(CAST(src_tok AS DOUBLE))) AS BIGINT) AS u
       |  FROM srcw),
       |tot AS (SELECT CAST(SUM(u) AS BIGINT) AS uu FROM w),
       |q0 AS (SELECT source, u, ($MIX_BUDGET * u) // uu AS q0,
       |  $MIX_BUDGET * u - (($MIX_BUDGET * u) // uu) * uu AS rem
       |  FROM w, tot),
       |lft AS (SELECT $MIX_BUDGET - CAST(SUM(q0) AS BIGINT) AS l FROM q0),
       |rkd AS (SELECT a.source, a.q0,
       |  1 + (SELECT COUNT(*) FROM q0 b
       |    WHERE b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source))
       |    AS rk
       |  FROM q0 a),
       |quota AS (SELECT source,
       |  q0 + CASE WHEN rk <= (SELECT l FROM lft) THEN 1 ELSE 0 END
       |    AS tok_quota
       |  FROM rkd),
       |ranked AS (SELECT source, doc_id, ntok,
       |  row_number() OVER (PARTITION BY source ORDER BY $h, doc_id)
       |    AS pick,
       |  COALESCE(CAST(SUM(ntok) OVER (PARTITION BY source
       |    ORDER BY $h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |    0) AS excl
       |  FROM toks)
       |SELECT r.source, r.pick, r.doc_id, r.ntok, q.tok_quota
       |FROM ranked r JOIN quota q USING (source)
       |WHERE r.excl < q.tok_quota
       |ORDER BY source, pick""".stripMargin
  }
}
