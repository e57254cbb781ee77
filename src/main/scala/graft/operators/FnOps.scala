package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.functions.Udfs.{rnd6, sqlRnd6}

/** Scalar function families (SURVEY.md §2.8) — one composite query per
  * family. All functions are codegen'd built-ins (no UDFs here), so
  * each query stays inside one WholeStageCodegen span over the scan.
  *
  * Oracle-dialect notes: DuckDB `floor`/`ceil` return DOUBLE (Spark:
  * LONG) → CAST in SQL; `round()` on doubles disagrees between engines
  * → decimal-cast rounding (rnd6) everywhere; libm results (exp/ln/pow)
  * agree only to ~1 ulp → always rnd6-wrapped.
  */
object FnOps {

  /** String family over documents. */
  def fnString(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        upper($"lang").as("lang_up"),
        trim(concat_ws("", lit(" "), $"source", lit(" "))).as("src_trim"),
        substring($"text", 1, 12).as("prefix12"),
        concat_ws("-", $"lang", $"source").as("lang_src"),
        size(split($"text", " ")).as("n_tokens"),
        regexp_extract($"text", "^([a-z]+)", 1).as("first_word"),
        regexp_replace($"text", "spark", "SPARK").as("replaced"),
        $"text".like("%spark%").as("has_spark"),
        levenshtein($"lang", lit("en")).as("lev_en"),
        length($"text").as("n_len"))
      .orderBy($"doc_id")
  }

  val fnStringSql: String =
    """SELECT doc_id,
      |  upper(lang) AS lang_up,
      |  trim(concat(' ', source, ' ')) AS src_trim,
      |  substring(text, 1, 12) AS prefix12,
      |  concat_ws('-', lang, source) AS lang_src,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
      |  regexp_replace(text, 'spark', 'SPARK', 'g') AS replaced,
      |  text LIKE '%spark%' AS has_spark,
      |  levenshtein(lang, 'en') AS lev_en,
      |  length(text) AS n_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Date/time family over orders (all values midnight-aligned UTC). */
  def fnDate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        date_trunc("month", $"o_orderdate").as("mon_start"),
        date_add(to_date($"o_orderdate"), 30).as("plus30"),
        datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
        last_day(to_date($"o_orderdate")).as("eom"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  val fnDateSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y,
      |  month(o_orderdate) AS m,
      |  day(o_orderdate) AS d,
      |  date_trunc('month', o_orderdate) AS mon_start,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  last_day(CAST(o_orderdate AS DATE)) AS eom,
      |  epoch_us(o_orderdate) // 1000000 AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Calendar-interval family beyond [[fnDate]]'s extraction basics:
    * month-stepping with end-of-month clamping (`add_months` —
    * 2024-01-31 + 1 month = 2024-02-29 in BOTH engines), ISO
    * week/weekday alignment (Spark's `weekday+1` ≡ DuckDB `isodow`,
    * the `q_ts_seasonal` identity), Monday-anchored week truncation,
    * and `next_day` — which DuckDB LACKS, so the oracle derives it
    * from the isodow arithmetic `d + ((7 − isodow) % 7) + 1` (strictly
    * after, Monday→+7): the house pattern for functions only one
    * engine ships. Whole-month distance is spelled as the exact
    * integer `(Δyear·12 + Δmonth)` rather than `months_between`,
    * whose fractional 31-day-month semantics no other engine
    * reproduces. All map-side scalar arithmetic — one scan, one
    * codegen stage. */
  def fnInterval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", to_date($"o_orderdate").as("d"))
      .select($"o_orderkey",
        add_months($"d", 3).as("add3m"),
        add_months($"d", -12).as("sub1y"),
        quarter($"d").as("q"),
        weekofyear($"d").as("iso_wk"),
        (weekday($"d") + 1).as("iso_dow"),
        date_trunc("week", $"d").cast("date").as("week_start"),
        next_day($"d", "Monday").as("next_mon"),
        ((year($"d") - 1995) * 12 + month($"d") - 1).as("months_since"))
      .orderBy($"o_orderkey")
  }

  val fnIntervalSql: String =
    """SELECT o_orderkey,
      |  CAST(d + INTERVAL 3 MONTH AS DATE) AS add3m,
      |  CAST(d - INTERVAL 12 MONTH AS DATE) AS sub1y,
      |  CAST(quarter(d) AS INTEGER) AS q,
      |  CAST(weekofyear(d) AS INTEGER) AS iso_wk,
      |  CAST(isodow(d) AS INTEGER) AS iso_dow,
      |  CAST(date_trunc('week', d) AS DATE) AS week_start,
      |  d + CAST(((7 - isodow(d)) % 7) + 1 AS INTEGER) AS next_mon,
      |  CAST((year(d) - 1995) * 12 + month(d) - 1 AS INTEGER)
      |    AS months_since
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Math family over supplier. floor/ceil cast to BIGINT for dialect
    * parity; transcendentals rnd6-wrapped (libm last-ulp drift). */
  def fnMath(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, sfDir)
      .select($"s_suppkey",
        floor($"s_acctbal").as("fl"),
        ceil($"s_acctbal").as("ce"),
        abs($"s_acctbal" - 5000.0).as("ab"),
        sqrt(abs($"s_acctbal")).as("sq"),
        rnd6(pow(abs($"s_acctbal"), lit(1.5))).as("pw"),
        rnd6(log(abs($"s_acctbal") + 1.0)).as("lg"),
        rnd6(exp($"s_acctbal" / 10000.0)).as("ex"),
        expr("s_suppkey div 7").as("idiv"),
        pmod($"s_suppkey", lit(7)).as("md"),
        ($"s_acctbal" / 7.0).as("fdiv"))
      .orderBy($"s_suppkey")
  }

  val fnMathSql: String =
    s"""SELECT s_suppkey,
       |  CAST(floor(s_acctbal) AS BIGINT) AS fl,
       |  CAST(ceil(s_acctbal) AS BIGINT) AS ce,
       |  abs(s_acctbal - 5000.0) AS ab,
       |  sqrt(abs(s_acctbal)) AS sq,
       |  ${sqlRnd6("pow(abs(s_acctbal), 1.5)")} AS pw,
       |  ${sqlRnd6("ln(abs(s_acctbal) + 1.0)")} AS lg,
       |  ${sqlRnd6("exp(s_acctbal / 10000.0)")} AS ex,
       |  s_suppkey // 7 AS idiv,
       |  s_suppkey % 7 AS md,
       |  s_acctbal / 7.0 AS fdiv
       |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Conditional family over orders. */
  def fnConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        when($"o_totalprice" > 200000.0, "big")
          .when($"o_totalprice" > 100000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_co"),
        nullif($"o_orderpriority", lit("3-MEDIUM")).as("prio_n"),
        least($"o_totalprice", lit(150000.0)).as("capped"),
        greatest($"o_totalprice", lit(50000.0)).as("floored"))
      .orderBy($"o_orderkey")
  }

  val fnConditionalSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
      |       WHEN o_totalprice > 100000.0 THEN 'mid'
      |       ELSE 'small' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_co,
      |  nullif(o_orderpriority, '3-MEDIUM') AS prio_n,
      |  least(o_totalprice, 150000.0) AS capped,
      |  greatest(o_totalprice, 50000.0) AS floored
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Exact decimal fold for sum-of-squares. DECIMAL(30,12) keeps the
    * merge `a + x` at precision 31 (fits), then casts back so the fold
    * stays type-stable — a (38,12) accumulator would widen to (38,11)
    * and lose the 12th digit. Exact ⇒ order-independent ⇒ reproducible
    * by the oracle's decimal SUM. */
  private val sqSumExpr =
    """aggregate(
      |  transform(embedding, x -> cast(cast(x as double) * cast(x as double) as decimal(30,12))),
      |  cast(0 as decimal(30,12)),
      |  (a, x) -> cast(a + x as decimal(30,12)))""".stripMargin

  /** Array / higher-order-function family over embeddings. The L2 norm
    * is an exact decimal fold (see [[sqSumExpr]]) reproducible by the
    * SQL oracle's unnested decimal sum. */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first_val"),
        // slice/sort_array stay in the plan, but the outputs are scalar
        // float cells (the driver's comparator cannot hash array cells);
        // floats compare exactly because both sides read the same values.
        element_at(slice($"embedding", 1, 3), 1).as("h3_1"),
        element_at(slice($"embedding", 1, 3), 3).as("h3_3"),
        element_at(sort_array(slice($"embedding", 1, 3)), 1).as("hs_min"),
        element_at(sort_array(slice($"embedding", 1, 3)), 3).as("hs_max"),
        expr(sqSumExpr).cast(DoubleType).as("sq_sum"),
        rnd6(sqrt(expr(sqSumExpr).cast(DoubleType))).as("l2_norm"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"))
      .orderBy($"vec_id")
  }

  val fnArraySql: String =
    s"""WITH sq AS (
       |  SELECT vec_id,
       |    CAST(SUM(CAST(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE)
       |      * CAST(embedding[CAST(i.range AS INT)] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sq_sum
       |  FROM embeddings, range(1, 65) i GROUP BY vec_id
       |)
       |SELECT e.vec_id,
       |  len(e.embedding) AS dim,
       |  e.embedding[1] AS first_val,
       |  e.embedding[1] AS h3_1,
       |  e.embedding[3] AS h3_3,
       |  list_sort(e.embedding[1:3])[1] AS hs_min,
       |  list_sort(e.embedding[1:3])[3] AS hs_max,
       |  sq.sq_sum AS sq_sum,
       |  ${sqlRnd6("sqrt(sq.sq_sum)")} AS l2_norm,
       |  len(list_filter(e.embedding, x -> x > 0)) AS n_pos
       |FROM embeddings e JOIN sq ON e.vec_id = sq.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** Map family: JSON props → MapType, keys/values/element_at. */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("mp", from_json($"props", MapType(StringType, IntegerType)))
      .select($"event_id",
        // map_keys stays in the plan; emitted ','-joined sorted (scalar
        // cell — the driver's comparator cannot hash array cells).
        array_join(sort_array(map_keys($"mp")), ",").as("keys"),
        size($"mp").as("n_keys"),
        element_at($"mp", "k").as("k_val"))
      .orderBy($"event_id")
  }

  val fnMapSql: String =
    """SELECT event_id,
      |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
      |  len(json_keys(props)) AS n_keys,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** Struct family: nested-record assembly, field access, and JSON
    * serialization — the typed-column nesting a columnar engine keeps
    * cheap (struct fields are just adjacent columns; no shredding
    * cost). Fields stay int/string so the to_json text is
    * byte-identical across engines (float formatting differs). */
  def fnStruct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .withColumn("rec",
        struct($"o_orderkey", $"o_orderpriority",
          array($"o_orderkey", $"o_custkey").as("keys")))
      .select($"o_orderkey",
        $"rec.o_orderpriority".as("prio"),
        element_at($"rec.keys", 2).as("custkey"),
        to_json($"rec").as("rec_json"))
      .orderBy($"o_orderkey")
  }

  val fnStructSql: String =
    """SELECT o_orderkey,
      |  struct_pack(o_orderkey := o_orderkey,
      |              o_orderpriority := o_orderpriority,
      |              keys := [o_orderkey, o_custkey]).o_orderpriority AS prio,
      |  struct_pack(o_orderkey := o_orderkey,
      |              o_orderpriority := o_orderpriority,
      |              keys := [o_orderkey, o_custkey]).keys[2] AS custkey,
      |  CAST(to_json(struct_pack(o_orderkey := o_orderkey,
      |              o_orderpriority := o_orderpriority,
      |              keys := [o_orderkey, o_custkey])) AS VARCHAR) AS rec_json
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON family: string-level JSON access (no map conversion). */
  def fnJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast(LongType).as("k_int"),
        get_json_object($"props", "$.missing").as("k_missing"))
      .orderBy($"event_id")
  }

  val fnJsonSql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      |  json_extract_string(props, '$.missing') AS k_missing
      |FROM events ORDER BY event_id""".stripMargin

  /** Bitwise family: and/or/xor/shifts over integer keys — integer
    * arithmetic, engine-identical by definition. (DuckDB spells xor as
    * a function — its `^` is exponentiation — hence the dialect split
    * in the oracle.) */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_orderkey".bitwiseAND(lit(255L))).as("k_and"),
        ($"l_partkey".bitwiseOR(lit(15L))).as("k_or"),
        ($"l_suppkey".bitwiseXOR(lit(7L))).as("k_xor"),
        shiftleft($"l_linenumber", 2).as("k_shl"),
        shiftright($"l_orderkey", 3).as("k_shr"))
      .orderBy($"l_orderkey", $"l_linenumber", $"k_xor")
  }

  val fnBitwiseSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_orderkey & 255 AS k_and,
      |  l_partkey | 15 AS k_or,
      |  xor(l_suppkey, 7) AS k_xor,
      |  l_linenumber << 2 AS k_shl,
      |  l_orderkey >> 3 AS k_shr
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, k_xor""".stripMargin

  /** Cryptographic content hashes — the backbone of content-addressed
    * dedup and incremental recompute at scale (a byte-stable hash per
    * document lets 100 TB reprocessing skip unchanged content). md5 and
    * sha-256 are algorithmically fixed, so the hex digests are
    * engine-identical by definition. */
  def fnHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        md5($"text").as("md5_hex"),
        sha2($"text", 256).as("sha256_hex"),
        length($"text").as("n_len"))
      .orderBy($"doc_id")
  }

  val fnHashSql: String =
    """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
      |  length(text) AS n_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Regexp family — extraction-all, match counting, regex split,
    * global replace, anchored match. Patterns stay in the RE2 ∩ Java
    * common subset (no backrefs, no lookaround — same discipline as
    * the PII scrubber) so Spark's java.util.regex and DuckDB's RE2
    * produce identical results. Map-side only: regexps are codegen'd
    * scalar calls inside one WholeStageCodegen span; at 100 TB the
    * only scale concern is pattern compile-per-row, which Spark avoids
    * by caching the compiled Pattern per task when the pattern is a
    * literal. */
  def fnRegexp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        // array results serialized to a joined string: the driver
        // comparator requires atomic output columns (ContractSpec)
        concat_ws(",", regexp_extract_all($"text", lit("(s[a-z]+)"), lit(1))).as("s_words"),
        size(regexp_extract_all($"text", lit("(s[a-z]+)"), lit(1))).as("n_s_words"),
        concat_ws("|", split($"text", "qu[a-z]+ ")).as("qu_split"),
        regexp_replace($"text", "(qu[a-z]+)", "Q").as("scrubbed"),
        $"text".rlike("(^| )stream( |$)").as("has_stream"),
        regexp_extract($"text", "([a-z]+an) ([a-z]+)", 2).as("after_an"))
      .orderBy($"doc_id")
  }

  val fnRegexpSql: String =
    """SELECT doc_id,
      |  COALESCE(array_to_string(regexp_extract_all(text, '(s[a-z]+)', 1), ','), '') AS s_words,
      |  len(regexp_extract_all(text, '(s[a-z]+)', 1)) AS n_s_words,
      |  array_to_string(regexp_split_to_array(text, 'qu[a-z]+ '), '|') AS qu_split,
      |  regexp_replace(text, '(qu[a-z]+)', 'Q', 'g') AS scrubbed,
      |  regexp_matches(text, '(^| )stream( |$)') AS has_stream,
      |  regexp_extract(text, '([a-z]+an) ([a-z]+)', 2) AS after_an
      |FROM documents ORDER BY doc_id""".stripMargin

  /** URL parsing family: crawl-style pipelines slice URLs into host /
    * path / query params constantly (domain filtering, per-site quotas,
    * canonicalization). Spark's parse_url is a codegen'd built-in; the
    * oracle reproduces each slice with anchored regexps (DuckDB has no
    * URL parser), which also documents the exact grammar subset relied
    * on. The URL is assembled deterministically from fixture columns so
    * the operator has a stable input without a crawl fixture. */
  def fnUrl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", concat(lit("https://"), $"source",
        lit(".example.com/docs/"), $"doc_id",
        lit("?lang="), $"lang", lit("&n="), $"n_chars").as("url"))
      .select($"doc_id", $"url",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY")).as("query"),
        parse_url($"url", lit("QUERY"), lit("lang")).as("lang_param"))
      .orderBy($"doc_id")
  }

  val fnUrlSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.com/docs/' || doc_id ||
      |    '?lang=' || lang || '&n=' || n_chars AS url
      |  FROM documents)
      |SELECT doc_id, url,
      |  regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
      |  regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
      |  regexp_extract(url, '\?([^#]*)', 1) AS query,
      |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
      |FROM u ORDER BY doc_id""".stripMargin

  /** Generator family: `sequence` + `explode` — the declarative
    * row-multiplier (range fan-out, calendar expansion, retry
    * schedules). Spark's Generate node streams elements without
    * materializing the array per row; each input row fans out
    * map-side, so no shuffle is involved at any scale. */
  def fnSequence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, sfDir)
      .select($"n_nationkey",
        explode(sequence(lit(0), pmod($"n_nationkey", lit(5)))).as("n"))
      .select($"n_nationkey", $"n", ($"n" * $"n").as("n_sq"),
        ($"n_nationkey" * 10 + $"n").as("derived_key"))
      .orderBy($"n_nationkey", $"n")
  }

  val fnSequenceSql: String =
    """SELECT n_nationkey, n, n * n AS n_sq,
      |  n_nationkey * 10 + n AS derived_key
      |FROM (SELECT n_nationkey,
      |        unnest(generate_series(0, n_nationkey % 5)) AS n
      |      FROM nation)
      |ORDER BY n_nationkey, n""".stripMargin

  /** Data masking: `mask()` redacts by character class (upper → X,
    * lower → x, digit → n) — the PII-redaction primitive for shipping
    * analytics-safe copies of identifier columns. Codegen'd per-row
    * transform; the DuckDB twin is the equivalent regexp_replace
    * chain. */
  def fnMask(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name",
        mask($"c_name").as("masked"),
        mask($"c_name", lit("U"), lit("l"), lit("#"), lit("*")).as("masked_custom"))
      .orderBy($"c_custkey")
  }

  val fnMaskSql: String =
    """SELECT c_custkey, c_name,
      |  regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '[^A-Za-z0-9]', '*', 'g'), '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'),
      |    '[0-9]', '#', 'g') AS masked_custom
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** VARIANT path (Spark 4's native semi-structured type):
    * parse_json → an open-schema binary-encoded value, fields pulled
    * with typed variant_get — the modern alternative to
    * get_json_object string re-parsing (parse once, binary access
    * after; at 100 TB the parse cost is paid once per row, not once
    * per extracted field). A missing path yields NULL, the dirty-data
    * contract. DuckDB has no VARIANT; the oracle extracts the same
    * values from the JSON text directly. */
  def fnVariant(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id",
        expr("cast(variant_get(parse_json(props), '$.k', 'int') as bigint)")
          .as("k"),
        expr("variant_get(parse_json(props), '$.missing', 'string')")
          .as("missing"))
      .orderBy($"event_id")
  }

  val fnVariantSql: String =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      |  json_extract_string(props, '$.missing') AS missing
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Error-safe (`try_`) function family: NULL instead of exception
    * for bad casts, division by zero, and out-of-bounds access — the
    * ANSI-mode escape hatches a dirty-data pipeline needs (a single
    * malformed row must not kill a 100 TB job; NULL + downstream
    * filter beats task retry storms). DuckDB lacks `try_divide`/
    * `try_element_at`, so the oracle spells their exact semantics
    * (NULLIF denominator; 1-based list access already NULL-safe). */
  def fnTry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        expr("try_divide(l_quantity, l_linenumber - 1)").as("safe_div"),
        expr("try_cast(cast(l_orderkey AS string) AS int)").as("cast_ok"),
        expr("try_cast(l_returnflag AS int)").as("cast_bad"),
        expr("try_element_at(array(l_returnflag, l_linestatus), l_linenumber)")
          .as("safe_elem"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture
      // (SampleOps.scala documents this), so sort by every output
      // column — rows that tie on all of them are identical and
      // therefore interchangeable under the driver's hash compare.
      .orderBy($"l_orderkey", $"l_linenumber", $"safe_div",
        $"cast_ok", $"cast_bad", $"safe_elem")
  }

  val fnTrySql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity / NULLIF(l_linenumber - 1, 0) AS safe_div,
      |  TRY_CAST(CAST(l_orderkey AS VARCHAR) AS INTEGER) AS cast_ok,
      |  TRY_CAST(l_returnflag AS INTEGER) AS cast_bad,
      |  ([l_returnflag, l_linestatus])[l_linenumber] AS safe_elem
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, safe_div,
      |  cast_ok, cast_bad, safe_elem""".stripMargin

  /** Higher-order array functions as a surfaced family: transform /
    * filter / exists / forall / aggregate over the token array — the
    * codegen'd lambda calculus that replaces per-row UDFs (each HOF
    * inlines into the same whole-stage-codegen span as the
    * surrounding projection; a Scala UDF would box every array).
    * DuckDB has no forall/exists, so the oracle rewrites both as
    * filter-count identities — which is also their definition. */
  def fnHof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", split(lower($"text"), " ").as("ws"))
      .select($"doc_id",
        expr("CAST(size(filter(ws, w -> length(w) > 5)) AS INT)").as("n_long"),
        expr("forall(ws, w -> w rlike '^[a-z]+$')").as("all_alpha"),
        expr("exists(ws, w -> w rlike '^[0-9]+$')").as("any_num"),
        expr("array_max(transform(ws, w -> length(w)))").as("longest"),
        expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("total_chars"))
      .orderBy($"doc_id")
  }

  val fnHofSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(ws, w -> length(w) > 5)) AS INTEGER) AS n_long,
      |  len(list_filter(ws, w -> NOT regexp_matches(w, '^[a-z]+$'))) = 0
      |    AS all_alpha,
      |  len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$'))) > 0
      |    AS any_num,
      |  list_max(list_transform(ws, w -> length(w))) AS longest,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(ws, w -> CAST(length(w) AS BIGINT))),
      |    (acc, x) -> acc + x) AS BIGINT) AS total_chars
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Levenshtein fuzzy matching over the corpus vocabulary: all
    * distinct-token pairs within edit distance ≤ 2 plus a normalized
    * similarity — the spelling-variant detector a text-cleaning
    * pipeline runs before token-level dedup. The pair space is the
    * DISTINCT vocabulary (corpus-bounded, ≪ corpus rows), so the
    * triangular self-join is broadcast with a cheap length-difference
    * band (|len_a − len_b| ≤ 2, a true edit-distance lower bound)
    * pre-filtering pairs before the O(len²) distance kernel runs. At
    * 100 TB the vocabulary still fits the broadcast side under a
    * doc-frequency cap ([[DedupOps]] stop-shingle pattern); for an
    * unboundable domain you'd block by (length, prefix) keys instead
    * of broadcasting — same bands, shuffled. Distance is integer and
    * identical across engines; the one division is rnd6'd. */
  def fnEditdist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Udfs.rnd6
    val vocab = TextOps.tokens(spark, sfDir).select($"tok").distinct()
    val rhs = vocab.select($"tok".as("tok_b"))
    vocab.select($"tok".as("tok_a"))
      .join(broadcast(rhs), $"tok_a" < $"tok_b" &&
        abs(length($"tok_a") - length($"tok_b")) <= 2)
      .withColumn("dist", levenshtein($"tok_a", $"tok_b"))
      .filter($"dist" <= 2)
      .select($"tok_a", $"tok_b", $"dist",
        rnd6(lit(1.0) - $"dist".cast("double") /
          greatest(length($"tok_a"), length($"tok_b"))).as("sim"))
      .orderBy($"tok_a", $"tok_b")
  }

  val fnEditdistSql: String = {
    import graft.functions.Udfs.sqlRnd6
    s"""WITH vocab AS (
       |  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |pairs AS (
       |  SELECT a.tok AS tok_a, b.tok AS tok_b,
       |    CAST(levenshtein(a.tok, b.tok) AS INTEGER) AS dist
       |  FROM vocab a JOIN vocab b
       |    ON a.tok < b.tok AND abs(length(a.tok) - length(b.tok)) <= 2)
       |SELECT tok_a, tok_b, dist,
       |  ${sqlRnd6("1.0 - CAST(dist AS DOUBLE) / " +
      "greatest(length(tok_a), length(tok_b))")} AS sim
       |FROM pairs WHERE dist <= 2
       |ORDER BY tok_a, tok_b""".stripMargin
  }

  /** Spark 4 COLLATION support (`collate(col, 'UTF8_LCASE')`):
    * case-insensitive GROUP BY, equality filter, and case-insensitive
    * `contains` — all evaluated by the collation-aware comparators in
    * the engine (one grouping pass; no per-row lower() copies of the
    * data in the grouping key path, which at 100 TB is a real
    * allocation saving on wide string columns). The fixture's segment
    * strings are re-cased deterministically by key (lower / Initcap /
    * UPPER by custkey mod 3) so the collation actually has work to do;
    * the group key is emitted re-collated to binary + lowercased so
    * the OUTPUT is a plain deterministic string. The oracle spells the
    * same semantics the portable way (lower() everywhere) — identical
    * result, different evaluation machinery, which is the point. */
  def fnCollation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select($"c_custkey",
        expr("""CASE CAST(c_custkey % 3 AS INT)
                |  WHEN 0 THEN lower(c_mktsegment)
                |  WHEN 1 THEN initcap(lower(c_mktsegment))
                |  ELSE upper(c_mktsegment) END""".stripMargin).as("seg_mixed"))
      .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("seg_ci"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct($"seg_mixed").as("n_casings"),
        sum(when(expr(
          "collate(seg_mixed, 'UTF8_LCASE') = collate('building', 'UTF8_LCASE')"),
          1).otherwise(0)).as("is_building"),
        sum(when(expr(
          "contains(collate(seg_mixed, 'UTF8_LCASE'), collate('MACH', 'UTF8_LCASE'))"),
          1).otherwise(0)).as("has_mach"))
      .select(lower(expr("collate(seg_ci, 'UTF8_BINARY')")).as("seg"),
        $"n_rows", $"n_casings", $"is_building", $"has_mach")
      .orderBy($"seg")
  }

  val fnCollationSql: String =
    """WITH cased AS (
      |  SELECT c_custkey,
      |    CASE CAST(c_custkey % 3 AS INTEGER)
      |      WHEN 0 THEN lower(c_mktsegment)
      |      WHEN 1 THEN upper(substring(lower(c_mktsegment), 1, 1))
      |        || substring(lower(c_mktsegment), 2)
      |      ELSE upper(c_mktsegment) END AS seg_mixed
      |  FROM customer)
      |SELECT lower(seg_mixed) AS seg, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT seg_mixed) AS n_casings,
      |  CAST(SUM(CASE WHEN lower(seg_mixed) = 'building'
      |    THEN 1 ELSE 0 END) AS BIGINT) AS is_building,
      |  CAST(SUM(CASE WHEN contains(lower(seg_mixed), lower('MACH'))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS has_mach
      |FROM cased GROUP BY lower(seg_mixed)
      |ORDER BY seg""".stripMargin
}
