package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** SQL-TEXT front end for [[MatchRecognize]] — the missing
  * `spark.sql` reach for the one SQL:2016 analytics feature the
  * library otherwise exposes only through Scala. A minimal
  * clause-grammar parser (not a fork of Spark's ANTLR parser: the
  * clause is self-contained, so a grammar-true recursive split is
  * ~100 lines and zero dependencies) maps the standard's surface
  * onto the operator:
  *
  * {{{
  * SELECT * FROM events
  * MATCH_RECOGNIZE (
  *   PARTITION BY user_id
  *   ORDER BY ts, event_id
  *   MEASURES FIRST(event_id), LAST(event_id)
  *   AFTER MATCH SKIP PAST LAST ROW        -- or: SKIP TO NEXT ROW
  *   PATTERN (V C* P)
  *   DEFINE
  *     V AS event_type = 'view',
  *     C AS event_type = 'click',
  *     P AS event_type = 'purchase'
  * )
  * }}}
  *
  * DEFINE predicates are arbitrary Spark SQL boolean expressions
  * (parsed with `expr`, so the full scalar-function surface works);
  * PATTERN text passes through to the operator's regex compiler
  * (`* + ? | () {n,m}`); MEASURES accepts FIRST(col)/LAST(col)
  * navigation (the operator's positional + CLASSIFIER-count measures
  * are always emitted, per its contract). Table resolution is by the
  * caller-supplied resolver, so the front end composes with any
  * source the engine reads. Execution cost is identical to the Scala
  * route — the parse produces the same plan. */
object MatchRecognizeSql {

  final case class Parsed(
      table: String,
      partitionBy: String,
      orderBy: Seq[String],
      measures: Seq[String],
      afterMatch: MatchRecognize.AfterMatchSkip,
      pattern: String,
      define: Seq[(String, String)])

  private val stmtRx =
    raw"(?is)\s*SELECT\s+\*\s+FROM\s+([A-Za-z_][A-Za-z_0-9]*)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*".r

  /** Split `s` on top-level commas (depth-0 w.r.t. parentheses). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(sql: String): Parsed = {
    val (table, body) = sql match {
      case stmtRx(t, b) => (t, b)
      case _ => throw new IllegalArgumentException(
        "expected: SELECT * FROM <table> MATCH_RECOGNIZE ( ... )")
    }
    def clause(name: String, rx: String): Option[String] =
      s"(?is)$rx".r.findFirstMatchIn(body).map(_.group(1).trim)
    def required(name: String, rx: String): String =
      clause(name, rx).getOrElse(throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE clause missing: $name"))

    val partitionBy = required("PARTITION BY",
      raw"PARTITION\s+BY\s+([A-Za-z_][A-Za-z_0-9]*)")
    val orderBy = splitTop(required("ORDER BY",
      raw"ORDER\s+BY\s+((?:[A-Za-z_][A-Za-z_0-9]*\s*,\s*)*[A-Za-z_][A-Za-z_0-9]*)"))
    val measures = clause("MEASURES",
      raw"MEASURES\s+(.*?)\s+(?:AFTER|PATTERN)\b")
      .map(splitTop).getOrElse(Nil)
      .map { m =>
        val f = raw"(?i)(FIRST|LAST)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)".r
        m match {
          case f(_, c) => c
          case other => throw new IllegalArgumentException(
            s"unsupported measure '$other' — FIRST(col)/LAST(col) only")
        }
      }.distinct
    val afterMatch = clause("AFTER MATCH",
      raw"AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)")
      .map(_.replaceAll(raw"(?s)\s+", " ").toUpperCase) match {
      case None | Some("PAST LAST ROW") => MatchRecognize.SkipPastLastRow
      case Some("TO NEXT ROW") => MatchRecognize.SkipToNextRow
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported AFTER MATCH SKIP $other")
    }
    // PATTERN's parens may nest (grouping/quantifiers) — take the
    // balanced span, not the first ')'
    val pattern = {
      val m = raw"(?is)PATTERN\s*\(".r.findFirstMatchIn(body)
        .getOrElse(throw new IllegalArgumentException(
          "MATCH_RECOGNIZE clause missing: PATTERN"))
      var depth = 1
      var i = m.end
      while (depth > 0 && i < body.length) {
        body(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      require(depth == 0, "unbalanced parens in PATTERN")
      body.substring(m.end, i - 1).trim
    }
    val defineBody = required("DEFINE", raw"DEFINE\s+(.*)\z")
    val defRx = raw"(?is)([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.*)".r
    val define = splitTop(defineBody).map {
      case defRx(name, pred) => name -> pred.trim
      case other => throw new IllegalArgumentException(
        s"DEFINE entry '$other' is not '<var> AS <predicate>'")
    }
    require(define.nonEmpty, "DEFINE must name at least one variable")
    Parsed(table, partitionBy, orderBy, measures, afterMatch, pattern,
      define)
  }

  /** Parse and run: `resolve` maps the FROM table name to its
    * DataFrame (temp views, catalog tables, fixture readers — any
    * source). */
  def sql(spark: SparkSession, text: String,
      resolve: String => DataFrame): DataFrame = {
    val p = parse(text)
    MatchRecognize(
      resolve(p.table),
      partitionBy = p.partitionBy,
      orderBy = p.orderBy,
      define = p.define.map { case (n, pred) => n -> expr(pred) },
      pattern = p.pattern,
      afterMatch = p.afterMatch,
      measuresFor = p.measures)
  }
}
