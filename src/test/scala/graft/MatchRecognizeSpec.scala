package graft

import org.apache.spark.sql.functions._
import graft.plans.MatchRecognize

/** Row-pattern semantics on crafted sequences: skip modes, greedy
  * leftmost matching, undefined-row breaks, measures, errors. */
class MatchRecognizeSpec extends SparkSpec {

  private def seqDf(s: String) = {
    import spark.implicits._
    s.zipWithIndex.map { case (c, i) => (1L, i.toLong, c.toString) }
      .toDF("u", "i", "t")
  }

  private def run(s: String, pattern: String,
      skip: MatchRecognize.AfterMatchSkip = MatchRecognize.SkipPastLastRow) = {
    import spark.implicits._
    MatchRecognize(seqDf(s), "u", Seq("i"),
      Seq("V" -> ($"t" === "v"), "C" -> ($"t" === "c"),
        "P" -> ($"t" === "p")),
      pattern, skip)
      .orderBy($"match_no")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))) // (no, first, last)
      .toSeq
  }

  test("leftmost-greedy non-overlapping matches with exact positions") {
    // vccp | vp | (x breaks) | vp
    assert(run("vccpvpxvp", "V C* P") ==
      Seq((1, 1, 4), (2, 5, 6), (3, 8, 9)))
  }

  test("greediness: C* consumes the whole click run") {
    assert(run("vcccccp", "V C* P") == Seq((1, 1, 7)))
  }

  test("SKIP TO NEXT ROW yields overlapping matches") {
    assert(run("cccc", "C C") == Seq((1, 1, 2), (2, 3, 4)))
    assert(run("cccc", "C C", MatchRecognize.SkipToNextRow) ==
      Seq((1, 1, 2), (2, 2, 3), (3, 3, 4)))
  }

  test("rows defined by no variable hard-break patterns") {
    assert(run("vxp", "V P") == Seq.empty, "filler row must break V P")
    assert(run("vp", "V P") == Seq((1, 1, 2)))
  }

  test("alternation and quantified groups work as regex composition") {
    assert(run("vpcp", "(V | C) P") == Seq((1, 1, 2), (2, 3, 4)))
    assert(run("vcvcp", "(V C){2} P") == Seq((1, 1, 5)))
  }

  test("per-variable CLASSIFIER counts are exact") {
    import spark.implicits._
    val row = MatchRecognize(seqDf("vccp"), "u", Seq("i"),
      Seq("V" -> ($"t" === "v"), "C" -> ($"t" === "c"),
        "P" -> ($"t" === "p")), "V C* P").collect()(0)
    assert(row.getAs[Int]("n_rows") == 4)
    assert(row.getAs[Int]("n_v") == 1)
    assert(row.getAs[Int]("n_c") == 2)
    assert(row.getAs[Int]("n_p") == 1)
  }

  test("an undefined pattern variable fails loudly") {
    intercept[IllegalArgumentException](run("vp", "V Q"))
  }

  test("multiple partitions match independently") {
    import spark.implicits._
    val df = Seq((1L, 0L, "v"), (1L, 1L, "p"), (2L, 0L, "v"),
      (2L, 1L, "c"), (2L, 2L, "p")).toDF("u", "i", "t")
    val out = MatchRecognize(df, "u", Seq("i"),
      Seq("V" -> ($"t" === "v"), "C" -> ($"t" === "c"),
        "P" -> ($"t" === "p")), "V C* P")
      .orderBy($"u").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(4))).toSeq ==
      Seq((1L, 2), (2L, 3))) // (user, n_rows)
  }

  test("empty-capable patterns never emit zero-width matches") {
    // `C*` matches the empty string at every position; a naive scan
    // would emit bogus n_rows=0 rows (and with measures, index past
    // the end of the partition) — all zero-width matches are skipped
    assert(run("vvv", "C*") == Seq.empty)
    assert(run("vcv", "C*") == Seq((1, 2, 2)), "only the width-1 run")
    assert(run("vp", "C? P") == Seq((1, 2, 2)),
      "optional var absent: match is just the P row")
    // measures navigate FIRST()/LAST() — the crash path for
    // zero-width matches at the partition edges
    import spark.implicits._
    val out = MatchRecognize(seqDf("cvc"), "u", Seq("i"),
      Seq("V" -> ($"t" === "v"), "C" -> ($"t" === "c"),
        "P" -> ($"t" === "p")), "V?",
      measuresFor = Seq("i"))
      .orderBy($"match_no").collect()
    assert(out.length == 1 && out(0).getAs[Int]("n_rows") == 1)
    assert(out(0).getAs[Long]("first_i") == 1L &&
      out(0).getAs[Long]("last_i") == 1L)
  }

  test("SQL text front end produces the identical result to the Scala route") {
    import spark.implicits._
    import graft.plans.MatchRecognizeSql
    val df = seqDf("vccpvpxvp")
    val viaSql = MatchRecognizeSql.sql(spark,
      """SELECT * FROM seq
        |MATCH_RECOGNIZE (
        |  PARTITION BY u
        |  ORDER BY i
        |  MEASURES FIRST(i), LAST(i)
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C* P)
        |  DEFINE V AS t = 'v', C AS t = 'c', P AS t = 'p'
        |)""".stripMargin, _ => df)
      .orderBy($"match_no").collect().toSeq
    val viaScala = MatchRecognize(df, "u", Seq("i"),
      Seq("V" -> ($"t" === "v"), "C" -> ($"t" === "c"),
        "P" -> ($"t" === "p")), "V C* P",
      measuresFor = Seq("i"))
      .orderBy($"match_no").collect().toSeq
    assert(viaSql == viaScala,
      "the SQL parse must map onto the operator with zero drift")
  }

  test("SQL front end: SKIP TO NEXT ROW, nested pattern parens, rich DEFINEs") {
    import graft.plans.MatchRecognizeSql
    val p = MatchRecognizeSql.parse(
      """SELECT * FROM t
        |MATCH_RECOGNIZE (
        |  PARTITION BY k
        |  ORDER BY a, b
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN ((V C)+ P?)
        |  DEFINE V AS x IN ('v', 'w'), C AS coalesce(y, 0) > least(1, 2),
        |    P AS x = 'p'
        |)""".stripMargin)
    assert(p.afterMatch == graft.plans.MatchRecognize.SkipToNextRow)
    assert(p.pattern == "(V C)+ P?",
      s"balanced-paren pattern extraction broke: '${p.pattern}'")
    assert(p.orderBy == Seq("a", "b") && p.partitionBy == "k")
    assert(p.define == Seq("V" -> "x IN ('v', 'w')",
      "C" -> "coalesce(y, 0) > least(1, 2)", "P" -> "x = 'p'"),
      "top-level comma split must not break inside function parens")
    assert(p.measures.isEmpty)
  }

  test("SQL front end rejects malformed statements loudly") {
    import graft.plans.MatchRecognizeSql
    def bad(s: String) =
      intercept[IllegalArgumentException](MatchRecognizeSql.parse(s))
    assert(bad("SELECT x FROM t").getMessage.contains("MATCH_RECOGNIZE"))
    assert(bad(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  ORDER BY a PATTERN (V) DEFINE V AS x = 1)""".stripMargin)
      .getMessage.contains("PARTITION BY"))
    assert(bad(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY a
        |  MEASURES SUM(x) PATTERN (V) DEFINE V AS x = 1)""".stripMargin)
      .getMessage.contains("FIRST(col)/LAST(col)"))
    assert(bad(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY a PATTERN (V) DEFINE V)""".stripMargin)
      .getMessage.contains("not '<var> AS <predicate>'"))
  }
}
