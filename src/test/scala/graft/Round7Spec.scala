package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, FnOps}

/** Round-5 sixth session: deletion-neighborhood fuzzy join and the
  * other operators added this session. */
class Round7Spec extends SparkSpec {

  test("q_dedup_fastss: equals the triangular editdist join at d<=2") {
    import spark.implicits._
    // the broadcast triangular join is the exactness reference; the
    // FastSS index must find exactly its dist<=2 pairs (len >= 3)
    val reference = FnOps.fnEditdist(spark, sf)
      .filter(length($"tok_a") >= 3 && length($"tok_b") >= 3)
      .select($"tok_a", $"tok_b", $"dist")
    val fastss = DedupOps.dedupFastss(spark, sf)
      .select($"tok_a", $"tok_b", $"dist")
    assert(fastss.exceptAll(reference).isEmpty,
      "FastSS produced a pair the triangular join does not have")
    assert(reference.exceptAll(fastss).isEmpty,
      "FastSS missed a dist<=2 pair (deletion neighborhood incomplete)")
    assert(fastss.count() > 0, "no dist<=2 pairs at this SF — fixture drift?")
  }

  test("q_dedup_fastss: variant-key fan-in is alphabet-bounded") {
    import spark.implicits._
    // the scale claim: no variant bucket can explode — its producer
    // count is bounded by 1 + (m+1)|A| + ((m+1)(m+2)/2)|A|^2
    val vocab = graft.engine.Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .distinct().filter(length($"tok") >= 3)
    def del(df: org.apache.spark.sql.DataFrame, in: String, out: String) =
      df.select($"tok", explode(expr(s"sequence(0, length($in))")).as("i"),
          col(in))
        .select($"tok",
          when($"i" === 0, col(in))
            .otherwise(concat(
              expr(s"substring($in, 1, i - 1)"),
              expr(s"substring($in, i + 1, length($in))"))).as(out))
        .distinct()
    val d1 = del(vocab.select($"tok", $"tok".as("v0")), "v0", "v1")
    val variants = del(d1, "v1", "v")
    val worst = variants.groupBy($"v")
      .agg(count(lit(1)).as("fanin"), max(length($"v")).as("m"))
      .agg(max(expr(
        "fanin - (1 + (m + 1) * 26 + ((m + 1) * (m + 2) div 2) * 26 * 26)"))
        .as("excess"))
      .head().getLong(0)
    assert(worst <= 0, s"variant fan-in exceeded the alphabet bound by $worst")
  }
}
