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

  test("q_join_skew_aqe: OptimizeSkewedJoin splits the hot partition") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    // sf0.01: the hot partition must clear the (lowered) byte threshold;
    // at sf0.001 every partition is tiny and AQE coalesces instead.
    // The fixture parquet is ONE row group ⇒ one real map task, and a
    // skewed partition can only split at map-output boundaries — so
    // spread the fact over 16 mappers first (any multi-file layout at
    // scale does this for free).
    val sf01 = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    val J = graft.operators.JoinOps
    val fact = J.skewFact(spark, sf01).repartition(16, col("l_quantity"))
    val dim = J.skewDim(spark, sf01)
    val baseline = J.joinSkewAqe(spark, sf01).collect()
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = J.skewJoinShape(fact, dim)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      // query stages are LEAF nodes (their plan is an inner child) —
      // recurse through q.plan or collect sees nothing below a stage
      def allStages(p: SparkPlan): Seq[ShuffleQueryStageExec] = {
        val qs = p.collect { case q: QueryStageExec => q }
        qs.collect { case s: ShuffleQueryStageExec => s } ++
          qs.flatMap(q => allStages(q.plan))
      }
      val sizes = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec =>
          allStages(a.executedPlan).map { s =>
            s"stage${s.id}(mappers=${s.shuffle.numMappers})=[" +
              s.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("?") + "]"
          }.mkString(" ")
        case _ => "root is not adaptive"
      }
      assert(plan.contains("skew=true"),
        s"no skew-split in the adaptive plan; shuffle sizes: $sizes\n$plan")
      assert(rows.toSeq == baseline.toSeq,
        "skew-split changed the result bytes")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
