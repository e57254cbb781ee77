package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Round-5 fifth session: quality-weighted survivorship, the
  * prefix-filtered similarity join, and the cross-split leakage gate. */
class Round6Spec extends SparkSpec {

  test("q_dedup_prefix_filter: prefix index prunes the candidate space") {
    import spark.implicits._
    val sh = DedupOps.rawShingles(graft.engine.Tables.documents(spark, sf))
      .persist()
    try {
      // brute-force candidate pairs: every pair sharing ANY shingle
      val a = sh.select($"doc_id".as("da"), $"shingle")
      val b = sh.select($"doc_id".as("db"), $"shingle".as("sb"))
      val brute = a.join(b, $"shingle" === $"sb" && $"da" < $"db")
        .select($"da", $"db").distinct().count()
      // prefix candidates: pairs colliding inside both docs' prefixes
      val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val dfreq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df".asc, $"shingle".asc)
      val prefix = sh.join(dfreq, "shingle")
        .withColumn("pos", row_number().over(w))
        .join(counts, "doc_id")
        .filter(expr("pos <= n_sh - (n_sh + 1) div 2 + 1"))
        .select($"doc_id", $"shingle")
      val pruned = prefix.as("pa").join(prefix.as("pb"),
          $"pa.shingle" === $"pb.shingle" && $"pa.doc_id" < $"pb.doc_id")
        .select($"pa.doc_id", $"pb.doc_id").distinct().count()
      // the filter must prune, and every J≥0.5 pair must survive it
      assert(pruned < brute,
        s"prefix filter pruned nothing: $pruned vs brute $brute")
      val results = DedupOps.dedupPrefixFilter(spark, sf).count()
      assert(results > 0, "no J>=0.5 pairs at this SF — fixture drift?")
      assert(results <= pruned,
        s"more results ($results) than candidates ($pruned)?")
    } finally { sh.unpersist(); () }
  }

  test("q_dedup_keep_best: one survivor per cluster, quality-dominant") {
    import spark.implicits._
    val best = DedupOps.dedupKeepBest(spark, sf).persist()
    try {
      val clusters = DedupOps.dedupCluster(spark, sf)
        .select($"cluster_id").distinct().count()
      assert(best.count() == clusters,
        "keep-best must emit exactly one row per cluster")
      assert(best.select($"cluster_id").distinct().count() == clusters,
        "duplicate cluster ids in keep-best output")
      // the chosen quality must equal the max quality over the
      // cluster's members (recomputed independently here)
      val q = graft.engine.Tables.documents(spark, sf)
        .select($"doc_id",
          size(array_distinct(split(lower($"text"), " "))).as("nu"),
          size(split($"text", " ")).cast("long").as("ntok"),
          expr("length(regexp_replace(text, '[a-z0-9 ]', ''))").as("np"),
          length($"text").as("nc"))
        .select($"doc_id", graft.functions.Udfs.rnd6(
          ($"nu" / $"ntok") * 0.4
            + least($"ntok" / 100.0, lit(1.0)) * 0.3
            + (lit(1.0) - $"np" / $"nc") * 0.3).as("q"))
      val maxQ = DedupOps.dedupCluster(spark, sf).join(q, "doc_id")
        .groupBy($"cluster_id").agg(max($"q").as("max_q"))
      val viol = best.join(maxQ, "cluster_id")
        .filter($"quality" =!= $"max_q").count()
      assert(viol == 0, s"$viol clusters kept a non-best-quality doc")
    } finally { best.unpersist(); () }
  }

  test("q_stream_stream_outer: emits the unmatched-purchase null rows") {
    import spark.implicits._
    val outer = graft.streaming.StreamOps.streamStreamOuter(spark, sf)
      .persist()
    try {
      val nulls = outer.filter($"click_id".isNull).count()
      assert(nulls > 0,
        "outer join emitted no null-extended rows — state never evicted?")
      // the matched subset must equal the inner stream-stream join
      val inner = graft.streaming.StreamOps.streamStreamJoin(spark, sf)
      val matched = outer.filter($"click_id".isNotNull)
      assert(matched.count() == inner.count(),
        "outer's matched rows disagree with the inner join")
    } finally { outer.unpersist(); () }
  }

  test("q_split_leakage: pair counts reconcile with the near-dup stream") {
    import spark.implicits._
    val leak = DedupOps.splitLeakage(spark, sf).collect()
    val totalPairs = leak.map(_.getLong(2)).sum
    val nearCount = DedupOps.dedupNear(spark, sf).count()
    assert(totalPairs == nearCount,
      s"split buckets lost pairs: $totalPairs vs $nearCount")
    // split labels are only the three expected values
    val labels = leak.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(labels.subsetOf(Set("train", "val", "test")),
      s"unexpected split labels: $labels")
  }
}
