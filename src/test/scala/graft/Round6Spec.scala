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

  test("q_embed_pq / q_simsearch_pq: codes in range, recall non-degenerate") {
    import spark.implicits._
    val pq = graft.operators.SimOps.embedPq(spark, sf).persist()
    try {
      val n = graft.engine.Tables.embeddings(spark, sf).count()
      assert(pq.count() == n, "PQ must code every vector")
      val bad = pq.filter(
        $"c0" < 0 || $"c0" > 7 || $"c1" < 0 || $"c1" > 7 ||
          $"c2" < 0 || $"c2" > 7 || $"c3" < 0 || $"c3" > 7 ||
          $"recon_err" < 0).count()
      assert(bad == 0, s"$bad vectors with out-of-range codes or negative error")
      // ADC must beat random guessing by a wide margin: recall@5 vs
      // 5/N chance. Mean recall over the 8 queries >= 0.2.
      val rec = graft.operators.SimOps.simsearchPqRecall(spark, sf)
        .agg(avg($"recall")).collect()(0).getDouble(0)
      assert(rec >= 0.2, s"PQ-ADC mean recall@5 degenerate: $rec")
    } finally { pq.unpersist(); () }
  }

  test("q_cf_mmr_rerank: 5 distinct items, head is the top-popular item") {
    import spark.implicits._
    val mmr = graft.operators.CfOps.cfMmrRerank(spark, sf).collect()
    assert(mmr.length == 5, s"expected 5 rows, got ${mmr.length}")
    assert(mmr.map(_.getLong(1)).distinct.length == 5,
      "MMR selected a duplicate item")
    // rank 1 must be the relevance argmax (rel = 1.0 after normalization)
    val first = mmr.find(_.getInt(0) == 1).get
    assert(math.abs(first.getDouble(2) - 1.0) < 1e-9,
      s"rank-1 item is not the top-popular candidate: rel=${first.getDouble(2)}")
    // mmr scores weakly decrease in rank (greedy argmax property)
    val scores = mmr.sortBy(_.getInt(0)).map(_.getDouble(3))
    // note: not strictly monotone in general MMR, but rank2..5 scores
    // cannot exceed rank1's pure-relevance score
    assert(scores.tail.forall(_ <= scores.head + 1e-9),
      s"later MMR score exceeds the rank-1 score: ${scores.toSeq}")
  }

  test("q_agg_bitmap_intersect: matches exact distinct-set arithmetic") {
    import spark.implicits._
    val bm = graft.operators.AggOps.aggBitmapIntersect(spark, sf)
      .filter($"type_a" === "click" && $"type_b" === "purchase")
      .collect()(0)
    val ev = graft.engine.Tables.events(spark, sf)
    val aSet = ev.filter($"event_type" === "click")
      .select($"user_id").distinct()
    val bSet = ev.filter($"event_type" === "purchase")
      .select($"user_id").distinct()
    val nBoth = aSet.intersect(bSet).count()
    assert(bm.getLong(2) == aSet.count(), "n_a mismatch vs exact distinct")
    assert(bm.getLong(3) == bSet.count(), "n_b mismatch vs exact distinct")
    assert(bm.getLong(4) == nBoth, "n_both mismatch vs exact intersection")
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
