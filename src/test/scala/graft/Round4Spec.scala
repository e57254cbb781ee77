package graft

import org.apache.spark.sql.functions._
import graft.operators.{CfOps, GraphOps}

/** Round-4 additions: data-dependent PageRank convergence and the
  * implicit-feedback ALS variant (both iterative — no SQL oracle, so
  * their correctness story lives here). */
class Round4Spec extends SparkSpec {

  test("pagerank converges to a stable fixpoint under a data-dependent delta test") {
    val eps = 10000000L // 1e7 units = 1e-5 rank mass
    val (ranks, iters) = GraphOps.pagerankConverged(spark, sf, eps)
    // loop exit with iters < maxIters proves max per-node delta < eps
    assert(iters > 0 && iters < 60, s"did not converge: iters=$iters")
    val prs = ranks.collect().map(_.getDouble(1))
    assert(prs.forall(p => p > 0.0 && p < 1.0))
    // fixed-point truncation drifts mass only DOWN, and only slightly
    val mass = prs.sum
    assert(mass <= 1.0 + 1e-9 && mass > 0.98, s"mass=$mass")
    // integer arithmetic ⇒ the converged ranks are rerun-identical
    val (again, iters2) = GraphOps.pagerankConverged(spark, sf, eps)
    assert(iters2 == iters)
    assert(again.collect().toSeq == ranks.collect().toSeq)
  }

  test("implicit-feedback ALS is seed-stable and ranks interacted items above chance") {
    import spark.implicits._
    val a = CfOps.alsImplicit(spark, sf).collect()
    val b = CfOps.alsImplicit(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "seeded implicit ALS must be rerun-stable")
    assert(a.nonEmpty)
    // ranking bound: implicit ALS reconstructs confidence-weighted
    // preference, so a user's top-10 should contain at least one item
    // they actually interacted with far more often than a random
    // top-10 would (10/n_items per draw)
    val recs = CfOps.alsImplicit(spark, sf).select($"user_id", $"item_id")
    val seen = CfOps.ratingsDerive(spark, sf).select($"user_id", $"item_id")
    val nUsers = recs.select($"user_id").distinct().count().toDouble
    val nItems = seen.select($"item_id").distinct().count().toDouble
    val hitUsers = recs.join(seen, Seq("user_id", "item_id"), "inner")
      .select($"user_id").distinct().count().toDouble
    val hitRate = hitUsers / nUsers
    val chance = math.min(1.0, 10.0 / nItems * 10.0) // ≈ P(≥1 hit) upper bound × slack
    assert(hitRate > math.max(0.2, chance),
      s"hitRate=$hitRate chance≈$chance nItems=$nItems — factorization is not ranking")
  }

  test("TopKPerKey matches window top-k on adversarial random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // seeded generator: heavy key skew (key 0 gets ~half the rows),
    // duplicate (v, id) sort keys, k larger than some groups
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(3000)((
      if (rnd.nextBoolean()) 0L else rnd.nextInt(40).toLong,
      rnd.nextInt(25), rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v", "id").repartition(7)
    val native = graft.plans.TopKPerKey
      .topK(df, Seq("k"), Seq("v" -> false, "id" -> true), 4, "rk")
      .select($"k", $"v", $"id", $"rk")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val win = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 4).select($"k", $"v", $"id", $"rk")
    val (n, wn) = (native.collect(), win.collect())
    assert(n.length == wn.length)
    // rows with duplicate (v, id) sort keys are interchangeable at the
    // rank boundary, so compare as multisets of identical rows
    assert(n.groupBy(identity).view.mapValues(_.length).toMap ==
      wn.groupBy(identity).view.mapValues(_.length).toMap,
      "native top-k diverged from the window formulation")
  }

  test("count-min estimates dominate exact counts within the eps*N bound") {
    import spark.implicits._
    val rows = graft.operators.AggOps.aggCountmin(spark, sf)
      .select($"cnt", $"est").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = graft.engine.Tables.lineitem(spark, sf).count()
    val slack = (0.00048828125 * n).toLong + 1
    // one-sided dominance is a hard CMS guarantee — assert per key
    rows.foreach { case (cnt, est) =>
      assert(est >= cnt, s"CMS under-counted: est=$est < exact=$cnt")
    }
    // the eps*N error bound holds per query only with prob 1-delta
    // (delta = 1%), so with dozens of candidate keys the all-pass
    // probability is materially below 1 on arbitrary data — assert a
    // large fraction instead of every key
    val within = rows.count { case (cnt, est) => est <= cnt + slack }
    assert(within >= math.ceil(rows.length * 0.95).toInt,
      s"only $within/${rows.length} CMS estimates within eps*N=$slack")
    // counter merges are long additions — repartition cannot change bytes
    val again = graft.operators.AggOps.aggCountmin(spark, sf)
      .select($"cnt", $"est").as[(Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("degree-oriented triangle counts match a naive in-memory enumeration") {
    import spark.implicits._
    // independent witness: enumerate triangles by brute force over the
    // same pair graph, driver-side (fixture graph is small)
    val pairs = CfOps.userCosine(spark, sf)
      .select($"user_a", $"user_b").as[(Long, Long)].collect()
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val naive = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- pairs; c <- adj(a) if c > b && adj(b).contains(c)) {
      for (v <- Seq(a, b, c)) naive(v) = naive.getOrElse(v, 0L) + 1L
    }
    val got = GraphOps.graphTriangles(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == naive.toMap,
      s"oriented enumeration disagrees with naive: got=${got.size} naive=${naive.size}")
    // degree histogram mass = node count of the pair graph
    val histMass = GraphOps.graphDegrees(spark, sf)
      .agg(sum($"n_users")).collect()(0).getLong(0)
    assert(histMass == adj.size)
  }
}
