package graft

import org.apache.spark.sql.DataFrame

/** Round-18 pins: the two hard `broadcast()` hot paths now route
  * through Cbo.joinDerived — stats-estimated broadcast-vs-shuffle
  * instead of a hint that had to be removed by hand at scale. Each
  * test forces a tiny budget, pins the shuffle fallback in the
  * physical plan, and proves the fallback is byte-identical to the
  * broadcast plan's result. */
class Round18Spec extends SparkSpec {

  private def withBudget[A](bytes: Long)(body: => A): A = {
    spark.conf.set(graft.plans.Cbo.BROADCAST_BYTES_CONF, bytes.toString)
    try body
    finally spark.conf.unset(graft.plans.Cbo.BROADCAST_BYTES_CONF)
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dedupPrefixFilter degrades its derived build sides to shuffle " +
      "under a tiny budget, byte-identically") {
    val broad = graft.operators.DedupOps.dedupPrefixFilter(spark, sf)
    val pBroad = plan(broad)
    assert(pBroad.contains("BroadcastHashJoin"),
      s"default budget must keep the broadcast build sides:\n$pBroad")
    val rowsBroad = broad.collect().toSeq
    val (rowsShuf, pShuf) = withBudget(1L) {
      val shuf = graft.operators.DedupOps.dedupPrefixFilter(spark, sf)
      (shuf.collect().toSeq, plan(shuf))
    }
    // the candidate self-join keeps whatever shape Spark's own
    // planner picks (it is unhinted); the four DERIVED build sides
    // must all have flipped — pin each by its join key: dfreq joins
    // on shingle, counts on doc_id, the two set joins on doc_a/doc_b
    for (key <- Seq("shingle", "doc_id", "doc_a", "doc_b"))
      assert(pShuf.contains(s"SortMergeJoin [$key#"),
        s"tiny budget must shuffle the derived join on $key:\n$pShuf")
    for (key <- Seq("doc_a", "doc_b"))
      assert(!pShuf.contains(s"BroadcastHashJoin [$key#"),
        s"derived set join on $key must not broadcast under a tiny budget")
    assert(rowsShuf == rowsBroad,
      "shuffle fallback changed the result bytes")
  }

  test("cfNegativeSamples degrades the seen-pairs anti join to shuffle " +
      "under a tiny budget, byte-identically") {
    val broad = graft.operators.CfOps.cfNegativeSamples(spark, sf)
    val pBroad = plan(broad)
    assert(pBroad.contains("BroadcastHashJoin") &&
        pBroad.contains("LeftAnti"),
      s"default budget must broadcast the seen set for the anti join:\n$pBroad")
    val rowsBroad = broad.collect().toSeq
    val (rowsShuf, pShuf) = withBudget(1L) {
      val shuf = graft.operators.CfOps.cfNegativeSamples(spark, sf)
      (shuf.collect().toSeq, plan(shuf))
    }
    // the pool stays broadcast (sized by construction, not derived);
    // the SEEN anti join must have left the broadcast class
    assert(pShuf.contains("SortMergeJoin") && pShuf.contains("LeftAnti"),
      s"tiny budget must shuffle the seen anti join:\n$pShuf")
    assert(rowsShuf == rowsBroad,
      "shuffle fallback changed the result bytes")
  }
}
