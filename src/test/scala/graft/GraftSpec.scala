package graft

/** The facade must expose the full surface and return live DataFrames. */
class GraftSpec extends SparkSpec {

  test("facade methods delegate to the operator surface") {
    val g = Graft(spark, sf)
    assert(g.ratings().count() > 0)
    assert(g.dedupExact().count() > 0)
    assert(g.textQuality().count() > 0)
    assert(g.mergeChanges().count() > 0)
    assert(g.growthAccounting().count() > 0)
    assert(g.cleaningFunnel().count() > 0)
    // closing-session tier
    assert(g.dedupedCorpusKeepBest().count() > 0)
    assert(g.nextItemExamples().count() > 0)
    assert(g.vectorCodes().count() > 0)
    assert(g.candidateKeys().count() > 0)
    assert(g.audienceOverlap().count() > 0)
    assert(g.bpeMerges().count() > 0)
  }

  test("query() dispatches every registered operator name") {
    val g = Graft(spark, sf)
    assert(SparkEntry.queries.keySet.contains("q_agg_multi_key_pricing"))
    assert(g.query("q_agg_multi_key_pricing").count() > 0)
    intercept[NoSuchElementException] { g.query("q_nope") }
  }
}
