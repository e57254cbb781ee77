package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Session-cache lifecycle: every per-(application, sfDir) cache in
  * the engine must evict other scopes when a new scope is touched —
  * a long-lived session sweeping many scale-factor directories holds
  * ONE directory's intermediates, relations, and replay rows, never
  * an unbounded accumulation. (DfCache's own eviction + unpersist is
  * covered in Round5Spec; this suite pins the operator instances and
  * the remaining caches.) */
class CacheLifecycleSpec extends SparkSpec {

  private def tinyDir(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_cls_$tag").toString
    Seq((1L, 10L)).toDF("a", "b").write.mode("overwrite")
      .parquet(s"$dir/region.parquet")
    dir
  }

  test("Tables.load evicts relations of other sfDir scopes") {
    val d1 = tinyDir("a")
    val d2 = tinyDir("b")
    Tables.load(spark, d1, "region")
    assert(Tables.relCacheKeys.exists(_.contains(d1)))
    Tables.load(spark, d2, "region")
    val keys = Tables.relCacheKeys
    assert(keys.exists(_.contains(d2)))
    assert(!keys.exists(_.contains(d1)),
      s"old scope must be evicted, got $keys")
    // restore the suite's fixture scope for later tests
    Tables.load(spark, sf, "region")
    ()
  }

  test("operator DfCache instances (CF, dedup, content) evict old scopes") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    for (cache <- Seq(graft.operators.CfOps.cache,
        graft.operators.DedupOps.cache, graft.operators.ContentOps.cache,
        graft.operators.GraphOps.cache, graft.operators.MlOps.cache)) {
      cache(spark, "/scopeA", "t1")(df)
      cache(spark, "/scopeA", "t2")(df)
      assert(cache.snapshot.keys.map(_._1).toSet.size == 1)
      cache(spark, "/scopeB", "t1")(df)
      val scopes = cache.snapshot.keys.map(_._1).toSet
      assert(scopes.size == 1 && scopes.head.endsWith("/scopeB"),
        s"stale scope survived: $scopes")
      // leave the cache empty for whoever runs next
      cache(spark, "/scopeC", "drop")(df)
    }
  }

  test("mlDbscan's returned plan reads the PERSISTED probe, not a recompute") {
    // The r11 verdict defect: a try/finally unpersist inside the
    // builder evicted the n×(n/m) probe before the caller's action,
    // so the border subtree recomputed the dominant stage at action
    // time. Pin: after building the frame, the probe is live in the
    // MlOps cache AND the returned physical plan scans the
    // InMemoryRelation (twice — degree/component chain and border).
    val df = graft.operators.MlOps.mlDbscan(spark, sf)
    assert(graft.operators.MlOps.cache.snapshot.keys
        .exists(k => k._1.endsWith(sf) && k._2 == "dbscan_nbr"),
      "dbscan probe must be live in the MlOps DfCache after build")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("InMemoryTableScan"),
      s"returned plan must read the persisted probe, got:\n$phys")
    // evict the sf-scoped probe before the next test: touching a
    // different scope unpersists it (this leaves one tiny dummy entry
    // under /scopeC — downstream assertions filter by sf-suffixed
    // scope, so the dummy is inert)
    graft.operators.MlOps.cache(spark, "/scopeC", "drop") {
      import spark.implicits._
      Seq((1L, 2L)).toDF("x", "y")
    }
    ()
  }

}
