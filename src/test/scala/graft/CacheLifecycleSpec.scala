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
        graft.operators.GraphOps.cache)) {
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

}
