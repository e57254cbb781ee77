package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-5 hardening: cache lifecycle, idempotent foreachBatch sink,
  * and physical partition pruning for the LSH similarity layout. */
class Round5Spec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("DfCache evicts and unpersists other scale-factor scopes") {
    import spark.implicits._
    val c = new graft.engine.DfCache
    val a = c(spark, "/tmp/sfA", "x")(spark.range(10).toDF("v"))
    a.count()
    assert(a.storageLevel != StorageLevel.NONE, "first scope not persisted")
    val b = c(spark, "/tmp/sfB", "x")(spark.range(5).toDF("v"))
    b.count()
    // requesting a NEW sfDir scope must evict + unpersist the old one
    assert(a.storageLevel == StorageLevel.NONE,
      "old scope's DataFrame still persisted after scope switch")
    assert(b.storageLevel != StorageLevel.NONE)
    val scopes = c.snapshot.keySet.map(_._1)
    assert(scopes.size == 1 && scopes.head.endsWith("/tmp/sfB"),
      s"expected only the new scope to survive, got $scopes")
    // values still CORRECT after eviction (recompute, not failure)
    assert(a.as[Long].collect().sorted.toSeq == (0L until 10L))
  }

  test("foreachBatch dynamic-overwrite sink is idempotent under batch re-delivery") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_feb_idem").toFile.getAbsolutePath
    val b0 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("event_id", "k", "value")
    val b1 = Seq((3L, "c", 3.0)).toDF("event_id", "k", "value")
    graft.streaming.StreamOps.febWrite(out)(b0, 0L)
    graft.streaming.StreamOps.febWrite(out)(b1, 1L)
    val before = spark.read.parquet(out)
      .select($"event_id", $"k", $"value", $"batch_id".cast("long"))
      .collect().map(_.toString).sorted.toSeq
    // retry/duplicate delivery of batch 0: same data, same batch id —
    // the partition is REPLACED, not appended to
    graft.streaming.StreamOps.febWrite(out)(b0, 0L)
    val after = spark.read.parquet(out)
      .select($"event_id", $"k", $"value", $"batch_id".cast("long"))
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "re-delivered batch changed the sink contents")
    assert(before.length == 3)
  }

  test("LSH pruned search reads only the probed bucket partitions via DPP") {
    val df = graft.operators.SimOps.simsearchLshPruned(spark, sf)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("emb_lsh"))
        => f
    }
    assert(scans.nonEmpty, "expected a scan over the partitioned LSH layout")
    assert(scans.exists(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .DynamicPruningExpression]))),
      s"expected a DynamicPruningExpression partition filter on the " +
        s"bucket-partitioned layout:\n${df.queryExecution.executedPlan}")
    // and the values agree with the in-join LSH form on the same data
    val pruned = df.collect().map(_.toString).toSeq
    val plain = graft.operators.SimOps.simsearchLsh(spark, sf)
      .collect().map(_.toString).toSeq
    assert(pruned == plain, "pruned-layout LSH disagrees with in-join LSH")
  }
}
