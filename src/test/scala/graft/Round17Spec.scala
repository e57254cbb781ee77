package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.streaming.{BatchOffset, EventsFileStream, EventsMicroBatchStream}

/** Round-17 pins: the sentinel-stagger admission boundary
  * (`onePerTriggerFrom`), clone back-ref robustness (corrupt refs are
  * stale, tags are collision-free), and the HNSW capped edge collect.
  */
class Round17Spec extends SparkSpec {

  private def stagedDir(nBatches: Int): String = {
    val dir = Files.createTempDirectory("graft_r17_staged_").toFile
    (0 until nBatches).foreach(i => new File(dir, s"batch=$i").mkdirs())
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  test("onePerTriggerFrom=3 walks 5 staged batches in exactly 3 " +
      "triggers: reals together, each sentinel alone") {
    val s = new EventsMicroBatchStream(stagedDir(5), 3,
      Long.MaxValue, EventsFileStream.SCHEMA, 3L)
    val o1 = s.latestOffset(BatchOffset(-1L), null)
    assert(o1 == BatchOffset(2L),
      s"trigger 1 must admit exactly the 3 real batches, got $o1")
    val o2 = s.latestOffset(BatchOffset(2L), null)
    assert(o2 == BatchOffset(3L),
      s"trigger 2 must admit ONLY sentinel batch 3, got $o2")
    val o3 = s.latestOffset(BatchOffset(3L), null)
    assert(o3 == BatchOffset(4L),
      s"trigger 3 must admit ONLY sentinel batch 4, got $o3")
  }

  test("onePerTriggerFrom never merges a boundary batch with earlier " +
      "ones even when maxPerTrigger would span the boundary") {
    // 2 reals + 2 sentinels, maxPerTrigger=4: without the boundary one
    // trigger would take everything; with it, reals stop AT the edge
    val s = new EventsMicroBatchStream(stagedDir(4), 4,
      Long.MaxValue, EventsFileStream.SCHEMA, 2L)
    assert(s.latestOffset(BatchOffset(-1L), null) == BatchOffset(1L))
    assert(s.latestOffset(BatchOffset(1L), null) == BatchOffset(2L))
    assert(s.latestOffset(BatchOffset(2L), null) == BatchOffset(3L))
  }

  test("onePerTriggerFrom=-1 keeps plain maxBatchesPerTrigger pacing") {
    val s = new EventsMicroBatchStream(stagedDir(5), 3,
      Long.MaxValue, EventsFileStream.SCHEMA, -1L)
    assert(s.latestOffset(BatchOffset(-1L), null) == BatchOffset(2L))
    assert(s.latestOffset(BatchOffset(2L), null) == BatchOffset(4L))
  }

  test("a truncated clone .ref is treated as stale (deleted), not " +
      "fatal to vacuum") {
    import graft.engine.TxnLog
    val root = Files.createTempDirectory("graft_r17_src_").toFile
      .getAbsolutePath
    TxnLog.destroy(root); TxnLog.init(root)
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val df = Seq(1L -> 10L, 2L -> 20L).toDF("key", "value")
      .withColumn("op", lit("upsert"))
    (1 to 3).foreach(_ =>
      TxnLog.commit(spark, root, _ => (df, Seq((1L, 2L)))))
    val log = new File(root, "_txn_log")
    Files.write(new File(log, "clone_deadbeef.ref").toPath,
      "no-pipe-here".getBytes(StandardCharsets.UTF_8))
    Files.write(new File(log, "clone_feedface.ref").toPath,
      "path|not_a_number".getBytes(StandardCharsets.UTF_8))
    TxnLog.vacuum(root, 1) // must not throw
    assert(!new File(log, "clone_deadbeef.ref").exists(),
      "corrupt ref must be garbage-collected")
    assert(!new File(log, "clone_feedface.ref").exists(),
      "unparseable-version ref must be garbage-collected")
  }

  test("two clones of the same source version to distinct roots pin " +
      "with DISTINCT refs (no 32-bit tag collisions)") {
    import graft.engine.TxnLog
    val src = Files.createTempDirectory("graft_r17_csrc_").toFile
      .getAbsolutePath
    TxnLog.destroy(src); TxnLog.init(src)
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val df = Seq(1L -> 10L, 2L -> 20L).toDF("key", "value")
      .withColumn("op", lit("upsert"))
    TxnLog.commit(spark, src, _ => (df, Seq((1L, 2L))))
    val d1 = Files.createTempDirectory("graft_r17_c1_").toFile
      .getAbsolutePath + "/t"
    val d2 = Files.createTempDirectory("graft_r17_c2_").toFile
      .getAbsolutePath + "/t"
    TxnLog.cloneShallow(src, d1)
    TxnLog.cloneShallow(src, d2)
    val refs = Option(new File(src, "_txn_log").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("clone_") &&
        f.getName.endsWith(".ref"))
    assert(refs.length == 2,
      s"each clone destination must own its own ref file, got " +
        refs.map(_.getName).mkString(", "))
  }
}
