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

  Seq("q_tpch_q11", "q_graph_kcore").foreach { key =>
    test(s"$key returns rows at sf0.001 (scale-robust thresholds — " +
        "the sf0.1 sweep guards the other end)") {
      val df = SparkEntry.queries(key)(spark, sf)
      assert(df.limit(1).count() > 0,
        s"$key returned 0 rows — its oracle compare would be vacuous")
    }
  }

  test("widening law: only lossless promotions are accepted") {
    import graft.engine.TxnLog.isWidening
    assert(isWidening("int", "bigint"))
    assert(isWidening("int", "double"))
    assert(isWidening("float", "double"))
    assert(isWidening("int", "decimal(10,0)"))
    assert(isWidening("bigint", "decimal(20,0)"))
    assert(isWidening("decimal(10,2)", "decimal(12,2)"))
    assert(isWidening("decimal(10,2)", "decimal(14,4)"))
    assert(!isWidening("bigint", "int"), "narrowing must be refused")
    assert(!isWidening("double", "float"))
    assert(!isWidening("bigint", "bigint"), "no-op is not a widening")
    assert(!isWidening("bigint", "decimal(19,0)"),
      "decimal(19,0) cannot hold every bigint")
    assert(!isWidening("decimal(12,2)", "decimal(12,4)"),
      "scale growth at fixed precision loses integral digits")
    assert(!isWidening("int", "string"))
  }

  test("concurrent widen + insert: both commit through OCC, final " +
      "read is wide with every row") {
    import graft.engine.TxnLog
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val root = Files.createTempDirectory("graft_r17_widen_").toFile
      .getAbsolutePath
    TxnLog.destroy(root); TxnLog.init(root)
    TxnLog.commit(spark, root, _ => (
      Seq(1L -> 10L, 2L -> 20L).toDF("key", "value")
        .selectExpr("key", "cast(value as int) as value")
        .withColumn("op", lit("upsert")),
      Seq((1L, 2L))))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val widen = new Thread(() =>
      try TxnLog.alterColumnType(spark, root, "value", "bigint")
      catch { case t: Throwable => errs.add(t); () })
    val insert = new Thread(() =>
      try TxnLog.commit(spark, root, _ => (
        Seq(3L -> 5000000000L).toDF("key", "value")
          .withColumn("op", lit("upsert")),
        Seq((3L, 3L))))
      catch { case t: Throwable => errs.add(t); () })
    widen.start(); insert.start()
    widen.join(120000); insert.join(120000)
    assert(errs.isEmpty, s"concurrent widen+insert failed: " +
      errs.toArray.mkString("; "))
    val latest = TxnLog.latestCommitted(root)
    assert(latest == 2L, s"both commits must land, head=$latest")
    val df = TxnLog.read(spark, root, latest)
    assert(df.schema("value").dataType == LongType,
      s"final schema must be wide, got ${df.schema("value").dataType}")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 5000000000L),
      s"rows after concurrent widen+insert: $got")
  }

  test("snowflake CBO: post-filter stats flip the dim order while the " +
      "dim-dim chain (supplier→nation) stays causally ordered") {
    import graft.plans.Cbo
    import spark.implicits._
    val fact = graft.engine.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey")
    val part = graft.engine.Tables.part(spark, sf)
      .select($"p_partkey".as("l_partkey"), $"p_name")
    val supp = graft.engine.Tables.supplier(spark, sf)
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    val nat = graft.engine.Tables.nation(spark, sf)
      .select($"n_nationkey".as("s_nationkey"), $"n_name")
    val pStats = Cbo.analyzePath(s"$sf/part.parquet")
    val sStats = Cbo.analyzePath(s"$sf/supplier.parquet")
    val nStats = Cbo.analyzePath(s"$sf/nation.parquet")
    def dims(partSel: Option[Double]) = Seq(
      "part" -> Cbo.Input(part, pStats, Seq("l_partkey"),
        pred = partSel.map(_ => $"p_name".contains("gear")),
        selOverride = partSel),
      "supplier" -> Cbo.Input(supp, sStats, Seq("l_suppkey")),
      "nation" -> Cbo.Input(nat, nStats, Seq("s_nationkey")))
    // unfiltered: supplier (10 rows at sf0.001) beats part (200) and
    // unlocks nation (25), which beats part next
    val (_, o1) = Cbo.reorderJoin(fact, dims(None))
    assert(o1 == Seq("supplier", "nation", "part"),
      s"raw-size snowflake order: got $o1")
    // a selective part filter inverts the estimates: part first —
    // but nation must STILL follow supplier (dim-dim availability)
    val (_, o2) = Cbo.reorderJoin(fact, dims(Some(0.01)))
    assert(o2 == Seq("part", "supplier", "nation"),
      s"post-filter stats must reorder the chain: got $o2")
    assert(o1 != o2 &&
      o1.indexOf("nation") > o1.indexOf("supplier") &&
      o2.indexOf("nation") > o2.indexOf("supplier"),
      "the dim-dim edge must hold under both stats regimes")
  }

  test("ALTER COLUMN TYPE refuses narrowing through the engine") {
    import graft.engine.TxnLog
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val root = Files.createTempDirectory("graft_r17_narrow_").toFile
      .getAbsolutePath
    TxnLog.destroy(root); TxnLog.init(root)
    TxnLog.commit(spark, root, _ => (
      Seq(1L -> 10L).toDF("key", "value").withColumn("op", lit("upsert")),
      Seq((1L, 1L))))
    intercept[IllegalArgumentException] {
      TxnLog.alterColumnType(spark, root, "value", "int")
    }
  }
}
