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

  test("NDV equality selectivity reorders a chain the range-only " +
      "estimator gets wrong") {
    import org.apache.spark.sql.functions.col
    import graft.plans.Cbo
    val partPath = s"$sf/part.parquet"
    val suppPath = s"$sf/supplier.parquet"
    val part = spark.read.parquet(partPath)
      .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))
    val supp = spark.read.parquet(suppPath)
      .select(col("s_suppkey").as("l_suppkey"), col("s_acctbal"))
    val fact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    // a point predicate on a high-NDV DOUBLE column: parquet footers
    // carry no long range for it, so the range-only estimator sees
    // sel = 1.0 and part (bigger than supplier) goes second…
    val price = part.agg(org.apache.spark.sql.functions
      .max(col("p_retailprice"))).head().getDouble(0)
    val partStats = Cbo.analyzePath(partPath)
    val suppStats = Cbo.analyzePath(suppPath)
    assert(partStats.nRows > suppStats.nRows,
      "fixture premise: part must out-row supplier")
    def dims(ps: Cbo.TableStats) = Seq(
      "part" -> Cbo.Input(part, ps, Seq("l_partkey"),
        eqFilter = Some(("p_retailprice", price))),
      "supplier" -> Cbo.Input(supp, suppStats, Seq("l_suppkey")))
    val (blindDf, blindOrder) = Cbo.reorderJoin(fact, dims(partStats))
    assert(blindOrder == Seq("supplier", "part"),
      s"without NDV the eq filter must estimate 1.0 → supplier first, " +
        s"got $blindOrder")
    // …but with NDV the same predicate estimates nRows/NDV ≈ a few
    // rows, so the filtered part branch prunes the fact FIRST
    val enriched = Cbo.withNdv(partStats, spark, partPath,
      Seq("p_retailprice"))
    assert(enriched.ndv("p_retailprice") > suppStats.nRows,
      "fixture premise: retail-price NDV must exceed supplier rows")
    val (ndvDf, ndvOrder) = Cbo.reorderJoin(fact, dims(enriched))
    assert(ndvOrder == Seq("part", "supplier"),
      s"NDV estimate must put the eq-filtered part first, got $ndvOrder")
    // the reorder is cost-only: both orders must agree byte-for-byte
    // (project to a fixed column order — using-joins reorder columns)
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity",
      "p_retailprice", "s_acctbal").map(col)
    assert(ndvDf.select(cols: _*).orderBy(cols: _*).collect().toSeq ==
      blindDf.select(cols: _*).orderBy(cols: _*).collect().toSeq,
      "join order changed the result")
  }

  test("VERSION AS OF agrees with TxnLog.read across an ALTER COLUMN " +
      "TYPE boundary") {
    import graft.engine.TxnLog
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{IntegerType, LongType}
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r18_tt_").toFile.getAbsolutePath
    TxnLog.destroy(root); TxnLog.init(root)
    TxnLog.commit(spark, root, _ => (
      Seq(1L -> 10L, 2L -> 20L).toDF("key", "value")
        .selectExpr("key", "cast(value as int) as value")
        .withColumn("op", lit("upsert")),
      Seq((1L, 2L))))
    val widenV = TxnLog.alterColumnType(spark, root, "value", "bigint")
    graft.sources.GraftCatalog.register(spark)
    val ident = (graft.sources.GraftCatalog.NAME +:
      root.split("/").filter(_.nonEmpty).toSeq)
      .map(p => s"`$p`").mkString(".")
    // pre-widen versions keep the narrow schema (time travel across
    // the boundary), the widen version itself must already be wide —
    // its metadata-only linked snapshot still holds narrow files, so
    // this is exactly where the raw physical read used to disagree
    // with TxnLog.read
    val pre = spark.sql(s"SELECT * FROM $ident VERSION AS OF 0")
    assert(pre.schema("value").dataType == IntegerType,
      s"v0 predates the ALTER: ${pre.schema("value").dataType}")
    val at = spark.sql(s"SELECT * FROM $ident VERSION AS OF $widenV")
    assert(at.schema("value").dataType == LongType,
      s"VERSION AS OF $widenV must show the widened type, got " +
        s"${at.schema("value").dataType}")
    val direct = TxnLog.read(spark, root, widenV)
    assert(at.schema("value").dataType == direct.schema("value").dataType,
      "the two read paths disagree at the widen boundary")
    assert(at.orderBy("key").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toSeq ==
      direct.orderBy("key").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toSeq,
      "row values must match between the read paths")
  }

  test("concurrent widenings of two DIFFERENT columns both survive " +
      "(no lost update of the types table)") {
    import graft.engine.TxnLog
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r18_types_").toFile.getAbsolutePath
    TxnLog.destroy(root); TxnLog.init(root)
    TxnLog.commit(spark, root, _ => (
      Seq((1L, 10L, 100L)).toDF("key", "value", "other")
        .selectExpr("key", "cast(value as int) as value",
          "cast(other as int) as other")
        .withColumn("op", lit("upsert")),
      Seq((1L, 1L))))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val t1 = new Thread(() =>
      try TxnLog.alterColumnType(spark, root, "value", "bigint")
      catch { case t: Throwable => errs.add(t); () })
    val t2 = new Thread(() =>
      try TxnLog.alterColumnType(spark, root, "other", "bigint")
      catch { case t: Throwable => errs.add(t); () })
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert(errs.isEmpty, s"concurrent widenings failed: " +
      errs.toArray.mkString("; "))
    val latest = TxnLog.latestCommitted(root)
    val types = TxnLog.currentTypes(root, latest)
    assert(types.get("value").contains("bigint") &&
        types.get("other").contains("bigint"),
      s"one widening was lost — the types map rebuilt from a stale " +
        s"base on retry: $types")
  }
}
