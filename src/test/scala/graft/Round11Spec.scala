package graft

import org.apache.spark.sql.functions._

import graft.operators.{ScanOps, SourceOps, SqlOps}
import graft.plans.QualifySql

/** Round-8 wave 2: QUALIFY SQL surface, hidden file-metadata columns,
  * and the storage-partitioned-join keys' row-level semantics (their
  * PLAN properties are pinned in SourceSpec). */
class Round11Spec extends SparkSpec {

  test("QUALIFY desugars to exactly the hand-written window subquery") {
    graft.engine.Tables.registerViews(spark, sf)
    val viaQualify = QualifySql.sql(spark,
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
      .collect().toSeq
    val byHand = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
      .collect().toSeq
    assert(viaQualify == byHand)
    assert(viaQualify.nonEmpty)
  }

  test("QUALIFY honors a trailing LIMIT and plain WHERE coexistence") {
    graft.engine.Tables.registerViews(spark, sf)
    val out = QualifySql.sql(spark,
      """SELECT o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1000.0
        |QUALIFY RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) <= 7
        |ORDER BY o_totalprice DESC, o_custkey LIMIT 5""".stripMargin)
      .collect()
    assert(out.length == 5)
    // descending by construction
    val prices = out.map(_.getDouble(1)).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("QUALIFY rejects malformed statements loudly") {
    graft.engine.Tables.registerViews(spark, sf)
    // no QUALIFY at all
    intercept[IllegalArgumentException] {
      QualifySql.sql(spark, "SELECT 1")
    }
    // QUALIFY only inside a subquery is NOT top-level
    intercept[IllegalArgumentException] {
      QualifySql.sql(spark,
        "SELECT * FROM (SELECT 1 WHERE false QUALIFY true)")
    }
    // two top-level QUALIFYs
    intercept[IllegalArgumentException] {
      QualifySql.sql(spark, "SELECT 1 QUALIFY true QUALIFY false")
    }
    // set operation heads are out of grammar
    intercept[IllegalArgumentException] {
      QualifySql.sql(spark,
        "SELECT 1 UNION ALL SELECT 2 QUALIFY true")
    }
    // empty predicate
    intercept[IllegalArgumentException] {
      QualifySql.sql(spark, "SELECT 1 QUALIFY ORDER BY 1")
    }
  }

  test("QUALIFY keyword detection ignores quoted text and parens") {
    graft.engine.Tables.registerViews(spark, sf)
    // the word QUALIFY inside a string literal must not count
    val out = QualifySql.sql(spark,
      """SELECT o_custkey, 'QUALIFY' AS tag, o_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
        |  o_orderkey) = 1""".stripMargin).collect()
    assert(out.length == 1 && out.head.getString(1) == "QUALIFY")
  }

  test("file-metadata profile: 16 files, dense per-file row ordinals, full coverage") {
    val rows = ScanOps.scanFileMetadata(spark, sf).collect()
    assert(rows.length == 16, s"expected the 16-file layout, got ${rows.length}")
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("min_ri") == 0L, s"row_index must start at 0: $r")
      assert(r.getAs[Long]("max_ri") == n - 1,
        s"row_index must be dense 0..n-1 within the file: $r")
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    val li = graft.engine.Tables.lineitem(spark, sf).count()
    assert(total == li, "per-file counts must cover the whole table")
    // range clustering ⇒ file date spans are non-overlapping when
    // ordered by min_d (the property stats skipping relies on)
    val spans = rows.sortBy(_.getAs[java.sql.Timestamp]("min_d").getTime)
      .map(r => (r.getAs[java.sql.Timestamp]("min_d").getTime,
        r.getAs[java.sql.Timestamp]("max_d").getTime)).toSeq
    spans.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, "range-clustered files must not overlap")
      case _ => ()
    }
  }

  test("SPJ keys return the co-partitioned join/agg answers (values, not just plans)") {
    import spark.implicits._
    val agg = SourceOps.sourceSpjAgg(spark, sf).collect()
    assert(agg.length == 32)
    assert(agg.map(_.getAs[Long]("n")).sum == 58000L) // ids in [2000, 60000)
    val join = SourceOps.sourceSpjJoin(spark, sf)
    val rows = join.collect()
    assert(rows.length == 5000)
    // v2 is exactly twice the generator value (both sides identical)
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Double]("v2") ==
        2.0 * graft.sources.SynthSource.valueOf(id))
    }
  }
}
