package graft

/** Round-11 evidence hardening: the six keys that used to pass the
  * DuckDB oracle VACUOUSLY (0 rows on both sides — a broken operator
  * that drops everything would also have "passed") now have fixture
  * slices that provably produce rows. These tests pin non-emptiness at
  * sf0.001 so the keys can never silently regress to vacuous greens;
  * tools/compare.py additionally fails ANY oracled key that returns 0
  * rows unless it appears in an explicit ZERO_ROW_ALLOWLIST (empty).
  */
class Round16Spec extends SparkSpec {

  private val fixedKeys = Seq(
    "q_join_anti",            // parts never bulk-shipped (qty > 45)
    "q_set_except",           // high-value viewers \ high-value buyers
    "q_subquery_not_exists",  // suppliers with no late bulk shipment
    "q_stream_mv_maintenance",// CDF-maintained MV, survivors non-empty
    "q_txn_mv_incremental",   // delta-maintained MV, survivors non-empty
    "q_txn_row_lineage")      // lineage of SURVIVING rows

  fixedKeys.foreach { key =>
    test(s"$key returns rows (no vacuous zero-row oracle pass)") {
      val df = SparkEntry.queries(key)(spark, sf)
      val n = df.limit(1).count()
      assert(n > 0, s"$key returned 0 rows at sf0.001 — its oracle " +
        "compare would be vacuous")
    }
  }

  test("the tt fixture's v3 delete-set is a PROPER slice: some users " +
      "deleted, some survive") {
    import org.apache.spark.sql.functions._
    val root = graft.operators.TxnOps.ttTable(spark, sf)
    val latest = graft.engine.TxnLog.latestCommitted(root)
    assert(latest == 3L)
    val v2 = graft.engine.TxnLog.read(spark, root, 2L).count()
    val v3 = graft.engine.TxnLog.read(spark, root, 3L).count()
    assert(v3 > 0, "v3 deleted every user — downstream MV/lineage keys " +
      "would pass vacuously")
    assert(v3 < v2, "v3 deleted nobody — the delete path is unexercised")
  }
}
