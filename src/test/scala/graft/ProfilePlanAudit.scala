package graft

import org.apache.spark.sql.SparkSession

/** One-off plan audit for round-6 keys (test scope): prints the
  * formatted plan's scan/join lines so shuffle/broadcast shape is
  * reviewable. Run: sbt "Test/runMain graft.ProfilePlanAudit"
  */
object ProfilePlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq("q_catalog_scan", "q_multimodal_manifest",
        "q_image_phash", "q_audio_decode", "q_match_recognize",
        // round-7 keys
        "q_scan_stats_skipping", "q_join_bloom_prefilter",
        "q_txn_optimize", "q_stream_txn_source", "q_sql_group_by_all")) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"==== $k ====")
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Join") || l.contains("PushedFilters"))
        .take(12).foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
