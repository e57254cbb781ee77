package graft

import org.apache.spark.sql.SparkSession

/** Deep-dive profiler for one key (test scope): per-stage durations
  * with FULL call-site details plus the post-execution AQE final plan.
  * Run: sbt "Test/runMain graft.ProfGraph <key> [sfDir]"
  */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q_graph_pagerank")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(key)
    fn(spark, sfDir).count() // warm
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val t = for {a <- i.submissionTime; b <- i.completionTime} yield (b - a) / 1000.0
        val m = i.taskMetrics
        val site = i.details.linesIterator.find(l =>
          l.contains("graft.") && !l.contains("ProfGraph")).getOrElse(i.name).trim
        println(f"stage ${i.stageId}%3d ${t.getOrElse(-1.0)}%7.3f s run=${m.executorRunTime / 1000.0}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f in=${m.inputMetrics.recordsRead}%9d sh_r=${m.shuffleReadMetrics.recordsRead}%8d sh_w=${m.shuffleWriteMetrics.recordsWritten}%8d tasks=${i.numTasks}%3d | ${i.name.take(48)} | $site")
      }
    })
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println("=== FINAL PLAN ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(20000))
    spark.stop()
  }
}
