package graft
import org.apache.spark.sql.SparkSession
object ProfKey {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q_dedup_prefix_filter")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(key)
    fn(spark, "/root/testdata/sf0.1").count()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val t = for {a <- i.submissionTime; b <- i.completionTime} yield (b - a) / 1000.0
        println(f"stage ${i.stageId}%3d ${t.getOrElse(-1.0)}%7.3f s  in=${i.taskMetrics.inputMetrics.recordsRead}%9d sh_r=${i.taskMetrics.shuffleReadMetrics.recordsRead}%9d sh_w=${i.taskMetrics.shuffleWriteMetrics.recordsWritten}%9d spill_m=${i.taskMetrics.memoryBytesSpilled}%10d spill_d=${i.taskMetrics.diskBytesSpilled}%10d  ${i.name.take(60)}")
      }
    })
    val t0 = System.nanoTime()
    fn(spark, "/root/testdata/sf0.1").count()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
