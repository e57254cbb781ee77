package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Ad-hoc stage profiler for the CF chain (test scope, not shipped).
  * Run: sbt "Test/runMain graft.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > 0.4))
          println(f"[stage] id=${si.stageId}%4d ${dur.getOrElse(-1.0)}%7.2f s  tasks=${si.numTasks}%3d  ${si.name.take(90)}")
      }
    })
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").count())
    time("ratingsDerive")(graft.operators.CfOps.ratingsDerive(spark, sfDir).count())
    time("itemCosine (1st: builds)")(graft.operators.CfOps.itemCosine(spark, sfDir).count())
    time("itemCosine (cached)")(graft.operators.CfOps.itemCosine(spark, sfDir).count())
    time("itemTopkNeighbors")(graft.operators.CfOps.itemTopkNeighbors(spark, sfDir).count())
    time("predictKnn")(graft.operators.CfOps.predictKnn(spark, sfDir).count())
    time("evalRmse")(graft.operators.CfOps.evalRmse(spark, sfDir).count())
    spark.stop()
  }
}
