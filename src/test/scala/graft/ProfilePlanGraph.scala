package graft

import org.apache.spark.sql.SparkSession

/** One-off plan probe: does the pagerank iteration join broadcast the
  * vertex state? (test scope, adjudication tooling) */
object ProfilePlanGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.GraphOps.graphPagerank(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val nB = "BroadcastHashJoin".r.findAllIn(plan).length
    val nS = "SortMergeJoin".r.findAllIn(plan).length
    val nC = "InMemoryTableScan".r.findAllIn(plan).length
    val depth = plan.linesIterator.size
    println(s"planprobe pagerank: broadcastJoins=$nB sortMergeJoins=$nS inMemScans=$nC planLines=$depth")
    spark.stop()
  }
}
