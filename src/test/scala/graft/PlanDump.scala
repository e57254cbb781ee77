package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered keys to files (test
  * scope, not shipped) — the round-13 plan-evidence artifact
  * (`plans/r13/<key>_{before,after}.txt`).
  *
  * Run: sbt "Test/runMain graft.PlanDump <outDir> <suffix> <key> [key...]"
  *
  * Plans are captured at CONSTRUCTION (AdaptiveSparkPlan
  * isFinalPlan=false where AQE applies) — the comparable artifact for
  * before/after diffs, since the final AQE plan depends on runtime
  * sizes that co-tenancy can nudge. Keys whose construction runs inner
  * actions (driver-loop operators) execute those actions here exactly
  * as in the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2).toSeq
    // Env-driven fixture/core-count with the harness defaults (r13
    // ADVICE: the hardcoded path/master silently broke other hosts).
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${key}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $key -> $outDir/${key}_$suffix.txt")
    }
    spark.stop()
  }
}
