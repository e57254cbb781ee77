package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Phase-level adjudicator for the offset-source streaming keys:
  * replays the q_stream_tumbling shape manually and prints each
  * micro-batch's engine-reported durationMs breakdown (triggerExecution,
  * queryPlanning, getBatch, addBatch, walCommit, stateCommit...) plus
  * wall-clock for stage/start/drain — so a fleet-bench drift can be
  * attributed to a PHASE, not guessed at.
  *
  * Run: sbt "Test/runMain graft.ProfileStream [sfDir] [reps]"
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).getOrElse("8")
    val maxPerTrigger = args.lift(3).getOrElse("1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // stage once (mirrors StreamOps.stageBatched for t3)
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val r = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = hi - lo + 1L
    val staged = java.nio.file.Files.createTempDirectory("graft_profstream_")
      .toFile.getAbsolutePath
    val t0 = System.nanoTime()
    ev.withColumn("batch",
        least(lit(2L), floor((unix_micros($"ts") - lit(lo)) * 3 / span))
          .cast("long"))
      .select($"event_id", unix_micros($"ts").as("ts"), $"user_id",
        $"event_type", $"value", $"batch")
      .repartition(8, col("batch"))
      .write.mode("overwrite").partitionBy("batch").csv(staged)
    println(f"stage: ${(System.nanoTime() - t0) / 1e9}%.3f s")

    (1 to reps).foreach { rep =>
      val tRep = System.nanoTime()
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val src = spark.readStream
        .format(classOf[graft.streaming.EventsFileStreamProvider].getName)
        .option("path", staged)
        .option("maxBatchesPerTrigger", maxPerTrigger)
        .load()
      val agg = src.groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      val q = agg.writeStream.format("memory")
        .queryName(s"profstream_$rep")
        .outputMode(OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      val wall = (System.nanoTime() - tRep) / 1e9
      println(f"rep$rep wall=${wall}%.3f s, per-trigger durationMs:")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} " +
          s"plan=${d.get("queryPlanning")} " +
          s"getBatch=${d.get("getBatch")} addBatch=${d.get("addBatch")} " +
          s"latestOffset=${d.get("latestOffset")} " +
          s"walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")}")
      }
      spark.sql(s"DROP TABLE IF EXISTS profstream_$rep")
    }
    spark.stop()
  }
}
