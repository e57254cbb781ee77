package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps.Ev

/** Streaming semantics that the single-batch Verify replay cannot
  * cover (SURVEY.md §5.2(4)): multi-batch convergence to the batch
  * twin, state continuity across micro-batches, and watermark
  * late-data drop. */
class StreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("multi-batch tumbling aggregation converges to batch result") {
    import spark.implicits._
    val events = (0 until 120).map(i =>
      Ev(i.toLong, ts(i), i % 3L, s"t${i % 2}", i.toDouble))
    val source = MemoryStream[Ev](spark)
    val q = source.toDS()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.engine.Exact.xsum($"value").as("s"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"s")
      .writeStream.format("memory").queryName("t_multi")
      .outputMode(OutputMode.Complete()).start()
    try {
      events.grouped(17).foreach { chunk =>
        source.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_multi").orderBy("ws", "event_type").collect()
    val batch = events.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.engine.Exact.xsum($"value").as("s"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"s")
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("late data beyond the watermark is dropped") {
    import spark.implicits._
    val source = MemoryStream[Ev](spark)
    val q = source.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
      .writeStream.format("memory").queryName("t_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: events up to minute 90 → watermark advances to 80
      source.addData((0 until 91).map(i => Ev(i.toLong, ts(i), 1L, "a", 1.0)))
      q.processAllAvailable()
      // batch 2: a straggler at minute 10 — far behind the watermark
      source.addData(Seq(Ev(1000L, ts(10), 1L, "a", 1.0)))
      q.processAllAvailable()
      // batch 3: advance far enough to finalize every window
      source.addData(Seq(Ev(1001L, ts(300), 1L, "a", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val n0 = spark.table("t_late").filter($"ws" === ts(0)).collect()
    // window [0, 30) holds events 0..29 — the late straggler must NOT count
    assert(n0.map(_.getLong(1)).toSeq == Seq(30L))
  }

  test("q_stream_late_data drops a nonzero late tail (non-vacuous replay)") {
    import spark.implicits._
    val out = graft.streaming.StreamOps.streamLateData(spark, sf)
    val emitted = out.agg(sum($"n")).collect()(0).getLong(0)
    val total = graft.engine.Tables.events(spark, sf).count()
    assert(emitted > 0, "late-data replay emitted nothing")
    // batch 2 contains rows in windows closed by batch 1's watermark
    // AND append mode withholds the unfinalized tail — both must bite
    assert(emitted < total,
      s"no rows dropped: emitted=$emitted total=$total — the replay is vacuous")
  }

  test("operators are source-agnostic: file stream source gives the same result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    val events = (0 until 100).map(i =>
      Ev(i.toLong, ts(i), i % 5L, s"t${i % 3}", i * 0.5))
    // lay the events out as three json files (micro-batches by file)
    events.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.mode("append").json(dir)
    }
    val schema = events.toDF().schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.engine.Exact.xsum($"value").as("s"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"s")
      .writeStream.format("memory").queryName("t_file")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_file").orderBy("ws", "event_type").collect()
    val batch = events.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.engine.Exact.xsum($"value").as("s"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"s")
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("absence pattern emits timer-only negatives (quiet users flushed)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val abandoned = graft.streaming.StreamOps
      .streamMatchTimeout(spark, sf)
      .select($"view_event_id").as[Long].collect().toSet
    // views that are their user's LAST event can only be emitted by
    // the event-time timer after the sentinel advances the watermark
    // — no in-batch evidence event ever arrives for them
    val lastViews = graft.engine.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1 && $"event_type" === "view")
      .select($"event_id").as[Long].collect().toSet
    assert(lastViews.nonEmpty, "fixture must have trailing views")
    assert(lastViews.subsetOf(abandoned),
      "every trailing view is abandoned and only a timer could emit it")
  }

  test("flatMapGroupsWithState carries state across micro-batches") {
    import spark.implicits._
    val events = (1 to 10).map(i => Ev(i.toLong, ts(i), 7L, "a", 1.5))
    val source = MemoryStream[Ev](spark)
    val q = source.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Byte], (Long, Long, Double)](
        OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          var acc = if (state.exists)
            java.nio.ByteBuffer.wrap(state.get).getDouble else 0.0
          val out = evs.toSeq.sortBy(_.event_id).map { e =>
            acc += e.value; (uid, e.event_id, acc)
          }
          state.update(java.nio.ByteBuffer.allocate(8).putDouble(acc).array())
          out.iterator
      }
      .toDF("user_id", "event_id", "cum")
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(events.take(4)); q.processAllAvailable()
      source.addData(events.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val cums = spark.table("t_state").orderBy("event_id")
      .collect().map(_.getDouble(2)).toSeq
    // running total must be continuous across the two batches
    assert(cums == (1 to 10).map(_ * 1.5))
  }
}
