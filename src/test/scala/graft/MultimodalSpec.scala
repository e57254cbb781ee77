package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** The stub decoder's contract: schema, batch shape, and exact
  * feature values on hand-computed input. */
class MultimodalSpec extends SparkSpec {

  test("decoded schema carries typed metadata + fixed-dim features") {
    val df = MultimodalOps.decoded(spark, sf)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("features") == "array<float>")
    assert(fields("fmt") == "string" && fields("width") == "int")
    import spark.implicits._
    val sizes = df.select(size($"features")).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(16), "feature dim must be constant")
  }

  test("histogram features are exact on hand-computed input") {
    import spark.implicits._
    // 'a' = 0x61 → bin 6; ' ' = 0x20 → bin 2
    val docs = Seq((5L, "aaa a", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("mm_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val feats = MultimodalOps.decoded(spark, dir)
      .select($"features").collect()(0).getSeq[Float](0)
    val expected = Array.fill(16)(0f)
    expected(6) = 4f // four 'a's
    expected(2) = 1f // one space
    assert(feats == expected.toSeq)
  }

  test("payloads never enter a shuffle: decode plan has no exchange before mapPartitions") {
    val df = MultimodalOps.decoded(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // the serialize→mapPartitions chain must sit directly on the scan side,
    // i.e. no Repartition/Exchange below it in the logical plan
    assert(!plan.toLowerCase.contains("repartition"),
      s"unexpected repartition in decode plan:\n$plan")
  }

  test("frame sampling covers every byte exactly once") {
    import spark.implicits._
    val frames = MultimodalOps.multimodalFrames(spark, sf)
    val tot = frames.groupBy($"doc_id").agg(sum($"frame_len").as("n")).alias("f")
    val docs = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", length(encode($"text", "UTF-8")).as("n_bytes"))
    val bad = tot.join(docs, "doc_id").filter($"n" =!= $"n_bytes").count()
    assert(bad == 0, "frame lengths must partition the payload")
  }

  test("resize plan fits the box and preserves aspect within integer rounding") {
    import spark.implicits._
    val r = MultimodalOps.multimodalResize(spark, sf)
    assert(r.filter($"out_w" > 64 || $"out_h" > 64).count() == 0,
      "resized dims must fit the 64-box")
    assert(r.filter($"out_w" < 1 || $"out_h" < 1).count() == 0)
    // pass-through for already-fitting images
    assert(r.filter($"width" <= 64 && $"height" <= 64 &&
      ($"out_w" =!= $"width" || $"out_h" =!= $"height")).count() == 0)
    // aspect preserved: |out_w/out_h − w/h| bounded by integer rounding
    val bad = r.filter($"width" > 64 || $"height" > 64)
      .filter(abs($"out_w" * $"height" - $"out_h" * $"width") >
        greatest($"width", $"height"))
      .count()
    assert(bad == 0, "aspect drift beyond integer rounding")
  }
}
