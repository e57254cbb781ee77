package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Algebraic properties of the dedup family (SURVEY.md §5.2(3)). */
class DedupSpec extends SparkSpec {

  test("exact dedup is idempotent and survivors are minimal doc_ids") {
    val once = DedupOps.dedupExact(spark, sf)
    // survivors joined back must map 1:1 to distinct content keys
    val n = once.count()
    val distinctTexts = graft.engine.Tables.documents(spark, sf)
      .select(md5(encode(col("text"), "UTF-8"))).distinct().count()
    assert(n == distinctTexts)
    // survivor is the min doc_id of its group ⇒ survivors are stable
    val again = once.select("text_md5").distinct().count()
    assert(again == n)
  }

  test("normalized exact dedup collapses re-capitalized and re-punctuated copies") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World! This is Fine.", "en", "s", 27L),
      (2L, "hello world  this is fine", "en", "s", 25L), // normalizes equal
      (3L, "a genuinely different document", "en", "s", 30L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("norm_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.dedupExactNorm(spark, dir).collect()
    assert(out.length == 2, s"expected 2 normalized groups, got ${out.toSeq}")
    val g = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(1L) == 2L, "docs 1+2 must collapse with survivor min(doc_id)=1")
    assert(g(3L) == 1L)
    // byte-exact dedup must NOT collapse them — that's the point
    assert(DedupOps.dedupExact(spark, dir).count() == 3)
  }

  test("minhash-LSH finds the planted near-duplicate pair") {
    import spark.implicits._
    val base = ((1 to 40).map(i => s"word$i") :+ "tail").mkString(" ")
    val nearDup = base.replace("word37", "changed") // 1 of 41 tokens differs
    val docs = Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, nearDup, "en", "s", nearDup.length.toLong),
      (3L, "completely different words about spark sql engines and shuffles here now", "en", "s", 70L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedup_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = DedupOps.dedupMinhashLsh(spark, dir)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"planted pair not found: ${pairs.toSeq}")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated doc joined a band bucket")
  }

  test("simhash of identical docs is identical, near-dup within hamming 8") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq(
      (1L, base, "en", "s", 10L),
      (2L, base, "en", "s", 10L), // exact copy
      (3L, base.replace("kappa", "omega"), "en", "s", 10L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("simhash_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sh = DedupOps.dedupSimhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L), "identical docs must hash identically")
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 8,
      s"near-dup hamming too large: ${java.lang.Long.bitCount(sh(1L) ^ sh(3L))}")
  }

  test("hot shingles above the doc-frequency ceiling are excluded from the dedup index") {
    import spark.implicits._
    // "end user license" appears in 6 of 8 docs: df=6 > 4 and 12 > 8 ⇒
    // stop-shingle, dropped; each doc's private trigrams (df=1) stay.
    val boiler = "end user license"
    val docs = (1L to 6L).map(i =>
      (i, s"$boiler uniq${i}a uniq${i}b uniq${i}c")) ++ Seq(
      (7L, "seven alpha beta gamma delta epsilon"),
      (8L, "eight zeta eta theta iota kappa"))
    val df = docs.toDF("doc_id", "text")
    val kept = DedupOps.informativeShingles(df)
      .select($"shingle").distinct().as[String].collect().toSet
    assert(!kept.contains("end user license"), "stop-shingle survived the ceiling")
    assert(kept.contains("uniq1a uniq1b uniq1c"), "informative shingle was dropped")
    assert(kept.contains("seven alpha beta"))
    // trigrams straddling the boilerplate boundary ("user license
    // uniqNa") differ per doc (df=1) and must be KEPT — the ceiling
    // removes exactly the universal trigram, not its neighborhood
    assert(kept.contains("user license uniq1a"))
  }

  test("hash-min clustering converges on a deep path graph (diameter >> round count heuristics)") {
    import spark.implicits._
    // 24-doc path graph: 1-2-3-...-24. Hash-min needs ~diameter rounds,
    // crossing two localCheckpoint generations (rounds 10 and 20) —
    // the lineage-truncation path a shallow dup family never exercises.
    val n = 24
    val docs = (1L to n.toLong).toDF("doc_id")
    val pairs = (1L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupOps.hashMinLabels(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 1L), s"path graph must collapse to one cluster: ${labels.toSeq}")
    assert(labels.forall(_._3 == n.toLong))
  }

  test("containment catches a short doc embedded in a long one that Jaccard misses") {
    import spark.implicits._
    val quote = (1 to 6).map(i => s"q$i").mkString(" ") // 6 tokens → 4 shingles
    val host = ((1 to 60).map(i => s"h$i") :+ quote).mkString(" ")
    val docs = Seq(
      (1L, quote, "en", "s", quote.length.toLong),
      (2L, host, "en", "s", host.length.toLong),
      (3L, "unrelated tokens about something else entirely here", "en", "s", 50L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("cont_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = DedupOps.dedupContainment(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(cont.contains((1L, 2L)), s"embedded quote not caught: $cont")
    assert(cont((1L, 2L)) == 1.0, "full embedding must have containment 1.0")
    // the same pair is BELOW the Jaccard near-dup threshold — the case
    // that justifies containment as its own detector
    val jac = DedupOps.dedupNear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)),
      "fixture degenerate: Jaccard already catches the embedding")
  }

  test("simhash band search finds near-identical docs by hamming distance") {
    import spark.implicits._
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "s", 10L),
      (2L, base, "en", "s", 10L), // identical → hamming 0
      (3L, (1 to 50).map(i => s"other$i").mkString(" "), "en", "s", 10L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("shp_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = DedupOps.dedupSimhashPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"identical docs not paired: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated doc within hamming 3")
  }

  test("large/small-star contraction agrees with hash-min on path and random graphs") {
    import spark.implicits._
    // deep path graph — star contraction's O(log n) advantage case
    val n = 24
    val docs = (1L to n.toLong).toDF("doc_id")
    val path = (1L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val a = DedupOps.hashMinLabels(docs, path).orderBy("doc_id").collect().toSeq
    val b = DedupOps.largeSmallStarLabels(docs, path).orderBy("doc_id").collect().toSeq
    assert(a == b, "star labels diverge from hash-min on the path graph")
    // deterministic pseudo-random multigraph: mixed component sizes,
    // duplicate and reversed edges included on purpose
    val m = 40L
    val docs2 = (1L to m).toDF("doc_id")
    val rnd = (1 to 60).map { i =>
      val x = (i * 1103515245L + 12345L) % m + 1
      val y = (i * 69069L + 1L) % m + 1
      (x, y)
    }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val a2 = DedupOps.hashMinLabels(docs2, rnd).orderBy("doc_id").collect().toSeq
    val b2 = DedupOps.largeSmallStarLabels(docs2, rnd).orderBy("doc_id").collect().toSeq
    assert(a2 == b2, "star labels diverge from hash-min on the random graph")
  }

  test("n-gram jaccard is 1.0 only for identical shingle sets") {
    import spark.implicits._
    val a = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, a, "en", "s", 10L),
      (2L, a, "en", "s", 10L),
      (3L, a + " eleven", "en", "s", 11L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("jac_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val jac = DedupOps.dedupNear(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(jac((1L, 2L)) == 1.0)
    assert(jac((1L, 3L)) < 1.0 && jac((1L, 3L)) > 0.5)
  }
}
