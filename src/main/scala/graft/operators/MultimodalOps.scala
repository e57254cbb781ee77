package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** Multimodal-column plumbing (north-star surface): media assets as
  * opaque `binary` payloads + typed metadata, with decode /
  * feature-extract / frame-sample as partition-wise batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (byte-histogram "features", marked STUB below);
  * everything around it — the asset schema, the mapPartitions batch
  * shape, the typed metadata, the explode of per-frame rows, and the
  * oracle-checked bookkeeping columns — is the real Spark plumbing a
  * production decoder would drop into.
  *
  * Scale notes (100 TB): payloads never enter a shuffle — decode is
  * map-side (mapPartitions), features (64 B) and metadata are the
  * only columns that move. Real pipelines would store payloads in
  * parquet binary columns with a small row-group size (or object-
  * store pointers) and let column pruning keep metadata-only queries
  * from touching bytes at all; the iterator-of-rows transform here is
  * exactly the mapInPandas batch contract, so a vectorized decoder
  * (JNI/arrow) swaps in without plan changes.
  */
object MultimodalOps {

  private val FEAT_DIM = 16
  private val FRAME_BYTES = 64

  /** Synthesized asset table: UTF-8 payload bytes standing in for
    * media, deterministic typed metadata derived from doc_id. */
  def assets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END").as("fmt"),
        (lit(16) + pmod($"doc_id", lit(32)) * 4).cast(IntegerType).as("width"),
        (lit(16) + pmod($"doc_id", lit(24)) * 4).cast(IntegerType).as("height")
      ).as("meta"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fmt", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("feat_dim", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("feat_sum", DoubleType)))

  /** STUB decode kernel: a 16-bin byte-value histogram stands in for
    * the real media decoder (deterministic fake — no codec in this
    * container). Signature and batch shape are the real contract:
    * bytes in, fixed-dim float features out. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FEAT_DIM)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) / FEAT_DIM) += 1f
      i += 1
    }
    hist
  }

  /** Partition-wise batch decode (the mapInPandas analog): iterate
    * the partition's rows once, run the kernel per asset, emit typed
    * feature rows. No shuffle; payloads die map-side. */
  def decoded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val enc = RowEncoder.encoderFor(decodedSchema)
    assets(spark, sfDir)
      .select($"doc_id", $"payload", $"meta.fmt", $"meta.width", $"meta.height")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = decodeStub(payload)
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("fmt"),
            r.getAs[Int]("width"), r.getAs[Int]("height"),
            payload.length, FEAT_DIM, feats.toSeq,
            feats.map(_.toDouble).sum)
        }
      }(enc)
      .orderBy($"doc_id")
  }

  /** Harness-facing decode query: [[decoded]] minus the raw feature
    * vector (the oracle checks the bookkeeping columns — feat_sum ≡
    * n_bytes because the histogram partitions the bytes; histogram
    * VALUES are asserted in MultimodalSpec against hand-computed
    * fixtures). */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decoded(spark, sfDir)
      .select($"doc_id", $"fmt", $"width", $"height", $"n_bytes",
        $"feat_dim", $"feat_sum")
      .orderBy($"doc_id")
  }

  val multimodalDecodeSql: String =
    s"""SELECT doc_id,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt,
       |  CAST(16 + (doc_id % 32) * 4 AS INTEGER) AS width,
       |  CAST(16 + (doc_id % 24) * 4 AS INTEGER) AS height,
       |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       |  $FEAT_DIM AS feat_dim,
       |  CAST(octet_length(encode(text)) AS DOUBLE) AS feat_sum
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning: aspect-preserving fit into a 64×64 box with
    * pure integer arithmetic (engine-portable; the pixel kernel
    * itself is the stubbed codec, like decode). The plan — target
    * dims + byte budget — is what the Spark side of a real resize
    * pipeline owns: a map-side projection over typed metadata, zero
    * shuffle; the per-image kernel then runs embarrassingly parallel
    * per partition. Images already inside the box pass through. */
  def multimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val box = 64
    assets(spark, sfDir)
      .select($"doc_id", $"meta.fmt".as("fmt"),
        $"meta.width".as("width"), $"meta.height".as("height"))
      .withColumn("long_side", greatest($"width", $"height"))
      .select($"doc_id", $"fmt", $"width", $"height",
        when($"long_side" <= box, $"width")
          .otherwise(expr(s"(width * $box) div long_side"))
          .cast("integer").as("out_w"),
        when($"long_side" <= box, $"height")
          .otherwise(expr(s"(height * $box) div long_side"))
          .cast("integer").as("out_h"))
      .withColumn("out_bytes", ($"out_w" * $"out_h" * 3).cast("integer"))
      .orderBy($"doc_id")
  }

  val multimodalResizeSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt,
      |    CAST(16 + (doc_id % 32) * 4 AS INTEGER) AS width,
      |    CAST(16 + (doc_id % 24) * 4 AS INTEGER) AS height
      |  FROM documents),
      |sized AS (
      |  SELECT *, greatest(width, height) AS long_side FROM dims)
      |SELECT doc_id, fmt, width, height,
      |  CAST(CASE WHEN long_side <= 64 THEN width
      |    ELSE (width * 64) // long_side END AS INTEGER) AS out_w,
      |  CAST(CASE WHEN long_side <= 64 THEN height
      |    ELSE (height * 64) // long_side END AS INTEGER) AS out_h,
      |  CAST((CASE WHEN long_side <= 64 THEN width
      |    ELSE (width * 64) // long_side END)
      |    * (CASE WHEN long_side <= 64 THEN height
      |    ELSE (height * 64) // long_side END) * 3 AS INTEGER) AS out_bytes
      |FROM sized ORDER BY doc_id""".stripMargin

  /** Frame sampling: one row per FRAME_BYTES-sized slice of the
    * payload (video frame-sample analog) — generated map-side from
    * the payload length, no shuffle. */
  def multimodalFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .select($"doc_id", length($"payload").as("n_bytes"))
      .select($"doc_id", $"n_bytes",
        explode(sequence(lit(0),
          expr(s"((n_bytes + ${FRAME_BYTES - 1}) div $FRAME_BYTES) - 1"))).as("frame_idx"))
      .select($"doc_id", $"frame_idx",
        ($"frame_idx" * FRAME_BYTES).as("frame_offset"),
        least(lit(FRAME_BYTES), $"n_bytes" - $"frame_idx" * FRAME_BYTES).as("frame_len"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val multimodalFramesSql: String =
    s"""SELECT doc_id, CAST(i.range AS INTEGER) AS frame_idx,
       |  CAST(i.range AS INTEGER) * $FRAME_BYTES AS frame_offset,
       |  least($FRAME_BYTES,
       |    CAST(octet_length(encode(text)) AS INTEGER)
       |      - CAST(i.range AS INTEGER) * $FRAME_BYTES) AS frame_len
       |FROM documents, range(0, 1000) i
       |WHERE i.range < (octet_length(encode(text)) + $FRAME_BYTES - 1) // $FRAME_BYTES
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Content-addressed asset dedup — the CAS-storage step of a
    * multimodal ingest: every payload keys on the md5 of its BYTES
    * (the 16-byte group key, never the payload, enters the shuffle —
    * the [[DedupOps.dedupExact]] 100 TB rule applied to media), one
    * min-id survivor per content key, with the byte-savings
    * accounting an asset store reports (dedup ratio is the metric
    * that decides whether CAS is worth running). Spark hashes the
    * binary column directly; the oracle hashes the text whose UTF-8
    * bytes ARE the payload, with octet_length (not character length)
    * for the byte math. */
  def multimodalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .select($"doc_id", md5($"payload").as("content_key"),
        length($"payload").cast("long").as("n_bytes"))
      .groupBy($"content_key", $"n_bytes")
      .agg(min($"doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))
      .select($"content_key", $"survivor_id", $"n_copies", $"n_bytes",
        (($"n_copies" - 1) * $"n_bytes").as("bytes_saved"))
      .orderBy($"survivor_id")
  }

  val multimodalDedupSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, md5(text) AS content_key,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT content_key, min(doc_id) AS survivor_id,
      |  count(*) AS n_copies, n_bytes,
      |  CAST((count(*) - 1) * n_bytes AS BIGINT) AS bytes_saved
      |FROM keyed
      |GROUP BY content_key, n_bytes
      |ORDER BY survivor_id""".stripMargin

  /** Perceptual-hash near-dup over the asset payloads — the IMAGE
    * twin of [[graft.operators.DedupOps]]' SimHash pair search, and
    * the reason CAS dedup ([[multimodalDedup]]) is not enough: a
    * re-encoded/re-cropped asset changes every byte but barely moves
    * a perceptual signature. The pHash here is the block-mean
    * construction (real pHash DCT needs a decoded raster — the
    * stubbed-codec boundary): the payload byte stream splits into 64
    * equal spans, bit_b = 1 iff span b's byte-sum exceeds the
    * payload mean (scale-free, so assets of different length remain
    * comparable), packed into 4×16-bit bands. Near-pair search is
    * the same band-pigeonhole as SimHash: hamming ≤ 3 over 64 bits
    * guarantees ≥ 1 of the 4 bands identical, so the band equi-join
    * provably finds EVERY pair within the radius — never all-pairs.
    *
    * All arithmetic is integer (byte sums, `s·64 > total` instead of
    * dividing, shift-packed bands), so Spark and the oracle agree
    * bit-for-bit. Signature build is the partition-wise kernel
    * ([[phashKernel]], same mapPartitions contract as [[decoded]] —
    * no shuffle until the 4-row-per-doc band table); at 100 TB the
    * bands table (doc_id + 5 longs) is what shuffles, never payload
    * bytes. The oracle mirrors the kernel over text chars, which ARE
    * the payload bytes for this ASCII fixture ([[assets]] encodes
    * UTF-8). */
  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("bv", ArrayType(LongType))))

  /** pHash kernel: payload bytes → 4×16-bit band values. Plain Scala
    * like [[decodeStub]] — per-asset imperative byte math is the
    * kernel contract of this family, and chaining the same logic
    * through nested SQL higher-order lambdas blows up the optimizer's
    * expression tree (each stage re-inlines the 64-term block array
    * into the next). */
  private[graft] def phashKernel(payload: Array[Byte]): Array[Long] = {
    val n = payload.length
    val blocks = new Array[Long](64)
    var total = 0L
    var b = 0
    while (b < 64) {
      var p = b * n / 64 // exclusive-lo/inclusive-hi span in 0-based form
      val hi = (b + 1) * n / 64
      while (p < hi) { blocks(b) += payload(p) & 0xffL; p += 1 }
      total += blocks(b)
      b += 1
    }
    val bv = new Array[Long](4)
    var i = 0
    while (i < 64) {
      if (blocks(i) * 64 > total) bv(i / 16) |= 1L << (i % 16)
      i += 1
    }
    bv
  }

  def multimodalPhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val enc = RowEncoder.encoderFor(phashSchema)
    val bands = assets(spark, sfDir)
      .select($"doc_id", $"payload")
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getAs[Long]("doc_id"),
            phashKernel(r.getAs[Array[Byte]]("payload")).toSeq)
        }
      }(enc)
      .select($"doc_id", posexplode($"bv").as(Seq("band", "bval")),
        expr("element_at(bv, 1)").as("b0"), expr("element_at(bv, 2)").as("b1"),
        expr("element_at(bv, 3)").as("b2"), expr("element_at(bv, 4)").as("b3"))
    bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bval" === $"y.bval" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        (expr("bit_count(x.b0 ^ y.b0) + bit_count(x.b1 ^ y.b1)") +
          expr("bit_count(x.b2 ^ y.b2) + bit_count(x.b3 ^ y.b3)"))
          .cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  val multimodalPhashSql: String =
    """WITH docs AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents),
      |blk AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64), b ->
      |      CASE WHEN (b + 1) * n // 64 >= b * n // 64 + 1
      |        THEN COALESCE(list_sum(list_transform(
      |          range(b * n // 64 + 1, (b + 1) * n // 64 + 1),
      |          p -> ord(substring(text, p, 1)))), 0)
      |        ELSE 0 END) AS blocks
      |  FROM docs),
      |sig AS (
      |  SELECT doc_id, blocks, list_sum(blocks) AS total,
      |    list_transform(range(0, 64), b ->
      |      CASE WHEN blocks[b + 1] * 64 > list_sum(blocks)
      |        THEN 1 ELSE 0 END) AS bits
      |  FROM blk),
      |bandv AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 4), k ->
      |      list_sum(list_transform(range(0, 16),
      |        i -> bits[16 * k + i + 1] * (1::BIGINT << i)))) AS bv
      |  FROM sig),
      |bands AS (
      |  SELECT doc_id, k AS band, bv[k + 1] AS bval,
      |    bv[1] AS b0, bv[2] AS b1, bv[3] AS b2, bv[4] AS b3
      |  FROM bandv, unnest(range(0, 4)) AS t(k)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
      |      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
      |      AS INTEGER) AS hamming
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, hamming FROM cand
      |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
}
