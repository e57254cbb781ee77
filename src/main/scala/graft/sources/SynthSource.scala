package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection,
  SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.OptionalLong

/** A complete DataSourceV2 batch source — the extension point a real
  * deployment uses to integrate an internal storage/generator system
  * with Spark, written here against a deterministic synthetic table so
  * the result is DuckDB-oracle-able:
  *
  *   id     BIGINT  = 0 … rows-1
  *   bucket INT     = id % buckets
  *   value  DOUBLE  = ((id * 2654435761) % 1000003) / 1000003.0
  *
  * (Knuth multiplicative hash modulo a prime: pure 64-bit integer
  * arithmetic followed by one exact double division, so Spark and the
  * oracle compute bit-identical values.)
  *
  * What it demonstrates — and what the paired spec PINS:
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes only `readSchema()` fields; a 2-column
  *    aggregate never generates the third column.
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): equality/IN
  *    on `bucket` and range predicates on `id` are consumed by the
  *    source (they become partition pruning + generation bounds);
  *    anything else stays a post-scan filter. Pushed filters are
  *    FULLY applied, so Spark plans no residual FilterExec for them.
  *  - **Partition pruning**: one [[InputPartition]] per bucket; a
  *    pushed bucket predicate drops whole partitions at planning
  *    time — the DSv2 analog of reading only matching directories.
  *  - **Statistics** ([[SupportsReportStatistics]]): post-pushdown
  *    row/byte estimates, so Catalyst can pick a broadcast join when
  *    the pruned remainder is small.
  *
  * At 100 TB the same four hooks are exactly what keeps a custom
  * source efficient: predicates reach the storage layer, partitions
  * map to storage splits, and the optimizer sees honest sizes.
  * Registered as `graft-synth` via DataSourceRegister (META-INF
  * services), options `rows` and `buckets`.
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new SynthTable(
      rows = opts.getOrElse("rows", "60000").toLong,
      buckets = opts.getOrElse("buckets", "32").toInt)
  }
}

object SynthSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** The one row-defining function; mirrored verbatim in the oracle. */
  def valueOf(id: Long): Double = ((id * 2654435761L) % 1000003L) / 1000003.0
}

private[graft] class SynthTable(rows: Long, buckets: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth(rows=$rows, buckets=$buckets)"
  override def schema(): StructType = SynthSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, buckets)
}

private[graft] class SynthScanBuilder(rows: Long, buckets: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownTopN {

  private var requiredSchema: StructType = SynthSource.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  private var topN: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** TopN pushdown (`ORDER BY id ASC LIMIT n`): the generator emits
    * ids ascending, so the scan can produce the global top-n itself —
    * one partition walks the kept residue classes in id order and
    * stops after n rows. FULLY pushed (`isPartiallyPushed = false`),
    * so Spark plans no Sort/Limit on top at all — the DSv2 contract
    * that lets an index-backed source serve ORDER-BY-key LIMIT
    * queries without materializing the table. Only the natural id
    * ascending order is accepted; anything else stays in Spark. */
  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean = {
    val ok = orders.length == 1 && {
      val o = orders(0)
      o.expression().references().map(_.describe()).sameElements(
        Array("id")) &&
        o.direction() == SortDirection.ASCENDING &&
        o.nullOrdering() == NullOrdering.NULLS_FIRST // id is non-null
    }
    if (ok) topN = limit
    ok
  }

  override def isPartiallyPushed(): Boolean = false

  /** Consume what the generator can evaluate exactly; return the rest
    * for Spark to apply post-scan. IsNotNull is vacuous (all columns
    * are non-null), bucket equality/IN prunes partitions, id bounds
    * narrow the generation range. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case IsNotNull("id" | "bucket" | "value") => true
      case EqualTo("bucket", _: Int) => true
      case In("bucket", vs) => vs.forall(_.isInstanceOf[Int])
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(rows, buckets, requiredSchema, pushed, topN)
}

private[graft] class SynthScan(rows: Long, buckets: Int,
    requiredSchema: StructType, pushed: Array[Filter],
    private[graft] val topN: Int = -1)
    extends Scan with Batch with SupportsReportStatistics {

  /** Generation range [lo, hi) after pushed id predicates. */
  private val (lo, hi): (Long, Long) = {
    var l = 0L
    var h = rows
    pushed.foreach {
      case EqualTo("id", v: Long) => l = math.max(l, v); h = math.min(h, v + 1)
      case GreaterThan("id", v: Long) => l = math.max(l, v + 1)
      case GreaterThanOrEqual("id", v: Long) => l = math.max(l, v)
      case LessThan("id", v: Long) => h = math.min(h, v)
      case LessThanOrEqual("id", v: Long) => h = math.min(h, v + 1)
      case _ => ()
    }
    (l, math.max(l, h))
  }

  /** Buckets surviving the pushed bucket predicates — each is one
    * input partition, so a dropped bucket is never even planned. */
  private[graft] val keptBuckets: Seq[Int] = {
    val all = 0 until buckets
    pushed.foldLeft(all: Seq[Int]) {
      case (acc, EqualTo("bucket", v: Int)) => acc.filter(_ == v)
      case (acc, In("bucket", vs)) =>
        val set = vs.collect { case i: Int => i }.toSet
        acc.filter(set)
      case (acc, _) => acc
    }
  }

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynth(rows=$rows, buckets=$buckets, range=[$lo,$hi), " +
      s"partitions=${keptBuckets.length}, topN=$topN, " +
      s"pushed=[${pushed.mkString(", ")}], read=${requiredSchema.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    if (topN >= 0)
      // fully-pushed ORDER BY id LIMIT n: ONE partition walks the kept
      // residues in global id order and stops after n rows
      Array(SynthTopNPartition(keptBuckets, buckets, lo, hi, topN,
        requiredSchema.fieldNames))
    else
      keptBuckets.map(b => SynthPartition(b, buckets, lo, hi,
        requiredSchema.fieldNames)).toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory = SynthReaderFactory

  /** Post-pushdown estimates (what the pruned scan will actually
    * emit), so the optimizer sizes joins against the truth. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val span = math.max(0L, hi - lo)
    private val n = if (buckets == 0) 0L else span * keptBuckets.length / buckets
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(n * (8 + 4 + 8))
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

/** One bucket's residue class within [lo, hi); generates only the
  * projected columns. Plain case class → trivially serializable. */
private[graft] case class SynthPartition(bucket: Int, buckets: Int,
    lo: Long, hi: Long, fields: Array[String]) extends InputPartition

/** Fully-pushed TopN: one partition walking ALL kept residues in
  * global id order, stopping after n emitted rows. */
private[graft] case class SynthTopNPartition(kept: Seq[Int], buckets: Int,
    lo: Long, hi: Long, n: Int, fields: Array[String]) extends InputPartition

private[graft] object SynthReaderFactory extends PartitionReaderFactory {
  private def row(fields: Array[String], id: Long, buckets: Int)
      : InternalRow = {
    val vals: Array[Any] = fields.map {
      case "id" => id
      case "bucket" => (id % buckets).toInt
      case "value" => SynthSource.valueOf(id)
    }
    new GenericInternalRow(vals)
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SynthPartition => new PartitionReader[InternalRow] {
        // first id >= lo with id ≡ bucket (mod buckets)
        private var id: Long =
          p.lo + ((p.bucket - p.lo % p.buckets + p.buckets) % p.buckets)
        private var current: InternalRow = _

        override def next(): Boolean = {
          if (id >= p.hi) return false
          current = row(p.fields, id, p.buckets)
          id += p.buckets
          true
        }

        override def get(): InternalRow = current
        override def close(): Unit = ()
      }

      case p: SynthTopNPartition => new PartitionReader[InternalRow] {
        private val keptSet = p.kept.toSet
        private var id: Long = p.lo
        private var emitted = 0
        private var current: InternalRow = _

        override def next(): Boolean = {
          if (emitted >= p.n) return false
          while (id < p.hi && !keptSet((id % p.buckets).toInt)) id += 1
          if (id >= p.hi) return false
          current = row(p.fields, id, p.buckets)
          id += 1
          emitted += 1
          true
        }

        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}
