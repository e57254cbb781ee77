package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution,
  Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection,
  SortOrder, Transform}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, IntegerType,
  LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A complete DataSourceV2 batch SINK — the write-side twin of
  * [[SynthSource]], exercising the full connector write protocol a
  * real external system integrates through:
  *
  *  - [[WriteBuilder]] (+ [[SupportsTruncate]], so `mode("overwrite")`
  *    maps to the V2 truncate-then-append contract instead of
  *    failing),
  *  - a serializable [[DataWriterFactory]] shipped to executors,
  *  - per-partition [[DataWriter]]s with the commit/abort lifecycle
  *    (task-level commit messages, driver-level job commit — the
  *    two-phase protocol that gives V2 writes their exactly-once
  *    story under task retry and speculation: only rows in COMMITTED
  *    task messages reach the job commit, a retried task's duplicate
  *    writer aborts and its buffer is dropped).
  *
  * The "storage" is an in-JVM registry keyed by the `table` option so
  * the harness can read written bytes back and oracle-compare them —
  * the commit messages carry the row batches themselves. In a real
  * sink the messages carry MANIFESTS (files written, offsets) and
  * commit publishes them atomically; the protocol shape is identical,
  * which is what this component demonstrates. Local single-JVM by
  * design: driver-side job commit sees executor-produced messages
  * only because local[*] shares the JVM — a cluster sink would write
  * payloads to shared storage, exactly as the doc above says.
  *
  * Supported column types: the fixture write schema (long / int /
  * double / string / date).
  */
class MemSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-memsink"

  // Write-only source: there is nothing to infer a read schema from;
  // supportsExternalMetadata lets Spark hand the DataFrame's schema in.
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemSinkTable(
      properties.asScala.getOrElse("table", "default"), schema)
}

/** Driver-side registry standing in for external storage. */
object MemSinkRegistry {
  private[sources] val tables =
    TrieMap.empty[String, (StructType, Seq[Seq[Any]])]

  /** Layout facts observed by the last clustered write of a table:
    * (every cluster key landed in exactly one writer task, every
    * task's rows arrived sorted, number of writer tasks). The
    * harness's assertion surface for the distribution contract — a
    * real sink trusts the engine and just writes. */
  private[sources] val layouts =
    TrieMap.empty[String, (Boolean, Boolean, Int)]

  def read(table: String): Option[(StructType, Seq[Seq[Any]])] =
    tables.get(table)

  def layout(table: String): Option[(Boolean, Boolean, Int)] =
    layouts.get(table)

  def clear(table: String): Unit = {
    tables.remove(table); layouts.remove(table); ()
  }
}

private[graft] class MemSinkTable(tableName: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_memsink($tableName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemSinkWriteBuilder(tableName, info.schema(),
      Option(info.options.get("clusterBy")),
      Option(info.options.get("writePartitions")).map(_.toInt))
}

private[graft] class MemSinkWriteBuilder(table: String, schema: StructType,
    clusterBy: Option[String], writePartitions: Option[Int])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = clusterBy match {
    case None => new Write {
      override def toBatch: BatchWrite =
        new MemSinkBatchWrite(table, schema, doTruncate, None)
    }
    // WRITE-SIDE LAYOUT CONTRACT (`RequiresDistributionAndOrdering`):
    // the sink DEMANDS rows arrive clustered by the declared column
    // and sorted within each writer task, and SPARK plans the
    // exchange + sort to satisfy it — the DSv2 hook behind
    // Iceberg/Delta "write.distribution-mode" that turns ingest into
    // query-ready layout (one file set per cluster key group, sorted
    // runs) instead of requiring a separate OPTIMIZE pass. At 100 TB
    // this moves the clustering cost INTO the write shuffle the job
    // pays anyway. `writePartitions` pins the writer-task count
    // (`requiredNumPartitions` — a binding demand AQE must honor,
    // where 0/absent lets AQE size the exchange; the Iceberg
    // target-file-count lever).
    case Some(c) => new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity(c)))
      override def requiredOrdering(): Array[SortOrder] =
        Array(Expressions.sort(Expressions.identity(c),
          SortDirection.ASCENDING))
      override def requiredNumPartitions(): Int =
        writePartitions.getOrElse(0)
      override def toBatch: BatchWrite =
        new MemSinkBatchWrite(table, schema, doTruncate,
          Some(schema.fieldIndex(c)))
    }
  }
}

private[graft] class MemSinkBatchWrite(table: String, schema: StructType,
    truncate: Boolean, clusterIdx: Option[Int]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    MemSinkWriterFactory(schema, clusterIdx)

  /** Job commit — atomic publish of every committed task's rows.
    * Truncate mode is a plain put (last writer wins, like an
    * INSERT OVERWRITE); append mode uses a CAS loop over the TrieMap
    * so two jobs committing into the same table key concurrently both
    * land (a get-then-put would let one overwrite the other's rows). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val batches = messages.toSeq.collect { case m: MemSinkRows => m }
    val rows = batches.flatMap(_.rows)
    // distribution contract audit (clustered writes only): clustered
    // = no key appears in two tasks' key sets; ordered = every task
    // saw a non-decreasing run. Key sets are per-task and bounded by
    // the write — the check is harness-side proof, not a scale path.
    if (clusterIdx.isDefined) {
      val nonEmpty = batches.filter(_.rows.nonEmpty)
      val clustered = nonEmpty.map(_.keys).combinations(2).forall {
        case Seq(a, b) => a.intersect(b).isEmpty
        case _ => true
      }
      val sorted = nonEmpty.forall(_.sortedRun)
      MemSinkRegistry.layouts.put(table,
        (clustered, sorted, nonEmpty.size))
      ()
    }
    if (truncate) { MemSinkRegistry.tables.put(table, (schema, rows)); () }
    else {
      @annotation.tailrec
      def appendCas(): Unit =
        MemSinkRegistry.tables.get(table) match {
          case None =>
            if (MemSinkRegistry.tables.putIfAbsent(
                table, (schema, rows)).isDefined) appendCas()
          case Some(prev) =>
            if (!MemSinkRegistry.tables.replace(
                table, prev, (schema, prev._2 ++ rows))) appendCas()
        }
      appendCas()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Task-commit message: the partition's externalized rows (a real
  * sink's message carries its file/offset manifest instead), plus —
  * for clustered writes — the task's distinct cluster keys and
  * whether its rows arrived as a sorted run. */
private[graft] case class MemSinkRows(rows: Seq[Seq[Any]],
    keys: Set[Long] = Set.empty, sortedRun: Boolean = true)
    extends WriterCommitMessage

private[graft] case class MemSinkWriterFactory(schema: StructType,
    clusterIdx: Option[Int]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new MemSinkDataWriter(schema, clusterIdx)
}

private[graft] class MemSinkDataWriter(schema: StructType,
    clusterIdx: Option[Int]) extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
  private val keys = scala.collection.mutable.Set.empty[Long]
  private var sortedRun = true
  private var lastKey = Long.MinValue

  private def ext(row: InternalRow, i: Int, dt: DataType): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => row.getLong(i)
      case IntegerType | DateType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case StringType => row.getUTF8String(i).toString
      case other =>
        throw new IllegalArgumentException(s"MemSink: unsupported $other")
    }

  override def write(row: InternalRow): Unit = {
    buf += schema.fields.indices
      .map(i => ext(row, i, schema.fields(i).dataType))
    clusterIdx.foreach { i =>
      val k = row.getLong(i)
      if (k < lastKey) sortedRun = false
      lastKey = k
      keys += k
    }
    ()
  }

  override def commit(): WriterCommitMessage =
    MemSinkRows(buf.toSeq, keys.toSet, sortedRun)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
