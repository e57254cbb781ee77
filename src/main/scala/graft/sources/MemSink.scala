package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
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

  def read(table: String): Option[(StructType, Seq[Seq[Any]])] =
    tables.get(table)

  def clear(table: String): Unit = { tables.remove(table); () }
}

private[graft] class MemSinkTable(tableName: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_memsink($tableName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemSinkWriteBuilder(tableName, info.schema())
}

private[graft] class MemSinkWriteBuilder(table: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemSinkBatchWrite(table, schema, doTruncate)
  }
}

private[graft] class MemSinkBatchWrite(table: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    MemSinkWriterFactory(schema)

  /** Job commit — atomic publish of every committed task's rows.
    * Truncate mode is a plain put (last writer wins, like an
    * INSERT OVERWRITE); append mode uses a CAS loop over the TrieMap
    * so two jobs committing into the same table key concurrently both
    * land (a get-then-put would let one overwrite the other's rows). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap {
      case MemSinkRows(r) => r
      case _ => Seq.empty
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
  * sink's message carries its file/offset manifest instead). */
private[graft] case class MemSinkRows(rows: Seq[Seq[Any]])
    extends WriterCommitMessage

private[graft] case class MemSinkWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new MemSinkDataWriter(schema)
}

private[graft] class MemSinkDataWriter(schema: StructType)
    extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]

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
    ()
  }

  override def commit(): WriterCommitMessage = MemSinkRows(buf.toSeq)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
