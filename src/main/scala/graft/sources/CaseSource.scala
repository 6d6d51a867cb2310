package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector with the shape a production Salesforce Case
  * source would have (SURVEY §2.1 S1: "production: DataSource V2
  * JDBC-style connector. Lazy paging ≈ partitioned scan"):
  *
  *  - the result set is split into `partitions` InputPartitions, the
  *    distributed analog of `query_all_iter`'s lazy pages
  *    (/root/reference/sync-db2.py:49-50);
  *  - SupportsPushDownFilters accepts the watermark predicate
  *    (`LastModifiedDate > ts`, the strict-`>` delta filter of
  *    sync-db2.py:163-167) and RecordTypeId equality (the SF_WHERE
  *    shape, config.py:102) — accepted filters are evaluated inside the
  *    source, exactly as SOQL pushdown would;
  *  - SupportsPushDownRequiredColumns prunes the generated columns (the
  *    explicit SOQL SELECT list, config.py:104-145).
  *
  * Since this environment has no network, rows are generated
  * deterministically from the row index: CaseNumber = i,
  * Status cycles New/Open/Closed, LastModifiedDate = 2024-01-01 + i
  * minutes, RecordTypeId cycles OTHER/012G.../'', Description =
  * 'case-<i>'. Options: rows (default 1000), partitions (default 4).
  */
class CaseSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CaseSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CaseTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object CaseSource {
  val schema: StructType = StructType(Seq(
    StructField("CaseNumber", StringType, nullable = false),
    StructField("Status", StringType, nullable = false),
    StructField("LastModifiedDate", TimestampType, nullable = false),
    StructField("RecordTypeId", StringType, nullable = false),
    StructField("Description", StringType, nullable = false)))

  /** 2024-01-01 00:00:00 UTC in microseconds. */
  val BaseMicros: Long = 1704067200L * 1000000L

  val Statuses = Array("New", "Open", "Closed")
  val RecordTypes = Array("OTHER", "012G00000014BhVIAU", "")

  def statusOf(i: Long): String = Statuses((i % 3).toInt)
  def recordTypeOf(i: Long): String = RecordTypes((i % 5).toInt.min(2))
  def modifiedMicrosOf(i: Long): Long = BaseMicros + i * 60L * 1000000L
}

class CaseTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_cases($rows)"
  override def schema(): StructType = CaseSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CaseScanBuilder(rows, partitions)
}

class CaseScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = CaseSource.schema

  /** Accept the predicates a SOQL WHERE could evaluate; everything else
    * stays a Spark-side residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("LastModifiedDate", _: java.sql.Timestamp) => true
      case EqualTo("RecordTypeId", _: String) => true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = new CaseScan(rows, partitions, pushed, requiredSchema)
}

class CaseScan(rows: Long, partitions: Int, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_cases pushed=[${pushed.mkString(", ")}] cols=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(start => CasePartition(start, math.min(start + per, rows)))
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CaseReaderFactory(pushed, required)
}

case class CasePartition(start: Long, end: Long) extends InputPartition

class CaseReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CaseReader(p.asInstanceOf[CasePartition], pushed, required)
}

/** Generates rows for one "page", applying pushed filters source-side. */
class CaseReader(p: CasePartition, pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = p.start - 1
  // Every accepted filter must be enforced (Spark drops accepted filters
  // from its own post-scan evaluation): multiple watermark bounds take
  // the tightest, multiple equalities must ALL hold. Timestamp → micros
  // keeps sub-millisecond precision so the strict `>` is not widened.
  private val wmMicros: Long = pushed.collect {
    case GreaterThan("LastModifiedDate", t: java.sql.Timestamp) =>
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
  }.foldLeft(Long.MinValue)(math.max)
  private val recordTypes: Seq[String] = pushed.collect {
    case EqualTo("RecordTypeId", s: String) => s
  }.toSeq

  private def passes(idx: Long): Boolean =
    CaseSource.modifiedMicrosOf(idx) > wmMicros &&
      recordTypes.forall(_ == CaseSource.recordTypeOf(idx))

  override def next(): Boolean = {
    i += 1
    while (i < p.end && !passes(i)) i += 1
    i < p.end
  }

  override def get(): InternalRow = {
    val full = Map[String, Any](
      "CaseNumber" -> UTF8String.fromString(i.toString),
      "Status" -> UTF8String.fromString(CaseSource.statusOf(i)),
      "LastModifiedDate" -> CaseSource.modifiedMicrosOf(i),
      "RecordTypeId" -> UTF8String.fromString(CaseSource.recordTypeOf(i)),
      "Description" -> UTF8String.fromString(s"case-$i"))
    InternalRow.fromSeq(required.fieldNames.toSeq.map(full))
  }

  override def close(): Unit = ()
}
