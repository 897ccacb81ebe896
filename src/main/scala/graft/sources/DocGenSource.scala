package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-corpus generator — the engine's one custom
  * `TableProvider`, exercising the connector API the file formats never
  * touch. `spark.read.format(classOf[DocGenSource].getName)
  * .option("rows", n).option("partitions", p).load()` yields a
  * deterministic `documents`-shaped table computed on the executors: no
  * disk, no network, content a pure function of `doc_id` (the same
  * split-mix mixing used across the engine's deterministic fixtures).
  *
  * Why a generator source instead of `spark.range(...).select(...)`:
  * the point is the CONNECTOR contract, demonstrated end to end —
  *   - `SupportsPushDownFilters`: `doc_id` bounds narrow the generation
  *     interval at PLANNING time, so `WHERE doc_id < k` creates
  *     partitions only for `[0, k)` — pruning before any task exists
  *     (the DSv2 twin of the file-stats manifest);
  *   - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *     requested columns — `select(count)` builds no document text;
  *   - partition planning: `partitions` readers each own a contiguous
  *     id range, so generation scales out like any scan.
  *
  * The same three hooks are exactly what a real warehouse connector
  * (BigQuery/Iceberg/JDBC) implements; this is the seam's reference
  * implementation, behavior-pinned in DocGenSourceSpec.
  */
class DocGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object DocGen {
  val SCHEMA: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val WORDS = Array("scan", "filter", "join", "hash", "merge", "batch",
    "row", "column", "table", "value", "query", "spark", "data", "key", "fast", "small")
  private val LANGS = Array("en", "de", "fr", "es")

  /** splitmix64 — the deterministic per-id seed */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textOf(id: Long): String = {
    val n = 8 + (mix(id) & 15).toInt // 8..23 words
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(WORDS((mix(id * 31 + i) & 15).toInt))
      i += 1
    }
    sb.toString
  }

  def langOf(id: Long): String = LANGS((mix(id + 7) & 3).toInt)
}

class DocGenTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"docgen($rows)"
  override def schema(): StructType = DocGen.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, partitions,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(rows))
}

class DocGenScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long = Long.MaxValue)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var cols: StructType = DocGen.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case EqualTo("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: java.lang.Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    // accepted bounds are EXACTLY enforced by interval narrowing, so only
    // the remainder needs Spark-side re-evaluation
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = { cols = requiredSchema }

  override def build(): Scan = new DocGenScan(lo, math.max(lo, hi), partitions, cols, rowsPerBatch)
}

class DocGenScan(lo: Long, hi: Long, partitions: Int, cols: StructType,
    rowsPerBatch: Long = Long.MaxValue)
    extends Scan with Batch {
  override def readSchema(): StructType = cols
  override def toBatch: Batch = this
  override def description(): String = s"docgen[$lo, $hi) cols=${cols.fieldNames.mkString(",")}"

  /** Streaming form: the same deterministic table as an offset-tracked
    * micro-batch stream. Offsets are plain row positions in [lo, hi);
    * each trigger admits at most `rowsPerBatch` ids, partitioned like the
    * batch scan. Because (offset -> rows) is a pure function, replaying a
    * committed offset range regenerates IDENTICAL rows — the
    * exactly-once-after-restart property the spec pins by killing and
    * resuming a query mid-stream on one checkpoint.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocGenMicroBatchStream(lo, hi, partitions, cols, rowsPerBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      val s = lo + n * i / p
      val e = lo + n * (i + 1) / p
      DocGenPartition(s, e): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new DocGenReaderFactory(cols)
}

case class DocGenPartition(start: Long, end: Long) extends InputPartition

/** Row-position offset, serialized as its decimal string. */
case class DocGenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class DocGenMicroBatchStream(lo: Long, hi: Long, partitions: Int, cols: StructType,
    rowsPerBatch: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = DocGenOffset(lo)
  // rate limiting happens HERE (admission control), never by truncating a
  // planned batch — an engine-committed offset range must produce exactly
  // its rows or restart semantics break
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    DocGenOffset(math.min(hi, start.asInstanceOf[DocGenOffset].pos + rowsPerBatch))
  override def latestOffset(): Offset = DocGenOffset(hi) // non-admission path: everything
  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(rowsPerBatch)
  // Trigger.AvailableNow: the run's END boundary is the whole table while
  // every batch stays admission-capped — without this interface the
  // engine's wrapper captures ONE capped offset as the boundary and a
  // rate-limited run stops after its first batch (pinned by the spec)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = DocGenOffset(hi)
  override def deserializeOffset(json: String): Offset = DocGenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocGenOffset].pos
    val e = end.asInstanceOf[DocGenOffset].pos
    val n = e - s
    if (n <= 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      DocGenPartition(s + n * i / p, s + n * (i + 1) / p): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new DocGenReaderFactory(cols)
}

class DocGenReaderFactory(cols: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // materialize ONLY pruned columns — text never builds for a
        // count() or an id-only projection; when text AND n_chars are both
        // projected, generate the text once per row, not per column
        lazy val text = DocGen.textOf(id)
        val vals = cols.fields.map(_.name match {
          case "doc_id" => id: java.lang.Long
          case "text" => UTF8String.fromString(text)
          case "lang" => UTF8String.fromString(DocGen.langOf(id))
          case "n_chars" => text.length.toLong: java.lang.Long
        })
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
