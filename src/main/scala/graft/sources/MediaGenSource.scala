package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{ImageCodec, JpegCodec, WavCodec}

/** DataSource V2 synthetic MEDIA-corpus generator — [[DocGenSource]]'s
  * binary sibling, so the multimodal plane ([[graft.ops.MultimodalPrep]],
  * the codec kernels) can be exercised and BENCHED at any scale without
  * shipping fixture bytes: payloads are REAL encoded media (PPM, PNG, GIF
  * stills through [[ImageCodec]]'s encoders, entropy-coded baseline JPEG
  * through [[JpegCodec]], baseline TIFF through [[graft.ops.TiffCodec]],
  * 16-bit PCM WAV through [[WavCodec]], multi-frame PPM streams as
  * video), generated on the executors as a pure function of `media_id`.
  *
  * Corpus realism knobs, all deterministic:
  *   - ~10% exact duplicates: ids ending in 9 replay the content of the
  *     decade's first id (same kind, same bytes) — content dedup has
  *     something to find;
  *   - ~1/37 of contents are TRUNCATED mid-payload — the poison blobs the
  *     codecs' totality contract and the prep fallback path exist for.
  *
  * Connector contract (same three hooks as DocGenSource, which is the
  * seam's reference implementation): `media_id` bound pushdown narrows the
  * generation interval at planning time; column pruning means a
  * metadata-only projection never encodes a payload; partition planning
  * gives each reader a contiguous id range. Micro-batch streaming reuses
  * the row-position offset scheme — replaying a committed range
  * regenerates identical bytes, so the streaming media-prep twin inherits
  * exactly-once semantics from determinism alone.
  */
class MediaGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MediaGen.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MediaGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object MediaGen {
  val SCHEMA: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** ids ending in 9 duplicate the content of the decade's first id. */
  def contentKey(id: Long): Long = if (id % 10 == 9) id - 9 else id

  private def mix(z: Long): Long = DocGen.mix(z)

  /** (kind, mime) — a pure function of the CONTENT key so duplicate pairs
    * agree on modality. The compressed-image slot rotates PNG / GIF /
    * JPEG / TIFF / QOI / ICO so every image family in the codec plane
    * (DEFLATE, LZW, lossy DCT, tag-directory, byte-oriented, and the
    * favicon container) appears in any realistic slice of the corpus.
    */
  def kindOf(id: Long): (String, String) = (contentKey(id) % 4) match {
    case 0 => ("image", "image/x-portable-pixmap")
    case 1 => (math.floorMod(mix(contentKey(id) + 11), 6): @unchecked) match {
      case 0 => ("image", "image/png")
      case 1 => ("image", "image/gif")
      case 2 => ("image", "image/jpeg")
      case 3 => ("image", "image/tiff")
      case 4 => ("image", "image/qoi")
      case 5 => ("image", "image/vnd.microsoft.icon")
    }
    case 2 => ("audio", "audio/wav")
    case _ => // the video slot alternates raw PPM streams and animated GIF
      if ((mix(contentKey(id) + 19) & 1) == 0) ("video", "video/x-ppm-stream")
      else ("video", "image/gif")
  }

  private def raster(seed: Long): ImageCodec.Raster = {
    val w = 16 + (mix(seed) & 31).toInt
    val h = 16 + (mix(seed + 1) & 31).toInt
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      // one mix per 8 bytes, not per byte
      val m = mix(seed * 31 + (i >> 3))
      rgb(i) = (m >>> ((i & 7) * 8)).toByte
      i += 1
    }
    ImageCodec.Raster(w, h, rgb)
  }

  /** Payload bytes for `id` — dedup/poison rules applied on the content
    * key, so both copies of a duplicate share the same (possibly
    * truncated) bytes.
    */
  def payloadOf(id: Long): Array[Byte] = {
    val ck = contentKey(id)
    val whole = (ck % 4) match {
      case 0 => ImageCodec.encodePpm(raster(ck * 131 + 5))
      case 1 => (math.floorMod(mix(ck + 11), 6): @unchecked) match {
        case 0 => ImageCodec.encodePng(raster(ck * 131 + 5))
        case 1 =>
          // GIF needs <= 256 colors: quantize each channel to 4 levels
          val r0 = raster(ck * 131 + 5)
          val q = ImageCodec.Raster(r0.width, r0.height,
            r0.rgb.map(b => (((b & 0xff) >> 6) * 85).toByte))
          ImageCodec.encodeGif(q).get // 64 distinct colors max — always Some
        case 2 => // the lossy family: full entropy-coded baseline 4:2:0
          JpegCodec.encode(raster(ck * 131 + 5), quality = 85, subsample420 = true)
        case 3 => // the tag-directory family: single-strip baseline TIFF
          graft.ops.TiffCodec.encodeTiff(raster(ck * 131 + 5))
        case 4 => // the byte-oriented family
          graft.ops.QoiCodec.encodeQoi(raster(ck * 131 + 5))
        case 5 => // the favicon container: BMP member + PNG member
          graft.ops.IcoCodec.buildIco(
            Seq(raster(ck * 131 + 5), raster(ck * 131 + 6)),
            asPng = _ == 1).get // rasters cap at 47 px — always Some
      }
      case 2 =>
        val n = 400 + (mix(ck) & 1023).toInt
        val samples = Array.tabulate(n)(i =>
          ((mix(ck * 17 + i / 64) >>> ((i % 64 / 4) * 4)) & 0x7ff).toShort)
        val pcm = WavCodec.Pcm(8000, 1, samples)
        // half the audio corpus is IMA ADPCM (format 0x11), half PCM16 —
        // both are WAV containers, so the mime doesn't split
        if ((mix(ck + 23) & 1) == 0) WavCodec.encodeWav(pcm)
        else WavCodec.encodeImaAdpcm(pcm)
      case _ =>
        val frames = 3 + (mix(ck) & 3).toInt
        if ((mix(ck + 19) & 1) == 0)
          (0 until frames).map(f => ImageCodec.encodePpm(raster(ck * 257 + f)))
            .reduce(_ ++ _)
        else {
          // animated GIF: all frames share frame 0's dims (the container
          // requires one logical screen), pixels quantized to 4 levels per
          // channel so the union palette always fits (<= 64 colors)
          val anchor = raster(ck * 257)
          val qFrames = (0 until frames).map { f =>
            val rgb = new Array[Byte](anchor.rgb.length)
            var j = 0
            while (j < rgb.length) {
              val m = mix((ck * 257 + f) * 31 + (j >> 3))
              rgb(j) = (((((m >>> ((j & 7) * 8)) & 0xff) >> 6) * 85)).toByte
              j += 1
            }
            ImageCodec.Raster(anchor.width, anchor.height, rgb)
          }
          ImageCodec.encodeGifAnimated(qFrames).get // always Some: 64-color cap
        }
    }
    if (mix(ck * 3 + 1) % 37 == 0) whole.take(whole.length * 3 / 5) // poison
    else whole
  }
}

class MediaGenTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"mediagen($rows)"
  override def schema(): StructType = MediaGen.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MediaGenScanBuilder(rows, partitions,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(rows))
}

class MediaGenScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var cols: StructType = MediaGen.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("media_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("media_id", _: java.lang.Long) => true
      case LessThan("media_id", _: java.lang.Long) => true
      case LessThanOrEqual("media_id", _: java.lang.Long) => true
      case EqualTo("media_id", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("media_id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("media_id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("media_id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("media_id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case EqualTo("media_id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = { cols = requiredSchema }
  override def build(): Scan =
    new MediaGenScan(lo, math.max(lo, hi), partitions, cols, rowsPerBatch)
}

class MediaGenScan(lo: Long, hi: Long, partitions: Int, cols: StructType, rowsPerBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = cols
  override def toBatch: Batch = this
  override def description(): String =
    s"mediagen[$lo, $hi) cols=${cols.fieldNames.mkString(",")}"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MediaGenMicroBatchStream(lo, hi, partitions, cols, rowsPerBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      MediaGenPartition(lo + n * i / p, lo + n * (i + 1) / p): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new MediaGenReaderFactory(cols)
}

case class MediaGenPartition(start: Long, end: Long) extends InputPartition

case class MediaGenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class MediaGenMicroBatchStream(lo: Long, hi: Long, partitions: Int, cols: StructType,
    rowsPerBatch: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = MediaGenOffset(lo)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    MediaGenOffset(math.min(hi, start.asInstanceOf[MediaGenOffset].pos + rowsPerBatch))
  override def latestOffset(): Offset = MediaGenOffset(hi)
  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(rowsPerBatch)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = MediaGenOffset(hi)
  override def deserializeOffset(json: String): Offset = MediaGenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MediaGenOffset].pos
    val e = end.asInstanceOf[MediaGenOffset].pos
    val n = e - s
    if (n <= 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      MediaGenPartition(s + n * i / p, s + n * (i + 1) / p): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new MediaGenReaderFactory(cols)
}

class MediaGenReaderFactory(cols: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MediaGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // payload encodes at most ONCE per row (n_bytes forces it too),
        // and not at all for id/kind/mime-only projections
        lazy val payload = MediaGen.payloadOf(id)
        lazy val km = MediaGen.kindOf(id)
        val vals = cols.fields.map(_.name match {
          case "media_id" => id: java.lang.Long
          case "kind" => UTF8String.fromString(km._1)
          case "mime" => UTF8String.fromString(km._2)
          case "payload" => payload
          case "n_bytes" => payload.length.toLong: java.lang.Long
        })
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
