package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Native EXACT distinct-count aggregate over `bigint` ids:
  * `graft_bitmap_distinct(id)` maintains a (chunk -> 64-bit mask) bitmap
  * per group — chunk = id >> 6, bit = id & 63, the same floor-semantics
  * layout as the oracle-checked `agg_bitmap` query and the
  * [[graft.ops.BitmapIncremental]] state table.
  *
  * Why a custom aggregate when `count(DISTINCT)` exists: Spark plans
  * DISTINCT aggregation as an Expand + a second keyed shuffle whose
  * volume grows with distinct (group, id) observations; this aggregate is
  * ONE ordinary two-phase hash aggregate whose partial state is the
  * bitmap itself — map-side combined, shuffled once, merged by `bit_or`.
  * Versus the two-groupBy `agg_bitmap` composition it saves the first
  * shuffle entirely (partials merge across partitions without a chunk
  * exchange). The trade: per-group memory is live-id-domain/8 bytes
  * (dense ids compress 64:1; a sparse far-flung domain degrades toward
  * 16 bytes/id — use the HLL sketch when approximate is acceptable).
  *
  * ImperativeAggregate evaluates outside whole-stage codegen by design
  * (object buffer); the rows-per-group reduction dominates that cost in
  * every aggregate-bound plan. Null ids are ignored, like count/count
  * distinct.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_distinct requires bigint, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      buf.merge(id >> 6, 1L << (id & 63L).toInt, (a, b) => a | b)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Long, Long], b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b2.forEach { (k, v) => b1.merge(k, v, (a, b) => a | b): Unit }
    b1
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    var n = 0L
    buf.forEach { (_, mask) => n += java.lang.Long.bitCount(mask) }
    n
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    buf.forEach { (k, v) => bb.putLong(k).putLong(v): Unit }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val buf = new java.util.HashMap[Long, Long](bytes.length / 16)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.put(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren.head)
}
