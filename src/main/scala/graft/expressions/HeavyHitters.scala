package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SpaceSaving heavy-hitters aggregate over strings:
  * `graft_heavy_hitters(item, m)` keeps at most `m` (item -> count, err)
  * counters per group and returns them as
  * `array<struct<item:string, cnt:bigint, err:bigint>>` sorted by
  * (cnt desc, item asc).
  *
  * Guarantees (Metwally et al., SpaceSaving; Agarwal et al., "Mergeable
  * Summaries", PODS'12) — note the sequential/merged distinction, which
  * HeavyHittersProps hunted down empirically:
  *   - SEQUENTIAL (one partition): every stored `cnt` OVERestimates the
  *     item's true count, by at most its stored `err`, and err <= N/m;
  *   - MERGED (the distributed case): partial states merge by pointwise
  *     count/err sum + top-m prune; an item's occurrences that one
  *     partition's summary evicted are simply absent from its counter, so
  *     the merged `cnt` can sit on EITHER side of the truth — the
  *     guarantee is the two-sided |cnt - true| <= N/m, and `err` becomes
  *     an accumulated-eviction diagnostic rather than a one-sided bound;
  *   - any item with true count > N/m is guaranteed present, sequential
  *     or merged;
  *   - when the group's DISTINCT item count never exceeds m, no eviction
  *     happens anywhere, every err is 0 and the counts are EXACT — which
  *     is what the oracle-paired query asserts (it emits err=0 and
  *     hash-compares).
  * The plan is ONE ordinary two-phase ObjectHashAggregate: map-side
  * partials of bounded size m, one exchange of m-entry states per group,
  * no row-level distinct shuffle.
  *
  * That bounded state is the 100 TB story: exact top-k by count needs a
  * full (group, item) aggregate whose shuffle grows with the vocabulary;
  * this shuffles m entries per partition per group no matter how many
  * distinct items flow through. Eviction does a linear min-scan of the m
  * counters (m is small by construction; a production giant-m variant
  * would keep a min-heap, which changes nothing observable).
  */
case class HeavyHitters(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Number].intValue

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if !capacityExpr.foldable =>
      TypeCheckResult.TypeCheckFailure("graft_heavy_hitters capacity must be foldable")
    case StringType if !Seq(ByteType, ShortType, IntegerType, LongType).contains(capacityExpr.dataType) =>
      // type-check BEFORE eval: a foldable non-numeric capacity must fail
      // cleanly, not ClassCastException during analysis
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters capacity must be an integral literal, got ${capacityExpr.dataType.sql}")
    case StringType =>
      val m = capacityExpr.eval()
      if (m == null || m.asInstanceOf[Number].intValue < 1)
        TypeCheckResult.TypeCheckFailure("graft_heavy_hitters capacity must be a positive literal")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a string item, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"
  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]

  override def update(
      buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from eval may alias a reused scan buffer — materialize
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) cur(0) += 1
      else if (buf.size < capacity) buf.put(item, Array(1L, 0L))
      else {
        // SpaceSaving eviction: replace the min-count entry; the newcomer
        // inherits its count (the overestimate) and records it as err
        var minKey: String = null
        var minCnt = Long.MaxValue
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue()(0) < minCnt) { minCnt = e.getValue()(0); minKey = e.getKey }
        }
        buf.remove(minKey)
        buf.put(item, Array(minCnt + 1, minCnt))
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Array[Long]],
      b2: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    b2.forEach { (k, v) =>
      val cur = b1.get(k)
      if (cur != null) { cur(0) += v(0); cur(1) += v(1) }
      else b1.put(k, v.clone())
    }
    if (b1.size > capacity) {
      // PODS'12 merge rule: keep the m largest combined counters
      // (deterministic tiebreak on item so partial-merge order can't
      // change the survivor set)
      val keep = new java.util.ArrayList(b1.entrySet())
      keep.sort { (a, b) =>
        val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      }
      val pruned = new java.util.HashMap[String, Array[Long]](capacity)
      var i = 0
      while (i < capacity) { pruned.put(keep.get(i).getKey, keep.get(i).getValue); i += 1 }
      return pruned
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val rows = new Array[Any](entries.size)
    var i = 0
    while (i < entries.size) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    var n = 4
    val it = buf.entrySet().iterator()
    while (it.hasNext) n += 4 + 16 + it.next().getKey.getBytes(StandardCharsets.UTF_8).length
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    buf.forEach { (k, v) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(v(0)).putLong(v(1)): Unit
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt()
    val buf = new java.util.HashMap[String, Array[Long]](size * 2)
    var i = 0
    while (i < size) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), Array(bb.getLong(), bb.getLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}
