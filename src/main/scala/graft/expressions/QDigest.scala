package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native q-digest quantile sketch (Shrivastava, Buragohain, Agrawal,
  * Suri — "Medians and Beyond", SenSys'04; mergeability per Agarwal et
  * al., PODS'12): `graft_qdigest(value, bits, k)` summarizes non-negative
  * longs in the fixed universe [0, 2^bits) with at most O(k·bits) dyadic
  * tree counters and returns the three quartile estimates as
  * `array<bigint>` [q25, q50, q75].
  *
  * The quantile sketch completes the classic-summary plane next to
  * SpaceSaving (top-k), Count-Min (frequency), and FM/bitmap/HLL
  * (distinct): bounded state per group regardless of value volume, and
  * partial states MERGE (counts add, then one recompress) — the
  * map-side-combine property the exact form (per-group sort) lacks.
  *
  * Guarantees:
  *   - rank error: each returned estimate's true rank is within
  *     (bits/k)·n of the target rank (the classic ε = log(U)/k bound) —
  *     the oracle-paired query verifies THIS bound in-plan, because
  *   - the estimate VALUE itself is not merge-order canonical: compression
  *     is deterministic given a count map, but different partitionings
  *     compress at different intermediate n, so two legal runs may return
  *     different (both in-bound) estimates — same adjudication as
  *     approx_percentile/HLL (gate the bound, not the estimate);
  *   - EXACT regime: while n < k the compression threshold floor(n/k) is
  *     zero, nothing ever collapses, and estimates are exact order
  *     statistics (value at rank ceil(q·n)) — spec-pinned.
  *
  * Tree convention: complete binary tree over the universe, root id 1,
  * children (2i, 2i+1); the leaf for value v has id 2^bits + v. A node at
  * depth d covers a 2^(bits−d)-value dyadic range. The q-digest invariant
  * — every collapsed pair satisfied count(v)+count(sibling)+count(parent)
  * <= floor(n/k) at its collapse — is restored by one bottom-up pass
  * (compress) after updates exceed 8·k·bits live nodes and after every
  * merge; quantile queries walk nodes in ascending max-covered-value
  * order (ties: deeper/narrower first) accumulating counts to the target
  * rank.
  */
case class QDigest(
    child: Expression,
    bitsExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  private lazy val bits: Int = bitsExpr.eval().asInstanceOf[Number].intValue
  private lazy val k: Long = kExpr.eval().asInstanceOf[Number].longValue
  private lazy val leafBase: Long = 1L << bits
  // computed in Long: 8*k*bits overflows Int for k > ~2^27, which would
  // floor maxLive at 64 and make every post-64 update pay a compress()
  // scan (quadratic); cap at 2^22 live nodes — beyond that the "sketch"
  // is bigger than any sensible exact histogram anyway
  private lazy val maxLive: Int =
    math.max(64L, math.min(8L * k * bits, 1L << 22)).toInt

  override def checkInputDataTypes(): TypeCheckResult = {
    val integral = Seq(ByteType, ShortType, IntegerType, LongType)
    if (!integral.contains(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_qdigest requires an integral value, got ${child.dataType.sql}")
    else if (!bitsExpr.foldable || !kExpr.foldable ||
      !integral.contains(bitsExpr.dataType) || !integral.contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_qdigest bits and k must be integral literals")
    else {
      val b = bitsExpr.eval(); val kk = kExpr.eval()
      if (b == null || kk == null) TypeCheckResult.TypeCheckFailure(
        "graft_qdigest bits and k must be non-null literals")
      else {
        val bv = b.asInstanceOf[Number].intValue
        val kv = kk.asInstanceOf[Number].longValue
        if (bv < 1 || bv > 62) TypeCheckResult.TypeCheckFailure(
          "graft_qdigest bits must be in [1, 62]")
        else if (kv < 1) TypeCheckResult.TypeCheckFailure(
          "graft_qdigest k must be positive")
        else TypeCheckResult.TypeCheckSuccess
      }
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdigest"
  override def children: Seq[Expression] = Seq(child, bitsExpr, kExpr)

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]

  private def total(buf: java.util.HashMap[Long, Long]): Long = {
    var n = 0L
    val it = buf.values().iterator()
    while (it.hasNext) n += it.next()
    n
  }

  /** One bottom-up compression pass: collapse sibling pairs (and their
    * parent slot) whose combined count fits the floor(n/k) threshold.
    * Deterministic: levels ascend, ids within a level ascend.
    */
  private def compress(buf: java.util.HashMap[Long, Long]): Unit = {
    val n = total(buf)
    val t = n / k
    if (t <= 0) return
    var depth = bits
    while (depth >= 1) {
      val lo = 1L << depth
      val hi = lo << 1
      // snapshot this level's live ids in ascending order
      val ids = new java.util.ArrayList[java.lang.Long]()
      val it = buf.keySet().iterator()
      while (it.hasNext) {
        val id = it.next()
        if (id >= lo && id < hi) ids.add(id)
      }
      java.util.Collections.sort(ids)
      var i = 0
      while (i < ids.size) {
        val id = ids.get(i)
        // process each sibling pair once, at its even member (or a lone
        // odd member whose even sibling is absent)
        val even = id & ~1L
        if (id == even || !buf.containsKey(even)) {
          val sib = even + 1
          val c1 = buf.getOrDefault(even, 0L)
          val c2 = buf.getOrDefault(sib, 0L)
          val p = even >> 1
          val cp = buf.getOrDefault(p, 0L)
          if (c1 + c2 > 0 && c1 + c2 + cp <= t) {
            buf.remove(even); buf.remove(sib)
            buf.put(p, cp + c1 + c2)
          }
        }
        i += 1
      }
      depth -= 1
    }
  }

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x0 = v.asInstanceOf[Number].longValue
      // clamp into the universe (documented: the sketch summarizes the
      // clamped distribution; callers size `bits` to their domain)
      val x = if (x0 < 0) 0L else if (x0 >= leafBase) leafBase - 1 else x0
      buf.merge(leafBase + x, 1L, (a, b) => a + b)
      if (buf.size > maxLive) compress(buf)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Long, Long], b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b2.forEach { (id, c) => b1.merge(id, c, (a, b) => a + b) }
    compress(b1)
    b1
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    // nodes sorted by (max covered value asc, depth desc = narrower first)
    final case class Node(maxV: Long, depth: Int, cnt: Long)
    val nodes = new java.util.ArrayList[Node](buf.size)
    buf.forEach { (id, c) =>
      val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
      val width = bits - depth
      val maxV = ((id - (1L << depth) + 1) << width) - 1
      nodes.add(Node(maxV, depth, c))
    }
    nodes.sort { (a, b) =>
      val c = java.lang.Long.compare(a.maxV, b.maxV)
      if (c != 0) c else Integer.compare(b.depth, a.depth)
    }
    def estimate(num: Long, den: Long): Long = {
      val target = math.max(1L, (n * num + den - 1) / den) // ceil(q*n)
      var cum = 0L
      var i = 0
      while (i < nodes.size) {
        cum += nodes.get(i).cnt
        if (cum >= target) return nodes.get(i).maxV
        i += 1
      }
      nodes.get(nodes.size - 1).maxV
    }
    new GenericArrayData(Array[Any](
      estimate(1, 4), estimate(1, 2), estimate(3, 4))): ArrayData
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { (id, c) => bb.putLong(id).putLong(c): Unit }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt()
    val buf = new java.util.HashMap[Long, Long](size * 2)
    var i = 0
    while (i < size) { buf.put(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QDigest =
    copy(child = newChildren(0), bitsExpr = newChildren(1), kExpr = newChildren(2))
}
