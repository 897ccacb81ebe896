package graft.udf

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** UDF / UDAF surface (SURVEY §2-B rows `udf_scalar`, `udaf_agg`).
  *
  * The scalar UDF reimplements the reference's comma-tolerant integer cast
  * (reference main.py:389-399) as a Scala closure — the library's preferred
  * form remains the codegen-friendly built-in composition
  * (regexp_replace + try_cast, see CtbOps); this exists to exercise the UDF
  * extension point and to prove parity between the two forms.
  */
object Udfs {

  /** Comma-stripping integer parse; null on failure (the reference's
    * ValueError -> None path).
    */
  val parseIntComma = udf { (s: String) =>
    if (s == null) None
    else {
      val cleaned = s.replace(",", "").trim
      if (cleaned.isEmpty) None
      else try Some(cleaned.toLong) catch { case _: NumberFormatException => None }
    }
  }

  /** Typed Aggregator mirroring the reference's error-report counters
    * (valid/invalid row tallies, main.py:432,461,657): input is a raw field
    * string; output is invalid-rows-per-mille as an exact integer.
    */
  case class ErrCounts(valid: Long, invalid: Long)

  class ErrorRateAggregator extends Aggregator[String, ErrCounts, Long] {
    private def isValid(s: String): Boolean =
      s != null && (s.isEmpty || (try { s.replace(",", "").trim.toLong; true }
        catch { case _: NumberFormatException => false }))
    def zero: ErrCounts = ErrCounts(0L, 0L)
    def reduce(b: ErrCounts, a: String): ErrCounts =
      if (isValid(a)) b.copy(valid = b.valid + 1) else b.copy(invalid = b.invalid + 1)
    def merge(x: ErrCounts, y: ErrCounts): ErrCounts =
      ErrCounts(x.valid + y.valid, x.invalid + y.invalid)
    def finish(r: ErrCounts): Long =
      if (r.valid + r.invalid == 0) 0L else r.invalid * 1000L / (r.valid + r.invalid)
    def bufferEncoder: Encoder[ErrCounts] = Encoders.product[ErrCounts]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form of the aggregator (usable in DataFrame .agg). */
  def errPermille(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new ErrorRateAggregator).apply(c)

  /** One (score, key) candidate for [[TopKAggregator]]. */
  case class Scored(v: Double, k: Long)

  /** Bounded top-k per group as a typed Aggregator: the buffer is a k-bounded
    * list sorted by (v DESC, k ASC), merged map-side.
    *
    * Scale rationale: the standard `row_number() OVER (PARTITION BY g ORDER
    * BY v DESC) <= k` plan shuffles and sorts EVERY row of the group; this
    * aggregator's partial aggregation bounds what crosses the wire to k rows
    * per (group × map partition) — at 100 TB with millions of rows per group
    * the shuffle shrinks by orders of magnitude. The deterministic (v, k)
    * tie-break keeps the result reproducible across partitionings.
    */
  class TopKAggregator(topK: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(topK >= 1, s"TopKAggregator: k must be >= 1, got $topK")
    private def lt(a: Scored, b: Scored): Boolean =
      a.v > b.v || (a.v == b.v && a.k < b.k)
    def zero: Seq[Scored] = Nil
    def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
      if (buf.lengthCompare(topK) >= 0 && !lt(in, buf.last)) buf
      else {
        val (before, after) = buf.span(lt(_, in))
        ((before :+ in) ++ after).take(topK)
      }
    }
    def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
      val out = Seq.newBuilder[Scored]
      var (a, b) = (x, y); var n = 0
      while (n < topK && (a.nonEmpty || b.nonEmpty)) {
        if (b.isEmpty || (a.nonEmpty && lt(a.head, b.head))) { out += a.head; a = a.tail }
        else { out += b.head; b = b.tail }
        n += 1
      }
      out.result()
    }
    def finish(r: Seq[Scored]): Seq[Scored] = r
    def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: top-k (score, key) rows per group as array<struct<v,k>>. */
  def topK(k: Int)(score: Column, key: Column): Column =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(score, key)
}
