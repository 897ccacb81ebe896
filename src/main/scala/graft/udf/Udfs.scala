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
}
