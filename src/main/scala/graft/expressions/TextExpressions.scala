package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel.
  *
  * The declarative signature build (explode tokens → project the shared
  * 60-bit hash → groupBy(doc_id) with 16 min() columns) is ONE
  * hash-aggregate, but it still inflates every document into |tokens|
  * rows and shuffles them on doc_id before the aggregate runs. A document
  * is already one row — the 16 slot minima are a pure per-row fold, so
  * this expression computes them IN-ROW: a single pass over the text
  * bytes, tokenizing on the same single-space rule as `split(text, ' ')`,
  * MD5-hashing each token (top-60-bits, the h60 the DuckDB oracle
  * shares), and min-folding the 16 affine permutations
  * `(97+13j)·(h mod P) + (31+7j) mod P` (P = 2^31−1) as it goes. Zero
  * row inflation, zero pre-join shuffle; the band self-join becomes the
  * FIRST exchange of the whole dedup query.
  *
  * Returns null for a document with no nonempty tokens — mirroring the
  * aggregate form, where such a doc simply has no group — so callers
  * filter nulls exactly where the old shape dropped empty docs.
  *
  * The heavy lifting lives in a static JVM method; `doGenCode` emits a
  * direct call, keeping the surrounding projection inside whole-stage
  * codegen without inlining the MD5 loop into generated Java.
  */
case class MinhashSigs16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash16 requires string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash16"

  override def nullSafeEval(input: Any): Any =
    MinhashSigs16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSigs16.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp = $cls.compute($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs16 =
    copy(child = newChild)
}

/** In-row 32-bit SimHash twin of [[MinhashSigs16]]: the per-bit balance
  * bal_i = Σ_token-instances ±1 is a plain per-row fold, so the whole
  * fingerprint computes in one pass over the text bytes — no explode, no
  * 32-sum hash-aggregate, no pre-banding shuffle. Same tokenize rule and
  * h60 hash as the aggregate form (and the DuckDB oracle); null for a
  * document with no nonempty tokens.
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash32 requires string, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    Simhash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Simhash32.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("fp")
      s"""
         |Object $tmp = $cls.compute($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $tmp).longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  /** One pass: ±1 per (token instance, bit) into 32 counters, fingerprint
    * bit set iff its balance is positive. Boxed Long or null (no tokens).
    */
  def compute(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val md = MinhashSigs16.digest()
    val bal = new Array[Int](32)
    var any = false
    var start = 0
    val n = bytes.length
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) {
          md.reset()
          md.update(bytes, start, i - start)
          val dig = md.digest()
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
          val h60 = h >>> 4
          var j = 0
          while (j < 32) {
            if (((h60 >> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
            j += 1
          }
          any = true
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) return null
    var fp = 0L
    var j = 0
    while (j < 32) { if (bal(j) > 0) fp |= 1L << j; j += 1 }
    java.lang.Long.valueOf(fp)
  }
}

object MinhashSigs16 {
  private val P = 2147483647L // 2^31 - 1, shared with the oracle SQL

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[expressions] def digest(): java.security.MessageDigest = digests.get()

  /** One pass: tokenize on single spaces (the `split(text, ' ')` rule —
    * other whitespace stays inside tokens), skip empties, fold each
    * token's h60 into the 16 minima. Null when no token survives.
    */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val md = digests.get()
    val mins = new Array[Long](16)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var start = 0
    val n = bytes.length
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) { // nonempty token [start, i)
          md.reset()
          md.update(bytes, start, i - start)
          val dig = md.digest()
          // first 15 hex chars = top 60 bits of the digest
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
          val hp = (h >>> 4) % P
          var j = 0
          while (j < 16) {
            val v = ((97 + 13 * j) * hp + (31 + 7 * j)) % P
            if (v < mins(j)) mins(j) = v
            j += 1
          }
          any = true
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

/** Unicode NFC normalization (the canonical-composition step every web
  * corpus runs before hashing/dedup: a decomposed `e`+U+0301 and the
  * precomposed `é` must not count as different documents). Thin, total
  * wrapper over `java.text.Normalizer` with an `isNormalized` fast path —
  * for the ASCII/already-composed bulk of a real corpus the input
  * UTF8String is returned as-is, zero allocation. Parity twin of DuckDB's
  * `nfc_normalize` (both implement UAX #15 NFC).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires string, got ${t.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Accent folding: NFD decomposition, then every non-spacing mark (Unicode
  * category Mn) dropped — `é/è/ê → e`, `ñ → n`, `ç → c`. The canonical
  * pre-hash key fold for cross-crawl dedup of Latin-script corpora (the
  * same fold DuckDB's utf8proc-backed `strip_accents` applies, which is
  * what the oracle runs). ASCII fast path returns the input UTF8String
  * untouched — no decomposition, no allocation — so at corpus scale the
  * cost is one byte scan for the overwhelmingly-ASCII majority.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_unaccent requires string, got ${t.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unaccent"

  override def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = StripAccents.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path on the raw bytes: no byte >= 0x80 → nothing to fold
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val nfd = java.text.Normalizer.normalize(
          s.toString, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var j = 0
        while (j < nfd.length) {
          val c = nfd.charAt(j)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          j += 1
        }
        return UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    s
  }
}
