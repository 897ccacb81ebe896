package graft.ingest

import graft.schema.CtbSchema
import graft.schema.CtbSchema._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result of ingesting one CTB file.
  *
  * @param clean   typed rows that survived validation (the rows the reference
  *                would insert into the sink, reference main.py:413-414)
  * @param errors  one row per recorded error string (reference accumulates
  *                human-readable strings, main.py:367-368; here a DataFrame so
  *                the error channel scales past driver memory)
  * @param fileFailed whole-file failure (empty file / unknown header), the
  *                reference's "move to Failed" outcomes (main.py:290-295,353-364)
  * @param failureReason populated when fileFailed
  */
case class IngestResult(
    clean: DataFrame,
    errors: DataFrame,
    fileFailed: Boolean,
    failureReason: Option[String])

/** Distributed re-expression of the reference's TSV ingest loop
  * (reference main.py:287-414). The reference materializes the whole file in
  * driver memory and loops row-at-a-time; here the file is a line-delimited
  * text scan and every per-row rule is a Catalyst expression, so the same
  * semantics run partition-parallel over arbitrarily large files.
  *
  * Semantics matched 1:1 (SURVEY §2-A B1-B13):
  *   B1  empty / header-only file        -> whole file Failed
  *   B3  header cleaning                 -> driver-side on the header row only
  *   B4  header -> canonical rename
  *   B5  unknown header                  -> whole file Failed
  *   B6  row width != header width       -> row skipped + error recorded
  *   B7  every field trimmed
  *   B8  empty string -> NULL (before casting)
  *   B9  INTEGER: strip "," then cast; failure -> error + row flagged
  *   B10 DATE: strict yyyy-MM-dd; failure -> error + row flagged
  *   B12 any flagged row is DROPPED (not inserted null-padded) — neither
  *       PERMISSIVE nor DROPMALFORMED reproduces this; composed by hand
  *   B13 errors accumulate with 1-based line numbers + row content
  */
object CtbIngest {

  private val LINE = "_line"
  private val LINENO = "_lineno"

  /** Ingest a TSV file from `path` (local or any Hadoop FS). */
  def ingestFile(spark: SparkSession, path: String): IngestResult = {
    // B1: read as raw lines; header handling needs the first line only.
    val raw = spark.read.text(path)
    // Reference does bytes.decode().strip().split('\n') — trailing blank
    // lines disappear via strip(); we filter blank lines the same way.
    val firstLine = raw.limit(1).collect().headOption.map(_.getString(0))
    firstLine match {
      case None =>
        return failed(spark, "File is empty")
      case Some(header) =>
        ingestLines(spark, raw, header)
    }
  }

  /** Core ingest given the raw line DataFrame and its (already read) header
    * line. Exposed separately so tests and the streaming path can reuse it.
    */
  def ingestLines(spark: SparkSession, raw: DataFrame, headerLine: String): IngestResult = {
    val rawHeaders = headerLine.split("\t", -1).toSeq
    // B3+B4: clean + canonicalize headers (metadata -> driver-side Scala).
    val canonical = rawHeaders.map(CtbSchema.canonicalName)
    // B5: unknown header fails the whole file.
    val unknown = canonical.filterNot(columnTypes.contains)
    if (unknown.nonEmpty)
      return failed(spark, s"Schema mismatch. Unknown columns: ${unknown.mkString(", ")}")

    import org.apache.spark.sql.expressions.Window
    // Number lines 1-based in file order so error messages match the
    // reference's `i` (enumerate(lines[1:], start=2) => data line numbers
    // begin at 2). monotonically_increasing_id preserves text-source order
    // within a single file; a global row_number makes it contiguous.
    val w = Window.orderBy(col("_mid"))
    val numbered = raw
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn(LINENO, row_number().over(w))
      .drop("_mid")
      .filter(col(LINENO) > 1) // drop header row
      .filter(length(trim(col("value"))) > 0) // reference strips the file; blank lines vanish
      .withColumnRenamed("value", LINE)

    // B1: a file with no data rows fails whole-file.
    if (numbered.isEmpty)
      return failed(spark, "File contains no data rows")

    val ncols = canonical.length
    val parts = split(col(LINE), "\t", -1)
    val widthOk = size(parts) === ncols

    // B6 errors: wrong width -> skip row, record error with line number+content.
    val widthErrors = numbered
      .filter(!widthOk)
      .select(concat(
        lit("Row "), col(LINENO),
        lit(s" has incorrect number of columns. Expected $ncols, got "), size(parts),
        lit(". Row content: "), col(LINE)).as("error"))

    // B7+B8: trim each field, empty -> NULL.
    val wide = numbered
      .filter(widthOk)
      .select(col(LINENO) +: canonical.zipWithIndex.map { case (name, i) =>
        nullif(trim(parts.getItem(i)), lit("")).as(name)
      }: _*)

    // B9/B10: typed casts. For each typed column build (value, ok) pairs.
    // try_* keeps this ANSI-safe (Spark 4 defaults to ANSI mode).
    def castCol(name: String): (Column, Column, Column) = columnTypes(name) match {
      case CtbString =>
        (col(name), lit(true), lit(null).cast(StringType))
      case CtbInt =>
        val v = regexp_replace(col(name), ",", "").try_cast("long")
        val ok = col(name).isNull || v.isNotNull
        val err = concat(lit(s"Row "), col(LINENO),
          lit(s": Could not convert '"), col(name), lit(s"' to INTEGER for column '$name'."))
        (v, ok, err)
      case CtbDate =>
        // Strict %Y-%m-%d: try_to_date with explicit pattern (Spark's
        // CORRECTED parser policy rejects out-of-range components).
        val v = try_to_date(col(name), "yyyy-MM-dd")
        val ok = col(name).isNull || v.isNotNull
        val err = concat(lit(s"Row "), col(LINENO),
          lit(s": Could not parse date '"), col(name), lit(s"' for column '$name' (expected yyyy-MM-dd)."))
        (v, ok, err)
    }

    val casts = canonical.map(n => n -> castCol(n)).toMap
    val rowOk = casts.values.map(_._2).reduce(_ && _)

    // B13: cast errors, one row per failing field.
    val castErrors = wide
      .select(col(LINENO), array(canonical.map { n =>
        val (_, ok, err) = casts(n)
        when(!ok, err).otherwise(lit(null))
      }: _*).as("errs"))
      .select(explode(col("errs")).as("error"))
      .filter(col("error").isNotNull)

    // B12: the row-drop rule — keep a row iff every typed column either was
    // NULL/empty in the source or cast successfully.
    val clean = wide
      .filter(rowOk)
      .select(canonical.map(n => casts(n)._1.as(n)): _*)

    val errors = widthErrors.unionByName(castErrors)
    IngestResult(clean, errors, fileFailed = false, failureReason = None)
  }

  private def failed(spark: SparkSession, reason: String): IngestResult = {
    val emptyClean = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
    val emptyErr = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("error", StringType))))
    IngestResult(emptyClean, emptyErr, fileFailed = true, Some(reason))
  }
}
