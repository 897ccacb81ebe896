package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data prep pipeline ([[graft.ops.TrainingDataPrep]], batch;
  * `pipeline_prep`, oracle-paired) in its STREAMING form: a document stream
  * is quality-gated, content-deduplicated within a watermark, benchmark-
  * decontaminated, and hash-sampled — continuously, with bounded state.
  *
  * Stage-by-stage state budget (the 100 TB/day constraint):
  *   - quality gate / sample / decontamination: stateless projections and
  *     filters — zero state;
  *   - dedup: `dropDuplicatesWithinWatermark` on the md5 fingerprint —
  *     state is O(watermark-window volume) of 16-byte keys, evicted as the
  *     watermark advances (plain streaming dropDuplicates never evicts);
  *   - the benchmark gram set rides as a broadcast LITERAL: eval suites
  *     are bounded by construction (thousands of grams, not corpus-scale),
  *     so membership is an in-row `arrays_overlap` against a constant —
  *     no join, no state. For a large held-out set, swap the literal for a
  *     Bloom filter built the same way; the pipeline shape is unchanged.
  */
object StreamingPrep {

  private val gramHashExpr =
    // word-4-gram 60-bit hashes of `text`, [] for docs under 4 tokens —
    // the same gram/hash construction the batch decontaminate op uses
    "CASE WHEN size(split(text, ' ')) >= 4 THEN " +
      "transform(sequence(1, size(split(text, ' ')) - 3), i -> " +
      "cast(conv(substring(md5(array_join(slice(split(text, ' '), i, 4), ' ')), 1, 15), 16, 10) as bigint)) " +
      "ELSE array() END"

  /** Distinct word-4-gram hashes of a (small, bounded) benchmark corpus —
    * the driver-side constant [[prep]] broadcasts. The collect is bounded
    * by the benchmark suite's size, never the training corpus.
    */
  def benchGramHashes(bench: DataFrame): Array[Long] =
    bench.select(explode(expr(gramHashExpr)).as("g")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** The keyed-hash sample predicate: md5(lang#doc_id) permille — the
    * reproducible-across-retries/engines/restarts alternative to rand().
    * Exposed for batch reuse; the stateless stages are stream/batch-agnostic.
    */
  def samplePredicate(samplePermille: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(concat(col("lang"), lit("#"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 1000) < samplePermille

  /** The stateless prefix of the pipeline (quality gate, decontamination,
    * sample) — identical semantics on a batch or streaming frame.
    */
  def gateAndSample(docs: DataFrame, benchGrams: Array[Long],
      samplePermille: Int): DataFrame = {
    val ws = split(col("text"), " ")
    docs
      // quality gate (same thresholds as the batch text_quality op)
      .filter(col("n_chars").between(40, 10000) && size(ws) >= 5 &&
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")) * 5 <= col("n_chars"))
      // benchmark decontamination: in-row overlap vs the broadcast literal
      .filter(!arrays_overlap(expr(gramHashExpr), typedlit(benchGrams.toSeq)))
      // reproducible stratified sample
      .filter(samplePredicate(samplePermille))
  }

  /** Continuous prep over a streaming (doc_id, ts, text, lang, n_chars)
    * frame. Emits surviving documents; every stage is append-mode-safe.
    *
    * @param samplePermille keep fraction (keyed md5 hash of lang#doc_id —
    *   reproducible across retries, engines and restarts, unlike rand())
    */
  def prep(docs: DataFrame, benchGrams: Array[Long],
      watermark: String = "10 minutes", samplePermille: Int = 1000): DataFrame =
    gateAndSample(docs, benchGrams, samplePermille)
      // bounded-state exact dedup, watermark-evicted (streaming-only op)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Convenience: build the benchmark constant from a batch table. */
  def prepAgainst(spark: SparkSession, docs: DataFrame, benchDocs: DataFrame,
      watermark: String = "10 minutes", samplePermille: Int = 1000): DataFrame =
    prep(docs, benchGramHashes(benchDocs), watermark, samplePermille)
}
