package graft.expressions

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_nfc / graft_unaccent: NFC recomposition, accent folding, the
  * ASCII/isNormalized fast paths (input instance returned untouched),
  * null propagation, codegen execution, and agreement with
  * java.text.Normalizer ground truth on a generated corpus.
  */
class UnicodeCleanSpec extends AnyFunSuite with SparkSpec {

  test("graft_nfc recomposes a decomposed sequence to the precomposed codepoint") {
    val r = spark.sql("SELECT graft_nfc('é') AS s, length(graft_nfc('é')) AS n").collect().head
    assert(r.getString(0) == "é" && r.getInt(1) == 1)
  }

  test("graft_nfc leaves NFC input identical (fast path, value equality)") {
    val r = spark.sql("SELECT graft_nfc('café latte') AS s").collect().head
    assert(r.getString(0) == "café latte")
  }

  test("graft_unaccent folds precomposed and decomposed forms to the same ASCII") {
    val r = spark.sql(
      "SELECT graft_unaccent('áéíóúñç') AS a, " +
        "graft_unaccent('é') AS b").collect().head
    assert(r.getString(0) == "aeiounc" && r.getString(1) == "e")
  }

  test("graft_unaccent ASCII fast path is the identity") {
    val r = spark.sql("SELECT graft_unaccent('plain ascii 123!') AS s").collect().head
    assert(r.getString(0) == "plain ascii 123!")
  }

  test("null propagation for both expressions") {
    val r = spark.sql(
      "SELECT graft_nfc(CAST(NULL AS STRING)) AS a, graft_unaccent(CAST(NULL AS STRING)) AS b")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("both expressions run inside whole-stage codegen and match Normalizer ground truth") {
    val df = spark.range(200).select(col("id"),
      concat(lit("wörd étude "), col("id")).as("t"))
      .select(col("id"), col("t"),
        call_function("graft_nfc", col("t")).as("nfc"),
        call_function("graft_unaccent", col("t")).as("fold"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    df.collect().foreach { row =>
      val t = row.getString(1)
      val nfc = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      val fold = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
        .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
      assert(row.getString(2) == nfc)
      assert(row.getString(3) == fold)
    }
  }
}
