package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinhashSigs16Spec extends AnyFunSuite with SparkSpec {

  test("in-row signature equals the aggregate-form slot minima, including ties and dups") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the the"), // duplicate-insensitivity
      (3L, "naïve café 東京 mixed    spacing"), // multi-byte UTF-8, runs of spaces
      (4L, "single"),
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val inRow = docs
      .select(col("doc_id"), call_function("graft_minhash16", col("text")).as("sig"))
    // reference: the pre-kernel aggregate formulation, verbatim
    val P = 2147483647L
    val slotAggs = (0 until 16).map { j =>
      min(expr(s"((97 + 13*$j) * hp + (31 + 7*$j)) % ${P}L")).as(s"m$j")
    }
    val agg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        (conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % P).as("hp"))
      .groupBy(col("doc_id")).agg(slotAggs.head, slotAggs.tail: _*)
      .select(col("doc_id"), array((0 until 16).map(j => col(s"m$j")): _*).as("sig"))
    val a = inRow.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val b = agg.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq == b.toSeq)
  }

  test("empty and all-space documents yield null (the no-group analogue); null in, null out") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val docs = Seq((1L, ""), (2L, "    "), (3L, "x")).toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = docs.select(col("doc_id"),
        call_function("graft_minhash16", col("text")).as("sig"))
      .orderBy("doc_id").collect()
    assert(got(0).isNullAt(1) && got(1).isNullAt(1) && got(3).isNullAt(1))
    assert(!got(2).isNullAt(1) && got(2).getSeq[Long](1).length == 16)
  }

  test("graft_simhash32 equals the 32-sum aggregate form; empty docs are null") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox slightly different"),
      (2L, "the the the unbalanced weight case"),
      (3L, "naïve café 東京"),
      (4L, "  "), // all spaces -> null
      (5L, "z")
    ).toDF("doc_id", "text")
    val inRow = docs.select(col("doc_id"),
      call_function("graft_simhash32", col("text")).as("simhash"))
    val balAggs = (0 until 32).map { i =>
      sum(when(expr(s"(shiftright(h, $i) % 2) = 1"), 1L).otherwise(-1L)).as(s"bal$i")
    }
    val fp = (0 until 32)
      .map(i => when(col(s"bal$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val agg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col("doc_id")).agg(balAggs.head, balAggs.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
    val a = inRow.filter(col("simhash").isNotNull).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = agg.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(inRow.filter(col("simhash").isNull).select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("kernel survives whole-stage codegen and the interpreted path identically") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val df = (1 to 50).map(i => (i.toLong, s"tok$i shared ${"x" * (i % 7)}"))
      .toDF("doc_id", "text")
    val withCg = df.select(call_function("graft_minhash16", col("text"))).collect()
    val noCg = withConf("spark.sql.codegen.wholeStage" -> "false") {
      df.select(call_function("graft_minhash16", col("text"))).collect()
    }
    assert(withCg.map(_.getSeq[Long](0)).toSeq == noCg.map(_.getSeq[Long](0)).toSeq)
  }

  private def withConf[T](kv: (String, String))(f: => T): T = {
    val old = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally old match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
}
