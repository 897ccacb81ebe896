package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal envelope plumbing: schema, partition-parallel feature
  * extraction, determinism of the stubbed decode.
  */
class MultimodalOpsSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("envelopes wrap every document as an opaque typed payload") {
    val env = MultimodalOps.envelopesFromDocuments(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(env.count() == n)
    val kinds = env.collect().map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures is partition-parallel, total, and deterministic") {
    val env = MultimodalOps.envelopesFromDocuments(spark, sfDir)
    val f1 = MultimodalOps.extractFeatures(env).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(env).collect().sortBy(_.media_id)
    assert(f1.length == env.count())
    assert(f1.map(_.content_fp).toSeq == f2.map(_.content_fp).toSeq) // deterministic stub
    assert(f1.forall(f => f.n_bytes > 0 && f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
    assert(f1.map(_.content_fp).distinct.length > 1) // fingerprints vary with payload
  }
}
