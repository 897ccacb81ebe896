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

  test("binaryFile source reads real files into envelopes with kind from extension") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.wav"), Array[Byte](5, 6))
    java.nio.file.Files.write(dir.resolve("c.mp4"), Array[Byte](7, 8, 9))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val env = MultimodalOps.envelopesFromBinaryFiles(spark, dir.toString, "*.{png,wav,mp4}")
      .collect().sortBy(_.kind)
    assert(env.length == 3) // glob pushdown excluded skip.txt
    assert(env.map(_.kind).toSeq == Seq("audio", "image", "video"))
    assert(env.find(_.kind == "image").get.payload.toSeq == Seq[Byte](1, 2, 3, 4))
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.envelopesFromBinaryFiles(spark, dir.toString, "*.{png,wav,mp4}"))
      .collect()
    assert(feats.length == 3)
    assert(feats.forall(_.n_bytes > 0))
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
