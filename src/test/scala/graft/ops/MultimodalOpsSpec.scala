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

  test("resize caps the long side, preserves aspect ratio, never upscales") {
    val env = MultimodalOps.envelopesFromDocuments(spark, sfDir)
    val maxDim = 256
    val feats = MultimodalOps.extractFeatures(env).collect()
      .map(f => f.media_id -> f).toMap
    val resized = MultimodalOps.resizeImages(env, maxDim, batchSize = 7).collect()
    assert(resized.length == feats.size)
    resized.foreach { r =>
      val f = feats(r.media_id)
      assert((r.src_w, r.src_h) == (f.width, f.height))
      assert(math.max(r.out_w, r.out_h) <= math.max(f.width, f.height), "never upscales")
      if (math.max(f.width, f.height) <= maxDim)
        assert((r.out_w, r.out_h) == (f.width, f.height), "small media untouched")
      else {
        assert(math.max(r.out_w, r.out_h) <= maxDim)
        // aspect preserved within integer floor: out_w/out_h ~ src_w/src_h
        val long = math.max(f.width, f.height)
        assert(r.out_w == math.max(1, f.width * maxDim / long))
        assert(r.out_h == math.max(1, f.height * maxDim / long))
      }
      assert(r.out_w >= 1 && r.out_h >= 1)
    }
    // deterministic re-encode fingerprints, distinct from the source's
    val again = MultimodalOps.resizeImages(env, maxDim, batchSize = 64).collect()
    assert(resized.sortBy(_.media_id).map(_.out_fp).toSeq
      == again.sortBy(_.media_id).map(_.out_fp).toSeq)
  }

  test("frame sampling keeps every stride-th frame of videos only") {
    val env = MultimodalOps.envelopesFromDocuments(spark, sfDir)
    val stride = 5
    val frames = MultimodalOps.sampleFrames(env, stride).collect()
    val videos = MultimodalOps.extractFeatures(env).collect().filter(_.kind == "video")
    val wantRows = videos.map(v => (v.n_frames + stride - 1) / stride).sum
    assert(frames.length == wantRows, "ceil(n_frames/stride) rows per video")
    val byMedia = frames.groupBy(_.media_id)
    assert(byMedia.keySet == videos.map(_.media_id).toSet, "videos only")
    byMedia.foreach { case (id, fs) =>
      val nf = videos.find(_.media_id == id).get.n_frames
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until nf by stride).toSeq)
    }
    assert(frames.map(_.frame_fp).distinct.length == frames.length,
      "frame fingerprints are unique across (media, idx)")
  }
}
