package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: decode features are deterministic per byte content") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye"))
      .toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs).as[Multimodal.Media]
    val feats = Multimodal.decodeFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len === 11)
    assert(feats(1L).checksum === feats(2L).checksum)
    assert(feats(1L).head_hash === feats(2L).head_hash)
    assert(feats(1L).checksum !== feats(3L).checksum)
    assert(feats(3L).n_frames === 1)
    assert(feats(1L).n_frames === 1)
  }

  test("frame sampling splits payload into fixed-size frames with stride") {
    val text = "x" * 100 // 100 bytes → 4 frames of 32 (last short)
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val all = Multimodal.sampleFrames(Multimodal.withPayload(docs), stride = 1)
    assert(all.count() === 4)
    val strided = Multimodal.sampleFrames(Multimodal.withPayload(docs), stride = 2)
    assert(strided.select("frame_no").as[Int].collect().toSet === Set(0, 2))
    val lens = all.select(length($"frame")).as[Int].collect().sorted
    assert(lens.toSeq === Seq(4, 32, 32, 32))
  }

  test("resize stub decimates frame bytes with the ceil(len/factor) contract") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val frames = Multimodal.sampleFrames(Multimodal.withPayload(docs), stride = 1)
    val resized = Multimodal.resizeFrames(frames, factor = 3)
    val out = resized.select($"frame".cast("string")).as[String].head()
    assert(out === "adgj") // bytes 0,3,6,9
    assert(Multimodal.resizeFrames(frames, 1).select($"frame".cast("string"))
      .as[String].head() === "abcdefghij") // factor 1 = identity
    intercept[IllegalArgumentException](Multimodal.resizeFrames(frames, 0))
  }
}
