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

  test("JPEG round-trip: exact geometry, bounded lossy color error, " +
    "corrupt payload fails loudly") {
    val docs = Seq((3L, "x"), (12L, "y"), (40L, "z")).toDF("doc_id", "text")
    val feats = Multimodal.decodeImage(Multimodal.encodeJpeg(docs))
      .collect().map(f => f.doc_id -> f).toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      val f = feats(id)
      // geometry is EXACT under any conformant decoder
      assert(f.width === (1 + id % 8).toInt && f.height === (1 + id % 5).toInt)
      // solid colors survive the DCT within a small per-pixel error
      val n = f.width.toLong * f.height
      def err(sum: Long, c: Long) = math.abs(sum - n * c).toDouble / n
      assert(err(f.sum_r, (id * 3) % 256) < 16, s"doc $id red")
      assert(err(f.sum_g, (id * 7) % 256) < 16, s"doc $id green")
      assert(err(f.sum_b, (id * 13) % 256) < 16, s"doc $id blue")
    }
    // a truncated JPEG fails loudly with its doc id, never a silent null
    val raw = Multimodal.encodeJpeg(docs.filter($"doc_id" === 3)).head().media
    val corrupt = Seq(Multimodal.Media(9L, raw.take(raw.length / 2), "jpg"))
      .toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeImage(corrupt).collect())
  }

  test("WAV round-trip recovers exact PCM statistics; chunk walker skips strangers") {
    val docs = Seq((5L, "x"), (40L, "y")).toDF("doc_id", "text")
    val feats = Multimodal.decodeWav(Multimodal.encodeWav(docs))
      .collect().map(f => f.doc_id -> f).toMap
    // doc 5: n = 16 + 5 = 21 samples, amplitudes (5*31 + i*17) % 2003 - 1001
    val amps5 = (0 until 21).map(i => (5 * 31 + i * 17) % 2003 - 1001)
    assert(feats(5L).sample_rate === 8000)
    assert(feats(5L).n_samples === 21L)
    assert(feats(5L).duration_us === 21L * 1000000 / 8000)
    assert(feats(5L).sum_amp === amps5.sum.toLong)
    assert(feats(5L).max_abs === amps5.map(math.abs).max.toLong)
    assert(feats(40L).n_samples === (16 + 40 % 32).toLong)
    // a LIST chunk inserted between fmt and data must be skipped, not choke
    val raw = Multimodal.encodeWav(docs.filter($"doc_id" === 5)).head().media
    val stranger = java.nio.ByteBuffer.allocate(raw.length + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    stranger.put(raw, 0, 36) // RIFF..fmt chunk end
      .put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOab".getBytes("US-ASCII")) // 6 bytes payload (even: no pad)
      .put(raw, 36, raw.length - 36)
    val withStranger = Seq(Multimodal.Media(5L, stranger.array(), "wav")).toDS()
    assert(Multimodal.decodeWav(withStranger).head().sum_amp ===
      amps5.sum.toLong)
    // corrupt payloads fail loudly with the doc id
    val bad = Seq(Multimodal.Media(9L, "nope".getBytes, "wav")).toDS()
    val err = intercept[org.apache.spark.SparkException](
      Multimodal.decodeWav(bad).collect())
    assert(err.getMessage.contains("9") || err.getCause != null)
    // an odd-sized data chunk would desync the walker — loud, not walked
    val odd = java.nio.ByteBuffer.allocate(raw.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(raw); odd.putInt(40, 17) // data size 17: not sample-aligned
    val oddDs = Seq(Multimodal.Media(5L, odd.array(), "wav")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeWav(oddDs).collect())
    // a fmt chunk declaring size < 16 would walk the cursor BACKWARDS —
    // loud per-doc failure, never a silent re-parse
    val shortFmt = java.nio.ByteBuffer.allocate(raw.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put(raw); shortFmt.putInt(16, 8) // fmt size 8 < mandatory 16
    val shortDs = Seq(Multimodal.Media(5L, shortFmt.array(), "wav")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeWav(shortDs).collect())
  }

  test("video container round-trip: per-frame decode, loud truncation") {
    val docs = Seq((3L, "x")).toDF("doc_id", "text")
    val frames = Multimodal.decodeVideo(Multimodal.encodeVideo(docs))
      .collect().sortBy(_.frame_no)
    assert(frames.length === 3)
    // geometry constant across frames; green steps by 11 per frame
    assert(frames.forall(f => f.width === 4 && f.height === 4)) // 1+3%8, 1+3%5
    val greens = frames.map(_.sum_g)
    assert(greens.toSeq === (0 until 3).map(f =>
      16L * ((3 * 7 + 11 * f) % 256)))
    // truncating mid-frame fails loudly with the doc id and frame no
    val raw = Multimodal.encodeVideo(docs).head().media
    val cut = Seq(Multimodal.Media(3L, raw.take(raw.length - 10), "vid")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeVideo(cut).collect())
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

  test("media embedding feeds the vector stack; identical bytes align") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different payload entirely"),
      (4L, "")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs).as[Multimodal.Media]
    val emb = Multimodal.embedMedia(media)
    // fixed dim, unit norm (except the empty payload), deterministic
    val rows = emb.as[(Long, Seq[Float])].collect().toMap
    assert(rows.values.forall(_.length === 16))
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(rows(1L)) - 1.0) < 1e-5)
    assert(norm(rows(4L)) === 0.0)
    assert(rows(1L) === rows(2L), "same bytes must embed identically")
    assert(rows(1L) !== rows(3L))
    // end-to-end similarity search: the byte-identical doc ranks first
    // with similarity 1
    val top = Multimodal.mediaTopK(docs, probeId = 1L, k = 2).collect()
    assert(top.head.getAs[Long]("vec_id") === 2L)
    assert(top.head.getAs[Double]("sim") === 1.0)
  }

  test("REAL image decode: PNG round-trips exactly through javax.imageio, " +
      "and a non-image payload fails loudly with its doc_id") {
    // ids straddle the 256 channel wrap and every width/height residue
    val ids = Seq(0L, 7L, 36L, 255L, 256L, 1000L)
    val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Multimodal.decodeImage(Multimodal.encodePng(docs))
      .collect().map(f => f.doc_id -> f).toMap
    ids.foreach { id =>
      val f = got(id)
      val (w, h) = ((1 + id % 8).toInt, (1 + id % 5).toInt)
      assert(f.width === w && f.height === h, s"geometry of $id")
      assert(f.sum_r === h * (0 until w).map(x => (id + x) % 256).sum,
        s"red gradient of $id")
      assert(f.sum_g === w.toLong * h * ((id * 7) % 256), s"green of $id")
      assert(f.sum_b === w.toLong * h * ((id * 13) % 256), s"blue of $id")
    }
    // a PNG decoded by a REAL parser, not arithmetic: byte 0 must be the
    // PNG signature, and corrupting it is a loud decode failure
    val media = Multimodal.encodePng(docs).collect().head
    assert((media.media(0) & 0xff) === 0x89 &&
      new String(media.media.slice(1, 4)) === "PNG")
    val bad = Seq(Multimodal.Media(42L, "not an image".getBytes, "png"))
      .toDS()
    val e = intercept[Exception](Multimodal.decodeImage(bad).collect())
    assert(e.getMessage.contains("42"),
      s"wanted the loud doc-id error, got: ${e.getMessage}")
  }
}
