package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in per-partition batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * mapPartitions batching, frame sampling — and all three codec paths
  * are real: [[decodeImage]] runs the JDK's `javax.imageio` (PNG/JPEG/
  * BMP/GIF), [[decodeWav]] walks RIFF/WAVE chunks for 16-bit mono PCM,
  * and [[decodeVideo]] decodes every keyframe of the length-prefixed
  * PNG-keyframe container — each inside a per-partition closure,
  * emitting exact geometry / sample statistics. [[decodeFeatures]]
  * remains the byte-level extractor for formats with no decoder here
  * (e.g. proprietary containers); a new codec slots into the same
  * closure without touching the plumbing: partition-sized batches keep
  * codec init cost amortized, exactly like a vectorized-batch UDF would.
  */
object Multimodal {

  case class Media(doc_id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, byte_len: Int, checksum: Long,
      head_hash: Long, n_frames: Int)
  /** Real decode output: exact geometry + per-channel pixel sums (Long —
    * combine-order-free, and enough to catch any mis-decode: the red
    * channel of the test fixture is an x-gradient, so even a correct
    * total under wrong pixel ADDRESSING mismatches). */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  val FrameBytes = 32

  /** Attach a binary payload column (here: utf-8 bytes of `text` stand in
    * for real media bytes) plus format metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("txt").as("format"))

  /** Deterministic PNG payloads, one per doc_id, generated IN-PLAN (the
    * image fixture for [[decodeImage]] — no media files exist in this
    * offline sandbox, and a distributed generator is what a real ingest
    * would look like anyway). Geometry and colors are pure functions of
    * doc_id so an independent oracle can state the decoded features
    * arithmetically: width = 1 + id%8, height = 1 + id%5, red an
    * x-gradient (id + x) % 256, green/blue solid id*7 % 256 / id*13 % 256.
    * PNG is lossless, so [[decodeImage]] must recover them EXACTLY. */
  def encodePng(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 8).toInt
        val h = (1 + id % 5).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = ((id * 7) % 256).toInt
        val b = ((id * 13) % 256).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id + x) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Media(id, out.toByteArray, "png")
      }
    }
  }

  /** Deterministic JPEG payloads — the LOSSY real-world format through
    * the same imageio closure. Geometry matches [[encodePng]]'s
    * derivation (width = 1 + id%8, height = 1 + id%5) and is recovered
    * EXACTLY by any conformant decoder; pixel values are solid per-doc
    * colors, which survive JPEG's DCT approximately — so the oracle
    * states geometry only, and the spec bounds the color error. */
  def encodeJpeg(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 8).toInt
        val h = (1 + id % 5).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((((id * 3) % 256).toInt) << 16) |
          ((((id * 7) % 256).toInt) << 8) | (((id * 13) % 256).toInt)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        Media(id, out.toByteArray, "jpg")
      }
    }
  }

  /** REAL image decode — the JDK's `javax.imageio` inside the
    * per-partition closure (PNG/JPEG/BMP/GIF readers ship with the JDK;
    * no external dependency). Exact geometry + per-channel sums; an
    * unreadable payload fails loudly with the doc_id rather than nulling
    * out (a corrupt-media quarantine belongs in a FILTER before this). */
  def decodeImage(ds: Dataset[Media]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.media))
        require(img != null,
          s"doc ${m.doc_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(m.doc_id, w, h, sr, sg, sb)
      }
    }
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
    duration_us: Long, sum_amp: Long, max_abs: Long)

  case class FrameFeatures(doc_id: Long, frame_no: Int, width: Int,
    height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic 3-frame "video" payloads: a length-prefixed container
    * of REAL PNG frames ([int32 n][int32 len, png]...), per-frame colors
    * pure functions of (doc_id, frame): geometry as [[encodePng]], red
    * the same x-gradient every frame, green/blue stepping by 11·f / 29·f
    * per frame so wrong frame addressing mismatches. The shape of every
    * keyframe-extractable container: seekable frames without decoding
    * predecessors. */
  def encodeVideo(docs: DataFrame, nFrames: Int = 3): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 8).toInt
        val h = (1 + id % 5).toInt
        val frames = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = ((id * 7 + 11 * f) % 256).toInt
          val b = ((id * 13 + 29 * f) % 256).toInt
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((((id + x) % 256).toInt) << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        val buf = java.nio.ByteBuffer.allocate(
          4 + frames.map(_.length + 4).sum)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.putInt(nFrames)
        frames.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
        Media(id, buf.array(), "vid")
      }
    }
  }

  /** REAL video decode: walk the frame container, decode each frame with
    * `javax.imageio`, one output row per frame — the per-partition,
    * bytes-never-cross-the-driver shape of a frame-feature extractor.
    * Truncated containers and undecodable frames fail loudly. */
  def decodeVideo(ds: Dataset[Media]): Dataset[FrameFeatures] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      require(m.media.length >= 4,
        s"doc ${m.doc_id}: container shorter than its frame-count header")
      val buf = java.nio.ByteBuffer.wrap(m.media)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = buf.getInt
      require(n >= 0 && n < (1 << 20), s"doc ${m.doc_id}: bad frame count $n")
      (0 until n).map { f =>
        require(buf.remaining() >= 4, s"doc ${m.doc_id}: truncated at frame $f")
        val len = buf.getInt
        require(len >= 0, s"doc ${m.doc_id}: frame $f declares negative size $len")
        require(buf.remaining() >= len,
          s"doc ${m.doc_id}: frame $f declares $len bytes, " +
            s"${buf.remaining()} remain")
        val fb = new Array[Byte](len); buf.get(fb)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(fb))
        require(img != null, s"doc ${m.doc_id}: frame $f not decodable")
        var (srr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            srr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        FrameFeatures(m.doc_id, f, img.getWidth, img.getHeight, srr, sg, sb)
      }
    }
  }

  /** Deterministic 16-bit PCM mono WAV payloads, one per doc_id,
    * generated IN-PLAN (the audio sibling of [[encodePng]]). RIFF/WAVE
    * with a real fmt chunk at 8 kHz; sample count and amplitudes are
    * pure functions of doc_id — n = 16 + id%32,
    * sample(i) = (id·31 + i·17) mod 2003 − 1001 — so an independent
    * oracle states the decoded features arithmetically, and PCM being
    * raw (no compression) the decoder must recover them EXACTLY. */
  def encodeWav(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (16 + id % 32).toInt
        val rate = 8000
        val dataLen = n * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1) // PCM
          .putShort(1) // mono
          .putInt(rate)
          .putInt(rate * 2)  // byte rate
          .putShort(2)       // block align
          .putShort(16)      // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < n) {
          buf.putShort((((id * 31 + i * 17) % 2003) - 1001).toShort)
          i += 1
        }
        Media(id, buf.array(), "wav")
      }
    }
  }

  /** REAL audio decode — a hand-rolled RIFF/WAVE walker in the
    * per-partition closure (PCM needs no codec library: the container is
    * a length-prefixed chunk list and the samples are raw little-endian
    * int16). Walks chunks generally (unknown chunks skip by their
    * declared size, the real-decoder behavior), validates PCM/16-bit,
    * and emits exact sample statistics; malformed payloads fail loudly
    * with the doc_id. */
  def decodeWav(ds: Dataset[Media]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val buf = java.nio.ByteBuffer.wrap(m.media)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag() == "RIFF", s"doc ${m.doc_id}: not a RIFF container")
        buf.getInt // declared riff size; trust the buffer bound instead
        require(tag() == "WAVE", s"doc ${m.doc_id}: RIFF is not WAVE")
        var rate = -1
        var sr = 0L; var maxAbs = 0L; var n = 0L
        var sawData = false
        while (buf.remaining() >= 8) {
          val id = tag(); val size = buf.getInt
          id match {
            case "fmt " =>
              val fmt = buf.getShort(); val ch = buf.getShort()
              rate = buf.getInt; buf.getInt; buf.getShort()
              val bits = buf.getShort()
              require(fmt == 1 && ch == 1 && bits == 16,
                s"doc ${m.doc_id}: only 16-bit mono PCM supported " +
                  s"(fmt=$fmt ch=$ch bits=$bits)")
              // the 16 bytes above are the mandatory PCM fmt body; a
              // smaller declared size would walk the cursor backwards
              require(size >= 16,
                s"doc ${m.doc_id}: fmt chunk size $size < 16")
              // skip extensions, word-aligned per RIFF like any chunk
              buf.position(buf.position() + (size - 16) + (size & 1))
            case "data" =>
              require(rate > 0, s"doc ${m.doc_id}: data chunk before fmt")
              // 16-bit PCM data must be sample-aligned, and a second data
              // chunk would silently mix statistics — both are malformed
              // here, not walkable
              require(size % 2 == 0,
                s"doc ${m.doc_id}: odd data chunk size $size for 16-bit PCM")
              require(!sawData, s"doc ${m.doc_id}: second data chunk")
              sawData = true
              var i = 0
              while (i < size / 2) {
                val s = buf.getShort().toLong
                sr += s
                if (math.abs(s) > maxAbs) maxAbs = math.abs(s)
                i += 1
              }
              n = size / 2
            case _ => // skip unknown chunk (word-aligned per RIFF)
              buf.position(buf.position() + size + (size & 1))
          }
        }
        require(sawData, s"doc ${m.doc_id}: WAVE has no data chunk")
        AudioFeatures(m.doc_id, rate, n, n * 1000000L / rate, sr, maxAbs)
      }
    }
  }

  /** Per-partition byte-level features for OPAQUE formats — containers
    * with no decoder here. PNG/JPEG/BMP/GIF, 16-bit PCM WAV, and the
    * PNG-keyframe video container all have real decode paths
    * ([[decodeImage]] / [[decodeWav]] / [[decodeVideo]]). */
  def decodeFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // codec init would happen once per partition, here:
      it.map { m =>
        val len = m.media.length
        var sum = 0L
        var h = 1125899906842597L
        var i = 0
        while (i < len) { sum += (m.media(i) & 0xff); h = 31 * h + m.media(i); i += 1 }
        MediaFeatures(m.doc_id, len, sum, h, (len + FrameBytes - 1) / FrameBytes)
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size frames, keep every
    * `stride`-th — the video-frame-subsample shape, as a codegen'd explode
    * (rows multiply, bytes don't move through a driver).
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.select(col("doc_id"), posexplode(
      // CASE guards the empty payload: sequence(0, -1) would yield the
      // descending [0, -1] and emit two phantom frames
      expr(s"""CASE WHEN length(media) > 0 THEN transform(
         |  sequence(0, CAST(ceil(length(media) / $FrameBytes.0) AS INT) - 1),
         |  f -> substring(media, f * $FrameBytes + 1, $FrameBytes))
         |ELSE CAST(array() AS ARRAY<BINARY>) END""".stripMargin))
      .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)

  /** "Resize" a frame by byte decimation: keep every `factor`-th byte.
    * STUB for a real resampler (see object scaladoc — an image resize is a
    * codec operation); the deterministic byte-level stand-in exercises the
    * exact plumbing a real one needs: binary→binary column transform,
    * length contract ceil(len/factor), codegen'd, no data through the
    * driver.
    */
  def resizeFrames(df: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    df.withColumn("frame", expr(
      s"""aggregate(
         |  transform(filter(sequence(0, length(frame) - 1), p -> p % $factor = 0),
         |            p -> substring(frame, p + 1, 1)),
         |  X'', (acc, b) -> concat(acc, b))""".stripMargin))
  }

  /** Media → embedding: the feature-extraction stage of a multimodal
    * retrieval/dedup pipeline (CLIP-style encoder in production; here the
    * encoder body is the documented STUB — a deterministic hash-seeded
    * projection of the bytes, L2-normalized — because no model runtime
    * exists in this sandbox). The plumbing is the real contract: binary
    * column in, fixed-dim `array<float>` out, per-partition batches so a
    * real encoder amortizes model load, output directly joinable to
    * [[EmbeddingOps]]/[[IvfIndex]]/[[SemDedup]] (same (vec_id, embedding)
    * shape the vector stack consumes). */
  def embedMedia(ds: Dataset[Media], dim: Int = 16): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // model load would happen once per partition, here:
      it.map { m =>
        val raw = new Array[Double](dim)
        var i = 0
        while (i < m.media.length) {
          // deterministic byte scatter — stands in for the encoder
          // forward; Long arithmetic so GB-scale payloads cannot
          // overflow the index into negative territory
          val slot = ((i.toLong * 31 + (m.media(i) & 0xff)) % dim).toInt
          raw(slot) += (m.media(i) & 0xff)
          i += 1
        }
        val norm = math.sqrt(raw.map(x => x * x).sum)
        val emb =
          if (norm == 0) raw.map(_.toFloat)
          else raw.map(x => (x / norm).toFloat)
        (m.doc_id, emb)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Media similarity search end-to-end: embed the corpus (ingest-time in
    * production), then exact cosine top-k against the probe document's
    * media — the multimodal near-dup / retrieval loop closed over the
    * same vector machinery as the text stack. */
  def mediaTopK(docs: DataFrame, probeId: Long, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val media = withPayload(docs).as[Media]
    EmbeddingOps.cosineTopK(
      embedMedia(media).withColumn("label", lit("media")), probeId, k)
  }

  /** The oracled query shape: payload → deterministic metadata columns. */
  def describe(spark: SparkSession, docs: DataFrame): DataFrame =
    withPayload(docs)
      .select(col("doc_id"),
        length(col("media")).as("byte_len"),
        expr(s"CAST(ceil(length(media) / $FrameBytes.0) AS INT)").as("n_frames"),
        col("format"))
}
