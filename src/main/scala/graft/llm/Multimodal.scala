package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in per-partition batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * mapPartitions batching, frame sampling — while the codec itself is a
  * STUB: image/audio decode libraries are not available in this
  * environment, so [[decodeFeatures]] derives deterministic fake features
  * from the bytes. Swapping in a real decoder changes only the body of the
  * `it.map { ... }` closure (e.g. javacv / a JNI codec), not the plumbing:
  * partition-sized batches keep codec init cost amortized, exactly like a
  * vectorized-batch UDF would.
  */
object Multimodal {

  case class Media(doc_id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, byte_len: Int, checksum: Long,
      head_hash: Long, n_frames: Int)

  val FrameBytes = 32

  /** Attach a binary payload column (here: utf-8 bytes of `text` stand in
    * for real media bytes) plus format metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("txt").as("format"))

  /** Per-partition "decode": deterministic features from raw bytes.
    * STUB — see object scaladoc; a real decoder slots into this closure. */
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
