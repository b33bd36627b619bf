package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a batched per-partition
  * decode/feature-extract pipeline.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[StubCodec]]); everything around
  * it — schema, partition-level batching, feature shape — is real and
  * tested, and a production codec drops into [[StubCodec.decode]]
  * unchanged.
  *
  * Scale posture: decode runs via `mapPartitions` on a typed Dataset, so
  * the (expensive, non-columnar) codec amortizes per-partition
  * initialization and streams record batches without collecting; binary
  * payloads never pass through the driver. `spark.sql.files.maxPartitionBytes`
  * bounds per-task memory for large blobs; for very large media a real
  * deployment would store pointers + range-read in the decoder, which this
  * signature also supports.
  */
object Media {

  case class MediaRow(media_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
                           checksum: Long, width: Int, height: Int)

  /** Deterministic stand-in for an image/audio codec. A real
    * implementation replaces `decode` with e.g. a JNI JPEG decode —
    * signature: bytes in, fixed-shape features out.
    */
  object StubCodec {
    /** STUB: real decode unavailable in this container (no codec libs).
      * Produces deterministic fake dimensions from the payload so tests
      * are stable.
      */
    def decode(payload: Array[Byte]): (Int, Int) = {
      val h = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
      (math.floorMod(h, 1920).toInt + 1, math.floorMod(h >>> 32, 1080).toInt + 1)
    }
  }

  /** Wrap a string column as a binary payload with typed metadata —
    * the pattern for landing media in a table (opaque bytes + metadata
    * struct, SURVEY north-star).
    */
  def attachPayload(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("bin").as("format"),
      col(contentCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        xxhash64(col("payload")).as("checksum")))

  /** Batched decode → features. One codec "session" per partition;
    * iterator-to-iterator (no materialization).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("format"), col("payload")).as[MediaRow]
      .mapPartitions { it =>
        // per-partition codec init would happen here (amortized)
        it.map { m =>
          val (w, h) = StubCodec.decode(m.payload)
          MediaFeatures(m.media_id, m.format, m.payload.length.toLong,
            m.payload.foldLeft(0L)((a, b) => a * 31 + b), w, h)
        }
      }
  }

  case class ResizedMedia(media_id: Long, format: String,
                          width: Int, height: Int, payload: Array[Byte])

  /** Resize: 1-row-in → 1-row-out payload transform. STUB resample (every
    * k-th byte, deterministic); a real bilinear/area resampler replaces
    * the body. Same per-partition batching as [[extractFeatures]].
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("format"), col("payload")).as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          // STUB: real resample unavailable (no codec libs in container)
          val stride = math.max(1, m.payload.length / math.max(1, targetW * targetH))
          val out = m.payload.indices.by(stride).map(m.payload).toArray
          ResizedMedia(m.media_id, m.format, targetW, targetH, out)
        }
      }
  }

  case class Frame(media_id: Long, frame_idx: Int, offset_bytes: Long,
                   payload: Array[Byte])

  /** Frame sampling for video payloads: 1-row-in → N-rows-out expansion
    * (the flatMap shape a video pipeline needs — each sampled frame
    * becomes its own row, so downstream per-frame ops parallelize).
    * STUB framing: fixed `frameBytes` chunks stand in for demuxed frames;
    * emits every `everyN`-th.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, everyN: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("format"), col("payload")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          m.payload.grouped(frameBytes).zipWithIndex
            .filter { case (_, i) => i % everyN == 0 }
            .map { case (chunk, i) =>
              Frame(m.media_id, i, i.toLong * frameBytes, chunk) }
        }
      }
  }
}
