package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `BINARY` payloads plus a typed
  * metadata struct; decode / feature-extraction runs as batched
  * per-partition compute over the binary column; resize and
  * frame-sampling are metadata-plan operations that never touch the
  * payload bytes.
  *
  * The real image/audio codecs are NOT in this container, so the decode
  * kernel is a clearly-marked deterministic STUB (md5-based — see
  * [[stubDecodeFeature]]); everything around it — the schema, the
  * `Dataset[MediaRow]` encoder, the mapPartitions batch shape, the
  * partitioning and the downstream feature plumbing — is real and is
  * what a production decoder would drop into.
  *
  * Scale notes:
  *  - Payloads never pass through a wide operator here: decode is a
  *    narrow mapPartitions (CPU-bound, scan-parallel); resize/frame
  *    plans are pure projections. The one rule at 100 TB: filter and
  *    frame-sample on METADATA first, decode last, so the expensive
  *    kernel sees the fewest bytes.
  *  - Feature output is `array<float>` — compact, columnar-friendly,
  *    and directly consumable by [[SimilarityOps]] (ANN, near-dup).
  */
object MultimodalOps {

  /** Typed view of one media row crossing the decode boundary. */
  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, payload: Array[Byte])

  /** Decoded features for one media item. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  /** Derive a media table from `documents`: the text bytes stand in for
    * an encoded payload; kind/width/height/n_frames are deterministic
    * functions of (doc_id, n_chars) so every engine derives the same
    * metadata. Schema: (media_id, kind, width, height, n_frames,
    * payload BINARY).
    */
  def asMedia(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      (lit(16L) + pmod(col("n_chars"), lit(241L))).cast("int").as("width"),
      (lit(16L) + pmod(col("n_chars") * 7L, lit(241L))).cast("int").as("height"),
      (lit(1L) + pmod(col("doc_id") * 13L, lit(120L))).cast("int").as("n_frames"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode kernel — stands in for a real image/audio decoder.
    * Deterministic and engine-portable: feature d of a payload is the
    * first 24 bits of md5(payload ++ ":" ++ d) scaled to [0, 1).
    * 24 bits so the value is EXACT in float32 (and its /2^24 scaling is
    * a power of two) — the oracle's double-precision recomputation
    * matches bit-for-bit. A real deployment replaces ONLY this function
    * (e.g. JNI to libjpeg / ffmpeg); the batch plumbing is unchanged.
    */
  def stubDecodeFeature(payload: Array[Byte], dim: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s":$dim".getBytes("UTF-8"))
    val h = md.digest()
    val u = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    (u.toDouble / 16777216.0).toFloat
  }

  /** Batched decode + feature extraction: one pass per partition over
    * the binary payloads (the Scala analogue of a pandas-batch UDF —
    * the MessageDigest instance and any decoder state are allocated
    * once per PARTITION, then reused row by row). Output:
    * (media_id, n_bytes, features array<float>[nDims]).
    */
  def decodeFeatures(media: DataFrame, nDims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "width", "height", "n_frames", "payload")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition (per-batch) state — where a real decoder would
        // initialize its codec context once
        rows.map { r =>
          val feats = Array.tabulate(nDims)(d => stubDecodeFeature(r.payload, d))
          MediaFeatures(r.media_id, r.payload.length.toLong, feats)
        }
      }
  }

  /** Resize plan: metadata-only. Scales (width, height) to fit inside
    * `maxSide` preserving aspect ratio — floor(side·maxSide/longest),
    * exact in double for any realistic pixel count (< 2^53), so every
    * engine agrees bit-for-bit. Payload untouched — a real pipeline
    * would fuse this target size into the decode kernel rather than
    * decode-then-resize.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxSide
    media.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      when(needs, floor(col("width") * lit(maxSide.toLong) / longest).cast("int"))
        .otherwise(col("width")).as("out_w"),
      when(needs, floor(col("height") * lit(maxSide.toLong) / longest).cast("int"))
        .otherwise(col("height")).as("out_h"))
  }

  /** Frame sampling for video rows: every `step`-th frame index
    * (0, step, 2·step, …) up to n_frames−1. Explodes metadata only —
    * at scale, the sampled (media_id, frame_no) list drives a decoder
    * that seeks to exactly those frames, never materializing the rest.
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_no"))
}
