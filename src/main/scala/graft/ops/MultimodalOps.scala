package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.11): image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * STUBBED with deterministic fakes (clearly marked below); everything
  * Spark-side — binary schema, per-partition batch iteration, metadata
  * extraction, frame sampling arithmetic — is real and tested. Swapping the
  * stub for a real codec changes only `decodeStub`.
  *
  * Scale notes: binary payloads ride the scan as plain columns (parquet
  * keeps them column-compressed); metadata extraction is a pure projection;
  * the decode pass is `mapPartitions` so a real codec amortizes init cost
  * (model load, dlopen) once per partition, not per row — the same reason
  * Python pipelines use mapInPandas batches.
  */
object MultimodalOps {

  /** A decoded media record. */
  final case class MediaFeature(doc_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int, n_frames: Int,
      feature_norm: Double)

  /** Wrap documents as a media table: content is the utf8 byte payload
    * (stand-in for image bytes), media_type round-robins by id. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"))

  /** Pure-projection metadata: byte length + sha256 — engine-portable,
    * no decode needed (this is the path that runs on all 100 TB; decode
    * runs only on the sampled subset a pipeline actually featurizes). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("content")).as("n_bytes"),
      lower(sha2(col("content"), 256)).as("sha256"))

  // ======================================================================
  // STUB: deterministic fake decoder. A real build replaces this body with
  // an actual codec call (e.g. TwelveMonkeys/JavaCV); signature and batch
  // shape stay identical.
  // ======================================================================
  private def decodeStub(mediaType: String, content: Array[Byte]): (Int, Int, Int, Double) = {
    val n = content.length
    val b0 = if (n > 0) content(0) & 0xff else 0
    val width = 64 + (b0 % 16) * 32            // fake: derived from payload
    val height = 64 + ((n / 7) % 16) * 32      // fake: derived from length
    val frames = mediaType match {
      case "video" => 1 + n % 240              // fake frame count
      case "audio" => 1 + n % 16000            // fake sample count
      case _       => 1
    }
    val norm = math.sqrt(content.iterator.map(b => (b & 0xff).toDouble).map(x => x * x).sum)
    (width, height, frames, norm)
  }

  /** Decode + featurize, batch-shaped: one decoder init per partition. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: initialize decoder/model HERE, once per partition
        rows.map { case (id, mt, bytes) =>
          val (w, h, f, norm) = decodeStub(mt, bytes)
          MediaFeature(id, mt, bytes.length, w, h, f, norm)
        }
      }
  }

  /** Frame sampling plumbing: every `stride`-th frame index up to n_frames,
    * as (doc_id, frame_idx) rows — the fan-out a video pipeline feeds to the
    * per-frame featurizer. Pure Spark arithmetic, no decode. */
  def sampleFrames(features: Dataset[MediaFeature], stride: Int = 30): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize PLANNING: integer box-fit of (width, height) into a
    * `maxSide` square preserving aspect ratio, never upscaling — the
    * (out_w, out_h) a real resampler consumes. Deliberately INTEGER
    * arithmetic (`x * maxSide div max(w, h)`), so the plan is bit-exact
    * on any engine; the pixels themselves are the stubbed codec's job.
    * Pure projection — this is the path that plans all 100 TB of media
    * before any decode runs. */
  def resizePlan(features: Dataset[MediaFeature], maxSide: Int = 224): DataFrame = {
    val f = features.toDF()
    val mx = greatest(col("width"), col("height"))
    def fit(side: String) =
      when(mx <= maxSide, col(side))
        .otherwise(expr(s"CAST((`$side` * $maxSide) DIV " +
          "greatest(width, height) AS INT)"))
    f.select(col("doc_id"), col("media_type"),
      col("width"), col("height"),
      fit("width").cast("int").as("out_w"),
      fit("height").cast("int").as("out_h"),
      (mx > maxSide).as("downscaled"))
  }
}
