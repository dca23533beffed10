package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media as opaque `binary` columns with typed metadata. The Spark-side
  * plumbing — schema, partition-friendly batching, typed record shape,
  * feature column layout — is real and tested; the actual codec call is a
  * clearly-marked deterministic stand-in because no image/audio libraries
  * exist in this offline container (swap `decodeStub` for a JNI/ffmpeg/
  * javacv call in production; the dataflow does not change).
  */
object MultimodalOps {

  /** Typed media record: the binary payload plus the metadata a pipeline
    * partitions and filters on without touching bytes. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      durationMs: Long)

  /** Decoded/extracted feature row: fixed-shape float vector per record
    * (≙ an image embedding / mel features / frame descriptor). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** === STUB === deterministic fake decode: a real build replaces this with
    * the codec (e.g. ImageIO/ffmpeg) — everything around it stays identical.
    * Features are a pure function of the bytes so tests are reproducible. */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 32).toInt / Int.MaxValue.toFloat)
      d += 1
    }
    out
  }

  /** Wrap raw binary + metadata columns into the typed media Dataset.
    * `df` needs (media_id, kind, bytes[, width, height, durationMs]). */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    val withMeta = Seq("width" -> "0", "height" -> "0", "durationMs" -> "0L")
      .foldLeft(df) { case (d, (c, default)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, expr(default))
      }
    withMeta.selectExpr("media_id", "kind", "bytes",
      "cast(width as int) width", "cast(height as int) height",
      "cast(durationMs as long) durationMs")
      .as(Encoders.product[MediaRecord])
  }

  /** Feature extraction over partition-local batches: mapPartitions so a real
    * decoder amortizes model/codec init per partition (the JVM analogue of a
    * pandas-batched UDF), while the plan stays a typed Dataset operation.
    * Output shape is fixed (`dim`) — downstream ANN/dedup operators consume
    * the `features` column directly. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 32): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) decoder happens here once
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          decodeStub(m.bytes, dim))
      }
    }
  }

  /** Frame sampling plumbing for video: splits a binary payload into `n`
    * deterministic byte-range "frames" (a real build decodes actual frames;
    * the fan-out shape 1→n, the explode, and the per-frame feature columns
    * are the tested contract). */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    // n=0 would make sequence(0, -1) emit a DESCENDING [0, -1] frame pair
    // and the substring arithmetic divide by zero mid-job — reject up front
    require(n >= 1, s"sampleFrames needs n >= 1 frames, got $n")
    val df = media.toDF()
    df.filter(col("kind") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes",
        // frame_idx * octet_length in BIGINT: the int product overflows at
        // ~2GB·frame-weighted payloads (frame 7 of a 307MB video) — ANSI
        // aborts the job, non-ANSI wraps negative and substring() silently
        // reads from the END of the blob (wrong frame bytes, wrong sha)
        expr(s"substring(bytes, cast(cast(frame_idx as bigint) * octet_length(bytes) / $n as bigint) + 1, " +
          s"cast(octet_length(bytes) / $n as int))"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame_bytes")).as("frame_n_bytes"),
        sha2(col("frame_bytes"), 256).as("frame_sha"))
  }
}
