package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Synth

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batched passes.
  *
  * The container has no image/audio codecs, so DECODE IS A DETERMINISTIC
  * FAKE: media blobs use a tiny self-describing header
  * (magic, kind, width, height, channels/frames) over a mix-generated
  * payload, and "decode" parses that header + payload. Everything
  * Spark-side — schema, partitioning, batch shape (mapPartitions over
  * row groups, one decode context per partition the way a real codec
  * pool would amortize), column pruning of the binary column when only
  * metadata is selected — is real and tested.
  */
object Media {

  val MagicImage: Byte = 0x11
  val MagicAudio: Byte = 0x22
  val MagicVideo: Byte = 0x33

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      meta_width: Int,
      meta_height: Int,
      meta_frames: Int,
      bytes: Array[Byte])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      mean_intensity: Double,
      histogram: Seq[Long])

  final case class FrameSample(
      media_id: Long,
      frame_no: Int,
      frame_mean: Double)

  // ------------------------------------------------- synthetic media

  /** Deterministic blob for media i: header(6B) + payload. */
  def blob(i: Long): MediaRow = {
    val kind = (i % 3) match {
      case 0 => ("image", MagicImage)
      case 1 => ("audio", MagicAudio)
      case _ => ("video", MagicVideo)
    }
    val w = 8 + (Synth.mix(i * 31L) & 7L).toInt * 4 // 8..36
    val h = 8 + (Synth.mix(i * 37L) & 7L).toInt * 4
    val frames = if (kind._1 == "video") 4 + (i % 5).toInt else 1
    val payloadLen =
      if (kind._1 == "audio") 256 else w * h * frames
    val payload = Array.tabulate(payloadLen)(j =>
      (Synth.mix(i * 1000003L + j) & 0xffL).toByte)
    val header = Array[Byte](kind._2, 0,
      (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte, frames.toByte)
    MediaRow(i, kind._1, w, h, frames, header ++ payload)
  }

  def synth(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(i => blob(i))
  }

  // -------------------------------------------------------- operators

  /** "Decode" images: parse header + compute intensity stats over the
    * payload. mapPartitions so a real decoder pool / pinned buffer would
    * initialize once per partition (the batch shape a Pandas-UDF /
    * mapInPandas port would keep). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // per-partition decode context (stub for codec init)
      val hist = new Array[Long](8)
      rows.map { r =>
        java.util.Arrays.fill(hist, 0L)
        val w = ((r.bytes(2) & 0xff) << 8) | (r.bytes(3) & 0xff)
        val h = ((r.bytes(4) & 0xff) << 8) | (r.bytes(5) & 0xff)
        var sum = 0L
        var j = 7
        while (j < r.bytes.length) {
          val v = r.bytes(j) & 0xff
          sum += v
          hist(v >>> 5) += 1
          j += 1
        }
        val n = r.bytes.length - 7
        ImageFeatures(r.media_id, w, h,
          if (n == 0) 0.0 else sum.toDouble / n, hist.toSeq)
      }
    }
  }

  /** "Resize": deterministic nearest-neighbor downsample of the fake
    * pixel grid to (w2, h2); returns new blobs with updated headers. */
  def resize(media: Dataset[MediaRow], w2: Int, h2: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { r =>
      val w = r.meta_width; val h = r.meta_height
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val sx = x * w / w2; val sy = y * h / h2
          out(y * w2 + x) = r.bytes(7 + sy * w + sx)
          x += 1
        }
        y += 1
      }
      val header = Array[Byte](MagicImage, 0,
        (w2 >> 8).toByte, w2.toByte, (h2 >> 8).toByte, h2.toByte, 1)
      MediaRow(r.media_id, "image", w2, h2, 1, header ++ out)
    }
  }

  /** Frame-sample videos: every k-th frame's mean intensity. */
  def frameSample(media: Dataset[MediaRow], everyK: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frameLen = r.meta_width * r.meta_height
      (0 until r.meta_frames by everyK).map { f =>
        var sum = 0L
        var j = 0
        while (j < frameLen) {
          sum += (r.bytes(7 + f * frameLen + j) & 0xff)
          j += 1
        }
        FrameSample(r.media_id, f, sum.toDouble / frameLen)
      }
    }
  }

  /** Metadata-only projection: must prune the binary column at the scan
    * (asserted in MediaSpec via the optimized plan). */
  def metaOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), col("meta_width"),
      col("meta_height"), col("meta_frames"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta_width") * col("meta_height")).as("avg_pixels"))
      .orderBy(col("kind"))
}
