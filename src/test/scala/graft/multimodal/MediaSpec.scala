package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MediaSpec extends SparkSpec {

  private lazy val media = Media.synth(spark, 90).cache()

  test("synth blobs are deterministic and self-describing") {
    val a = Media.blob(7L); val b = Media.blob(7L)
    assert(a.bytes.sameElements(b.bytes))
    assert(a.kind === "audio") // 7 % 3 == 1
    assert(Media.blob(0L).kind === "image")
    assert(Media.blob(2L).kind === "video")
  }

  test("decodeImages parses headers and computes stats per partition batch") {
    val feats = Media.decodeImages(media).collect()
    assert(feats.length === 30) // a third are images
    feats.foreach { f =>
      val r = Media.blob(f.media_id)
      assert(f.width === r.meta_width)
      assert(f.height === r.meta_height)
      assert(f.mean_intensity > 0 && f.mean_intensity < 255)
      assert(f.histogram.sum === r.meta_width.toLong * r.meta_height)
    }
  }

  test("decode is deterministic across partitionings") {
    val a = Media.decodeImages(media).collect()
      .map(f => (f.media_id, f.mean_intensity)).toMap
    val b = Media.decodeImages(media.repartition(7)).collect()
      .map(f => (f.media_id, f.mean_intensity)).toMap
    assert(a === b)
  }

  test("resize produces valid blobs decodable to the new size") {
    val resized = Media.resize(media, 8, 8)
    val feats = Media.decodeImages(resized).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === 8 && f.height === 8)
      assert(f.histogram.sum === 64L)
    }
  }

  test("frameSample: every k-th frame, correct count") {
    val samples = Media.frameSample(media, 2).collect()
    val byId = samples.groupBy(_.media_id)
    byId.foreach { case (id, frames) =>
      val r = Media.blob(id)
      assert(frames.length === (r.meta_frames + 1) / 2)
      assert(frames.map(_.frame_no).sorted.toSeq ===
        (0 until r.meta_frames by 2))
    }
  }

  test("metadata-only query prunes the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val plan = Media.metaOnly(fromDisk).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"),
      s"binary column must be pruned from the scan:\n$plan")
  }
}
