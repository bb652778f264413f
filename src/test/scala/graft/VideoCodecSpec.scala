package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import graft.ext.{ImageIoCodec, Multimodal, VideoCodec}
import graft.ext.Multimodal.MediaRow

/** The motion-PNG video path: container round-trip, real per-frame
  * decode, frame sampling, whole-video and frame-level near-dup with
  * actual pixels end to end. */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, f(x, y)))
      im.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private val W = 48
  private val H = 32
  /** Frame t of a horizontally drifting gradient. */
  private def frame(t: Int): Array[Byte] =
    png(W, H)((x, y) => ((x + t * 4) % W) * 255 / W)

  test("decode: container parses to true frame count, dims from the " +
    "first REAL-decoded frame; malformed payloads invalid") {
    val vid = VideoCodec.encode((0 until 6).map(frame))
    val rows = Seq(
      MediaRow(1L, "video", vid, "gvid"),
      MediaRow(2L, "video", Array[Byte](1, 2, 3), "gvid"),
      MediaRow(3L, "image", vid, "png"))
    val meta = Multimodal
      .decode(rows.toDS(), codec = VideoCodec, batchSize = 2)
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).valid && meta(1L).n_frames === 6)
    assert(meta(1L).width === W && meta(1L).height === H)
    assert(meta(1L).duration_ms === 6 * VideoCodec.FrameMs)
    assert(!meta(2L).valid && !meta(3L).valid)
  }

  test("sampleFrames: evenly spaced REAL PNGs, each decodable") {
    val vid = MediaRow(1L, "video", VideoCodec.encode((0 until 8).map(frame)), "gvid")
    val sampled = Multimodal.sampleFrames(Seq(vid).toDS(), n = 4, codec = VideoCodec)
      .collect()
    assert(sampled.length === 4)
    sampled.foreach { r =>
      val m = ImageIoCodec.decode(Seq(MediaRow(
        r.getAs[Long]("media_id"), "image",
        r.getAs[Array[Byte]]("frame_bytes"), "png"))).head
      assert(m.valid && m.width === W && m.height === H)
    }
  }

  test("frame-level near-dup with real pixels: two videos sharing " +
    "perturbed frames pair up; an unrelated video does not") {
    // v1 and v2 share the same drift with a small brightness delta —
    // per-frame aHash within the banded radius; v3 is inverted
    val v1 = VideoCodec.encode((0 until 4).map(frame))
    val v2 = VideoCodec.encode((0 until 4).map(t =>
      png(W, H)((x, y) =>
        (if (x < 3 && y < 3) 14 else 0) + ((x + t * 4) % W) * 255 / W)))
    val v3 = VideoCodec.encode((0 until 4).map(t =>
      png(W, H)((x, y) => 255 - ((x + t * 4) % W) * 255 / W)))
    val vids = Seq(
      MediaRow(10L, "video", v1, "gvid"),
      MediaRow(20L, "video", v2, "gvid"),
      MediaRow(30L, "video", v3, "gvid")).toDS()
    val frames = Multimodal.sampleFrames(vids, n = 4, codec = VideoCodec)
      .select((col("media_id") * 10 + col("frame_index")).as("fid"),
        col("frame_bytes"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => MediaRow(id, "image", b, "png") }
    val pairs = Multimodal.phashNearDupPairs(
      Multimodal.perceptualHashes(frames, codec = ImageIoCodec),
      hashBits = 64)
      .select(expr("id_a div 10").as("va"), expr("id_b div 10").as("vb"))
      .where(col("va") =!= col("vb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 20L)), s"shared-frame pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 30L || p._2 == 30L),
      s"inverted video matched: $pairs")
    // whole-video hash agrees: middle-frame aHash pairs v1/v2 only
    val vh = VideoCodec.phash(Seq(
      MediaRow(10L, "video", v1, "gvid"),
      MediaRow(20L, "video", v2, "gvid"),
      MediaRow(30L, "video", v3, "gvid"))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(vh(10L), vh(20L)) <= 3)
    assert(ham(vh(10L), vh(30L)) > 10)
  }

  test("resize: every frame truly rescaled and re-containerized") {
    val vid = MediaRow(1L, "video", VideoCodec.encode((0 until 5).map(frame)), "gvid")
    val out = VideoCodec.resize(vid, 16, 8)
    val meta = VideoCodec.decode(Seq(out)).head
    assert(meta.valid && meta.n_frames === 5)
    assert(meta.width === 16 && meta.height === 8)
  }
}
