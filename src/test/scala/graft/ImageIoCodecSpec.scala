package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import graft.ext.{ImageIoCodec, Multimodal}
import graft.ext.Multimodal.MediaRow

/** The REAL image decoder through the batched codec seam: generated
  * PNG/BMP bytes decode to their true dimensions, features are decoded-
  * pixel means, and the 8×8 aHash is locality-sensitive — a few
  * perturbed pixels stay within Hamming 3 (found by
  * phashNearDupPairs), an inverted image lands far away. */
class ImageIoCodecSpec extends SparkSpec {
  import spark.implicits._

  /** w×h image encoded with the JDK writer; pixel = f(x, y) gray. */
  private def img(w: Int, h: Int, fmt: String)(f: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, f(x, y)))
      im.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private val W = 64
  private val H = 48
  private def gradient(x: Int, y: Int): Int = x * 255 / W

  test("decode: generated PNG and BMP bytes through the batched seam " +
    "yield true dimensions and channels") {
    val rows = Seq(
      MediaRow(1L, "image", img(W, H, "png")(gradient), "png"),
      MediaRow(2L, "image", img(32, 32, "bmp")((x, y) => (x + y) * 4), "bmp"),
      MediaRow(3L, "image", Array[Byte](1, 2, 3), "png"), // corrupt
      MediaRow(4L, "audio", img(8, 8, "png")(gradient), "wav")) // wrong type
    val meta = Multimodal
      .decode(rows.toDS(), codec = ImageIoCodec, batchSize = 2)
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).valid && meta(1L).width === W && meta(1L).height === H)
    assert(meta(1L).channels === 3 && meta(1L).n_frames === 1)
    assert(meta(2L).valid && meta(2L).width === 32 && meta(2L).height === 32)
    assert(!meta(3L).valid, "corrupt payload must decode as invalid")
    assert(!meta(4L).valid, "non-image media is not this codec's type")
  }

  test("features: decoded-pixel cell means (left cells darker than " +
    "right on a horizontal gradient), cosine-compatible shape") {
    val rows = Seq(MediaRow(1L, "image", img(W, H, "png")(gradient), "png"))
    val f = Multimodal
      .extractFeatures(rows.toDS(), dim = 16, codec = ImageIoCodec)
      .head().feature
    assert(f.length === 16)
    // grid is 4×4 row-major: within each row the gradient must ascend
    for (r <- 0 until 4; c <- 0 until 3)
      assert(f(r * 4 + c) < f(r * 4 + c + 1),
        s"cell ($r,$c) not darker than ($r,${c + 1}): ${f.toSeq}")
  }

  test("aHash locality: perturbed image within Hamming 3 and found by " +
    "phashNearDupPairs; inverted image far away") {
    val base = img(W, H, "png")(gradient)
    // a small local perturbation: brighten a 4×3 patch slightly
    val near = img(W, H, "png")((x, y) =>
      if (x < 4 && y < 3) gradient(x, y) + 12 else gradient(x, y))
    val far = img(W, H, "png")((x, y) => 255 - gradient(x, y))
    val media = Seq(
      MediaRow(1L, "image", base, "png"),
      MediaRow(2L, "image", near, "png"),
      MediaRow(3L, "image", far, "png")).toDS()
    val hashes = Multimodal.perceptualHashes(media, codec = ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 3,
      s"near-identical images too far: ${ham(hashes(1L), hashes(2L))}")
    assert(ham(hashes(1L), hashes(3L)) > 10,
      s"inverted image too close: ${ham(hashes(1L), hashes(3L))}")
    // end to end: banded blocking at hashBits=64 finds exactly the
    // near pair
    val pairs = Multimodal.phashNearDupPairs(
      Multimodal.perceptualHashes(media, codec = ImageIoCodec),
      hashBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("resize: REAL downscale through the seam — output re-decodes " +
    "at target dims and keeps the perceptual hash close") {
    val rows = Seq(MediaRow(1L, "image", img(W, H, "png")(gradient), "png"))
    val resized = Multimodal
      .resize(rows.toDS(), width = 16, height = 12, codec = ImageIoCodec)
      .collect()
    assert(resized.length === 1 && resized.head._2 === 16)
    val outRow = resized.head._1
    val meta = ImageIoCodec.decode(Seq(outRow)).head
    assert(meta.valid && meta.width === 16 && meta.height === 12,
      s"resized payload decodes to ${meta.width}x${meta.height}")
    // box-filter downscale preserves the 8x8 cell structure: the
    // resized image's aHash stays within a small Hamming distance
    val h0 = ImageIoCodec.phash(rows).head._2
    val h1 = ImageIoCodec.phash(Seq(outRow)).head._2
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 6,
      s"resize moved the aHash ${java.lang.Long.bitCount(h0 ^ h1)} bits")
    // non-image rows fall back to the stub truncation contract
    val stubRow = MediaRow(2L, "audio", Array.fill(100)(7.toByte), "wav")
    assert(ImageIoCodec.resize(stubRow, 16, 12).content.length <= 100)
  }

  test("deterministic across batch sizes and repeated runs") {
    val rows = (0L until 7L).map(i =>
      MediaRow(i, "image", img(W, H, "png")((x, y) =>
        gradient(x, y) + i.toInt * 3), "png"))
    val h1 = Multimodal.perceptualHashes(rows.toDS(), ImageIoCodec, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.perceptualHashes(rows.toDS(), ImageIoCodec, batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === h2)
  }
}
