package graft.ext

import java.awt.image.BufferedImage

import graft.ext.Multimodal.{Codec, DecodedMeta, MediaFeatures, MediaRow}

/** REAL image decoder behind the [[Multimodal.Codec]] seam, built on
  * the JDK's own `javax.imageio` readers — PNG/BMP/GIF/JPEG/WBMP ship
  * with every JRE, so unlike the audio/video paths no external native
  * library is needed and the batched plumbing can be exercised against
  * actual decoded pixels (spec: `ImageIoCodecSpec` round-trips
  * generated PNG/BMP bytes and checks pHash locality on
  * near-identical images).
  *
  * Division of labor with [[Multimodal.DeterministicStubCodec]]: the
  * stub stays the substrate of the m1–m4 DuckDB oracles (its outputs
  * are portable md5 arithmetic an independent engine can replay —
  * decoded pixel values are not), and handles the audio/video types
  * this codec reports as `valid = false`. A deployment composes codecs
  * per media type; the seam (one codec call per `batchSize` rows
  * inside `mapPartitions`) is identical either way.
  *
  * All pixel math is integer box-filtering over `getRGB` — no AWT
  * `Graphics2D` scaling, so it runs headless and produces identical
  * results on any JVM.
  */
object ImageIoCodec extends Codec {

  // ImageIO's default on-disk stream cache would add executor-local
  // /tmp I/O per decode; decoding from byte arrays needs none of it.
  javax.imageio.ImageIO.setUseCache(false)

  private def read(r: MediaRow): Option[BufferedImage] =
    if (r.media_type != "image" || r.content.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content)))
      catch { case _: java.io.IOException => None } // corrupt payload

  /** Mean luma (0–255, Rec.601 integer weights) of each cell of a g×g
    * grid — a deterministic box-filter downscale. */
  private def cellMeans(img: BufferedImage, g: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val cy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val cx = math.min(g - 1, x * g / w)
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 +
          ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        sums(cy * g + cx) += luma
        counts(cy * g + cx) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g)(i =>
      if (counts(i) == 0L) 0.0 else sums(i).toDouble / counts(i))
  }

  override def decode(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { r =>
      read(r) match {
        case Some(img) =>
          DecodedMeta(
            r.media_id, r.media_type, r.format,
            width = img.getWidth, height = img.getHeight,
            channels = img.getColorModel.getNumComponents,
            sample_rate = 0, duration_ms = 0L, n_frames = 1, valid = true)
        case None =>
          DecodedMeta(r.media_id, r.media_type, r.format,
            0, 0, 0, 0, 0L, 0, valid = false)
      }
    }

  /** Feature vector = mean luma of the first `dim` cells of the
    * smallest square grid with ≥ dim cells — the classic tiny-thumbnail
    * embedding; cosine-compatible with [[Similarity]]. */
  override def features(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures] =
    batch.map { r =>
      val f = read(r) match {
        case Some(img) =>
          val g = math.ceil(math.sqrt(dim.toDouble)).toInt
          val cells = cellMeans(img, g)
          Array.tabulate(dim)(i => cells(i).toFloat)
        case None => Array.fill(dim)(0f)
      }
      MediaFeatures(r.media_id, r.media_type, f)
    }

  /** Classic 8×8 aHash: 64 mean-luma cells thresholded at their global
    * mean — locality-sensitive on PIXELS (a small pixel perturbation
    * flips at most the few cells whose mean crosses the threshold),
    * which is what makes [[Multimodal.phashNearDupPairs]] with
    * `hashBits = 64` a real near-duplicate-image detector here. */
  override def phash(batch: Seq[MediaRow]): Seq[(Long, Long)] =
    batch.map { r =>
      val bits = read(r) match {
        case Some(img) =>
          val cells = cellMeans(img, 8)
          val mean = cells.sum / 64.0
          cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
            if (c > mean) acc | (1L << i) else acc
          }
        case None => 0L
      }
      (r.media_id, bits)
    }

  /** REAL resize: box-filter downscale (the same deterministic cell
    * averaging the hash path uses, at target resolution — headless, no
    * Graphics2D) re-encoded as PNG. Non-image / undecodable rows fall
    * back to the stub truncation contract so a mixed batch keeps the
    * schema and batch shape. */
  override def resize(row: MediaRow, width: Int, height: Int): MediaRow =
    read(row) match {
      case Some(img) if width > 0 && height > 0 =>
        val out = new BufferedImage(
          width, height, BufferedImage.TYPE_INT_RGB)
        val (w, h) = (img.getWidth, img.getHeight)
        // per-target-pixel box average over its source region
        var ty = 0
        while (ty < height) {
          val y0 = ty * h / height
          val y1 = math.max(y0 + 1, (ty + 1) * h / height)
          var tx = 0
          while (tx < width) {
            val x0 = tx * w / width
            val x1 = math.max(x0 + 1, (tx + 1) * w / width)
            var (rs, gs, bs, n) = (0L, 0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff
                bs += rgb & 0xff; n += 1
                x += 1
              }
              y += 1
            }
            out.setRGB(tx, ty,
              (((rs / n).toInt) << 16) | (((gs / n).toInt) << 8) | (bs / n).toInt)
            tx += 1
          }
          ty += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        row.copy(content = bos.toByteArray, format = "png")
      case _ => super.resize(row, width, height)
    }

  /** Images are their own single frame; audio/video are not this
    * codec's media type (compose with a video codec at the seam). */
  override def sampleFrames(row: MediaRow, n: Int): Seq[Array[Byte]] =
    if (row.media_type == "image" && n > 0 && row.content.nonEmpty)
      Seq(row.content)
    else Seq.empty
}
