package graft.ext

import graft.ext.Multimodal.{Codec, DecodedMeta, MediaFeatures, MediaRow}

/** REAL video path behind the [[Multimodal.Codec]] seam: a
  * motion-PNG container (the MJPEG idea with PNG frames — the JDK has
  * no mp4/mkv demuxer, but it decodes PNG, so the container is
  * length-prefixed PNG frames and every byte of the pipeline is real:
  * container parse → frame extraction → [[ImageIoCodec]] pixel
  * decode). Completes the trio: [[ImageIoCodec]] images,
  * [[WavCodec]] audio, this for video; the md5 stub remains the
  * m1–m4 oracle substrate.
  *
  * Container layout (all integers big-endian):
  * `"GVID" | int32 frameCount | frameCount × (int32 len | PNG bytes)`.
  * Fixed 25 fps (40 ms/frame) for duration metadata — a real container
  * carries timestamps; the constant keeps the format minimal.
  */
object VideoCodec extends Codec {

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')
  val FrameMs = 40L // 25 fps

  /** Build a container from encoded (PNG) frame payloads. */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Parse a container into its frame payloads (None if malformed). */
  def frames(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(content))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, Magic)) None
      else {
        val k = in.readInt()
        if (k < 0 || k > (1 << 20)) None
        else Some((0 until k).map { _ =>
          val len = in.readInt()
          if (len < 0 || len > content.length) throw new java.io.EOFException
          val f = new Array[Byte](len)
          in.readFully(f)
          f
        })
      }
    } catch { case _: java.io.IOException => None }

  private def parse(r: MediaRow): Option[IndexedSeq[Array[Byte]]] =
    if (r.media_type != "video" || r.content.isEmpty) None
    else frames(r.content)

  private def asImage(id: Long, png: Array[Byte]): MediaRow =
    MediaRow(id, "image", png, "png")

  override def decode(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { r =>
      parse(r) match {
        case Some(fs) if fs.nonEmpty =>
          val first = ImageIoCodec.decode(Seq(asImage(r.media_id, fs.head))).head
          DecodedMeta(
            r.media_id, r.media_type, r.format,
            width = first.width, height = first.height,
            channels = first.channels,
            sample_rate = 0, duration_ms = fs.length * FrameMs,
            n_frames = fs.length, valid = first.valid)
        case _ =>
          DecodedMeta(r.media_id, r.media_type, r.format,
            0, 0, 0, 0, 0L, 0, valid = false)
      }
    }

  /** Features of the MIDDLE frame (the keyframe heuristic) through the
    * real image path. */
  override def features(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures] =
    batch.map { r =>
      val f = parse(r) match {
        case Some(fs) if fs.nonEmpty =>
          ImageIoCodec.features(
            Seq(asImage(r.media_id, fs(fs.length / 2))), dim).head.feature
        case _ => Array.fill(dim)(0f)
      }
      MediaFeatures(r.media_id, r.media_type, f)
    }

  /** Middle-frame aHash — pairs with [[Multimodal.phashNearDupPairs]]
    * at `hashBits = 64` for whole-video near-dup; frame-LEVEL dedup
    * samples frames and hashes each through [[ImageIoCodec]]. */
  override def phash(batch: Seq[MediaRow]): Seq[(Long, Long)] =
    batch.map { r =>
      val bits = parse(r) match {
        case Some(fs) if fs.nonEmpty =>
          ImageIoCodec.phash(Seq(asImage(r.media_id, fs(fs.length / 2)))).head._2
        case _ => 0L
      }
      (r.media_id, bits)
    }

  /** Up to `n` evenly spaced REAL frame payloads (each a decodable
    * PNG — downstream per-frame image ops run [[ImageIoCodec]] on
    * them directly). */
  override def sampleFrames(row: MediaRow, n: Int): Seq[Array[Byte]] =
    parse(row) match {
      case Some(fs) if fs.nonEmpty && n > 0 =>
        val take = math.min(n, fs.length)
        (0 until take).map(i => fs(i * fs.length / take))
      case _ => Seq.empty
    }

  /** Real resize: every frame through [[ImageIoCodec.resize]], then
    * re-containerized. */
  override def resize(row: MediaRow, width: Int, height: Int): MediaRow =
    parse(row) match {
      case Some(fs) if fs.nonEmpty =>
        row.copy(content = encode(fs.map(f =>
          ImageIoCodec.resize(asImage(row.media_id, f), width, height).content)))
      case _ => super.resize(row, width, height)
    }
}
