package graft.ext

import graft.ext.Multimodal.{Codec, DecodedMeta, MediaFeatures, MediaRow}

/** REAL audio decoder behind the [[Multimodal.Codec]] seam, built on
  * the JDK's own `javax.sound.sampled` (WAV/AIFF/AU PCM parsing ships
  * with every JRE — the audio sibling of [[ImageIoCodec]]). Together
  * they make two of the three media types run an actual decoder
  * through the batched plumbing; video stays on the stub (no container
  * demuxer in the JDK), and the stub remains the m1–m4 oracle
  * substrate for all three.
  *
  * All analysis is integer/double math over the decoded PCM samples —
  * deterministic across JVMs, no audio device needed (parsing only).
  */
object WavCodec extends Codec {

  /** Decoded clip: per-channel-interleaved samples normalized to
    * [-1, 1], plus the source format. */
  private final case class Clip(
      samples: Array[Double], sampleRate: Int, channels: Int, bits: Int)

  private def read(r: MediaRow): Option[Clip] =
    if (r.media_type != "audio" || r.content.isEmpty) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val f = in.getFormat
          val bits = f.getSampleSizeInBits
          val enc = f.getEncoding
          val pcmSigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val pcmUnsigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!pcmSigned && !pcmUnsigned) None // compressed: not this codec
          else if (bits != 8 && bits != 16) None
          else {
            val raw = in.readAllBytes()
            val n = raw.length / (bits / 8)
            val out = new Array[Double](n)
            var i = 0
            if (bits == 8) {
              while (i < n) {
                out(i) =
                  if (pcmSigned) raw(i).toDouble / 128.0
                  else ((raw(i) & 0xff) - 128).toDouble / 128.0
                i += 1
              }
            } else {
              val be = f.isBigEndian
              while (i < n) {
                val lo = raw(2 * i) & 0xff
                val hi = raw(2 * i + 1) & 0xff
                val s =
                  if (be) ((lo << 8) | hi).toShort else ((hi << 8) | lo).toShort
                out(i) = s.toDouble / 32768.0
                i += 1
              }
            }
            Some(Clip(out, f.getSampleRate.toInt, f.getChannels, bits))
          }
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

  /** Mean-square energy of each of g equal sample windows. */
  private def windowEnergies(c: Clip, g: Int): Array[Double] = {
    val n = c.samples.length
    val sums = new Array[Double](g)
    val counts = new Array[Long](g)
    var i = 0
    while (i < n) {
      val w = math.min(g - 1, i * g / math.max(n, 1))
      sums(w) += c.samples(i) * c.samples(i)
      counts(w) += 1
      i += 1
    }
    Array.tabulate(g)(j => if (counts(j) == 0L) 0.0 else sums(j) / counts(j))
  }

  override def decode(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { r =>
      read(r) match {
        case Some(c) =>
          DecodedMeta(
            r.media_id, r.media_type, r.format,
            width = 0, height = 0, channels = c.channels,
            sample_rate = c.sampleRate,
            duration_ms =
              c.samples.length.toLong * 1000L /
                math.max(c.sampleRate * c.channels, 1),
            n_frames = 0, valid = true)
        case None =>
          DecodedMeta(r.media_id, r.media_type, r.format,
            0, 0, 0, 0, 0L, 0, valid = false)
      }
    }

  /** Feature vector = log-RMS energy of `dim` equal windows — the
    * classic energy-contour embedding; cosine-compatible with
    * [[Similarity]] like every feature column in this module. */
  override def features(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures] =
    batch.map { r =>
      val f = read(r) match {
        case Some(c) =>
          windowEnergies(c, dim).map(e =>
            math.log1p(e * 1e4).toFloat) // stable at silence (e = 0)
        case None => Array.fill(dim)(0f)
      }
      MediaFeatures(r.media_id, r.media_type, f)
    }

  /** 64-bit energy-contour hash: bit i = window-i mean-square energy
    * above the clip mean — the audio analog of the 8×8 aHash, and like
    * it locality-sensitive: a small local perturbation moves only the
    * windows whose energy crosses the global mean. */
  override def phash(batch: Seq[MediaRow]): Seq[(Long, Long)] =
    batch.map { r =>
      val bits = read(r) match {
        case Some(c) =>
          val e = windowEnergies(c, 64)
          val mean = e.sum / 64.0
          e.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
            if (v > mean) acc | (1L << i) else acc
          }
        case None => 0L
      }
      (r.media_id, bits)
    }

  /** Frame-level PCM features through the REAL decoder: non-overlapping
    * `frameLen`-sample frames, per frame the zero-crossing count
    * (frame-LOCAL sign transitions, v<0 vs v≥0 — no cross-frame pair)
    * and the exact integer energy Σv² over the reconstructed 16-bit
    * sample values. Integer domain end-to-end (the decode normalizes
    * to [-1,1]; `round(v·32768)` reconstructs the original PCM shorts
    * exactly), so the whole feature frame is engine-replayable when
    * the payload generator is analytic — the m-family oracle
    * discipline. The imperative loop lives at the codec seam like
    * every decoder here; everything downstream is a plain DataFrame.
    * Output: (media_id, frame_idx, n_samples, zcr, energy). */
  def frameFeatures(
      media: org.apache.spark.sql.Dataset[MediaRow],
      frameLen: Int = 256): org.apache.spark.sql.DataFrame = {
    require(frameLen >= 2, "frameLen must be >= 2")
    val sp = media.sparkSession
    import sp.implicits._
    media.flatMap { r =>
      read(r) match {
        case Some(c) if c.samples.nonEmpty =>
          val s = c.samples.map(v =>
            math.max(-32768, math.min(32767, math.round(v * 32768.0).toInt)))
          val nFrames = (s.length + frameLen - 1) / frameLen
          (0 until nFrames).map { f =>
            val start = f * frameLen
            val end = math.min(start + frameLen, s.length)
            var zcr = 0L
            var energy = 0L
            var j = start
            while (j < end) {
              if (j > start && ((s(j) < 0) != (s(j - 1) < 0))) zcr += 1
              energy += s(j).toLong * s(j).toLong
              j += 1
            }
            (r.media_id, f.toLong, (end - start).toLong, zcr, energy)
          }
        case _ => Seq.empty
      }
    }.toDF("media_id", "frame_idx", "n_samples", "zcr", "energy")
  }

  /** Audio "frames" = n evenly spaced decoded PCM chunks (byte slices
    * of the RAW payload would include the RIFF header; these are the
    * decoded samples re-encoded as 16-bit little-endian mono-order
    * bytes, 1024 samples per chunk). */
  override def sampleFrames(row: MediaRow, n: Int): Seq[Array[Byte]] =
    read(row) match {
      case Some(c) if n > 0 && c.samples.nonEmpty =>
        val chunk = 1024
        (0 until n).map { i =>
          val start = i * c.samples.length / n
          val len = math.min(chunk, c.samples.length - start)
          val out = new Array[Byte](len * 2)
          var j = 0
          while (j < len) {
            val s = math.max(-32768, math.min(32767,
              math.round(c.samples(start + j) * 32768.0).toInt))
            out(2 * j) = (s & 0xff).toByte
            out(2 * j + 1) = ((s >> 8) & 0xff).toByte
            j += 1
          }
          out
        }
      case _ => Seq.empty
    }
}
