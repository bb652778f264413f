package graft

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.ext.{Multimodal, WavCodec}
import graft.ext.Multimodal.MediaRow

/** The REAL audio decoder through the batched codec seam: generated
  * 16-bit PCM WAV bytes decode to their true format, features are
  * decoded-energy contours, and the 64-window energy hash is
  * locality-sensitive — a slightly perturbed clip stays within
  * Hamming 3 (found by phashNearDupPairs), an inverted-envelope clip
  * lands far away. */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  private val Rate = 16000f

  /** Mono 16-bit little-endian WAV; sample i = f(i) in [-1, 1]. */
  private def wav(n: Int)(f: Int => Double): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = math.max(-32768, math.min(32767,
        math.round(f(i) * 32767.0).toInt)).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(Rate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val N = 16000 // 1 second
  // rising-envelope tone: energy contour ascends — every hash window
  // carries signal (a constant-amplitude tone would tie every window
  // at the mean and make the threshold bits unstable)
  private def ramp(i: Int): Double =
    (i.toDouble / N) * math.sin(2 * math.Pi * 440 * i / Rate) * 0.9

  test("decode: generated WAV bytes through the batched seam yield " +
    "true sample rate, channels, duration; corrupt/wrong-type invalid") {
    val rows = Seq(
      MediaRow(1L, "audio", wav(N)(ramp), "wav"),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3, 4), "wav"), // corrupt
      MediaRow(3L, "image", wav(N)(ramp), "png")) // wrong type
    val meta = Multimodal
      .decode(rows.toDS(), codec = WavCodec, batchSize = 2)
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).valid && meta(1L).sample_rate === 16000)
    assert(meta(1L).channels === 1 && meta(1L).duration_ms === 1000L)
    assert(!meta(2L).valid && !meta(3L).valid)
  }

  test("features: rising-envelope energy contour ascends; " +
    "deterministic across batch sizes") {
    val rows = Seq(MediaRow(1L, "audio", wav(N)(ramp), "wav"))
    val f = Multimodal
      .extractFeatures(rows.toDS(), dim = 8, codec = WavCodec)
      .head().feature
    assert(f.length === 8)
    for (i <- 0 until 7)
      assert(f(i) < f(i + 1), s"window $i not quieter than ${i + 1}: ${f.toSeq}")
    val f2 = Multimodal
      .extractFeatures(rows.toDS(), dim = 8, codec = WavCodec, batchSize = 1)
      .head().feature
    assert(f.toSeq === f2.toSeq)
  }

  test("energy-hash locality: perturbed clip within Hamming 3 and " +
    "found by phashNearDupPairs; inverted envelope far away") {
    val base = wav(N)(ramp)
    // small local perturbation: one 50 ms patch slightly louder
    val near = wav(N)(i =>
      if (i >= 800 && i < 1600) ramp(i) * 1.1 else ramp(i))
    // inverted envelope: loud start, quiet end — complementary contour
    val far = wav(N)(i =>
      ((N - i).toDouble / N) * math.sin(2 * math.Pi * 440 * i / Rate) * 0.9)
    val media = Seq(
      MediaRow(1L, "audio", base, "wav"),
      MediaRow(2L, "audio", near, "wav"),
      MediaRow(3L, "audio", far, "wav")).toDS()
    val hashes = Multimodal.perceptualHashes(media, codec = WavCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 3,
      s"near-identical clips too far: ${ham(hashes(1L), hashes(2L))}")
    assert(ham(hashes(1L), hashes(3L)) > 10,
      s"inverted envelope too close: ${ham(hashes(1L), hashes(3L))}")
    val pairs = Multimodal.phashNearDupPairs(
      Multimodal.perceptualHashes(media, codec = WavCodec), hashBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("sampleFrames: decoded PCM chunks, 16-bit LE, evenly spaced") {
    val row = MediaRow(1L, "audio", wav(N)(ramp), "wav")
    val frames = WavCodec.sampleFrames(row, 4)
    assert(frames.length === 4)
    assert(frames.forall(_.length === 2048)) // 1024 samples * 2 bytes
    // energy of decoded chunks ascends with the envelope
    def energy(b: Array[Byte]): Double = {
      var e = 0.0
      for (j <- 0 until b.length / 2) {
        val s = (((b(2 * j + 1) & 0xff) << 8) | (b(2 * j) & 0xff)).toShort
        e += s.toDouble * s
      }
      e
    }
    val es = frames.map(energy)
    for (i <- 0 until 3) assert(es(i) < es(i + 1))
  }

  test("frameFeatures: hand-computed ZCR and exact integer energy, " +
    "frame-local transitions only") {
    // 6 samples alternating ±1000/32768, frameLen=4 → two frames:
    // [1000,-1000,1000,-1000] (3 transitions) and [1000,-1000] (1);
    // the frame boundary pair (-1000 → 1000) must NOT count
    val alt = wav(6)(i => (if (i % 2 == 0) 1000.0 else -1000.0) / 32768.0)
    val media = Seq(MediaRow(7L, "audio", alt, "wav")).toDS()
    val got = WavCodec.frameFeatures(media, frameLen = 4)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // wav() scales by 32767 then decode reconstructs round(v·32768):
    // 1000/32768 → short 1000 both ways (the m-family round trip)
    assert(got(0L) === ((4L, 3L, 4L * 1000L * 1000L)))
    assert(got(1L) === ((2L, 1L, 2L * 1000L * 1000L)))
    // a constant-sign clip has zero crossings, exact DC energy
    val dc = wav(5)(_ => 512.0 / 32768.0)
    val got2 = WavCodec.frameFeatures(
      Seq(MediaRow(8L, "audio", dc, "wav")).toDS(), frameLen = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got2 === Seq((0L, 5L, 0L, 5L * 512L * 512L)))
  }
}
