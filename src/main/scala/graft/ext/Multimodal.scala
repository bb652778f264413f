package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: images/audio/video
  * travel as opaque `binary` columns plus a typed metadata struct, and
  * decode/feature-extract/resize/frame-sample run as partition-level
  * batch operators.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch shape (a pluggable [[Codec]] is invoked once per batch of
  * `batchSize` rows inside `mapPartitions`, the Scala analog of a
  * `mapInPandas` batch UDF: amortizes per-batch codec setup, keeps
  * memory bounded, preserves partitioning so a following groupBy/join
  * shuffles only derived features, never raw bytes).
  *
  * The codecs themselves are STUBS — this container has no image/audio
  * libraries. [[DeterministicStubCodec]] derives plausible metadata and
  * features purely from the bytes (stable across runs/executors); a
  * real deployment drops in a JNI/JavaCV-backed [[Codec]] with the same
  * interface and nothing else changes.
  */
object Multimodal {

  /** One media row: content is the opaque payload; meta is typed. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte],
      format: String)

  final case class DecodedMeta(
      media_id: Long,
      media_type: String,
      format: String,
      width: Int, height: Int, channels: Int, // image/video
      sample_rate: Int, duration_ms: Long, // audio/video
      n_frames: Int,
      valid: Boolean)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      feature: Array[Float])

  /** Batch codec interface (the seam where a real decoder plugs in).
    * Called once per batch; implementations may allocate native
    * resources per call. */
  trait Codec extends Serializable {
    def decode(batch: Seq[MediaRow]): Seq[DecodedMeta]
    def features(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures]
    /** Sample up to `n` evenly spaced frame payloads of a video. */
    def sampleFrames(row: MediaRow, n: Int): Seq[Array[Byte]]
    /** Re-encode `row`'s payload at the target dimensions. The default
      * is the stub contract (payload truncated proportionally to the
      * pixel-count ratio from the decoded metadata — schema/batch
      * plumbing only); a real image codec overrides with an actual
      * rescale + re-encode ([[ImageIoCodec.resize]]). */
    def resize(row: MediaRow, width: Int, height: Int): MediaRow = {
      val m = decode(Seq(row)).head
      val scale =
        if (m.width <= 0 || m.height <= 0) 1.0
        else math.min(1.0,
          (width.toLong * height).toDouble / (m.width.toLong * m.height))
      val newLen = math.max(1, (row.content.length * scale).toInt)
      row.copy(content = row.content.take(newLen))
    }
    /** Perceptual hash per row (media_id, phash). A real codec
      * computes mean-thresholded 8×8 luma (classic aHash), which is
      * locality-sensitive on pixels; the stub derives
      * [[Multimodal.PhashBits]] cells from payload bytes, so it is
      * content-stable (identical payloads → identical hash) but not
      * pixel-local. */
    def phash(batch: Seq[MediaRow]): Seq[(Long, Long)]
  }

  /** Stub pHash width: 60 bits (the informative width of the portable
    * md5 idiom — see [[graft.ext.Dedup.pmd5]]), banded 4×15 for
    * pigeonhole blocking, like the text SimHash path. A real 64-bit
    * aHash codec passes `hashBits = 64` to [[phashNearDupPairs]]. */
  val PhashBits = 60

  /** STUB codec: every output is a pure deterministic function of the
    * payload bytes — no real decoding happens in this container. All
    * derived values come from the PORTABLE 60-bit md5 hash (the
    * [[graft.ext.Dedup.pmd5]] idiom: first 15 hex digits of
    * `md5(label || payload)` parsed base-16), so an independent SQL
    * engine can replay every media query end to end — the substrate
    * behind the m1–m4 DuckDB oracles in [[MultimodalQueries]]. */
  object DeterministicStubCodec extends Codec {
    /** Portable 60-bit hash ≡ Spark `conv(substr(md5(x),1,15),16,10)`
      * ≡ DuckDB `('0x'||substr(md5(x),1,15))::BIGINT` where
      * x = label ++ payload. Non-negative. */
    private def pmd5(label: String, payload: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(label.getBytes("UTF-8"))
      md.update(payload)
      val d = md.digest()
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      (h << 4) | ((d(7) >> 4) & 0xfL) // 7.5 bytes = 15 hex digits
    }

    def decode(batch: Seq[MediaRow]): Seq[DecodedMeta] = batch.map { r =>
      val h = pmd5("meta:", r.content)
      val isImg = r.media_type == "image"
      val isAud = r.media_type == "audio"
      DecodedMeta(
        r.media_id, r.media_type, r.format,
        width = if (isAud) 0 else (64 + h % 1024).toInt,
        height = if (isAud) 0 else (64 + (h / 1024) % 1024).toInt,
        channels = if (isAud) 1 else 3,
        sample_rate = if (isAud) 16000 else 0,
        duration_ms =
          if (isImg) 0L else 1000L + (h / 1048576L) % 60000L,
        n_frames =
          if (r.media_type == "video") (24 + (h / 1073741824L) % 240).toInt
          else if (isImg) 1 else 0,
        valid = r.content.nonEmpty)
    }

    /** Feature i = ((pmd5("feat<i>:", payload) % 2001) − 1000): an
      * integer in [−1000, 1000], exactly representable in Float — the
      * downstream double-precision cosine is then exact integer
      * arithmetic up to the final divide/sqrt, replayable bit-equal by
      * the oracle (the s1 idiom). */
    def features(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures] =
      batch.map { r =>
        val f = Array.tabulate(dim) { i =>
          ((pmd5(s"feat$i:", r.content) % 2001L) - 1000L).toFloat
        }
        MediaFeatures(r.media_id, r.media_type, f)
      }

    def phash(batch: Seq[MediaRow]): Seq[(Long, Long)] = batch.map { r =>
      // stub aHash: PhashBits "cells" derived from the bytes, bit =
      // cell above the cell mean — the same thresholding a real aHash
      // does over decoded 8×8 luma
      val cells = Array.tabulate(PhashBits)(i =>
        (pmd5(s"cell$i:", r.content) % 256L).toInt)
      val mean = cells.sum / PhashBits
      val bits = cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
        if (c > mean) acc | (1L << i) else acc
      }
      (r.media_id, bits)
    }

    def sampleFrames(row: MediaRow, n: Int): Seq[Array[Byte]] = {
      val meta = decode(Seq(row)).head
      val frames = math.min(n, math.max(meta.n_frames, 0))
      (0 until frames).map { i =>
        // a real codec returns decoded frame payloads; the stub slices
        // the source deterministically
        val start = if (row.content.isEmpty) 0
          else (i * row.content.length / math.max(frames, 1))
        row.content.slice(start, math.min(start + 16, row.content.length))
      }
    }
  }

  /** Batched partition-level decode: the Spark plumbing under test. */
  def decode(
      media: Dataset[MediaRow], codec: Codec = DeterministicStubCodec,
      batchSize: Int = 64): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(
      _.grouped(batchSize).flatMap(b => codec.decode(b.toSeq)))
  }

  /** Batched feature extraction → embedding column compatible with
    * graft.ext.Similarity (cosine top-k / ANN over the result). */
  def extractFeatures(
      media: Dataset[MediaRow], dim: Int = 16,
      codec: Codec = DeterministicStubCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(
      _.grouped(batchSize).flatMap(b => codec.features(b.toSeq, dim)))
  }

  /** Resize: image/video rows re-encoded at target dimensions through
    * the codec seam — [[ImageIoCodec]] performs an actual box-filter
    * rescale + PNG re-encode, the stub truncates deterministically
    * (same schema and batch shape either way). */
  def resize(
      media: Dataset[MediaRow], width: Int, height: Int,
      codec: Codec = DeterministicStubCodec,
      batchSize: Int = 64): Dataset[(MediaRow, Int, Int)] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(
      _.map(r => (codec.resize(r, width, height), width, height))))
  }

  /** Frame sampling: video row → up to n (media_id, frame_index,
    * frame_bytes) rows. */
  def sampleFrames(
      media: Dataset[MediaRow], n: Int,
      codec: Codec = DeterministicStubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.media_type == "video")
      .flatMap { r =>
        codec.sampleFrames(r, n).zipWithIndex.map { case (f, i) =>
          (r.media_id, i, f)
        }
      }
      .toDF("media_id", "frame_index", "frame_bytes")
  }

  /** Batched perceptual hashing through the codec seam →
    * (media_id, phash) — the input to [[phashNearDupPairs]]. */
  def perceptualHashes(
      media: Dataset[MediaRow], codec: Codec = DeterministicStubCodec,
      batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(
      _.grouped(batchSize).flatMap(b => codec.phash(b.toSeq)))
      .toDF("media_id", "phash")
  }

  /** Near-duplicate media pairs by pHash Hamming distance ≤
    * `maxHamming`, via the Manku-style chunk blocking the SimHash text
    * path uses (Dedup.simhash): split the `hashBits`-bit hash into 4
    * equal bands — by pigeonhole any pair within Hamming 3 collides
    * exactly on ≥1 band — candidate within a (band, value) bucket,
    * then verify the EXACT distance with one codegen'd
    * `bit_count(a^b)`. `hashBits` = 64 for a real aHash codec, 60 for
    * [[DeterministicStubCodec]] (the pmd5 width).
    * 100 TB shape: the only shuffle is the skinny (band, value) key;
    * `maxBucket` caps degenerate buckets (black frames, test cards —
    * the d6 lesson: every banding generator needs a skew guard) with
    * capped buckets counted in the `dropped_buckets` log line rather
    * than silently scanned. Requires `maxHamming` < 4 for losslessness;
    * raise bands for a looser radius. Output: (id_a, id_b, hamming). */
  def phashNearDupPairs(
      hashes: DataFrame, idCol: String = "media_id",
      hashCol: String = "phash", maxHamming: Int = 3,
      maxBucket: Int = 1000, hashBits: Int = 64): DataFrame = {
    require(maxHamming < 4, "4-band blocking is lossless only to Hamming 3")
    require(hashBits % 4 == 0, "hashBits must split into 4 equal bands")
    val bw = hashBits / 4
    val bands = explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), b * bw)
          .bitwiseAND(lit((1L << bw) - 1)).as("bv"))): _*))
    val keyed = hashes
      .select(col(idCol).as("_id"), col(hashCol).as("_h"), bands.as("_b"))
      .select(col("_id"), col("_h"),
        col("_b.band").as("_band"), col("_b.bv").as("_bv"))
    val capped = keyed
      .withColumn("_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_band"), col("_bv"))))
      .where(col("_n") <= maxBucket)
      .drop("_n")
    val a = capped.select(col("_band"), col("_bv"),
      col("_id").as("id_a"), col("_h").as("_ha"))
    val b = capped.select(col("_band"), col("_bv"),
      col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_band", "_bv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).cast("long").as("hamming"))
  }

  /** Deterministic fake media corpus derived from the documents table
    * (text bytes as payloads) — the fixture path for specs/queries. */
  def corpusFromDocuments(
      spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val fmt = kind match {
          case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"), fmt)
    }
  }
}
