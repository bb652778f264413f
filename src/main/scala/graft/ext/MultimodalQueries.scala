package graft.ext

import org.apache.spark.sql.functions._
import graft.query.{Q, Tables}

/** Query-pack surface for Multimodal. The codec is the deterministic
  * stub (see Multimodal scaladoc) whose every output derives from the
  * portable 60-bit md5 hash — so each query carries a FULL DuckDB
  * replay oracle: the oracle re-derives metadata / features / frame
  * slices / pHash cells from the same `md5(label || payload)` idiom
  * (`('0x'||substr(md5(x),1,15))::BIGINT` ≡ Spark
  * `conv(substr(md5(x),1,15),16,10)`) and replays the pipeline end to
  * end. The media payload is the UTF-8 bytes of `documents.text`
  * (ASCII in the fixture), so byte slices replay as `substr` and
  * byte length as `octet_length`.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // decode: binary + typed metadata profile per media type. Oracle
    // re-derives width/frames from h = pmd5('meta:' || payload).
    Q(
      "m1_media_decode_profile",
      """WITH m AS (
        |  SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        |    doc_id % 3 AS k,
        |    ('0x'||substr(md5('meta:'||text),1,15))::BIGINT AS h,
        |    strlen(text) AS len
        |  FROM documents)
        |SELECT media_type,
        |  count(*)::BIGINT AS n,
        |  sum(CASE WHEN len > 0 THEN 1 ELSE 0 END)::BIGINT AS n_valid,
        |  max(CASE WHEN k = 1 THEN 0 ELSE 64 + h % 1024 END)::BIGINT
        |    AS max_width,
        |  max(CASE k WHEN 2 THEN 24 + (h // 1073741824) % 240
        |    WHEN 0 THEN 1 ELSE 0 END)::BIGINT AS max_frames
        |FROM m GROUP BY media_type""".stripMargin) { (s, dir) =>
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      Multimodal.decode(corpus).toDF()
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
          max(col("width")).cast("long").as("max_width"),
          max(col("n_frames")).cast("long").as("max_frames"))
    },

    // feature extraction → exact cosine top-k over the derived
    // embedding column (plumbing composes with Similarity). Features
    // are exact small integers in Float, so the double cosine is
    // integer arithmetic up to the final divide/sqrt — the oracle
    // regenerates them and replays the s1 cosine idiom.
    Q(
      "m2_media_feature_topk",
      """WITH f AS (
        |  SELECT doc_id AS id,
        |    list_transform(range(0, 16), i ->
        |      CAST((('0x'||substr(md5('feat'||i||':'||text),1,15))::BIGINT
        |            % 2001) - 1000 AS DOUBLE)) AS v
        |  FROM documents),
        |qv AS (SELECT v AS q FROM f WHERE id = 0),
        |c AS (
        |  SELECT f.id,
        |    round(
        |      list_sum(list_transform(range(1, 17), i -> v[i] * q[i]))
        |      / (sqrt(list_sum(list_transform(v, x -> x * x)))
        |         * sqrt(list_sum(list_transform(q, x -> x * x)))),
        |      6) AS cos6
        |  FROM f, qv)
        |SELECT id, CAST(round(cos6 * 1000000) AS BIGINT) AS cos_e6
        |FROM c ORDER BY cos6 DESC, id ASC LIMIT 5""".stripMargin) { (s, dir) =>
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(corpus, dim = 16).toDF()
      val q = feats.where(col("media_id") === 0)
        .select(col("feature")).head().getSeq[Float](0)
      Similarity.cosineTopK(feats, "media_id", "feature", q, k = 5)
        .select(
          col("id"),
          round(col("cos_sim") * 1e6).cast("long").as("cos_e6"))
    },

    // video frame sampling fan-out: videos have n_frames ≥ 24, so all
    // n = 4 requested frames are emitted; frame i is the 16-byte slice
    // at offset i·len/4 — the oracle recomputes the slice lengths.
    Q(
      "m3_frame_sample",
      """WITH v AS (
        |  SELECT doc_id AS media_id, strlen(text) AS len
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id, least(16, len - (i * len) // 4) AS fb
        |  FROM v, range(4) t(i))
        |SELECT media_id,
        |  count(*)::BIGINT AS n_frames_sampled,
        |  sum(fb)::BIGINT AS bytes_sampled
        |FROM f GROUP BY media_id""".stripMargin) { (s, dir) =>
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      Multimodal.sampleFrames(corpus, n = 4)
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_frames_sampled"),
          sum(length(col("frame_bytes"))).as("bytes_sampled"))
    },

    // frame-level video near-dup: pHash every sampled frame, find
    // frame pairs within Hamming 3 (banded + bucket-capped, never
    // all-pairs), aggregate to video pairs — the classic shared-frame
    // video-dedup pipeline. Near-dup source documents share byte
    // regions, so their sampled frame payloads collide at Hamming 0.
    // The oracle replays the whole pipeline: frame slicing, 60 pmd5
    // cells → mean threshold → 60-bit pHash, 4×15-bit band blocking
    // with the bucket cap, exact bit_count(xor) verify, video rollup.
    Q(
      "m4_phash_neardup",
      """WITH v AS (
        |  SELECT doc_id AS media_id, text, strlen(text) AS len
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id * 10 + i AS fid,
        |    substr(text, ((i * len) // 4) + 1, 16) AS ft
        |  FROM v, range(4) t(i)),
        |cells AS (
        |  SELECT fid, j,
        |    ('0x'||substr(md5('cell'||j||':'||ft),1,15))::BIGINT % 256 AS c
        |  FROM fr, range(60) u(j)),
        |mn AS (SELECT fid, sum(c) // 60 AS mean FROM cells GROUP BY fid),
        |ph AS (
        |  SELECT cells.fid,
        |    sum(CASE WHEN c > mean THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |      AS phash
        |  FROM cells JOIN mn USING (fid) GROUP BY cells.fid),
        |keyed AS (
        |  SELECT fid, phash, b, (phash >> (b * 15)) & 32767 AS bv
        |  FROM ph, range(4) w(b)),
        |capped AS (
        |  SELECT fid, phash, b, bv FROM (
        |    SELECT fid, phash, b, bv,
        |      count(*) OVER (PARTITION BY b, bv) AS nb
        |    FROM keyed)
        |  WHERE nb <= 1000),
        |cand AS (
        |  SELECT DISTINCT a.fid AS id_a, b2.fid AS id_b,
        |    a.phash AS ha, b2.phash AS hb
        |  FROM capped a JOIN capped b2
        |    ON a.b = b2.b AND a.bv = b2.bv AND a.fid < b2.fid),
        |pairs AS (
        |  SELECT id_a, id_b, bit_count(xor(ha, hb))::BIGINT AS hamming
        |  FROM cand WHERE bit_count(xor(ha, hb)) <= 3)
        |SELECT id_a // 10 AS video_a, id_b // 10 AS video_b,
        |  count(*)::BIGINT AS n_frame_matches,
        |  min(hamming)::BIGINT AS min_hamming
        |FROM pairs WHERE id_a // 10 <> id_b // 10
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      val frames = Multimodal.sampleFrames(corpus, n = 4)
        .select((col("media_id") * 10 + col("frame_index")).as("fid"),
          col("frame_bytes"))
        .as[(Long, Array[Byte])]
        .map { case (id, b) => Multimodal.MediaRow(id, "image", b, "raw") }
      Multimodal
        .phashNearDupPairs(
          Multimodal.perceptualHashes(frames),
          hashBits = Multimodal.PhashBits)
        .select(expr("id_a div 10").as("video_a"),
          expr("id_b div 10").as("video_b"), col("hamming"))
        .where(col("video_a") =!= col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(count(lit(1)).as("n_frame_matches"),
          min(col("hamming")).as("min_hamming"))
    },

    // REAL-decoder round trips (round 8). The stub is replayable
    // because its outputs are md5 arithmetic; a real codec's pixel/
    // sample path is not — but its DECODED METADATA is, when the media
    // is GENERATED with dimensions derived from the row id: the oracle
    // replays the generator formula, and agreement proves the actual
    // javax.imageio / javax.sound decoder recovered the true shape
    // end to end through the batched seam (encode → bytes → decode).
    Q(
      "m5_imageio_roundtrip",
      """SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 48 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 48) % 32 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents").select(col("doc_id"))
        .as[Long].map { id =>
          val w = 16 + (id % 48).toInt
          val h = 16 + ((id / 48) % 32).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((x * 7 + y * 13 + id) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Multimodal.MediaRow(id, "image", bos.toByteArray, "png")
        }
      Multimodal.decode(media, ImageIoCodec).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"))
    },

    Q(
      "m6_wav_roundtrip",
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS BIGINT)
        |    AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(((1000 + doc_id % 3000) * 1000)
        |    // (CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END)
        |    AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.decode(wavMedia(s, dir), WavCodec).toDF()
        .select(col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("duration_ms").as("duration_ms"))
    },

    // frame-level audio features through the REAL WAV decoder:
    // 256-sample frames, zero-crossing count + exact integer energy.
    // Same analytic-payload discipline as m6 — the PCM is a formula of
    // doc_id, so the oracle regenerates every sample with range() and
    // replays the frame aggregation without parsing a byte.
    Q(
      "m8_wav_frame_features",
      """WITH d AS (
        |  SELECT doc_id AS id, 1000 + doc_id % 3000 AS n FROM documents
        |), s AS (
        |  SELECT id, unnest(range(0, n)) AS i FROM d
        |), v AS (
        |  SELECT id, i, ((i * 31 + id) % 2048) - 1024 AS v FROM s
        |), g AS (
        |  SELECT id, i, i // 256 AS f, v,
        |    CASE WHEN v < 0 THEN 1 ELSE 0 END AS neg
        |  FROM v
        |), w AS (
        |  SELECT id, f, i, v, neg,
        |    lag(neg) OVER (PARTITION BY id, f ORDER BY i) AS pneg
        |  FROM g
        |)
        |SELECT id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN pneg IS NOT NULL AND neg <> pneg
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      WavCodec.frameFeatures(wavMedia(s, dir))
    },

    Q(
      "m7_video_roundtrip",
      """SELECT doc_id AS media_id,
        |  CAST(2 + doc_id % 6 AS BIGINT) AS n_frames,
        |  CAST(16 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 16) % 16 AS BIGINT) AS height,
        |  CAST((2 + doc_id % 6) * 40 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents").select(col("doc_id"))
        .as[Long].map { id =>
          val k = 2 + (id % 6).toInt
          val w = 16 + (id % 16).toInt
          val h = 16 + ((id / 16) % 16).toInt
          val frames = (0 until k).map { t =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = ((x * 5 + y * 11 + t * 17 + id) % 256).toInt
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          Multimodal.MediaRow(id, "video", VideoCodec.encode(frames), "gvid")
        }
      Multimodal.decode(media, VideoCodec).toDF()
        .select(col("media_id"),
          col("n_frames").cast("long").as("n_frames"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("duration_ms").as("duration_ms"))
    }
  )

  /** Shared m6/m8 payload generator: a REAL RIFF/WAVE file per doc,
    * PCM entirely a formula of doc_id — sample_i = ((i·31 + id) mod
    * 2048) − 1024 over n = 1000 + id mod 3000 samples at 8/16 kHz —
    * so the oracles regenerate the payload analytically instead of
    * parsing bytes. */
  private def wavMedia(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id"))
      .as[Long].map { id =>
        val rate = if (id % 2 == 0) 8000f else 16000f
        val n = 1000 + (id % 3000).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (((i * 31 + id) % 2048) - 1024).toShort
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Multimodal.MediaRow(id, "audio", bos.toByteArray, "wav")
      }
  }
}
