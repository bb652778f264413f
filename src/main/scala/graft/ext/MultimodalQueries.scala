package graft.ext

import org.apache.spark.sql.functions._
import graft.query.{Q, Tables}

/** Query-pack surface for Multimodal (stub codec — see Multimodal
  * scaladoc; the Spark plumbing is the deliverable, all rows-only). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // decode: binary + typed metadata profile per media type.
    Q.noOracle("m1_media_decode_profile") { (s, dir) =>
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      Multimodal.decode(corpus).toDF()
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
          max(col("width")).as("max_width"),
          max(col("n_frames")).as("max_frames"))
    },

    // feature extraction → ANN over the derived embedding column
    // (plumbing composes with Similarity).
    Q.noOracle("m2_media_feature_topk") { (s, dir) =>
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(corpus, dim = 16).toDF()
      val q = feats.where(col("media_id") === 0)
        .select(col("feature")).head().getSeq[Float](0)
      Similarity.cosineTopK(feats, "media_id", "feature", q, k = 5)
    },

    // video frame sampling fan-out.
    Q.noOracle("m3_frame_sample") { (s, dir) =>
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
    Q.noOracle("m4_phash_neardup") { (s, dir) =>
      import s.implicits._
      val corpus = Multimodal.corpusFromDocuments(
        s, Tables.load(s, dir, "documents"))
      val frames = Multimodal.sampleFrames(corpus, n = 4)
        .select((col("media_id") * 10 + col("frame_index")).as("fid"),
          col("frame_bytes"))
        .as[(Long, Array[Byte])]
        .map { case (id, b) => Multimodal.MediaRow(id, "image", b, "raw") }
      Multimodal
        .phashNearDupPairs(Multimodal.perceptualHashes(frames))
        .select(expr("id_a div 10").as("video_a"),
          expr("id_b div 10").as("video_b"), col("hamming"))
        .where(col("video_a") =!= col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(count(lit(1)).as("n_frame_matches"),
          min(col("hamming")).as("min_hamming"))
    }
  )
}
