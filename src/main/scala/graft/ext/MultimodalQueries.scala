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
    }
  )
}
