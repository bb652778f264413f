package graft.ext

import org.apache.spark.sql.functions._
import graft.query.{Q, Tables}

/** Query-pack surface for Similarity over the `embeddings` table. The
  * query vector is the corpus vector with vec_id = 0 (deterministic),
  * fetched driver-side like any query parameter would be.
  */
object SimilarityQueries {

  private def queryVec(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    Tables.load(s, dir, "embeddings")
      .where(col("vec_id") === 0)
      .select(col("embedding"))
      .head()
      .getSeq[Float](0)

  val all: Seq[Q] = Seq(
    // brute-force exact cosine top-k (the baseline ANN must match).
    Q.noOracle("s1_cosine_topk") { (s, dir) =>
      Similarity.cosineTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10)
    },

    // LSH-bucketed ANN top-k (scale path; recall vs s1 tested in spec).
    Q.noOracle("s2_ann_topk") { (s, dir) =>
      Similarity.annTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryVec(s, dir), k = 10)
    },

    // IVF ANN: k-means inverted lists, probe nearest 4 of 16 cells.
    Q.noOracle("s4_ivf_topk") { (s, dir) =>
      val idx = Similarity.ivfBuild(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
      Similarity.ivfTopK(idx, queryVec(s, dir), k = 10)
    },

    // vector norms / label centroid stats — aggregation over arrays.
    Q.noOracle("s3_label_centroid_norms") { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      e.select(
        col("label"),
        Similarity.norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("nrm")), 6).as("avg_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm"))
    }
  )
}
