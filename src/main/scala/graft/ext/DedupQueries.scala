package graft.ext

import org.apache.spark.sql.functions._
import graft.query.{Q, Tables}

/** Query-pack surface for Dedup over the `documents` table. */
object DedupQueries {

  val all: Seq[Q] = Seq(
    // exact dedup: content-digest groupBy; keep lowest doc_id per digest.
    Q(
      "d1_exact_dedup",
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
    },

    // dedup summary: corpus-level duplicate stats (SQL-expressible).
    Q(
      "d2_dedup_summary",
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dups
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
    },

    // MinHash+LSH near-dup pairs — sketch-based, Spark-specific hashes →
    // rows-only check; exactness covered by DedupSpec (planted dups).
    Q.noOracle("d3_minhash_neardup") { (s, dir) =>
      Dedup.minhashPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
    },

    // SimHash signatures + near-dup pairs within Hamming distance 3.
    Q.noOracle("d4_simhash_neardup") { (s, dir) =>
      Dedup.simhashPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", maxDist = 3)
    },

    // exact n-gram Jaccard pairs via inverted-index join (J >= 0.8).
    Q.noOracle("d5_ngram_jaccard_pairs") { (s, dir) =>
      Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", threshold = 0.8)
    },

    // embedding-cosine near-dup pairs, banded-LSH-bucketed. Threshold
    // 0.4 because the synthetic corpus's most-similar pair is ~0.51 —
    // the operator's contract (pairs ≥ t found via bucket collision) is
    // the same at any t.
    Q.noOracle("d6_embedding_neardup") { (s, dir) =>
      Similarity.cosineNearDupPairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4)
    }
  )
}
