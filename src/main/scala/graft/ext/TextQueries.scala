package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.query.{Q, Tables}

/** Query-pack surface for TextAnalysis over the `documents` table. */
object TextQueries {
  import TextAnalysis._

  val all: Seq[Q] = Seq(
    // token counting — whitespace tokens; oracle via DuckDB list ops.
    Q(
      "t1_token_stats",
      """SELECT lang,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS total_tokens,
        |  CAST(max(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS max_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
          max(tokenCount(col("text")).cast("long")).as("max_tokens"),
          sum(col("n_chars")).as("total_chars"))
    },

    // stopword ratio buckets (quality pre-filter shape); integer
    // arithmetic only → exact oracle parity.
    Q(
      "t2_stopword_hits",
      """SELECT lang,
        |  CAST(sum(len(list_filter(string_split_regex(trim(text), ' +'),
        |      t -> t IN ('the','a','of','and','to','in','is','it')))) AS BIGINT) AS en_hits,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(stopwordHits(col("text"), stopwords("en")).cast("long"))
            .as("en_hits"),
          count(lit(1)).as("n_docs"))
    },

    // language-ID heuristic vs the labelled lang column (accuracy-style
    // confusion counts). Heuristic itself is engine-specific → rows-only.
    Q.noOracle("t3_langid_confusion") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("lang"), tokens(col("text")).as("toks")) // split once
        .select(col("lang"), langIdFromTokens(col("toks")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
    },

    // quality score distribution — engine-specific blend → rows-only.
    Q.noOracle("t4_quality_scores") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          round(qualityScore(col("text")), 4).as("quality"))
    },

    // order-sensitive rolling-hash fingerprint → rows-only (xxhash64 is
    // Spark-specific); exact-dup detection via fingerprint collision.
    Q.noOracle("t5_fingerprints") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
    },

    // BPE-ish regex tokenization (letter runs / non-letter runs) vs
    // whitespace tokens — engine-specific regex split → rows-only.
    Q.noOracle("t7_regex_tokens") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(size(tokensRegex(col("text"))).cast("long")).as("regex_tokens"),
          sum(tokenCount(col("text")).cast("long")).as("ws_tokens"))
    },

    // punctuation/char-class profile — SQL-expressible, exact ints.
    Q(
      "t6_punct_profile",
      """SELECT source,
        |  CAST(sum(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))) AS BIGINT) AS punct_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars2,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum((length(col("text")) -
            length(regexp_replace(col("text"), "[!-/:-@\\[-`{-~]", "")))
            .cast("long")).as("punct_chars"),
          sum(length(col("text")).cast("long")).as("total_chars2"),
          count(lit(1)).as("n_docs"))
    }
  )
}
