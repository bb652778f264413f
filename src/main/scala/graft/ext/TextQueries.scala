package graft.ext

import org.apache.spark.sql.functions._
import graft.ext.Caches.Registered
import org.apache.spark.sql.types.DecimalType
import graft.query.{Q, Tables}

/** Query-pack surface for TextAnalysis over the `documents` table. */
object TextQueries {
  import TextAnalysis._

  val all: Seq[Q] = Seq(
    // Okapi BM25 retrieval: rank the corpus against the 5 rarest terms
    // of doc 0 (a deterministic query both engines derive identically:
    // distinct doc-0 terms ordered by corpus df, then term). Per-term
    // contributions floor to e6 ints before the per-doc sum (the
    // t14/t18 discipline), so the oracle replays the identical double
    // tree and the integer top-20 is exact.
    Q(
      "t21_bm25_search",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
        |), st AS (
        |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
        |), dfa AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), qt AS (
        |  SELECT t.term, df FROM (SELECT DISTINCT term FROM tok WHERE doc_id = 0) t
        |  JOIN dfa USING (term) ORDER BY df ASC, term ASC LIMIT 5
        |), sc AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(
        |      ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(qt.df AS DOUBLE) + 0.5)
        |        / (CAST(qt.df AS DOUBLE) + 0.5)) *
        |      (CAST(tf AS DOUBLE) * 2.2 /
        |        (CAST(tf AS DOUBLE) + 1.2 * (0.25 +
        |          0.75 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
        |            / CAST(sum_dl AS DOUBLE))))
        |      * 1e6) AS BIGINT) AS t_e6
        |  FROM tf JOIN qt USING (term) JOIN dl USING (doc_id), st
        |)
        |SELECT doc_id, CAST(sum(t_e6) AS BIGINT) AS score_e6
        |FROM sc GROUP BY doc_id
        |ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      val dfa = tok.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val qTerms = tok.where(col("doc_id") === 0).select("term").distinct()
        .join(dfa, "term")
        .orderBy(col("df").asc, col("term").asc).limit(5)
        .collect().map(_.getString(0)).toSeq
      bm25(docs, "doc_id", "text", qTerms)
        .orderBy(col("score_e6").desc, col("doc_id").asc).limit(20)
    },

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
    // confusion counts). Pure integer stopword-hit argmax with a
    // lexicographic (hits, lang) tie-break — the oracle replays it with
    // list_filter counts + greatest over structs.
    Q(
      "t3_langid_confusion",
      """WITH hits AS (
        |  SELECT lang,
        |    len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('der','die','das','und','zu','ist','ein','nicht'))) AS h_de,
        |    len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('the','a','of','and','to','in','is','it'))) AS h_en,
        |    len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('el','la','de','y','que','en','un','es'))) AS h_es,
        |    len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('le','la','de','et','un','est','que','en'))) AS h_fr
        |  FROM documents
        |), best AS (
        |  SELECT lang, greatest(h_de, h_en, h_es, h_fr) AS maxh,
        |    CASE WHEN h_fr >= h_de AND h_fr >= h_en AND h_fr >= h_es THEN 'fr'
        |         WHEN h_es >= h_de AND h_es >= h_en THEN 'es'
        |         WHEN h_en >= h_de THEN 'en'
        |         ELSE 'de' END AS winner
        |  FROM hits
        |)
        |SELECT lang,
        |  CASE WHEN maxh > 0 THEN winner ELSE 'und' END AS pred,
        |  count(*) AS n
        |FROM best GROUP BY lang, pred""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("lang"), tokens(col("text")).as("toks")) // split once
        .select(col("lang"), langIdFromTokens(col("toks")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
    },

    // quality score distribution. The blend is double arithmetic, but the
    // oracle evaluates the IDENTICAL expression tree (same literals, same
    // association) so the doubles are bit-equal; floor(q*1e4) as BIGINT
    // makes the output integer-exact.
    Q(
      "t4_quality_scores",
      s"""WITH f AS (
        |  SELECT doc_id,
        |    $qualityFColsSql
        |  FROM documents
        |)
        |SELECT doc_id,
        |  $qualityBlendE4Sql AS quality_e4
        |FROM f""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          floor(qualityScore(col("text")) * 10000).cast("long").as("quality_e4"))
    },

    // order-sensitive rolling-hash fingerprint; exact-dup detection via
    // fingerprint collision. Oracled: the md5 chain step is portable,
    // so DuckDB replays the identical left fold (seed prepended — its
    // list_reduce has no initial-value form).
    Q(
      "t5_fingerprints",
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(list_reduce(
        |      ['1469598103934665603'] || string_split_regex(trim(text), ' +'),
        |      (acc, t) -> CAST(CAST(('0x'||substr(md5(acc||'|'||t),1,15)) AS BIGINT) AS VARCHAR)
        |    ) AS BIGINT) AS fp
        |  FROM documents
        |)
        |SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM f GROUP BY fp""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
    },

    // BPE-ish regex tokenization (letter runs / non-letter runs) vs
    // whitespace tokens — the extraction pattern is RE2-compatible so the
    // oracle counts matches of the very same regex.
    Q(
      "t7_regex_tokens",
      """SELECT lang,
        |  CAST(sum(len(regexp_extract_all(text, '\p{L}+|[^\p{L} ]+'))) AS BIGINT) AS regex_tokens,
        |  CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS ws_tokens
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(size(tokensRegex(col("text"))).cast("long")).as("regex_tokens"),
          sum(tokenCount(col("text")).cast("long")).as("ws_tokens"))
    },

    // PII scrubbing — the corpus carries no PII, so the query plants a
    // synthetic email + phone per document (identically on both engines)
    // and verifies detection counts and post-scrub lengths exactly.
    Q(
      "t8_pii_scrub",
      s"""WITH d AS (
        |  SELECT doc_id,
        |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or +1 555 01' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
        |  CAST(length(regexp_replace(regexp_replace(t, '${TextAnalysis.EmailPattern}', '[EMAIL]', 'g'),
        |    '${TextAnalysis.PhonePattern}', '[PHONE]', 'g')) AS BIGINT) AS scrubbed_len
        |FROM d""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(
            col("text"), lit(" contact: user"), col("doc_id").cast("string"),
            lit("@example.com or +1 555 01"), col("doc_id").cast("string"))
            .as("t"))
        .select(
          col("doc_id"),
          countEmails(col("t")).cast("long").as("n_emails"),
          length(scrubPii(col("t"))).cast("long").as("scrubbed_len"))
    },

    // repetition profile (Gopher-style): token totals / distinct /
    // max-frequency per document — exact integer oracle.
    Q(
      "t9_repetition_profile",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tk
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tk, count(*) AS n FROM tok GROUP BY doc_id, tk
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS max_tok_freq
        |FROM tf GROUP BY doc_id""".stripMargin) { (s, dir) =>
      repetitionProfile(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // deterministic train/val/test split — content-hash assignment
    // (layout-independent, the q24 sampling idiom); per-language split
    // counts, exact oracle.
    Q(
      "t10_dataset_split",
      """WITH a AS (
        |  SELECT lang, CASE
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents
        |)
        |SELECT lang, split, count(*) AS n FROM a GROUP BY lang, split""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("lang"), Splits.assignSplit(col("doc_id")).as("split"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n"))
    },

    // distributed BPE tokenizer training: word-frequency table + one
    // pair-count aggregation per merge round (only the argmax pair
    // reaches the driver). CONSTRUCTIVE oracle (the q77 unrolled-round
    // idiom): each round replays pair counting, the deterministic
    // argmax (freq desc, pair lexicographic — both engines compare
    // strings as binary UTF-8), and the greedy left-to-right merge
    // fold via gaps-and-islands (runs of consecutive overlapping
    // matches keep even offsets). Early stop (max pair freq < 2)
    // propagates as an empty per-round merge CTE. Equality with a
    // pure reference trainer is additionally pinned by BpeSpec.
    Q("t11_bpe_train", bpeOracleSql(12)) { (s, dir) =>
      val merges = Bpe.train(
        Tables.load(s, dir, "documents"), "text", numMerges = 12)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b, a + b) }
        .toDF("rank", "first", "second", "merged")
    },

    // sequence packing (concat-and-chunk): which fixed-size training
    // chunks each document's tokens land in. The Spark side is the
    // two-phase parallel prefix sum (Packing.packChunks — no global
    // window over the corpus); the oracle replays the logically
    // identical serial cumsum.
    Q(
      "t12_sequence_pack",
      """WITH tok AS (
        |  SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, ntok,
        |    sum(ntok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tok WHERE ntok > 0
        |)
        |SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
        |  CAST((cum - ntok) // 512 AS BIGINT) AS chunk_start,
        |  CAST((cum - 1) // 512 AS BIGINT) AS chunk_end
        |FROM c""".stripMargin) { (s, dir) =>
      Packing.packChunks(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), tokenCount(col("text")).as("ntok")),
        "doc_id", "ntok", chunkSize = 512L, bucketWidth = 64L)
    },

    // Gopher-style quality-rule flags — the cheap pre-filters every web
    // corpus goes through; all integer/identical-double-tree arithmetic
    // → exact oracle. ntok/charsum are materialized once (prior
    // projection) so the token split runs once per document.
    Q(
      "t13_quality_filter",
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ntok,
        |    CAST(length(regexp_replace(trim(text), ' +', '', 'g')) AS BIGINT) AS charsum
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN ntok BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS f_wordcount,
        |  CASE WHEN floor((CAST(charsum AS DOUBLE) * 100.0) / CAST(ntok AS DOUBLE))
        |       BETWEEN 300 AND 1000 THEN 1 ELSE 0 END AS f_wordlen,
        |  CASE WHEN ((length(text) - length(replace(text, '...', ''))) // 3
        |       + length(text) - length(replace(text, '#', ''))) * 10 <= ntok
        |       THEN 1 ELSE 0 END AS f_symbols,
        |  CASE WHEN text LIKE '- %' OR text LIKE '* %' THEN 0 ELSE 1 END AS f_bullet,
        |  CASE WHEN len(list_filter(string_split_regex(trim(text), ' +'),
        |       t -> t IN ('the','a','of','and','to','in','is','it'))) >= 2
        |       THEN 1 ELSE 0 END AS f_stopwords
        |FROM f""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
          charSum(col("text")).cast("long").as("charsum"))
        .select(col("doc_id"),
          gopherFlags(col("text"), col("toks"),
            size(col("toks")).cast("long"), col("charsum")).as("fl"))
        .select(col("doc_id"),
          col("fl.f_wordcount").as("f_wordcount"),
          col("fl.f_wordlen").as("f_wordlen"),
          col("fl.f_symbols").as("f_symbols"),
          col("fl.f_bullet").as("f_bullet"),
          col("fl.f_stopwords").as("f_stopwords"))
    },

    // per-document top-3 TF-IDF terms — the classic keyword/topic
    // profile. Score doubles are identical expression trees on both
    // engines (exact-int operands) so rank and floor(score·1e6) agree
    // bit-for-bit; (score DESC, term ASC) makes ranks unique.
    Q(
      "t14_tfidf_topterms",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY
        |      CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
        |      tf.term ASC) AS rk
        |  FROM tf JOIN df ON tf.term = df.term, n
        |)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
        |  CAST(floor(score * 1000000) AS BIGINT) AS score_e6
        |FROM ranked WHERE rk <= 3""".stripMargin) { (s, dir) =>
      tfidfTopTerms(Tables.load(s, dir, "documents"), "doc_id", "text", k = 3)
    },

    // overlapping sliding-window chunking (RAG/embedding chunker):
    // 64-token windows every 48 tokens, final window clamped; chunk
    // hashes give chunk-level identity. Both engines clamp slices past
    // the array end, so the oracle replays the windows exactly.
    Q(
      "t16_chunk_overlap",
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |  WHERE length(trim(text)) > 0
        |), k AS (
        |  SELECT unnest(generate_series(0,
        |    (SELECT CAST(max((len(t) - 1) // 48) AS INT) FROM tok))) AS k
        |)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
        |  md5(array_to_string(t[k*48+1:k*48+64], ' ')) AS chunk_hash,
        |  CAST(len(t[k*48+1:k*48+64]) AS BIGINT) AS n_tokens
        |FROM tok JOIN k ON k <= (len(t) - 1) // 48""".stripMargin) { (s, dir) =>
      Packing.chunkOverlap(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, stride = 48)
    },

    // temperature-based domain mixing (α=0.5 resampler): the corpus's
    // sources are uniform, so a skewed 60/30/10 domain is derived from
    // doc_id — deterministically, on both engines — and the mixer's
    // √(n_min/n) keep-rates + hash-bucket sample are verified exactly
    // (√ and ÷ are correctly-rounded IEEE → identical on any engine).
    Q(
      "t15_domain_mix",
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'web'
        |         WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS domain
        |  FROM documents
        |), s AS (
        |  SELECT domain, count(*) AS n_docs FROM d GROUP BY domain
        |), m AS (SELECT min(n_docs) AS n_min FROM s),
        |rates AS (
        |  SELECT domain, n_docs,
        |    CAST(floor(256.0 * sqrt(CAST(m.n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)))
        |      AS BIGINT) AS buckets
        |  FROM s, m
        |)
        |SELECT r.domain, r.n_docs, r.buckets,
        |  CAST(sum(CASE WHEN r.buckets >= 256
        |    OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)
        |       < lower(lpad(to_hex(r.buckets), 2, '0'))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM d JOIN rates r ON d.domain = r.domain
        |GROUP BY r.domain, r.n_docs, r.buckets""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 10 < 6, "web")
            .when(col("doc_id") % 10 < 9, "books")
            .otherwise("code").as("domain"))
      val rates = Splits.temperatureRates(d, "domain")
      d.join(broadcast(rates), Seq("domain"))
        .groupBy(col("domain"), col("n_docs"), col("buckets"))
        .agg(sum(
          when(Splits.temperatureKeep(col("doc_id"), col("buckets")), 1L)
            .otherwise(0L)).as("n_kept"))
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
    },

    // deterministic global shuffle + shard assignment (the training-set
    // writer's layout): content-hash shard, in-shard position — stable
    // across clusters/layouts/reruns, no RNG. Hex-int arithmetic is
    // engine-portable (Spark conv(x,16,10) ≡ DuckDB '0x...'::BIGINT).
    // corpus-trained bigram LM quality score (CCNet-style perplexity
    // filter). Per-bigram log-probs floor to e6 ints BEFORE the per-doc
    // sum — integer addition is exact under any partial-agg order, and
    // ln over bit-identical double arguments is bit-equal across
    // engines (t14 precedent) -> full hash oracle.
    Q(
      "t18_lm_score",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM toks))) AS i
        |), grams AS (
        |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
        |  FROM toks JOIN pos ON i <= len(t) - 1
        |  WHERE len(t) >= 2
        |), c2 AS (
        |  SELECT prev, cur, count(*) AS n2 FROM grams GROUP BY prev, cur
        |), c1 AS (
        |  SELECT prev, count(*) AS n1 FROM grams GROUP BY prev
        |), v AS (
        |  SELECT count(DISTINCT t[i]) AS v
        |  FROM toks JOIN pos ON i <= len(t)
        |), sc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    sum(CAST(floor(1e6 * ln(
        |      CAST(n2 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))) AS BIGINT))
        |      AS logprob_e6_sum
        |  FROM grams JOIN c2 USING (prev, cur) JOIN c1 USING (prev), v
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  CAST(coalesce(sc.logprob_e6_sum, 0) AS BIGINT) AS logprob_e6_sum
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.lmScore(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // winnowing fingerprints (MOSS scheme): every shared w+k-1-token run
    // between two documents is guaranteed to share a fingerprint, at
    // ~2/(w+1) storage density. Fully oracled — the 60-bit hash is the
    // t17 hex-int idiom and the window min a plain ROWS frame, so both
    // engines derive the identical fingerprint set (XOR-digested to one
    // driver-safe int64 per doc).
    Q(
      "t19_winnow_fingerprints",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM toks))) AS i
        |), grams AS (
        |  SELECT doc_id, i,
        |    ('0x'||substr(md5(t[i]||' '||t[i+1]||' '||t[i+2]),1,15))::BIGINT AS h
        |  FROM toks JOIN pos ON i <= len(t) - 2
        |  WHERE len(t) >= 3
        |), wins AS (
        |  SELECT doc_id, i,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM grams
        |), fps AS (
        |  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= greatest(1, ng - 3)
        |)
        |SELECT d.doc_id, coalesce(f.n_fp, 0) AS n_fp,
        |  CAST(coalesce(f.fp_xor, 0) AS BIGINT) AS fp_xor
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, count(*) AS n_fp, bit_xor(fp) AS fp_xor
        |  FROM fps GROUP BY doc_id
        |) f ON f.doc_id = d.doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.winnow(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 3, w = 4)
    },

    // normalization-for-dedup digest (CCNet normalize-before-hash):
    // NFC + lowercase + space-collapse + trim, then md5 — the key every
    // exact-dedup pass should group on instead of raw text. NFC is the
    // custom codegen'd NfcNormalize expression; DuckDB's nfc_normalize
    // oracles it (the sf corpus is ASCII so NFC is an identity here —
    // the unicode behavior itself is pinned by GraftExtensionsSpec on
    // composed/decomposed fixtures).
    Q(
      "t20_normalized_digest",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)), ' +', ' ', 'g')))
        |    AS norm_digest,
        |  CAST(length(trim(regexp_replace(lower(nfc_normalize(text)), ' +', ' ', 'g')))
        |    AS BIGINT) AS norm_len
        |FROM documents""".stripMargin) { (s, dir) =>
      val norm = TextAnalysis.normalizeText(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), md5(norm).as("norm_digest"),
          length(norm).cast("long").as("norm_len"))
    },

    // data selection under a global token budget: keep the
    // highest-quality documents whose cumulative token count fits
    // 10k tokens. The oracle is the serial single-window prefix sum;
    // the operator's score-band two-phase decomposition must reproduce
    // it exactly (hash equality is the stitching proof, like q59).
    Q(
      "t22_budget_prune",
      s"""WITH f AS (
        |  SELECT doc_id,
        |    $qualityFColsSql
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    $qualityBlendE4Sql AS score,
        |    CAST(ntok AS BIGINT) AS n_tokens
        |  FROM f
        |), r AS (
        |  SELECT doc_id, score, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM q WHERE n_tokens > 0
        |)
        |SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM r WHERE cum_tokens <= 10000""".stripMargin) { (s, dir) =>
      Packing.budgetPrune(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            floor(TextAnalysis.qualityScore(col("text")) * 10000)
              .cast("long").as("score"),
            size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
        "doc_id", "score", "n_tokens", budget = 10000L)
    },

    // ngramDistance(text, needle) — 4-gram set symmetric difference
    // over total size, e6 units; the needle passes through the same
    // normalize+gram pipeline on both engines.
    Q(
      "t23_ngram_distance",
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(nfc_normalize(text)), ' +', ' ', 'g')) AS h
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(length(h) - 3, 1) + 1),
        |    i -> substr(h, i, 4))) AS ga
        |  FROM n
        |), nq AS (
        |  SELECT trim(regexp_replace(lower(nfc_normalize(
        |    'key agg row scan slow fast table value part hash')),
        |    ' +', ' ', 'g')) AS h
        |), q AS (
        |  SELECT list_distinct(list_transform(
        |    range(1, greatest(length(h) - 3, 1) + 1),
        |    i -> substr(h, i, 4))) AS gb
        |  FROM nq
        |)
        |SELECT doc_id,
        |  CAST(floor(CAST(len(ga) + len(gb) - 2*len(list_intersect(ga, gb))
        |    AS DOUBLE) / (len(ga) + len(gb)) * 1e6) AS BIGINT)
        |    AS ngram_dist_e6
        |FROM g, q""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.ngramDistanceE6(col("text"),
            "key agg row scan slow fast table value part hash")
            .as("ngram_dist_e6"))
    },

    Q(
      "t17_shard_assign",
      """WITH k AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents
        |)
        |SELECT doc_id,
        |  ('0x'||substr(shuffle_key,1,4))::BIGINT % 8 AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY ('0x'||substr(shuffle_key,1,4))::BIGINT % 8
        |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
        |FROM k""".stripMargin) { (s, dir) =>
      Splits.shardByHash(
        Tables.load(s, dir, "documents").select("doc_id"), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos").cast("long").as("pos"))
    },

    // split-leakage audit: near-dup pairs (the d5 exact shingle
    // Jaccard) CROSSING the t10 train/val/test boundary — the internal
    // decontamination check every split pipeline needs (d10 checks
    // against an EXTERNAL benchmark; this catches train↔test leakage
    // within the corpus). Output: one row per unordered split pair
    // with the leak count and worst similarity.
    Q(
      "t25_split_leakage",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.sh, b.sh)) AS shared,
        |    len(a.sh) AS na, len(b.sh) AS nb
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b,
        |    CAST(round(round(CAST(shared AS DOUBLE)
        |      /CAST(na + nb - shared AS DOUBLE), 4)*10000) AS BIGINT)
        |      AS jaccard_e4
        |  FROM p
        |  WHERE shared > 0
        |    AND CAST(shared AS DOUBLE)/CAST(na + nb - shared AS DOUBLE) >= 0.8
        |), sp AS (
        |  SELECT doc_id, CASE
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents
        |), x AS (
        |  SELECT least(sa.split, sb.split) AS split_lo,
        |    greatest(sa.split, sb.split) AS split_hi, jaccard_e4
        |  FROM pairs
        |  JOIN sp sa ON pairs.id_a = sa.doc_id
        |  JOIN sp sb ON pairs.id_b = sb.doc_id
        |  WHERE sa.split <> sb.split
        |)
        |SELECT split_lo, split_hi, count(*) AS n_leaks,
        |  max(jaccard_e4) AS worst_jaccard_e4
        |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(
        docs, "doc_id", "text",
        threshold = 0.8, maxPostings = Int.MaxValue)
      val sp = docs.select(col("doc_id"),
        Splits.assignSplit(col("doc_id")).as("split"))
      pairs
        .join(sp.select(col("doc_id").as("id_a"),
          col("split").as("split_a")), "id_a")
        .join(sp.select(col("doc_id").as("id_b"),
          col("split").as("split_b")), "id_b")
        .where(col("split_a") =!= col("split_b"))
        .select(
          least(col("split_a"), col("split_b")).as("split_lo"),
          greatest(col("split_a"), col("split_b")).as("split_hi"),
          round(col("jaccard") * 10000).cast("long").as("jaccard_e4"))
        .groupBy(col("split_lo"), col("split_hi"))
        .agg(count(lit(1)).as("n_leaks"),
          max(col("jaccard_e4")).as("worst_jaccard_e4"))
    },

    // SAMPLED split-leakage audit — t25's check at the audit cost a
    // 100 TB corpus allows ([[Dedup.ngramJaccardPairsSampled]]): exact
    // cross-split near-dup pairs restricted to pairs touching the
    // pmd5-sampled doc subset (mod 4 ⇒ ~1/4 of docs; the one-sided
    // postings join makes ground truth O(sample·corpus) instead of
    // index²). Release monitoring runs THIS form per split refresh;
    // t25's exhaustive form remains the at-sf certification. The pmd5
    // sample replays in SQL, so leak counts stay hash-oracled.
    Q(
      "t46_split_leakage_sampled",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.sh, b.sh)) AS shared,
        |    len(a.sh) AS na, len(b.sh) AS nb
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b,
        |    CAST(round(round(CAST(shared AS DOUBLE)
        |      /CAST(na + nb - shared AS DOUBLE), 4)*10000) AS BIGINT)
        |      AS jaccard_e4
        |  FROM p
        |  WHERE shared > 0
        |    AND CAST(shared AS DOUBLE)/CAST(na + nb - shared AS DOUBLE) >= 0.8
        |    AND (('0x'||substr(md5(CAST(id_a AS VARCHAR)),1,15))::BIGINT % 4 = 0
        |      OR ('0x'||substr(md5(CAST(id_b AS VARCHAR)),1,15))::BIGINT % 4 = 0)
        |), sp AS (
        |  SELECT doc_id, CASE
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents
        |), x AS (
        |  SELECT least(sa.split, sb.split) AS split_lo,
        |    greatest(sa.split, sb.split) AS split_hi, jaccard_e4
        |  FROM pairs
        |  JOIN sp sa ON pairs.id_a = sa.doc_id
        |  JOIN sp sb ON pairs.id_b = sb.doc_id
        |  WHERE sa.split <> sb.split
        |)
        |SELECT split_lo, split_hi, count(*) AS n_leaks,
        |  max(jaccard_e4) AS worst_jaccard_e4
        |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairsSampled(
        docs, "doc_id", "text", threshold = 0.8, sampleMod = 4L)
      val sp = docs.select(col("doc_id"),
        Splits.assignSplit(col("doc_id")).as("split"))
      pairs
        .join(sp.select(col("doc_id").as("id_a"),
          col("split").as("split_a")), "id_a")
        .join(sp.select(col("doc_id").as("id_b"),
          col("split").as("split_b")), "id_b")
        .where(col("split_a") =!= col("split_b"))
        .select(
          least(col("split_a"), col("split_b")).as("split_lo"),
          greatest(col("split_a"), col("split_b")).as("split_hi"),
          round(col("jaccard") * 10000).cast("long").as("jaccard_e4"))
        .groupBy(col("split_lo"), col("split_hi"))
        .agg(count(lit(1)).as("n_leaks"),
          max(col("jaccard_e4")).as("worst_jaccard_e4"))
    },

    // vocabulary statistics + Zipf exponent per source slice: OLS
    // slope of ln(freq) vs ln(rank) over the rank-frequency curve,
    // e6-floored per vocab row before the integer sums (the q51
    // ladder), rank ties broken by token so both engines rank
    // identically.
    Q(
      "t24_zipf_slope",
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(trim(text), ' +')) AS tk
        |  FROM documents
        |), f AS (
        |  SELECT source, tk, count(*) AS c FROM tok GROUP BY 1, 2
        |), r AS (
        |  SELECT source, tk, c,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, tk ASC) AS rk
        |  FROM f
        |), p AS (
        |  SELECT source, c,
        |    CAST(floor(1e6 * ln(rk)) AS BIGINT) AS x,
        |    CAST(floor(1e6 * ln(c)) AS BIGINT) AS y
        |  FROM r
        |), m AS (
        |  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(c) AS tot
        |  FROM p GROUP BY 1
        |)
        |SELECT source, CAST(n AS BIGINT) AS vocab,
        |  CAST(tot AS BIGINT) AS total_tokens,
        |  CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * 1e6)
        |    AS BIGINT) AS zipf_slope_e6
        |FROM m""".stripMargin) { (s, dir) =>
      TextAnalysis.zipfSlope(
        Tables.load(s, dir, "documents"), "source", "text")
        .withColumnRenamed("slice", "source")
    },

    // DSIR hashed importance weights: rank every document by how much
    // more likely its tokens are under a 4096-bucket hashed unigram
    // model of the TARGET slice (lang='en') than under the raw pool's
    // model — the importance-resampling data-selection score. Bucket
    // log-ratios are one IEEE-exact double tree e6-floored per bucket
    // (the t14/t18 log discipline), so per-doc weights are exact
    // integer sums; the oracle replays hashing, smoothing, and the
    // identical division nesting.
    Q(
      "t26_dsir_weights",
      dsirChainSql +
        """
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(p.logweight_e6, 0) AS BIGINT) AS logweight_e6
        |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin) {
      (s, dir) =>
        TextAnalysis.dsirWeights(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en")
    },

    // corpus-scale BPE tokenization: train 12 merges (t11), then apply
    // them round-by-round over the distinct-word vocabulary and count
    // per-document BPE tokens — "tokenize the corpus with the trained
    // tokenizer", the step between tokenizer training and sequence
    // packing (t12). The round-based form is the oracle-replayable
    // declarative twin of the memoized mapPartitions encoder
    // (Bpe.encodeTokens); BpeSpec pins the two equal on this corpus.
    Q("t27_bpe_encode", bpeEncodeOracleSql(12)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val merges = Bpe.train(docs, "text", numMerges = 12)
      Bpe.encodeTokensByRounds(docs, "doc_id", "text", merges)
    },

    // tokenizer fertility audit: per language, BPE tokens per
    // whitespace word (fertility) and chars per BPE token
    // (compression) under the t11/t27-trained merges — the
    // vocabulary-quality metric tokenizer teams track per language
    // before committing a vocab. Integer ratios on corpus-level sums
    // (one div per group, not per doc), full t27 chain replay + a
    // lang rollup in the oracle.
    Q("t31_bpe_fertility", bpeFertilityOracleSql(12)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val merges = Bpe.train(docs, "text", numMerges = 12)
      val enc = Bpe.encodeTokensByRounds(docs, "doc_id", "text", merges)
      // LEFT join + coalesce mirrors the oracle's base CTE exactly: a
      // doc the encoder dropped (null id) still counts toward its
      // language's doc/word/char sums with zero BPE tokens
      docs
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).cast("long").as("ws"), col("n_chars"))
        .join(enc, Seq("doc_id"), "left")
        .withColumn("n_bpe_tokens", coalesce(col("n_bpe_tokens"), lit(0L)))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_bpe_tokens").as("bpe_tokens"),
          sum("ws").as("ws_tokens"),
          sum("n_chars").as("nch"))
        .select(col("lang"), col("n_docs"), col("bpe_tokens"),
          col("ws_tokens"),
          expr("(bpe_tokens * 10000) div ws_tokens").as("fertility_e4"),
          expr("(nch * 10000) div bpe_tokens").as("chars_per_bpe_e4"))
    },

    // in-engine quality-classifier distillation: exact-integer batch-GD
    // linear probability model (the q77 recipe, two features) distills
    // a metadata label (n_chars >= 320 — stand-in for any expensive
    // quality signal) into cheap text-derived features (token count,
    // en-stopword hits), then EVERY document is scored under the
    // trained weights — the classifier-filtering step of a
    // training-data pipeline with a bit-exact unrolled-epoch oracle
    // (weights AND scores replay; StatsSpec pins separation on a
    // crafted corpus).
    Q("t28_quality_classifier", qualityLrOracleSql(8)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.query.Stats.gdLinearModel2Scores(
        docs, col("doc_id"),
        tokenCount(col("text")),
        stopwordHits(col("text"), stopwords("en")),
        when(col("n_chars") >= 320, 1000000L).otherwise(0L))
        .withColumnRenamed("id", "doc_id")
    },

    // END-TO-END curation pipeline: the operators COMPOSE into one
    // declarative DAG — Gopher quality gate (t13 flags, all five) →
    // keep-best exact dedup (d7) → benchmark-decontamination screen
    // (d10 fraction < 20%) → content-hash shard assignment (t17) with
    // per-shard running token budget (t12's prefix-sum shape). One
    // hash oracle certifies the whole chain; every stage stays
    // partition-parallel (the only windows key on content_hash /
    // shard). This is the "switch your pipeline to one engine" query.
    Q("t30_curation_pipeline", t30OracleSql) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val flagged = docs
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
          charSum(col("text")).cast("long").as("charsum"))
        .select(col("doc_id"), col("text"),
          size(col("toks")).cast("long").as("ntok"),
          gopherFlags(col("text"), col("toks"),
            size(col("toks")).cast("long"), col("charsum")).as("fl"))
      val quality = flagged
        .where(col("fl.f_wordcount") === 1 && col("fl.f_wordlen") === 1 &&
          col("fl.f_symbols") === 1 && col("fl.f_bullet") === 1 &&
          col("fl.f_stopwords") === 1)
        .select(col("doc_id"), col("text"), col("ntok"))
        .persistRegistered()
      quality.count() // eager: three consumers in the composed DAG
      val kept = Dedup.dedupKeepBest(quality, "doc_id", "text", col("ntok"))
      val keptDocs = quality.join(kept.select("doc_id"), Seq("doc_id"))
      val contam = Dedup.contamination(
        keptDocs, "doc_id", "text",
        docs.where(col("doc_id") < 10), "text")
      val clean = keptDocs
        .join(
          contam.where(col("contamination_e4") < 2000)
            .select(col("id").as("doc_id")),
          Seq("doc_id"))
        .select(col("doc_id"), col("ntok"))
      val sharded = Splits.shardByHash(clean.select("doc_id"), "doc_id", 8)
      val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sharded
        .join(clean, Seq("doc_id"))
        .select(col("doc_id"), col("ntok"), col("shard"),
          col("pos").cast("long").as("pos"),
          sum(col("ntok")).over(w).as("cum_tok"))
    },

    // per-source unigram KL divergence vs the whole corpus: the
    // distribution-drift audit of a corpus mixture (which source is
    // distributionally unlike the rest). Add-one smoothing over the
    // global vocab on both sides; per-term e9 floors of one shared
    // double tree, exact integer sums.
    Q(
      "t32_unigram_kl",
      """WITH tok AS (
        |  SELECT source AS s,
        |    unnest(string_split_regex(trim(text), ' +')) AS t
        |  FROM documents
        |), cst AS (
        |  SELECT s, t, count(*) AS c FROM tok GROUP BY 1, 2
        |), ct AS (
        |  SELECT t, count(*) AS cg FROM tok GROUP BY 1
        |), ns AS (
        |  SELECT s, count(*) AS ns FROM tok GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS nn, count(DISTINCT t) AS vv FROM tok
        |), term AS (
        |  SELECT ns.s, ns.ns,
        |    floor(
        |      (CAST(coalesce(cst.c, 0) + 1 AS DOUBLE)
        |        / CAST(ns.ns + vv AS DOUBLE))
        |      * ln(
        |        (CAST(coalesce(cst.c, 0) + 1 AS DOUBLE)
        |          / CAST(ns.ns + vv AS DOUBLE))
        |        / (CAST(ct.cg + 1 AS DOUBLE)
        |          / CAST(nn + vv AS DOUBLE)))
        |      * 1e9) AS e
        |  FROM ns CROSS JOIN ct CROSS JOIN tot
        |  LEFT JOIN cst ON cst.s = ns.s AND cst.t = ct.t
        |)
        |SELECT s AS source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |  CAST(sum(e) AS BIGINT) AS kl_e9
        |FROM term GROUP BY s""".stripMargin) { (s, dir) =>
      TextAnalysis.unigramKl(
        Tables.load(s, dir, "documents"), "source", "text")
    },

    // C4-style blocklist screen: occurrence audit for a banned-phrase
    // list (1–2 token phrases) — one corpus scan, gram explode,
    // broadcast-hash join against the phrase list (few KB vs TBs),
    // count aggregation. The filter itself (blocklistFilter, left-anti
    // on the same hit stream) is spec-pinned; the audit view is the
    // oracled vehicle. Oracle: unigram ∪ bigram unnest joined to a
    // VALUES list — literal string grams on both engines.
    Q(
      "t29_blocklist_filter",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(toks) AS phrase FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> concat_ws(' ', toks[i], toks[i+1]))) AS phrase FROM t
        |), b AS (
        |  SELECT unnest(['spark', 'merge', 'slow',
        |    'table table', 'fast sort', 'key agg']) AS phrase
        |)
        |SELECT phrase, count(*) AS n_hits,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM g JOIN b USING (phrase)
        |GROUP BY phrase""".stripMargin) { (s, dir) =>
      TextAnalysis.blocklistHits(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "merge", "slow", "table table", "fast sort",
          "key agg"))
    },

    // per-source document CAP (the C4 "at most N pages per domain"
    // ceiling, the companion to t15's proportional temperature mix):
    // each source keeps its 20 lowest-pmd5(doc_id) documents — a
    // deterministic uniform sample realized as ONE bounded-top-k hash
    // aggregate (O(cap) state per key at every phase). Oracle replays
    // the portable hash rank with a row_number window.
    Q(
      "t33_domain_cap",
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS hk
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id, row_number() OVER
        |    (PARTITION BY source ORDER BY hk, doc_id) AS rn
        |  FROM h
        |)
        |SELECT source, doc_id FROM r WHERE rn <= 20""".stripMargin) {
      (s, dir) =>
        graft.ext.Splits.capPerKey(
          Tables.load(s, dir, "documents"), "source", "doc_id", cap = 20)
    },

    // DSIR importance-resampling EXECUTION (Gumbel top-k): t26 scores
    // the corpus; this draws the n/10-doc training subset with
    // probability ∝ importance weight — sampling without replacement
    // via hash-derived standard Gumbel noise added to each log-weight,
    // keep the largest keys. Deterministic (no RNG: the draw is a pure
    // function of corpus content), executed as ONE BoundedTopK global
    // aggregate (O(k) state at every phase — no global sort), and
    // fully hash-oracled: DuckDB replays the t26 chain, the shared
    // -1e6·ln(-ln u) double tree, and the (key DESC, id ASC) top-k.
    Q("t34_dsir_resample", dsirResampleOracleSql) { (s, dir) =>
      TextAnalysis.dsirResample(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", keepNth = 10)
    },

    // CCNet perplexity buckets: per language, tercile the corpus by
    // average bigram NLL (t18's LM score, integer-averaged per
    // bigram) into head/middle/tail — the quality stratification
    // CCNet-style pipelines partition each language's crawl by before
    // choosing mixing rates. The window is per-language (keyed range
    // sort, no global window); sub-2-token docs carry no LM evidence
    // and land in tail with a NULL score.
    Q("t35_ccnet_buckets", ccnetBucketsOracleSql) { (s, dir) =>
      TextAnalysis.ccnetBuckets(
        Tables.load(s, dir, "documents"), "doc_id", "text", "lang")
    },

    // token-budget mixture PLAN: per-source α=0.5 temperature shares
    // (∝ √tokens) and repeat factors under a 1M-token training
    // budget — the per-domain epoch table a training run is scheduled
    // from (epochs_e4 > 10000 = the domain is seen more than once;
    // the up-sampling t15's down-sampler cannot express). All
    // integer: floor(√tokens) is correctly-rounded IEEE on both
    // engines, shares are ppm integer divisions, and the budget
    // product uses the exact remainder-first decomposition so a
    // multi-trillion-token budget cannot overflow a BIGINT.
    Q("t36_mixture_plan", mixturePlanOracleSql(budget = 1000000L)) {
      (s, dir) =>
        Splits.mixturePlan(
          Tables.load(s, dir, "documents"), "source",
          tokenCount(col("text")), budgetTokens = 1000000L)
    },

    // vocabulary coverage curve: token-occurrence coverage of the V
    // most frequent types at V = 100/1000/10000 — the audit a
    // tokenizer team reads before committing a vocab budget (t31's
    // fertility companion). Scale-shaped: the rank window runs over a
    // TakeOrdered top-max(V) frame, never the full type inventory.
    Q("t37_vocab_coverage", vocabCoverageOracleSql(Seq(100, 1000, 10000))) {
      (s, dir) =>
        TextAnalysis.vocabCoverage(
          Tables.load(s, dir, "documents"), "text",
          sizes = Seq(100, 1000, 10000))
    },

    // split-balance drift audit: the t32 per-slice unigram KL with the
    // slice = the t10 content-hash train/val/test assignment — the
    // hygiene check that the eval splits are distributionally
    // representative of train (a skewed val set invalidates every
    // downstream metric). Pure composition of two published
    // contracts; KL near zero is the expected (healthy) reading.
    Q("t38_split_drift", splitDriftOracleSql) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(Splits.assignSplit(col("doc_id")).as("split"), col("text"))
      TextAnalysis.unigramKl(docs, "split", "text")
        .withColumnRenamed("source", "split")
    },

    // curation FUNNEL: every document labeled with the FIRST t30 stage
    // that rejects it (the five Gopher gates in order, then exact
    // dedup, then benchmark contamination) or 'kept' — the funnel
    // table every published curation pipeline reports (how many docs/
    // tokens each gate costs). Same predicates as t30 (shared oracle
    // CTE chain), labeling instead of filtering, so the 'kept' row is
    // definitionally t30's survivor set.
    Q("t39_curation_funnel", t39OracleSql) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val flagged = docs
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
          charSum(col("text")).cast("long").as("charsum"))
        .select(col("doc_id"), col("text"),
          size(col("toks")).cast("long").as("ntok"),
          gopherFlags(col("text"), col("toks"),
            size(col("toks")).cast("long"), col("charsum")).as("fl"))
        .persistRegistered()
      flagged.count() // eager: label pass + quality subset share one scan
      val quality = flagged
        .where(col("fl.f_wordcount") === 1 && col("fl.f_wordlen") === 1 &&
          col("fl.f_symbols") === 1 && col("fl.f_bullet") === 1 &&
          col("fl.f_stopwords") === 1)
        .select(col("doc_id"), col("text"), col("ntok"))
      val kept = Dedup.dedupKeepBest(quality, "doc_id", "text", col("ntok"))
        .select(col("doc_id"), lit(1L).as("kb"))
      val keptDocs = quality.join(kept.select("doc_id"), Seq("doc_id"))
      val contam = Dedup.contamination(
        keptDocs, "doc_id", "text",
        docs.where(col("doc_id") < 10), "text")
        .select(col("id").as("doc_id"), col("contamination_e4"))
      flagged
        .join(kept, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .select(col("ntok"),
          when(col("fl.f_wordcount") === 0, "wordcount")
            .when(col("fl.f_wordlen") === 0, "wordlen")
            .when(col("fl.f_symbols") === 0, "symbols")
            .when(col("fl.f_bullet") === 0, "bullet")
            .when(col("fl.f_stopwords") === 0, "stopwords")
            .when(col("kb").isNull, "dedup")
            .when(col("contamination_e4") >= 2000, "contamination")
            .otherwise("kept").as("stage"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    },

    // interpolated Kneser-Ney bigram scoring (the KenLM/CCNet
    // smoothing, vs t18's add-one): discount D=0.75 off every seen
    // bigram, back off to the CONTINUATION unigram (distinct
    // predecessors / distinct bigram types). Per-bigram log-prob is
    // ONE left-associated double tree over five integer count frames
    // — bit-identical across engines (t18/t14 precedent) — e6-floored
    // before the exact integer per-doc sum.
    Q(
      "t40_kneser_ney",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM toks))) AS i
        |), grams AS (
        |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
        |  FROM toks JOIN pos ON i <= len(t) - 1
        |  WHERE len(t) >= 2
        |), c2 AS (
        |  SELECT prev, cur, count(*) AS n2 FROM grams GROUP BY prev, cur
        |), c1 AS (
        |  SELECT prev, count(*) AS n1 FROM grams GROUP BY prev
        |), nf AS (
        |  SELECT prev, count(DISTINCT cur) AS nf FROM grams GROUP BY prev
        |), np AS (
        |  SELECT cur, count(DISTINCT prev) AS np FROM grams GROUP BY cur
        |), nt AS (
        |  SELECT count(*) AS nt FROM (SELECT DISTINCT prev, cur FROM grams)
        |), sc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    sum(CAST(floor(1e6 * ln(
        |      greatest(CAST(n2 AS DOUBLE) - 0.75, 0.0) / CAST(n1 AS DOUBLE)
        |      + ((0.75 * CAST(nf AS DOUBLE)) / CAST(n1 AS DOUBLE))
        |        * (CAST(np AS DOUBLE) / CAST(nt AS DOUBLE)))) AS BIGINT))
        |      AS kn_e6_sum
        |  FROM grams JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |    JOIN nf USING (prev) JOIN np USING (cur), nt
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  CAST(coalesce(sc.kn_e6_sum, 0) AS BIGINT) AS kn_e6_sum
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.knScore(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // leakage-SAFE split: near-dup clusters (d8's recursive-CTE
    // replay), every doc inherits its cluster representative's
    // content-hash split — so near-duplicates can never straddle
    // train/val/test (the prevention twin of t25's measurement;
    // singletons coincide with t10's per-doc split). Uncapped postings
    // for oracle parity (the d5/d8 contract).
    Q(
      "t41_leakage_safe_split",
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS sh
        |  FROM t
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.sh, b.sh)) AS shared,
        |    len(a.sh) AS na, len(b.sh) AS nb
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |), pr AS (
        |  SELECT id_a, id_b FROM p
        |  WHERE shared > 0
        |    AND CAST(shared AS DOUBLE)/CAST(na + nb - shared AS DOUBLE) >= 0.8
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr
        |), walk(a, lbl) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.a, w.lbl FROM edges e JOIN walk w ON e.b = w.a
        |), cl AS (
        |  SELECT a AS id, min(lbl) AS cluster_id FROM walk GROUP BY a
        |), asg AS (
        |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id
        |)
        |SELECT doc_id, cluster_id, CASE
        |  WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6'
        |    THEN 'train'
        |  WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'f3'
        |    THEN 'val'
        |  ELSE 'test' END AS split
        |FROM asg""".stripMargin) { (s, dir) =>
      graft.ext.Splits.leakageSafeSplit(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        maxPostings = Int.MaxValue)
    },

    // context-length packing sweep: per candidate sequence length, how
    // many docs the t12 concat-and-split layout fragments across a
    // chunk boundary, total chunks, and final-chunk padding — the
    // table that fixes the pretraining context size. One shared
    // serial-window cumsum replays every cell (pure integers).
    Q(
      "t42_packing_sweep",
      """WITH tok AS (
        |  SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, ntok,
        |    sum(ntok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tok WHERE ntok > 0
        |), l AS (
        |  SELECT unnest([256, 512, 1024, 2048]) AS ctx_len
        |)
        |SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
        |  count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |  CAST(max((cum - 1) // ctx_len) + 1 AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN (cum - ntok) // ctx_len <> (cum - 1) // ctx_len
        |    THEN 1 ELSE 0 END) AS BIGINT) AS frag_docs,
        |  CAST(sum(CASE WHEN (cum - ntok) // ctx_len <> (cum - 1) // ctx_len
        |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS frag_ppm,
        |  CAST((ctx_len - sum(ntok) % ctx_len) % ctx_len AS BIGINT)
        |    AS pad_tokens
        |FROM c, l GROUP BY ctx_len""".stripMargin) { (s, dir) =>
      Packing.packingSweep(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), tokenCount(col("text")).as("ntok")),
        "doc_id", "ntok")
    },

    // Curriculum PLAN over the t4 quality score
    // ([[Splits.curriculumPlan]]): exact equal-count decile buckets
    // (easy→hard pacing) WITHOUT a global sort — thresholds from a
    // cumulative histogram of the bounded score domain (≤ 10⁴ distinct
    // values), bucket assignment a when-chain of 9 literals, two
    // linear corpus passes total. Oracle replays the t4 score formula,
    // the integer threshold rule (smallest v with cc·10 ≥ i·n) and the
    // strictly-greater bucket count verbatim.
    Q(
      "t43_curriculum_plan",
      s"""WITH $qualityDecileCtes
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |  min(qe) AS min_q_e4, max(qe) AS max_q_e4,
        |  CAST(sum(qe) AS BIGINT) AS sum_q_e4,
        |  CAST(sum(qe) // count(*) AS BIGINT) AS avg_q_e4
        |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
      Splits.curriculumPlan(
        Tables.load(s, dir, "documents")
          .select(
            floor(qualityScore(col("text")) * 10000).cast("long")
              .as("quality_e4")),
        "quality_e4")
    },

    // Moore–Lewis cross-entropy difference selection
    // ([[TextAnalysis.mooreLewis]]): per-doc log P_in − log P_gen
    // under two add-one bigram LMs (in-domain = the lexicographically
    // smallest source, general = the rest); selected = positive
    // difference. Both models' counts ride the ONE t18 gram shuffle as
    // conditional sums — the marginal cost of the second model is one
    // column per aggregate. Oracle extends t18's replay with FILTER
    // CASE counts and the same e6-floored ln tree per model.
    Q(
      "t44_moore_lewis",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t,
        |    source = (SELECT min(source) FROM documents) AS is_in
        |  FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM toks))) AS i
        |), grams AS (
        |  SELECT doc_id, is_in, t[i] AS prev, t[i+1] AS cur
        |  FROM toks JOIN pos ON i <= len(t) - 1
        |  WHERE len(t) >= 2
        |), c2 AS (
        |  SELECT prev, cur,
        |    sum(CASE WHEN is_in THEN 1 ELSE 0 END) AS n2i,
        |    sum(CASE WHEN is_in THEN 0 ELSE 1 END) AS n2g
        |  FROM grams GROUP BY prev, cur
        |), c1 AS (
        |  SELECT prev,
        |    sum(CASE WHEN is_in THEN 1 ELSE 0 END) AS n1i,
        |    sum(CASE WHEN is_in THEN 0 ELSE 1 END) AS n1g
        |  FROM grams GROUP BY prev
        |), v AS (
        |  SELECT count(DISTINCT CASE WHEN is_in THEN t[i] END) AS vi,
        |    count(DISTINCT CASE WHEN NOT is_in THEN t[i] END) AS vg
        |  FROM toks JOIN pos ON i <= len(t)
        |), sc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    sum(CAST(floor(1e6 * ln(
        |      CAST(n2i + 1 AS DOUBLE) / CAST(n1i + vi AS DOUBLE))) AS BIGINT))
        |      AS si,
        |    sum(CAST(floor(1e6 * ln(
        |      CAST(n2g + 1 AS DOUBLE) / CAST(n1g + vg AS DOUBLE))) AS BIGINT))
        |      AS sg
        |  FROM grams JOIN c2 USING (prev, cur) JOIN c1 USING (prev), v
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  CAST(coalesce(sc.si, 0) AS BIGINT) AS lm_in_e6_sum,
        |  CAST(coalesce(sc.sg, 0) AS BIGINT) AS lm_gen_e6_sum,
        |  CAST(coalesce(sc.si, 0) - coalesce(sc.sg, 0) AS BIGINT)
        |    AS ml_e6_sum,
        |  CAST(CASE WHEN coalesce(sc.si, 0) - coalesce(sc.sg, 0) > 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS selected
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin) {
      (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val minSrc = docs.agg(min(col("source")).as("_ms"))
        val flagged = docs
          .crossJoin(broadcast(minSrc))
          .withColumn("_in", col("source") === col("_ms"))
        TextAnalysis.mooreLewis(flagged, "doc_id", "text", "_in")
    },

    // PSI quality-score drift per source ([[Splits.psiDrift]]): each
    // source's score distribution against the GLOBAL equal-count
    // deciles, Laplace-smoothed, per-bin terms e6-floored before the
    // integer sum; flagged at the standard PSI ≥ 0.1 alert. The score
    // twin of s22's embedding drift. One corpus shuffle to
    // (source, bucket) counts; the oracle shares t43's threshold CTEs
    // so the bin rule cannot drift between the two consumers.
    Q(
      "t45_psi_quality_drift",
      s"""WITH $qualityDecileCtes, nsb AS (
        |  SELECT source AS src, bucket, count(*) AS nsb
        |  FROM b GROUP BY 1, 2
        |), nb AS (
        |  SELECT bucket, sum(nsb) AS nb FROM nsb GROUP BY 1
        |), ns AS (
        |  SELECT src, sum(nsb) AS ns FROM nsb GROUP BY 1
        |), tot AS (
        |  SELECT sum(nsb) AS n, count(DISTINCT bucket) AS nbk FROM nsb
        |), g0 AS (
        |  SELECT ns.src, ns.ns, nb.bucket, nb.nb FROM ns, nb
        |), grid AS (
        |  SELECT g0.src, g0.ns, g0.bucket, g0.nb, coalesce(x.nsb, 0) AS nsb
        |  FROM g0 LEFT JOIN nsb x
        |    ON x.src = g0.src AND x.bucket = g0.bucket
        |), terms AS (
        |  SELECT src, ns,
        |    CAST(floor(1e6
        |      * (CAST(nsb + 1 AS DOUBLE) / CAST(ns + nbk AS DOUBLE)
        |         - CAST(nb + 1 AS DOUBLE) / CAST(n + nbk AS DOUBLE))
        |      * ln((CAST(nsb + 1 AS DOUBLE) / CAST(ns + nbk AS DOUBLE))
        |          / (CAST(nb + 1 AS DOUBLE) / CAST(n + nbk AS DOUBLE))))
        |      AS BIGINT) AS term
        |  FROM grid, tot
        |)
        |SELECT src AS source, CAST(max(ns) AS BIGINT) AS n_docs,
        |  CAST(sum(term) AS BIGINT) AS psi_e6,
        |  CAST(CASE WHEN sum(term) >= 100000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS flagged
        |FROM terms GROUP BY src""".stripMargin) { (s, dir) =>
      Splits.psiDrift(
        Tables.load(s, dir, "documents")
          .select(
            col("source"),
            floor(qualityScore(col("text")) * 10000).cast("long")
              .as("quality_e4")),
        "source", "quality_e4")
    }
  )

  /** t39 replay: the shared t30 chain, then one first-match CASE over
    * the identical gate predicates (negated, in gate order) labeling
    * every document; LEFT joins carry the dedup-survivor and
    * contamination evidence only the later stages consult. */
  private lazy val t39OracleSql: String = t30ChainSql +
    """, lab AS (
      |  SELECT f.doc_id, f.ntok,
      |    CASE
      |      WHEN NOT (f.ntok BETWEEN 50 AND 100000) THEN 'wordcount'
      |      WHEN NOT (floor((CAST(f.charsum AS DOUBLE) * 100.0)
      |          / CAST(f.ntok AS DOUBLE)) BETWEEN 300 AND 1000)
      |        THEN 'wordlen'
      |      WHEN ((length(f.text) - length(replace(f.text, '...', ''))) // 3
      |          + length(f.text) - length(replace(f.text, '#', ''))) * 10
      |          > f.ntok THEN 'symbols'
      |      WHEN f.text LIKE '- %' OR f.text LIKE '* %' THEN 'bullet'
      |      WHEN len(list_filter(string_split_regex(trim(f.text), ' +'),
      |          t -> t IN ('the','a','of','and','to','in','is','it'))) < 2
      |        THEN 'stopwords'
      |      WHEN kb.doc_id IS NULL THEN 'dedup'
      |      WHEN floor(CAST(coalesce(h.ch, 0) AS DOUBLE)
      |          / CAST(tt.n AS DOUBLE) * 10000) >= 2000
      |        THEN 'contamination'
      |      ELSE 'kept' END AS stage
      |  FROM f LEFT JOIN kb ON kb.doc_id = f.doc_id
      |  LEFT JOIN tot tt ON tt.doc_id = f.doc_id
      |  LEFT JOIN hits h ON h.doc_id = f.doc_id
      |)
      |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS n_tokens
      |FROM lab GROUP BY stage""".stripMargin

  /** t37 replay: type counts, TakeOrdered top-max(V), rank window over
    * that reduced frame, per-V coverage sums in integer basis points. */
  private def vocabCoverageOracleSql(sizes: Seq[Int]): String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split_regex(trim(text), ' +')) AS t
       |  FROM documents
       |), c AS (
       |  SELECT t, count(*) AS c FROM tok GROUP BY t
       |), tot AS (SELECT sum(c) AS total FROM c),
       |top AS (SELECT t, c FROM c ORDER BY c DESC, t ASC LIMIT ${sizes.max}),
       |r AS (
       |  SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rank
       |  FROM top
       |), v AS (SELECT unnest([${sizes.mkString(", ")}]) AS vocab_size)
       |SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
       |  CAST(sum(r.c) AS BIGINT) AS covered_tokens,
       |  CAST(sum(r.c) * 10000 // total AS BIGINT) AS coverage_bp,
       |  CAST(10000 - sum(r.c) * 10000 // total AS BIGINT) AS oov_bp
       |FROM v JOIN r ON r.rank <= v.vocab_size, tot
       |GROUP BY v.vocab_size, total""".stripMargin

  /** t38 replay: the t32 chain verbatim with the slice expression =
    * t10's md5-bucket split assignment. */
  private lazy val splitDriftOracleSql: String =
    """WITH tok AS (
      |  SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |           THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
      |           THEN 'val'
      |         ELSE 'test' END AS s,
      |    unnest(string_split_regex(trim(text), ' +')) AS t
      |  FROM documents
      |), cst AS (
      |  SELECT s, t, count(*) AS c FROM tok GROUP BY 1, 2
      |), ct AS (
      |  SELECT t, count(*) AS cg FROM tok GROUP BY 1
      |), ns AS (
      |  SELECT s, count(*) AS ns FROM tok GROUP BY 1
      |), tot AS (
      |  SELECT count(*) AS nn, count(DISTINCT t) AS vv FROM tok
      |), term AS (
      |  SELECT ns.s, ns.ns,
      |    floor(
      |      (CAST(coalesce(cst.c, 0) + 1 AS DOUBLE)
      |        / CAST(ns.ns + vv AS DOUBLE))
      |      * ln(
      |        (CAST(coalesce(cst.c, 0) + 1 AS DOUBLE)
      |          / CAST(ns.ns + vv AS DOUBLE))
      |        / (CAST(ct.cg + 1 AS DOUBLE)
      |          / CAST(nn + vv AS DOUBLE)))
      |      * 1e9) AS e
      |  FROM ns CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN cst ON cst.s = ns.s AND cst.t = ct.t
      |)
      |SELECT s AS split, CAST(max(ns) AS BIGINT) AS n_tokens,
      |  CAST(sum(e) AS BIGINT) AS kl_e9
      |FROM term GROUP BY s""".stripMargin

  /** t36 replay: per-source token sums, floor-√ integer weights, the
    * remainder-first exact `(b·w) div 10⁶` decomposition, and the
    * integer epochs ratio — every op `div`/`//`-portable (all
    * operands strictly positive). */
  private def mixturePlanOracleSql(budget: Long): String =
    s"""WITH s AS (
       |  SELECT source, count(*) AS n_docs,
       |    sum(len(string_split_regex(trim(text), ' +'))) AS tokens
       |  FROM documents GROUP BY source
       |), q AS (
       |  SELECT source, n_docs, tokens,
       |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS sqrt_tok
       |  FROM s
       |), t AS (SELECT sum(sqrt_tok) AS tot FROM q),
       |w AS (
       |  SELECT source, n_docs, tokens,
       |    CASE WHEN tot > 0 THEN sqrt_tok * 1000000 // tot
       |         ELSE 0 END AS weight_ppm
       |  FROM q, t
       |), tgt AS (
       |  SELECT source, n_docs, tokens, weight_ppm,
       |    ($budget // 1000000) * weight_ppm
       |      + (($budget % 1000000) * weight_ppm) // 1000000 AS target_tokens
       |  FROM w
       |)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(tokens AS BIGINT) AS tokens,
       |  CAST(weight_ppm AS BIGINT) AS weight_ppm,
       |  CAST(target_tokens AS BIGINT) AS target_tokens,
       |  CAST(CASE WHEN tokens > 0 THEN target_tokens * 10000 // tokens END
       |    AS BIGINT) AS epochs_e4
       |FROM tgt""".stripMargin

  /** The t26 DSIR scoring chain (hashed 4096-bucket unigram models of
    * target vs raw pool, smoothed bucket log-ratios e6-floored, exact
    * integer per-doc sums) — shared verbatim by the t26 weights oracle
    * and the t34 resampling oracle, which extends it with the Gumbel
    * top-k draw. Ends at the `per` CTE. */
  private lazy val dsirChainSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang = 'en' AS is_target,
      |    ('0x'||substr(md5(unnest(string_split_regex(trim(text), ' +'))),1,15))::BIGINT % 4096 AS b
      |  FROM documents
      |), counts AS (
      |  SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tb,
      |    count(*) AS rb
      |  FROM tok GROUP BY b
      |), tot AS (
      |  SELECT sum(tb) AS tt, sum(rb) AS rt FROM counts
      |), model AS (
      |  SELECT b, CAST(floor(1e6 * ln(
      |      (CAST(tb + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))
      |      / (CAST(rb + 1 AS DOUBLE) / CAST(rt + 4096 AS DOUBLE))))
      |    AS BIGINT) AS lr_e6
      |  FROM counts, tot
      |), per AS (
      |  SELECT doc_id, count(*) AS n_tokens, sum(lr_e6) AS logweight_e6
      |  FROM tok JOIN model USING (b) GROUP BY doc_id
      |)""".stripMargin

  /** t34 oracle: the t26 chain, then the hash-derived standard Gumbel
    * (one shared double tree, e6-floored), key = logweight + gumbel,
    * and the top n/10 by (key DESC, doc_id ASC) via row_number —
    * the oracle replays the BoundedTopK selection with a window. */
  private lazy val dsirResampleOracleSql: String =
    dsirChainSql +
      """, w AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(p.logweight_e6, 0) AS BIGINT) AS logweight_e6
        |  FROM documents d LEFT JOIN per p USING (doc_id)
        |), g AS (
        |  SELECT doc_id, logweight_e6,
        |    logweight_e6 + CAST(floor(-1e6 * ln(-ln(
        |      CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
        |          % 1000000000 + 1 AS DOUBLE)
        |      / CAST(1000000001 AS DOUBLE)))) AS BIGINT) AS key_e6
        |  FROM w
        |), kc AS (
        |  SELECT greatest(1, count(*) // 10) AS kk FROM documents
        |), r AS (
        |  SELECT doc_id, logweight_e6, key_e6,
        |    row_number() OVER (ORDER BY key_e6 DESC, doc_id ASC) AS rn
        |  FROM g
        |)
        |SELECT CAST(rn AS BIGINT) AS rank, doc_id, logweight_e6, key_e6
        |FROM r, kc WHERE rn <= kk""".stripMargin

  /** t35 oracle: the t18 bigram-NLL chain, integer-averaged per bigram
    * (`//` on two positives ≡ Spark `div`), then per-language ntile(3)
    * terciles with the (score, doc_id) deterministic order; docs
    * without a bigram (absent from `sc`) are labeled tail with NULL
    * score outside the terciles. */
  private lazy val ccnetBucketsOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
      |), pos AS (
      |  SELECT unnest(generate_series(1,
      |    (SELECT CAST(max(len(t)) AS INT) FROM toks))) AS i
      |), grams AS (
      |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
      |  FROM toks JOIN pos ON i <= len(t) - 1
      |  WHERE len(t) >= 2
      |), c2 AS (
      |  SELECT prev, cur, count(*) AS n2 FROM grams GROUP BY prev, cur
      |), c1 AS (
      |  SELECT prev, count(*) AS n1 FROM grams GROUP BY prev
      |), v AS (
      |  SELECT count(DISTINCT t[i]) AS v
      |  FROM toks JOIN pos ON i <= len(t)
      |), sc AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    sum(CAST(floor(1e6 * ln(
      |      CAST(n2 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))) AS BIGINT))
      |      AS logprob_e6_sum
      |  FROM grams JOIN c2 USING (prev, cur) JOIN c1 USING (prev), v
      |  GROUP BY doc_id
      |), b AS (
      |  SELECT s.doc_id, d.lang, CAST(s.n_bigrams AS BIGINT) AS n_bigrams,
      |    (-s.logprob_e6_sum) // s.n_bigrams AS avg_nll_e6
      |  FROM sc s JOIN documents d USING (doc_id)
      |), t AS (
      |  SELECT doc_id, lang, n_bigrams, avg_nll_e6,
      |    ntile(3) OVER (PARTITION BY lang
      |      ORDER BY avg_nll_e6 ASC, doc_id ASC) AS tile
      |  FROM b
      |)
      |SELECT doc_id, lang, n_bigrams,
      |  CAST(avg_nll_e6 AS BIGINT) AS avg_nll_e6,
      |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
      |    AS bucket
      |FROM t
      |UNION ALL
      |SELECT d.doc_id, d.lang, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), 'tail'
      |FROM documents d LEFT JOIN sc s ON s.doc_id = d.doc_id
      |WHERE s.doc_id IS NULL""".stripMargin

  /** t30 oracle: the full curation chain in DuckDB — t13's flag
    * predicates inlined as a WHERE, the d7 keep-best window, the d10
    * shingle-fraction screen, the t17 shard hash, and the per-shard
    * running token sum. */
  /** The t30 gate+dedup+contamination CTE chain (through `tot`) —
    * shared by the t30 pipeline oracle and the t39 funnel oracle,
    * which labels instead of filtering. */
  private lazy val t30ChainSql: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ntok,
      |    CAST(length(regexp_replace(trim(text), ' +', '', 'g')) AS BIGINT) AS charsum
      |  FROM documents
      |), q AS (
      |  SELECT doc_id, text, ntok FROM f
      |  WHERE ntok BETWEEN 50 AND 100000
      |    AND floor((CAST(charsum AS DOUBLE) * 100.0) / CAST(ntok AS DOUBLE))
      |        BETWEEN 300 AND 1000
      |    AND ((length(text) - length(replace(text, '...', ''))) // 3
      |        + length(text) - length(replace(text, '#', ''))) * 10 <= ntok
      |    AND NOT (text LIKE '- %' OR text LIKE '* %')
      |    AND len(list_filter(string_split_regex(trim(text), ' +'),
      |        t -> t IN ('the','a','of','and','to','in','is','it'))) >= 2
      |), kb AS (
      |  SELECT doc_id, text, ntok FROM (
      |    SELECT doc_id, text, ntok, row_number() OVER (
      |      PARTITION BY md5(text) ORDER BY ntok DESC, doc_id ASC) AS rn
      |    FROM q) WHERE rn = 1
      |), tt AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM kb
      |), ss AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM tt
      |), et AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
      |  FROM documents WHERE doc_id < 10
      |), es AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM et
      |), ev AS (
      |  SELECT DISTINCT unnest(sh) AS g FROM es
      |), d AS (
      |  SELECT doc_id, unnest(sh) AS g FROM ss
      |), hits AS (
      |  SELECT doc_id, count(*) AS ch FROM d JOIN ev USING (g) GROUP BY 1
      |), tot AS (
      |  SELECT doc_id, len(sh) AS n FROM ss
      |)""".stripMargin

  private lazy val t30OracleSql: String = t30ChainSql +
    """, clean AS (
      |  SELECT kb.doc_id, kb.ntok
      |  FROM kb JOIN tot USING (doc_id) LEFT JOIN hits USING (doc_id)
      |  WHERE floor(CAST(coalesce(ch, 0) AS DOUBLE) / CAST(n AS DOUBLE) * 10000) < 2000
      |), k AS (
      |  SELECT doc_id, ntok, md5(CAST(doc_id AS VARCHAR)) AS sk FROM clean
      |), sh2 AS (
      |  SELECT doc_id, ntok,
      |    ('0x'||substr(sk,1,4))::BIGINT % 8 AS shard,
      |    CAST(row_number() OVER (
      |      PARTITION BY ('0x'||substr(sk,1,4))::BIGINT % 8
      |      ORDER BY sk, doc_id) AS BIGINT) AS pos
      |  FROM k
      |)
      |SELECT doc_id, ntok, shard, pos,
      |  CAST(sum(ntok) OVER (PARTITION BY shard ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |FROM sh2""".stripMargin

  /** Constructive DuckDB replay of [[Bpe.train]] — `rounds` unrolled
    * merge rounds over the (word, symbols, freq) vocab. Per round k:
    * `p_k` counts adjacent symbol pairs weighted by word freq; `m_k` is
    * the deterministic argmax (freq desc, then pair lexicographic;
    * empty when the max count drops under minFreq=2 — and it STAYS
    * empty every later round because the vocab then passes through
    * unchanged, the Spark trainer's early-stop); `v_k` applies the
    * merge greedily left-to-right. Greedy-with-overlap replays as
    * gaps-and-islands: matched positions form runs of consecutive
    * indexes (overlap is only possible at stride 1), and the greedy
    * fold keeps exactly the even offsets within each run; a position
    * whose predecessor merged is consumed (pmg filter). Every `v_k` is
    * `AS MATERIALIZED`: each is referenced twice (pair counting and the
    * next merge application), and CTE inlining would re-expand the
    * whole chain 2^rounds times. */
  /** The WITH-chain shared by t11 and t27: corpus word table, v0 char
    * split, and `rounds` unrolled merge rounds ending at v`rounds`. */
  private def bpeChainCtes(rounds: Int): String = {
    val base =
      """WITH words AS (
        |  SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), ' +')) AS w
        |    FROM documents)
        |  WHERE len(w) > 0 GROUP BY w
        |), v0 AS MATERIALIZED (
        |  SELECT w, string_split(w, '') AS symbols, freq FROM words
        |)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s""", p$k AS (
         |  SELECT u.a AS a, u.b AS b, sum(freq) AS n
         |  FROM (SELECT unnest(list_transform(range(1, len(symbols)),
         |      j -> {'a': symbols[j], 'b': symbols[j+1]})) AS u, freq
         |    FROM v${k - 1})
         |  GROUP BY u.a, u.b
         |), m$k AS (
         |  SELECT a, b FROM p$k WHERE n >= 2
         |  ORDER BY n DESC, a ASC, b ASC LIMIT 1
         |), v$k AS MATERIALIZED (
         |  SELECT w, max(freq) AS freq,
         |    list(CASE WHEN mg = 1 THEN s || nx ELSE s END ORDER BY i)
         |      FILTER (WHERE pmg = 0) AS symbols
         |  FROM (
         |    SELECT *, lag(mg, 1, 0) OVER (PARTITION BY w ORDER BY i) AS pmg
         |    FROM (
         |      SELECT *, CASE WHEN mt = 1 AND
         |          (i - min(i) OVER (PARTITION BY w, grp)) % 2 = 0
         |        THEN 1 ELSE 0 END AS mg
         |      FROM (
         |        SELECT *, CASE WHEN mt = 1 THEN
         |            i - row_number() OVER (PARTITION BY w, mt ORDER BY i)
         |          END AS grp
         |        FROM (
         |          SELECT e.*, CASE WHEN m.a IS NOT NULL AND e.s = m.a
         |              AND e.nx = m.b THEN 1 ELSE 0 END AS mt
         |          FROM (
         |            SELECT w, freq, i, s,
         |              lead(s) OVER (PARTITION BY w ORDER BY i) AS nx
         |            FROM (SELECT w, freq,
         |              unnest(range(1, len(symbols)+1)) AS i,
         |              unnest(symbols) AS s FROM v${k - 1})
         |          ) e LEFT JOIN m$k m ON TRUE
         |        )
         |      )
         |    )
         |  ) GROUP BY w
         |)""".stripMargin
    }.mkString
    base + steps
  }

  private def bpeOracleSql(rounds: Int): String = {
    val out = (1 to rounds)
      .map(k => s"SELECT ${k - 1} AS r, a, b FROM m$k")
      .mkString("\n  UNION ALL ")
    bpeChainCtes(rounds) +
      s"""
         |SELECT CAST(r AS BIGINT) AS rank, a AS first, b AS second,
         |  a || b AS merged
         |FROM (
         |  $out
         |)""".stripMargin
  }

  /** t28 replay: exact-integer 2-feature batch GD (the q77 idiom —
    * HUGEINT gradient sums, truncating `//` updates) on
    * (token count, en-stopword hits) → n_chars>=320 e6 labels, then
    * every document scored under the final weights. Learning-rate
    * divisors are contract constants inlined on both engines. */
  private def qualityLrOracleSql(epochs: Int): String = {
    val lrw = 10000L; val lrb = 10L
    val base =
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), ' +')) AS HUGEINT) AS x1,
         |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
         |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS HUGEINT) AS x2,
         |    CAST(CASE WHEN n_chars >= 320 THEN 1000000 ELSE 0 END AS HUGEINT) AS y6
         |  FROM documents
         |), e0 AS (SELECT CAST(0 AS HUGEINT) AS w1, CAST(0 AS HUGEINT) AS w2,
         |  CAST(0 AS HUGEINT) AS b)""".stripMargin
    val steps = (1 to epochs).map { k =>
      s""", g$k AS (
         |  SELECT e.w1, e.w2, e.b,
         |    sum((e.w1*f.x1 + e.w2*f.x2 + e.b - f.y6)*f.x1) AS s1,
         |    sum((e.w1*f.x1 + e.w2*f.x2 + e.b - f.y6)*f.x2) AS s2,
         |    sum(e.w1*f.x1 + e.w2*f.x2 + e.b - f.y6) AS sb, count(*) AS n
         |  FROM e${k - 1} e, f GROUP BY e.w1, e.w2, e.b
         |), e$k AS (
         |  SELECT w1 - (2*s1) // (n*$lrw) AS w1, w2 - (2*s2) // (n*$lrw) AS w2,
         |    b - (2*sb) // (n*$lrb) AS b FROM g$k
         |)""".stripMargin
    }.mkString
    base + steps +
      s"""
         |SELECT f.doc_id,
         |  CAST(e.w1*f.x1 + e.w2*f.x2 + e.b AS BIGINT) AS score_e6
         |FROM f, e$epochs e""".stripMargin
  }

  /** t27 replay: the t11 merge chain to v`rounds`, then every corpus
    * token joins its word's final symbol count and sums per document —
    * [[Bpe.encodeTokensByRounds]] exactly (the words CTE is the same
    * distinct-word universe; tokens of length 0 are excluded on both
    * sides; docs whose every token vanished keep 0 via the left join). */
  private def bpeEncodeOracleSql(rounds: Int): String =
    bpeChainCtes(rounds) +
      s"""
         |, tokd AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w
         |  FROM documents
         |), per AS (
         |  SELECT t.doc_id, sum(len(v.symbols)) AS n
         |  FROM tokd t JOIN v$rounds v USING (w)
         |  WHERE len(t.w) > 0
         |  GROUP BY t.doc_id
         |)
         |SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin

  /** t31 replay: the t27 chain + per-doc whitespace/char counts,
    * rolled up per language with integer fertility/compression
    * ratios on the group sums. */
  private def bpeFertilityOracleSql(rounds: Int): String =
    bpeChainCtes(rounds) +
      s"""
         |, tokd AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w
         |  FROM documents
         |), per AS (
         |  SELECT t.doc_id, sum(len(v.symbols)) AS n
         |  FROM tokd t JOIN v$rounds v USING (w)
         |  WHERE len(t.w) > 0
         |  GROUP BY t.doc_id
         |), base AS (
         |  SELECT d.doc_id, d.lang,
         |    len(string_split_regex(trim(d.text), ' +')) AS ws,
         |    d.n_chars, coalesce(p.n, 0) AS bpe
         |  FROM documents d LEFT JOIN per p USING (doc_id)
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |  CAST((sum(bpe) * 10000) // sum(ws) AS BIGINT) AS fertility_e4,
         |  CAST((sum(n_chars) * 10000) // sum(bpe) AS BIGINT)
         |    AS chars_per_bpe_e4
         |FROM base GROUP BY lang""".stripMargin

  /** ONE definition of the t4 quality-score replay SQL — the f-CTE
    * feature block and the e4-floored blend that every oracle
    * replaying [[TextAnalysis.qualityScore]] interpolates (six sites
    * across TextQueries/DedupQueries): a weight, stopword-set or
    * punctuation-class tweak lands here or nowhere, so no oracle can
    * desynchronize from the engine formula. */
  private[ext] lazy val qualityFColsSql: String =
    """CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS ntok,
      |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
      |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS hits,
      |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
      |    CAST(length(text) AS DOUBLE) AS nchars""".stripMargin

  private[ext] lazy val qualityBlendE4Sql: String =
    """CAST(floor((least(ntok/64.0, 1.0)*0.4 + (hits/greatest(ntok, 1.0))*0.4 +
      |      (1.0 - punct/greatest(nchars, 1.0))*0.2) * 10000) AS BIGINT)""".stripMargin

  /** Shared t43/t45 replay prefix: the t4 quality formula, the
    * [[Splits.scoreBucketThresholds]] integer threshold rule
    * (smallest v with cc·10 ≥ i·n) and the strictly-greater bucket
    * assignment — ONE definition so the two consumers cannot drift.
    * Ends at `b` = (doc_id, source, qe, bucket). */
  private lazy val qualityDecileCtes: String =
    s"""f AS (
      |  SELECT doc_id, source,
      |    $qualityFColsSql
      |  FROM documents
      |), q AS (
      |  SELECT doc_id, source,
      |    $qualityBlendE4Sql AS qe
      |  FROM f
      |), h AS (
      |  SELECT qe AS v, count(*) AS c FROM q GROUP BY 1
      |), cum AS (
      |  SELECT v, sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      |  FROM h
      |), nn AS (
      |  SELECT count(*) AS n FROM q
      |), th AS (
      |  SELECT t.i AS i, min(cum.v) AS tv
      |  FROM range(1, 10) t(i), nn, cum
      |  WHERE cum.cc * 10 >= t.i * nn.n GROUP BY t.i
      |), b AS (
      |  SELECT q.doc_id, q.source, q.qe,
      |    1 + (SELECT count(*) FROM th WHERE q.qe > th.tv) AS bucket
      |  FROM q
      |)""".stripMargin
}
