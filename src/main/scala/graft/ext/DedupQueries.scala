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

    // duplicated-span profile: per-document count of 8-gram positions
    // shared with other documents (the n-gram view of exact substring
    // dedup). Gram digests are md5-of-text so the oracle replays the
    // identical grouping; the oracle's positions table emulates the
    // explode.
    Q(
      "d12_dup_span_profile",
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM tok))) AS i
        |), grams AS (
        |  SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS g
        |  FROM tok JOIN pos ON i <= len(t) - 7
        |), shared AS (
        |  SELECT g FROM (
        |    SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
        |  WHERE nd >= 2
        |)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN g IN (SELECT g FROM shared) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_spans
        |FROM grams GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dupSpanProfile(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 8)
    },

    // span-level dedup transform: cut every token covered by a
    // cross-document duplicate 8-gram, hash the cleaned text. The
    // oracle replays positions/coverage with the same window and
    // string_agg-in-position-order.
    Q(
      "d13_dedup_spans",
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
        |), pos AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(t)) AS INT) FROM tok))) AS i
        |), tp AS (
        |  SELECT doc_id, i - 1 AS p, t[i] AS tk FROM tok JOIN pos ON i <= len(t)
        |), grams AS (
        |  SELECT doc_id, i - 1 AS q, md5(array_to_string(t[i:i+7], ' ')) AS g
        |  FROM tok JOIN pos ON i <= len(t) - 7
        |), shared AS (
        |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
        |    FROM grams GROUP BY g) WHERE nd >= 2
        |), starts AS (
        |  SELECT doc_id, q FROM grams WHERE g IN (SELECT g FROM shared)
        |), flags AS (
        |  SELECT tp.doc_id, tp.p, tp.tk,
        |    CASE WHEN s.q IS NOT NULL THEN 1 ELSE 0 END AS st
        |  FROM tp LEFT JOIN starts s ON tp.doc_id = s.doc_id AND tp.p = s.q
        |), cov AS (
        |  SELECT doc_id, p, tk,
        |    max(st) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
        |  FROM flags
        |)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(tk, ' ' ORDER BY p) FILTER (WHERE c = 0), ''))
        |    AS clean_hash,
        |  CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(c) AS BIGINT) AS n_removed
        |FROM cov GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dedupSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 8)
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
    // Oracle-able because the result is EXACT set math, not a sketch:
    // DuckDB brute-forces all |docs|² shingle-set intersections (fine at
    // oracle scale; the Spark side never materializes pairs without a
    // shared shingle). Hash-vs-string shingle identity coincides up to
    // pmd5 (60-bit md5) collisions (~1e-9 at this corpus size).
    Q(
      "d5_ngram_jaccard_pairs",
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
        |)
        |SELECT id_a, id_b,
        |  CAST(round(round(CAST(shared AS DOUBLE)/CAST(na + nb - shared AS DOUBLE), 4)*10000) AS BIGINT) AS jaccard_e4
        |FROM p
        |WHERE shared > 0
        |  AND CAST(shared AS DOUBLE)/CAST(na + nb - shared AS DOUBLE) >= 0.8""".stripMargin) {
      (s, dir) =>
        // uncapped: the oracle has no postings cap, and the EXACTNESS of
        // this query is its contract (the capped variant is the
        // documented skew-guard scale path, exercised in DedupSpec)
        Dedup.ngramJaccardPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.8, maxPostings = Int.MaxValue)
          .select(
            col("id_a"), col("id_b"),
            round(col("jaccard") * 10000).cast("long").as("jaccard_e4"))
    },

    // exact dedup with survivor policy: keep the best-quality copy
    // (training-pipeline keep-best vs d1's keep-first). The corpus has no
    // exact dups, so the query plants them — a shifted-id union — the
    // same on both engines.
    Q(
      "d7_dedup_keep_best",
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
        |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS hits,
        |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    md5(text) AS content_hash
        |  FROM d
        |), sc AS (
        |  SELECT doc_id, content_hash,
        |    CAST(floor((least(ntok/64.0, 1.0)*0.4 + (hits/greatest(ntok, 1.0))*0.4 +
        |      (1.0 - punct/greatest(nchars, 1.0))*0.2) * 10000) AS BIGINT) AS score
        |  FROM f
        |), r AS (
        |  SELECT doc_id, content_hash, score,
        |    row_number() OVER (PARTITION BY content_hash
        |      ORDER BY score DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY content_hash) AS n_dups
        |  FROM sc
        |)
        |SELECT doc_id, content_hash, score, CAST(n_dups AS BIGINT) AS n_dups
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.dedupKeepBest(
        doubled, "doc_id", "text",
        floor(TextAnalysis.qualityScore(col("text")) * 10000).cast("long"))
    },

    // near-dup clustering: connected components over the exact-Jaccard
    // pair graph (pairs -> dedup groups, representative = min id). The
    // oracle replays it with a recursive CTE (transitive reachability,
    // min reachable id == the min-label fixpoint).
    Q(
      "d8_neardup_clusters",
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
        |)
        |SELECT a AS id, min(lbl) AS cluster_id FROM walk GROUP BY a""".stripMargin) {
      (s, dir) =>
        Dedup.nearDupClusters(
          Dedup.ngramJaccardPairs(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            threshold = 0.8, maxPostings = Int.MaxValue))
    },

    // the complete corpus dedup: near-dup pairs -> clusters -> best
    // survivor per cluster (quality argmax, id tiebreak), singletons
    // kept. One row per survivor; the oracle composes the d8 recursive
    // CTE with the t4 quality expression and a survivor window.
    Q(
      "d9_dedup_corpus",
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
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS hits,
        |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
        |    CAST(length(text) AS DOUBLE) AS nchars
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    CAST(floor((least(ntok/64.0, 1.0)*0.4 + (hits/greatest(ntok, 1.0))*0.4 +
        |      (1.0 - punct/greatest(nchars, 1.0))*0.2) * 10000) AS BIGINT) AS score
        |  FROM f
        |), j AS (
        |  SELECT q.doc_id AS id, coalesce(cl.cluster_id, q.doc_id) AS cluster_id,
        |    q.score
        |  FROM q LEFT JOIN cl ON cl.id = q.doc_id
        |), r AS (
        |  SELECT id, cluster_id, score,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY score DESC, id ASC) AS rn,
        |    count(*) OVER (PARTITION BY cluster_id) AS n_members
        |  FROM j
        |)
        |SELECT id AS keep_id, cluster_id, score,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      Dedup.dedupCorpusByNgram(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        floor(TextAnalysis.qualityScore(col("text")) * 10000).cast("long"),
        threshold = 0.8, maxPostings = Int.MaxValue)
    },

    // benchmark decontamination: per-doc fraction of shingles appearing
    // in an eval set (here: docs 0..9 stand in as the benchmark — the
    // same on both engines). Benchmark docs self-report 10000.
    Q(
      "d10_contamination",
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
        |), bench AS (
        |  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id < 10
        |), d AS (
        |  SELECT doc_id, unnest(sh) AS g FROM s
        |), hits AS (
        |  SELECT doc_id, count(*) AS bench_hits
        |  FROM d JOIN bench USING (g) GROUP BY doc_id
        |), tot AS (
        |  SELECT doc_id, len(sh) AS n FROM s
        |)
        |SELECT t.doc_id AS id, CAST(t.n AS BIGINT) AS n_shingles,
        |  CAST(coalesce(h.bench_hits, 0) AS BIGINT) AS bench_hits,
        |  CAST(floor(CAST(coalesce(h.bench_hits, 0) AS DOUBLE) /
        |    CAST(t.n AS DOUBLE) * 10000) AS BIGINT) AS contamination_e4
        |FROM tot t LEFT JOIN hits h USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.contamination(
        docs, "doc_id", "text",
        docs.where(col("doc_id") < 10), "text")
    },

    // embedding-space corpus dedup: the d9 composition with sign-LSH
    // cosine candidates; survivor = highest-norm vector (LSH + xxhash
    // internals -> rows-only; composition pieces pinned by specs).
    // Bucket geometry auto-derives from corpus size (planesPerBand =
    // ceil(log2(n/64))) and oversized buckets are capped — the scale
    // guards DedupSpec pins.
    Q.noOracle("d11_dedup_corpus_cosine") { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      Dedup.dedupCorpusByCosine(
        e, "vec_id", "embedding",
        round(Similarity.norm(col("embedding")) * 1e6).cast("long"),
        threshold = 0.4)
    },

    // embedding-cosine near-dup pairs, banded-LSH-bucketed. Threshold
    // 0.4 because the synthetic corpus's most-similar pair is ~0.51 —
    // the operator's contract (pairs ≥ t found via bucket collision) is
    // the same at any t. Geometry auto-derives from corpus size and
    // buckets are size-capped (the Θ(n²) guard), so the candidate count
    // stays ~n·targetBucket at any scale.
    Q.noOracle("d6_embedding_neardup") { (s, dir) =>
      Similarity.cosineNearDupPairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4)
    },

    // incremental dedup: an arriving batch (doc_id >= 250) against the
    // accumulated corpus (doc_id < 250) — anti-join on the content
    // digest, then keep-first within the batch. The production shape
    // for a continuous crawl: the corpus never rescans, only its digest
    // column joins.
    Q(
      "d14_incremental_dedup",
      """WITH c AS (
        |  SELECT DISTINCT md5(text) AS content_hash FROM documents
        |  WHERE doc_id < 250
        |), b AS (
        |  SELECT doc_id, md5(text) AS content_hash FROM documents
        |  WHERE doc_id >= 250
        |)
        |SELECT min(doc_id) AS keep_id, content_hash,
        |  count(*) AS n_batch_dups
        |FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.content_hash = b.content_hash)
        |GROUP BY content_hash""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.dedupAgainstCorpus(
        docs.where(col("doc_id") >= 250), "doc_id", "text",
        docs.where(col("doc_id") < 250), "text")
    },

    // winnowing near-dup pairs: substring-level detector on the t19
    // fingerprints — a shared run of w+k-1=6 tokens forces a shared
    // fingerprint (MOSS guarantee), at ~2/(w+1) the postings of d5's
    // full shingle index. Exact (no seeds) -> fully oracled, same
    // maxPostings skew cap as d5.
    Q(
      "d15_winnow_pairs",
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
        |), rare AS (
        |  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000
        |), c AS (
        |  SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM c a JOIN c b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      Dedup.winnowPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        minShared = 2, k = 3, w = 4, maxPostings = 1000)
    },

    // winnow-based corpus dedup: the d9/d11 composition with the
    // substring-level candidate generator — completes the generator
    // family (ngram set overlap / embedding cosine / winnow substring)
    // over the identical clustering + best-survivor tail. Oracle =
    // d15's fingerprint CTEs + d9's recursive reachability + survivor
    // selection.
    Q(
      "d16_dedup_corpus_winnow",
      """WITH RECURSIVE toks AS (
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
        |), rare AS (
        |  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000
        |), c AS (
        |  SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
        |), pr AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM c a JOIN c b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr
        |), walk(a, lbl) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.a, w.lbl FROM edges e JOIN walk w ON e.b = w.a
        |), cl AS (
        |  SELECT a AS id, min(lbl) AS cluster_id FROM walk GROUP BY a
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
        |      x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS hits,
        |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
        |    CAST(length(text) AS DOUBLE) AS nchars
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    CAST(floor((least(ntok/64.0, 1.0)*0.4 + (hits/greatest(ntok, 1.0))*0.4 +
        |      (1.0 - punct/greatest(nchars, 1.0))*0.2) * 10000) AS BIGINT) AS score
        |  FROM f
        |), j AS (
        |  SELECT q.doc_id AS id, coalesce(cl.cluster_id, q.doc_id) AS cluster_id,
        |    q.score
        |  FROM q LEFT JOIN cl ON cl.id = q.doc_id
        |), r AS (
        |  SELECT id, cluster_id, score,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY score DESC, id ASC) AS rn,
        |    count(*) OVER (PARTITION BY cluster_id) AS n_members
        |  FROM j
        |)
        |SELECT id AS keep_id, cluster_id, score,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      Dedup.dedupCorpusByWinnow(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        floor(TextAnalysis.qualityScore(col("text")) * 10000).cast("long"),
        minShared = 2, k = 3, w = 4, maxPostings = 1000)
    },

    // SemDeDup: k-means-cell semantic dedup over the embedding corpus
    // (the clustering-cell alternative to d11's sign-LSH banding; cell
    // assignment is seeded k-means → rows-only, recall + planted-dup
    // behavior spec-pinned).
    Q.noOracle("d18_semdedup") { (s, dir) =>
      // threshold 0.4 like d11: the synthetic corpus's most-similar
      // pair is ~0.51, so a 0.9 threshold would test nothing
      val emb = Tables.load(s, dir, "embeddings")
      Dedup.semDedup(
        emb, "vec_id", "embedding",
        round(graft.ext.Similarity.norm(col("embedding")) * 1e6)
          .cast("long"),
        threshold = 0.4, k = 16, dim = Some(64))
    },

    // edit-distance (fuzzy) near-dup pairs over 64-char normalized
    // heads. Uncapped postings here — the q-gram COUNT filter is
    // LOSSLESS for ≥ q·(maxDist+1)-char heads, so the oracle can be
    // the brute-force length-banded levenshtein join; the capped
    // variant is the documented skew-guard scale path (DedupSpec).
    // q=8 over this low-entropy corpus: the count threshold (shared ≥
    // maxGlen − q·d) is what keeps the verify set ≈ true pairs.
    Q(
      "d17_fuzzy_pairs",
      """WITH n AS (
        |  SELECT doc_id,
        |    substr(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
        |      1, 64) AS h
        |  FROM documents
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.h, b.h) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.h) - length(b.h)) <= 3
        |  AND levenshtein(a.h, b.h) <= 3""".stripMargin) { (s, dir) =>
      Dedup.fuzzyPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        maxDist = 3, headLen = 64, q = 8, maxPostings = Int.MaxValue)
    }
  )
}
