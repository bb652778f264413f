package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB case:
  *
  *  - exact: hash-groupBy on a content digest — one shuffle keyed by the
  *    digest, uniform by construction (md5), no skew.
  *  - MinHash+LSH: per-doc signature is a pure projection (scales with
  *    the scan); candidate generation is a self-equi-join on (band,
  *    band_hash) buckets — only colliding docs meet, so the shuffle
  *    carries |docs|×bands rows, not |docs|² pairs. Oversized buckets
  *    (degenerate content, e.g. empty docs) are capped to keep any
  *    single reducer bounded.
  *  - SimHash: 64-bit signature via per-token bit voting, candidates via
  *    16-bit chunk collision (any pair within Hamming distance 3 shares
  *    ≥1 of 4 chunks — pigeonhole), verified with bit_count(xor).
  *
  * Everything is `functions._` expressions — no UDFs — so signatures are
  * computed inside WholeStageCodegen next to the parquet scan.
  */
object Dedup {
  import TextAnalysis.tokens

  // ---- MinHash ----------------------------------------------------------

  /** Word w-shingles of a document (w consecutive tokens, space-joined). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    when(
      size(toks) >= w,
      transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** k independent min-hashes: h_i(doc) = min over shingles of
    * xxhash64(i, shingle). One expression per hash → k×|shingles| hashes
    * per row, all codegen'd. k=64 ≈ ±12% Jaccard error. */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))): _*)

  /** LSH banding: split the k-wide signature into `bands` bands of
    * k/bands rows and hash each band. Docs sharing any band hash are
    * candidate near-duplicates. bands=16, rows=4 ⇒ catches J≳0.5. */
  def bandHashes(sig: Column, bands: Int = 16, k: Int = 64): Column = {
    val rows = k / bands
    array((0 until bands).map(b =>
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))
          .as("bh"))): _*)
  }

  /** Exact Jaccard between two shingle arrays (verification step). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** End-to-end MinHash-LSH near-dup pairs over (id, text).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    * maxBucket bounds any LSH bucket (skew guard at scale).
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    val base = docs.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    // Materialize the signature as its own projection step: band hashes
    // reference `sig` as a column, so the 64-wide minhash expression is
    // evaluated once per row. (Inlining it would copy the whole
    // signature tree into every band expression — 64× the hashing and a
    // codegen blowup; Catalyst's CollapseProject keeps multiply-
    // referenced non-cheap aliases materialized.)
    val sigs = base
      .select(col("id"), minhashSignature(col("sh"), k).as("sig"))
      .select(col("id"), explode(bandHashes(col("sig"), bands, k)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    // skew guard: drop degenerate buckets (e.g. near-identical boiler-
    // plate) so no reducer sees O(bucket²) pairs
    val bucketed = sigs.withColumn(
      "bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .where(col("bsz") <= maxBucket)
    // candidates carry ids only — document content joins back in just
    // for the surviving pairs (at 100 TB the shuffle is |docs|×bands
    // skinny rows + |candidates| wide rows, never |docs|² anything)
    val l = bucketed.select(col("band"), col("bh"), col("id").as("id_a"))
    val r = bucketed.select(col("band"), col("bh"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash: per-token 64-bit hash votes +1/-1 per bit position;
    * sign of the per-bit sum forms the signature. Order-insensitive. */
  def simhash(text: Column): Column = {
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(
        acc,
        transform(
          sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(t), b)
            .bitwiseAND(1) === 1, 1).otherwise(-1)),
        (a, v) => a + v))
    aggregate(
      zip_with(
        votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b))
          .otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within Hamming distance `maxDist` (< 16):
    * candidates via 4×16-bit chunk equality (pigeonhole over 4 chunks
    * guarantees recall for maxDist ≤ 3), verified by popcount(xor). */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigs.select(
      col("id"), col("sig"),
      explode(array((0 until 4).map(c =>
        struct(
          lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFF).as("ch"))): _*))
        .as("c"))
      .select(col("id"), col("sig"), col("c.chunk").as("chunk"), col("c.ch").as("ch"))
    val l = chunked.select(col("chunk"), col("ch"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("ch"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "ch"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("dist"))
      .dropDuplicates("id_a", "id_b")
      .where(col("dist") <= maxDist)
  }

  // ---- n-gram Jaccard (exact, no sketch) --------------------------------

  /** Exact n-gram Jaccard similarity for all candidate pairs sharing at
    * least one shingle (inverted-index join — the exact-match analog of
    * LSH; shuffle is keyed by shingle, capped per shingle for skew). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, w: Int = 3, maxPostings: Int = 1000): DataFrame = {
    val withSh = docs.select(
      col(idCol).as("id"), array_distinct(shingles(col(textCol), w)).as("sh"))
    // inverted index carries ids only (posting lists are skinny); shingle
    // sets join back in for surviving candidate pairs — same shuffle
    // discipline as minhashPairs
    val inverted = withSh
      .select(col("id"), explode(col("sh")).as("g"))
      .withColumn("psz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .where(col("psz") <= maxPostings)
    val l = inverted.select(col("g"), col("id").as("id_a"))
    val r = inverted.select(col("g"), col("id").as("id_b"))
    l.join(r, Seq("g"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
