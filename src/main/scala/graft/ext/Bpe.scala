package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training — the
  * canonical "train the tokenizer on the corpus" step of an LLM data
  * pipeline, expressed Spark-first.
  *
  * Training operates on the WORD-FREQUENCY table, not the raw corpus
  * (standard BPE): the corpus collapses to `(word, freq)` in one
  * aggregation — at 100 TB the vocab is millions of rows, not
  * trillions — and every merge round is then
  * `explode adjacent pairs → sum(freq) → argmax` (one distributed
  * aggregation; only the single winning pair returns to the driver) +
  * a per-word fold applying the merge. Rounds are lineage-truncated
  * (`localCheckpoint`) so the plan stays constant-size (the iterative
  * loop rule).
  *
  * Merge application inside a round is a higher-order `aggregate` fold
  * per word — greedy left-to-right, the standard BPE overlap rule
  * ("aaa" + merge (a,a) → [aa, a]). Encoding with a trained merge list
  * is inherently per-word sequential, so [[encodeTokens]] uses the
  * mapPartitions escape hatch (same rationale as the multimodal codec
  * seam) with a per-partition memo cache — each DISTINCT word is
  * encoded once per partition.
  */
object Bpe {

  /** (symbols array<string>, freq) word table from a document corpus. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))
      .select(
        filter(split(col("w"), ""), c => length(c) > 0).as("symbols"),
        col("freq"))

  /** Greedy left-to-right application of ONE merge to a symbol array. */
  private def mergePair(sym: Column, a: String, b: String): Column =
    aggregate(
      sym,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges; stops early when no adjacent pair reaches
    * `minFreq`. Ties break deterministically (freq desc, then pair
    * lexicographic) so training is reproducible on any layout. */
  def train(
      docs: DataFrame, textCol: String,
      numMerges: Int, minFreq: Long = 2L): Seq[(String, String)] = {
    var v = vocab(docs, textCol).localCheckpoint(true)
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = v
        .select(
          explode(zip_with(
            slice(col("symbols"), lit(1), size(col("symbols")) - 1),
            slice(col("symbols"), lit(2), size(col("symbols")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getAs[Long]("n") < minFreq) done = true
      else {
        val (a, b) = (top.head.getAs[String]("a"), top.head.getAs[String]("b"))
        merges += ((a, b))
        val next = v.select(
          mergePair(col("symbols"), a, b).as("symbols"), col("freq"))
        // r14: cut lineage every 3 rounds instead of every round — an
        // eager localCheckpoint is a full materialization job, and at
        // ≤3 nested fold lambdas the plan stays far below the
        // expression-tree blowup the per-round cut guarded against
        // (encodeTokensByRounds already runs a 4-round cadence);
        // two-thirds of the checkpoint jobs drop from training
        v = if (merges.length % 3 == 0) next.localCheckpoint(true) else next
      }
    }
    merges.toSeq
  }

  /** Pure single-word BPE encode against ranked merges (driver/executor
    * helper; greedy lowest-rank-first, the standard algorithm). Splits
    * by CODE POINT — Java regex (and therefore the training-side
    * `split(w, "")`) never splits inside a surrogate pair, so encode
    * must not either or non-BMP merges would never apply. */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var sym = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var continue = sym.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < sym.length - 1) {
        val r = ranks.getOrElse((sym(i), sym(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        sym = (sym.take(bestAt) :+ (sym(bestAt) + sym(bestAt + 1))) ++
          sym.drop(bestAt + 2)
        continue = sym.length > 1
      }
    }
    sym
  }

  /** (doc_id, n_bpe_tokens) by ROUND-BASED application of a trained
    * merge list — the declarative twin of [[encodeTokens]]: merge k
    * applies everywhere before merge k+1, the exact transformation
    * [[train]] performs while discovering the list, so the
    * segmentation equals the training-time vocab state after the last
    * round (BpeSpec pins equality with the rank-greedy [[encodeWord]]
    * path on the fixture corpus). The per-word fold runs over the
    * DISTINCT-WORD frame (each word folded once per merge, lineage cut
    * every few rounds); symbol counts then join back onto the token
    * stream by word — a shuffle join (the vocab may exceed broadcast
    * size at 100 TB) plus one per-doc sum. */
  def encodeTokensByRounds(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .distinct()
      .select(col("w"),
        filter(split(col("w"), ""), c => length(c) > 0).as("symbols"))
    val vN = merges.zipWithIndex.foldLeft(words) {
      case (v, ((a, b), i)) =>
        val next = v.select(col("w"), mergePair(col("symbols"), a, b).as("symbols"))
        // cut lineage every 4 rounds: 12 nested fold lambdas in one
        // projection would otherwise blow the expression tree
        if ((i + 1) % 4 == 0) next.localCheckpoint(true) else next
    }
    val wlen = vN.select(col("w"), size(col("symbols")).cast("long").as("n_sym"))
    val toks = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(coalesce(col(textCol), lit("")))).as("w"))
      .where(length(col("w")) > 0)
    val per = toks.join(wlen, "w")
      .groupBy("doc_id").agg(sum("n_sym").as("n_bpe_tokens"))
    docs.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** (doc_id, n_bpe_tokens) per document under a trained merge list.
    * mapPartitions seam with a per-partition word→count memo — each
    * distinct word is BPE-encoded once per partition, and only two
    * scalars per row cross the boundary. */
  def encodeTokens(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val b = spark.sparkContext.broadcast(ranks)
    docs
      // null-safe like the column operators: null text counts 0 tokens,
      // rows without an id are unencodable and dropped
      .where(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = b.value
        val memo = collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          val n = text.trim.split(" +").iterator.filter(_.nonEmpty)
            .map(w => memo.getOrElseUpdate(w, encodeWord(w, r).length))
            .sum
          (id, n.toLong)
        }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
