package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: concatenate the corpus
  * in stable id order and cut it into fixed-size token chunks
  * ("concat-and-chunk" — the packing strategy most pretraining loaders
  * use). Each document is assigned the [chunk_start, chunk_end] range of
  * training sequences its tokens land in.
  *
  * Scale design: the obvious formulation — `sum(ntok) OVER (ORDER BY
  * id)` — is a GLOBAL window, which Spark executes on a single
  * partition: a non-starter at 100 TB. This is the classic two-phase
  * parallel prefix sum instead:
  *
  *  1. coarse buckets (`id div bucketWidth`) are aggregated to one
  *     subtotal row each — a normal distributed aggregation;
  *  2. the tiny subtotal frame (corpus_size / bucketWidth rows) takes
  *     the global window — single-partition, but over kilobytes;
  *  3. bucket offsets broadcast-join back and an in-bucket window
  *     (partitioned by bucket — fully parallel) finishes the cumsum.
  *
  * The result is identical to the serial cumsum (PackingSpec pins this)
  * while every per-row stage stays partition-parallel.
  */
object Packing {

  /** Overlapping sliding-window chunking (the RAG/embedding chunker):
    * each document yields windows of `chunkSize` tokens starting every
    * `stride` tokens (overlap = chunkSize − stride); the final window
    * clamps at the document end. Pure explode + projection — no
    * shuffle; chunk identity is the md5 of the space-joined window so
    * chunk-level dedup/lineage works downstream. Output: idCol,
    * chunk_idx, chunk_hash, n_tokens. */
  def chunkOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"chunkOverlap: need 0 < stride <= chunkSize (got $stride, $chunkSize)")
    docs
      // length guard, not size: split(trim(""), " +") is [""] (size 1),
      // so a size>0 filter would pass empty docs through as a phantom
      // md5("") chunk
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_t"),
        explode(sequence(lit(0),
          floor((size(col("_t")) - 1) / lit(stride)).cast("int")))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("_t"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("_c"))
      .select(col(idCol), col("chunk_idx"),
        md5(array_join(col("_c"), " ").cast("binary")).as("chunk_hash"),
        size(col("_c")).cast("long").as("n_tokens"))
  }

  /** Per-document chunk assignment. Output: idCol, n_tokens,
    * chunk_start, chunk_end (all long). Documents with zero tokens are
    * assigned the zero-width range starting at the next boundary
    * position (chunk_end = chunk_start - 1 would be nonsensical, so
    * they are filtered — a packer emits nothing for an empty doc).
    */
  def packChunks(
      docs: DataFrame,
      idCol: String,
      ntokCol: String,
      chunkSize: Long,
      bucketWidth: Long = 4096L): DataFrame = {
    val b = docs
      .select(col(idCol), col(ntokCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("_bucket", expr(s"$idCol div $bucketWidth"))

    // phase 1: one subtotal per bucket (distributed agg)
    val subtotals = b.groupBy("_bucket").agg(sum("n_tokens").as("_btotal"))

    // phase 2: exclusive prefix over the subtotal frame — a global
    // window, but over |corpus|/bucketWidth rows, not |corpus|.
    val exclusive = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("_offset", coalesce(sum("_btotal").over(exclusive), lit(0L)))
      .select("_bucket", "_offset")

    // phase 3: in-bucket cumsum (parallel across buckets) + offset.
    val inBucket = Window.partitionBy("_bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("_cum", sum(col("n_tokens")).over(inBucket) + col("_offset"))
      .select(
        col(idCol),
        col("n_tokens"),
        expr(s"(_cum - n_tokens) div $chunkSize").as("chunk_start"),
        expr(s"(_cum - 1) div $chunkSize").as("chunk_end"))
  }

  /** Context-length packing sweep — the table a pretraining engineer
    * reads before fixing the sequence length: for each candidate
    * context size, how many documents the concat-and-split packer
    * ([[packChunks]], the GPT-style zero-padding layout) FRAGMENTS
    * across a chunk boundary (a fragmented doc loses cross-boundary
    * attention), how many chunks the corpus yields, and the padding the
    * single final partial chunk carries. All integer math over the one
    * shared (id, ntok) cumsum per length — the serial-window oracle
    * replays every cell.
    *
    * Output, one row per `ctxLens` entry: (ctx_len, n_docs,
    * total_tokens, n_chunks, frag_docs, frag_ppm, pad_tokens). */
  def packingSweep(
      docs: DataFrame, idCol: String, ntokCol: String,
      ctxLens: Seq[Long] = Seq(256L, 512L, 1024L, 2048L),
      bucketWidth: Long = 4096L): DataFrame = {
    require(ctxLens.nonEmpty && ctxLens.forall(_ > 0), "ctxLens must be > 0")
    // the shared frame is two skinny columns off the scan — cheaper to
    // re-read per length than to persist (the |ctxLens| branches would
    // race-populate a lazy cache inside the one union action anyway)
    val base = docs
      .select(col(idCol), col(ntokCol).cast("long").as("ntok"))
      .where(col("ntok") > 0)
    ctxLens.map { l =>
      packChunks(base, idCol, "ntok", chunkSize = l, bucketWidth)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (max(col("chunk_end")) + 1).as("n_chunks"),
          sum(when(col("chunk_start") =!= col("chunk_end"), 1L)
            .otherwise(0L)).as("frag_docs"))
        .select(
          lit(l).as("ctx_len"), col("n_docs"), col("total_tokens"),
          col("n_chunks"),
          col("frag_docs"),
          expr("frag_docs * 1000000 div n_docs").as("frag_ppm"),
          expr(s"($l - total_tokens % $l) % $l").as("pad_tokens"))
    }.reduce(_ unionAll _)
  }

  /** Data selection under a token budget — the "keep the best N tokens"
    * pruning step of a curation pipeline: order documents by
    * (quality score desc, id asc) and keep the prefix whose cumulative
    * token count stays ≤ `budget` (a document is kept iff the running
    * sum INCLUDING it fits).
    *
    * Same two-phase prefix-sum discipline as [[packChunks]], except the
    * buckets must follow the SORT order, so they are score BANDS
    * (`-(score div scoreBand)` — ascending bucket = descending score;
    * equal scores can never straddle a band): per-band subtotals take
    * the tiny global window, in-band cumsums run parallel, and the
    * result is identical to the serial `sum over (ORDER BY score DESC,
    * id)` — t22's oracle IS that single-window SQL. Output: (idCol,
    * score, n_tokens, cum_tokens), the kept rows only. */
  def budgetPrune(
      docs: DataFrame, idCol: String, scoreCol: String, ntokCol: String,
      budget: Long, scoreBand: Long = 500L): DataFrame = {
    require(budget >= 0 && scoreBand > 0,
      s"budgetPrune: bad params (budget=$budget band=$scoreBand)")
    val b = docs
      .select(col(idCol), col(scoreCol).cast("long").as("score"),
        col(ntokCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("_bucket", -expr(s"score div $scoreBand"))
    val subtotals = b.groupBy("_bucket").agg(sum("n_tokens").as("_btotal"))
    val exclusive = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("_offset", coalesce(sum("_btotal").over(exclusive), lit(0L)))
      .select("_bucket", "_offset")
    val inBucket = Window.partitionBy("_bucket")
      .orderBy(col("score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(inBucket) + col("_offset"))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col("score"), col("n_tokens"), col("cum_tokens"))
  }
}
