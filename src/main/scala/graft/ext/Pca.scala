package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding corpus via one-pass integer
  * covariance + deterministic power iteration — the dim-reduction /
  * whitening primitive of an embedding pipeline (dominant-direction
  * removal, ABTT-style post-processing, PCA-guided IVF cell axes).
  *
  * Shape at 100 TB: the ONLY data-scale pass is the moment aggregation —
  * each row projects to a flat array of dim first-moment terms and
  * dim·(dim+1)/2 upper-triangular products, exploded to skinny
  * (pos, value) rows that Spark's partial hash aggregate collapses to
  * ≤ dim·(dim+3)/2 rows PER PARTITION before the one shuffle (the
  * classic treeAggregate shape, expressed declaratively). The driver
  * then iterates a dim×dim integer matrix (64×64 = 32 KB — matrix size
  * is dim², never data-scale; the collect is the k×dim-class bounded
  * collect of the Lloyd trainers).
  *
  * Determinism / oracle replayability (the Lloyd playbook, Similarity
  * .scala):
  *  - inputs quantize to e4 integers (`round(x·10⁴)` — BIGINT sums
  *    stay exact to n ≈ 5·10⁹ rows at |x| ≤ 4; the moment pass is the
  *    only place corpus size enters);
  *  - the covariance-scaled matrix M_ij = n·Σxy − Σx·Σy is normalized
  *    to e6 integers by truncating division with its own max |M_ij)|
  *    (both engines truncate toward zero: Scala BigInt `/`, DuckDB
  *    `//`);
  *  - power iteration runs a FIXED round count (default 60) from the
  *    all-1e6 vector, renormalizing by max |w_i| with the same
  *    truncating division — every intermediate is an exact integer, so
  *    an independent SQL engine replays the whole computation
  *    bit-for-bit ([[PcaOracle]]).
  *
  * Convergence: fixed-round power iteration approaches the top
  * eigenvector at rate (λ₂/λ₁)ᵗ; what dominant-direction removal needs
  * is the RAYLEIGH QUOTIENT, which converges quadratically faster. On
  * the near-isotropic synthetic fixture (λ₁/λ₂ = 1.013, the hard case)
  * 60 rounds reach R(v)/λ₁ = 0.998 (cos 0.95 to the exact top
  * eigenvector; measured against numpy's eigh). The sign of the result
  * follows the iteration, identically in both engines.
  */
object Pca {

  /** (dim_idx 1-based, eig_e6) — the dominant eigenvector of the
    * e4-quantized covariance moments, e6-normalized to max |v_i| = 1e6. */
  def topComponent(
      spark: SparkSession, emb: DataFrame, vecCol: String, dim: Int,
      iters: Int = 60, scale: Long = 10000L): DataFrame = {
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val q = emb.select(
      transform(col(vecCol), x => round(x.cast("double") * scale)
        .cast("long")).as("e"))
    // flat moment vector per row: [1, x_1..x_dim, x_i*x_j for i<=j] —
    // the count rides along at pos 0, so ONE distributed pass yields
    // every moment
    val flat = q.select(posexplode(concat(
      array(lit(1L)),
      col("e"),
      flatten(transform(
        sequence(lit(1), lit(dim)),
        i => transform(
          sequence(i, lit(dim)),
          j => element_at(col("e"), i) * element_at(col("e"), j)))))))
    val sums = flat.groupBy(col("pos")).agg(sum(col("col")).as("s"))
      .orderBy("pos")
      .as[(Int, Long)]
      .collect()
    require(sums.length == 1 + dim + nPairs,
      s"moment pass returned ${sums.length}")
    val n = BigInt(sums(0)._2)
    val first = sums.slice(1, dim + 1).map(t => BigInt(t._2))
    val m = Array.ofDim[BigInt](dim, dim)
    var idx = dim + 1
    for (i <- 0 until dim; j <- i until dim) {
      val v = n * BigInt(sums(idx)._2) - first(i) * first(j)
      m(i)(j) = v
      m(j)(i) = v
      idx += 1
    }
    val maxAbs = m.flatten.map(_.abs).max.max(BigInt(1))
    val e6 = BigInt(1000000)
    val c = m.map(_.map(v => v * e6 / maxAbs)) // BigInt / truncates to zero
    var vec = Array.fill(dim)(e6)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * vec(j)).sum)
      val wMax = w.map(_.abs).max.max(BigInt(1))
      vec = w.map(_ * e6 / wMax)
    }
    vec.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v.toLong) }
      .toSeq.toDF("dim_idx", "eig_e6")
  }

  /** Remove the component along `eigE6` (the all-but-the-top trick):
    * x ← x − (x·v̂)v̂ with v̂ the e6 eigenvector renormalized in double.
    * A pure projection — composes with any downstream ANN/dedup pass. */
  def removeComponent(
      emb: DataFrame, vecCol: String, eigE6: Array[Long]): DataFrame = {
    val norm = math.sqrt(eigE6.map(v => v.toDouble * v).sum)
    val unit = eigE6.map(_ / norm)
    val unitCol = array(unit.toIndexedSeq.map(lit(_)): _*)
    // dot via the codegen'd VectorDot — the same left-to-right double
    // fold as the `aggregate(zip_with(...))` formulation (so the s14
    // oracle's list_sum replay still matches bit-for-bit), minus the
    // interpreted per-element lambda cost
    val dot = Similarity.dot(col(vecCol), unitCol)
    // residual as an EXPLICIT per-index array: `_dot` is referenced
    // dim times, which stops CollapseProject from inlining it back
    // into the projection — a single-reference zip_with lambda gets
    // collapsed and silently re-runs the whole fold per element
    // (verified on this Spark: the "materialize in a prior
    // projection" trick alone is a no-op for HOF lambdas)
    emb.withColumn("_dot", dot)
      .withColumn(
        vecCol,
        array(unit.indices.map(i =>
          (element_at(col(vecCol), i + 1).cast("double") -
            col("_dot") * lit(unit(i))).cast("float")): _*))
      .drop("_dot")
  }
}
