package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Caches.Registered
import org.apache.spark.storage.StorageLevel

/** Vertex-centric iterative graph computation in the Pregel shape —
  * one join-per-superstep against a persisted edge relation, rank
  * state as a skinny (id, rank) frame. Nothing graph-shaped lives on
  * the driver: at 100 TB the edge relation partitions by `src`, each
  * superstep is one shuffle of the skinny rank frame onto that
  * partitioning, and AQE handles hub-vertex skew. The curation use is
  * duplication-hub scoring: PageRank over the near-dup candidate
  * graph ranks the documents whose content radiates through the
  * corpus (template/boilerplate hubs), a removal-priority signal the
  * pairwise dedup family (d3–d9) cannot see because it scores pairs,
  * not positions in the whole graph.
  */
object Graph {

  /** Integer-exact unnormalized PageRank over an undirected pair list.
    *
    * All arithmetic is BIGINT so the fixpoint prefix is engine-exact:
    * ranks start at `initE9` (1e9 = "1.0"), each superstep a vertex
    * emits `((rank * dampNum) div dampDen) div outdeg` along every
    * incident edge (truncating integer division, identical to DuckDB's
    * `//` on the positive domain), and absorbs `baseE9` plus the sum
    * of incoming contributions. Dangling mass is dropped, not
    * redistributed — the standard simplification, replayed identically
    * by the oracle. Overflow headroom: total mass is ≤ n·initE9, so
    * the multiply stays in Long for corpora to ~10^8 vertices per
    * rank unit; beyond that, lower initE9.
    *
    * The edge relation (directed both ways + outdeg) is persisted and
    * eagerly populated once — every superstep joins against the cached
    * form, so the pair generator (typically
    * [[Dedup.shingleOverlapPairs]]) runs exactly once. Iteration count
    * is a constant (PageRank converges geometrically; 5–20 rounds);
    * each round extends the lineage by one join+agg — for hundreds of
    * rounds a periodic `localCheckpoint` would bound the plan, same as
    * the connected-components loop in [[Dedup]].
    *
    * Output: (id, rank) with rank in e9 units.
    */
  def pageRankInt(
      vertices: DataFrame,
      pairs: DataFrame,
      iterations: Int = 5,
      initE9: Long = 1000000000L,
      baseE9: Long = 150000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointEvery: Int = 8,
      stopDeltaE9: Option[Long] = None): DataFrame = {
    val verts = vertices.select(col(vertices.columns.head).as("id"))
    iterate(
      verts.select(col("id"),
        lit(baseE9).as("base"), lit(initE9).as("init")),
      pairs, iterations, dampNum, dampDen,
      checkpointEvery = checkpointEvery, stopDeltaE9 = stopDeltaE9)
  }

  /** Personalized PageRank: teleport mass lands ONLY on the seed set —
    * rank measures multi-hop proximity TO the seeds through the graph.
    * The curation use is transitive contamination/expansion discovery:
    * d10/d21 find documents that DIRECTLY overlap an eval benchmark;
    * seeding PPR with that benchmark on the shingle-overlap graph also
    * surfaces the paraphrase CHAINS (A overlaps B overlaps the
    * benchmark, but A touches no benchmark shingle itself) that a
    * one-hop screen structurally cannot see. Same integer contract as
    * [[pageRankInt]] with base/init gated to seeds (non-seeds start at
    * 0 and receive no teleport); unreached vertices therefore finish
    * at exactly 0 and callers filter `rank > 0`. Output: (id, rank).
    */
  def personalizedPageRankInt(
      vertices: DataFrame,
      pairs: DataFrame,
      seeds: DataFrame,
      iterations: Int = 5,
      initE9: Long = 1000000000L,
      baseE9: Long = 150000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    val verts = vertices.select(col(vertices.columns.head).as("id"))
    val seedIds = seeds
      .select(col(seeds.columns.head).as("id"), lit(1L).as("is_seed"))
      .distinct()
    val vertsBase = verts
      .join(seedIds, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("is_seed"), lit(0L)) * baseE9).as("base"),
        (coalesce(col("is_seed"), lit(0L)) * initE9).as("init"))
    iterate(vertsBase, pairs, iterations, dampNum, dampDen)
  }

  /** Edge-WEIGHTED PageRank: a vertex splits its damped mass across
    * neighbors in proportion to integer edge weights — on the
    * shingle-overlap graph, weight = shared-shingle count, so a
    * 40-gram template edge pulls 20× the mass of a borderline 2-gram
    * edge and hub scores track overlap DEPTH, not just degree.
    * Contribution along (u→v, w): `(((rank·dampNum) div dampDen)·w)
    * div Σw(u)` — pure BIGINT, same engine-exactness contract
    * (headroom: rank·85·w must stay in Long — fine for corpus-scale
    * weights; renormalize weights if Σrank·maxW nears 2⁶³).
    * `pairs` must carry (id_a, id_b, `weightCol`). With all weights
    * equal this reduces exactly to [[pageRankInt]]. */
  def pageRankWeightedInt(
      vertices: DataFrame,
      pairs: DataFrame,
      weightCol: String,
      iterations: Int = 5,
      initE9: Long = 1000000000L,
      baseE9: Long = 150000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    val verts = vertices.select(col(vertices.columns.head).as("id"))
    iterate(
      verts.select(col("id"),
        lit(baseE9).as("base"), lit(initE9).as("init")),
      pairs, iterations, dampNum, dampDen, weightCol = Some(weightCol))
  }

  /** The shared superstep loop over (id, base, init) vertices. Each
    * superstep is ONE join (the skinny rank frame onto the persisted
    * edge relation) and ONE aggregation — the teleport base term rides
    * the aggregation as union rows rather than a third per-round join,
    * which also keeps every vertex present in the output (a vertex
    * with no in-edges still contributes its base row).
    *
    * The edge relation is VERTEX-RESTRICTED up front (semi-join of
    * both endpoints against the vertex frame): a pair whose endpoint
    * is absent from `vertices` would otherwise appear in the output
    * with no base term and begin radiating mass from superstep 2,
    * diverging from the oracle's verts-restricted formulation. All
    * in-repo pair generators derive from the vertex frame (no-op
    * semi-joins), but the operator no longer relies on that.
    *
    * Lineage control: every `checkpointEvery` supersteps the rank
    * frame `localCheckpoint`s (eager) — the plan would otherwise grow
    * one join+agg per round, and at hundreds of rounds analysis time
    * and driver stack depth dominate. Each checkpoint is a
    * materialization barrier, so the default trades one extra action
    * per 8 rounds for bounded plans; the d22/d23/d25 pack queries run
    * 5 rounds and never hit it.
    *
    * Early exit: `stopDeltaE9 = Some(d)` stops once the max absolute
    * per-vertex rank change of a superstep is ≤ d (integer ranks make
    * d=0 an EXACT fixpoint test). The check is an action per round,
    * so with it enabled EVERY round localCheckpoints first — without
    * that, each check would re-execute the whole uncached segment
    * since the last checkpoint (quadratic recompute) and the returned
    * frame would replay it once more. Opt-in; the fixed-iteration
    * form stays the engine-exact replay contract ([[pageRankInt]]
    * docs). */
  private def iterate(
      vertsBase: DataFrame, pairs: DataFrame, iterations: Int,
      dampNum: Long, dampDen: Long,
      weightCol: Option[String] = None,
      checkpointEvery: Int = 8,
      stopDeltaE9: Option[Long] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val w = weightCol.map(col).getOrElse(lit(1L))
    val vb = vertsBase.persistRegistered()
    val directed = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"),
        w.cast("long").as("w"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"),
        w.cast("long").as("w")))
      .join(vb.select(col("id").as("src")), Seq("src"), "leftsemi")
      .join(vb.select(col("id").as("dst")), Seq("dst"), "leftsemi")
    val sw = directed.groupBy("src").agg(sum(col("w")).as("sw"))
    val edges = directed.join(sw, "src")
      .persistRegistered()
    edges.count() // eager populate: every superstep reads this frame

    var ranks = vb.select(col("id"), col("init").as("rank"))
    var round = 0
    var converged = false
    while (round < iterations && !converged) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(
          col("dst").as("id"),
          expr(s"(((rank * $dampNum) div $dampDen) * w) div sw").as("c"))
      val next = contrib
        .union(vb.select(col("id"), col("base")))
        .groupBy("id").agg(sum(col("c")).as("rank"))
      val bounded =
        if (stopDeltaE9.isDefined || (round + 1) % checkpointEvery == 0)
          next.localCheckpoint(true)
        else next
      stopDeltaE9.foreach { d =>
        val maxDelta = bounded.withColumnRenamed("rank", "r2")
          .join(ranks, Seq("id"))
          .agg(coalesce(max(abs(col("r2") - col("rank"))), lit(0L)))
          .head().getLong(0)
        if (maxDelta <= d) converged = true
      }
      ranks = bounded
      round += 1
    }
    ranks
  }
}
