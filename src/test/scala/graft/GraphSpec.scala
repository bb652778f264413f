package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Graph}

/** Integer PageRank (Pregel-shape join-per-superstep) + the
  * shingle-overlap edge generator it rides on.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: two-vertex cycle conserves mass exactly") {
    // 1 <-> 2: each emits ((1e9*85) div 100) div 1 = 850000000 and
    // absorbs base 150000000 → rank stays exactly 1e9 every round
    val verts = Seq(1L, 2L).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Graph.pageRankInt(verts, pairs, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("pageRank: star center ranks highest, exact first-round values") {
    // center 0 — leaves 1,2,3. r1(0) = 0.15e9 + 3·850000000 = 2.7e9+…
    // r1(leaf) = 0.15e9 + (850000000 div 3); isolated 9 gets base only
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val r1 = Graph.pageRankInt(verts, pairs, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1(0L) === 150000000L + 3L * 850000000L)
    assert(r1(1L) === 150000000L + 850000000L / 3L)
    assert(r1(1L) === r1(2L) && r1(2L) === r1(3L))
    assert(r1(9L) === 150000000L)
    // and the ordering persists at the fixpoint prefix
    val r5 = Graph.pageRankInt(verts, pairs, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r5(0L) > r5(1L) && r5(1L) > r5(9L))
  }

  test("shingleOverlapPairs: absolute-overlap edges with exact counts") {
    // a/b share the 5-token run "v w x y z" → 3 shared trigrams; c
    // shares nothing trigram-level with either
    val docs = Seq(
      (1L, "v w x y z p q"),
      (2L, "m n v w x y z"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val pairs = Dedup.shingleOverlapPairs(
      docs, "doc_id", "text", minShared = 2, maxPostings = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 3L)))
    // minShared above the true overlap → no edge
    assert(Dedup.shingleOverlapPairs(
      docs, "doc_id", "text", minShared = 4, maxPostings = 1000)
      .count() === 0L)
  }

  test("personalized pageRank: teleport pinned to seeds, exact rounds, " +
    "unreached vertices stay at zero") {
    // star 0–{1,2,3} + isolated 9; seed = leaf 1 only
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val r1 = Graph.personalizedPageRankInt(
      verts, pairs, seeds, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: only the seed had mass — the center absorbs its full
    // damped contribution, the seed keeps just its base, the other
    // leaves and the isolated vertex are exactly 0
    assert(r1 === Map(
      0L -> 850000000L, 1L -> 150000000L,
      2L -> 0L, 3L -> 0L, 9L -> 0L))
    // round 2: center mass fans to all three leaves; the seed also
    // gets the seed-ward trickle from the center
    val r2 = Graph.personalizedPageRankInt(
      verts, pairs, seeds, iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val fromCenter = (850000000L * 85L / 100L) / 3L
    val fromSeed = 150000000L * 85L / 100L
    assert(r2 === Map(
      0L -> fromSeed,
      1L -> (150000000L + fromCenter),
      2L -> fromCenter, 3L -> fromCenter, 9L -> 0L))
    // proximity ordering at the fixpoint prefix: seed > center-adjacent
    // leaves (symmetric), isolated still exactly 0
    val r5 = Graph.personalizedPageRankInt(
      verts, pairs, seeds, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r5(1L) > r5(2L) && r5(2L) === r5(3L) && r5(9L) === 0L)
  }

  test("weighted pageRank: mass splits by weight, uniform weights " +
    "reduce to the plain operator") {
    // star 0–1 (w=9), 0–2 (w=1): the center splits 850e6 as 9:1
    val verts = Seq(0L, 1L, 2L).toDF("id")
    val wpairs = Seq((0L, 1L, 9L), (0L, 2L, 1L)).toDF("id_a", "id_b", "w")
    val r1 = Graph.pageRankWeightedInt(verts, wpairs, "w", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1(0L) === 150000000L + 850000000L + 850000000L)
    assert(r1(1L) === 150000000L + (850000000L * 9L) / 10L)
    assert(r1(2L) === 150000000L + 850000000L / 10L)
    // uniform weights ≡ plain (the ×w div Σw factor cancels exactly)
    val verts5 = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    val plain = Graph.pageRankInt(
      verts5, pairs.toDF("id_a", "id_b"), iterations = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val uniform = Graph.pageRankWeightedInt(
      verts5, pairs.map(p => (p._1, p._2, 7L)).toDF("id_a", "id_b", "w"),
      "w", iterations = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(uniform === plain)
    spark.catalog.clearCache()
  }

  test("random graphs: engine ranks equal an independent driver-side " +
    "integer replay, plain and personalized") {
    // a from-scratch reference implementation of the integer contract
    // (adjacency maps + truncating div) — any divergence in the join/
    // union/agg formulation from the declared arithmetic fails here
    def ref(
        n: Int, pairs: Seq[(Long, Long)], seeds: Option[Set[Long]],
        iters: Int): Map[Long, Long] = {
      val out = scala.collection.mutable.Map.empty[Long, List[Long]]
      for ((a, b) <- pairs) {
        out(a) = b :: out.getOrElse(a, Nil)
        out(b) = a :: out.getOrElse(b, Nil)
      }
      def base(v: Long) =
        if (seeds.forall(_.contains(v))) 150000000L else 0L
      def init(v: Long) =
        if (seeds.forall(_.contains(v))) 1000000000L else 0L
      var r = (0L until n).map(v => v -> init(v)).toMap
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- 0L until n) next(v) = base(v)
        for ((u, nbrs) <- out; v <- nbrs)
          next(v) = next(v) + ((r(u) * 85L) / 100L) / nbrs.length
        r = next.toMap
      }
      r
    }
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 8) {
      val n = 5 + rnd.nextInt(20)
      val pairs = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.2
      } yield (a, b)).toSeq
      val iters = 1 + rnd.nextInt(4)
      val verts = (0L until n).toDF("id")
      val pairsDf = pairs.toDF("id_a", "id_b")
      val got = Graph.pageRankInt(verts, pairsDf, iters)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === ref(n, pairs, None, iters),
        s"plain trial=$trial n=$n e=${pairs.size} iters=$iters")
      val seedSet = (0L until n).filter(_ => rnd.nextDouble() < 0.3).toSet
      if (seedSet.nonEmpty) {
        val gotP = Graph.personalizedPageRankInt(
          verts, pairsDf, seedSet.toSeq.toDF("id"), iters)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        assert(gotP === ref(n, pairs, Some(seedSet), iters),
          s"ppr trial=$trial n=$n seeds=${seedSet.size} iters=$iters")
      }
      spark.catalog.clearCache()
    }
  }

  test("session-4 operators tolerate empty frames (no crash, empty or " +
    "base-only output)") {
    import graft.ext.{Similarity, TextAnalysis}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // graph: empty vertex set → empty ranks; vertices with no edges →
    // every vertex at base
    assert(Graph.pageRankInt(
      noDocs.select(col("doc_id")), noPairs, 2).count() === 0L)
    val isolated = Graph.pageRankInt(
      Seq(1L, 2L).toDF("id"), noPairs, 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(isolated === Map(1L -> 150000000L, 2L -> 150000000L))
    // dedup/text/similarity: empty in → empty out
    assert(graft.ext.Dedup.noveltyProfile(
      noDocs, "doc_id", "text").count() === 0L)
    assert(TextAnalysis.blocklistHits(
      noDocs, "doc_id", "text", Seq("x")).count() === 0L)
    assert(TextAnalysis.blocklistFilter(
      noDocs, "doc_id", "text", Seq("x")).count() === 0L)
    assert(Similarity.mmrTopK(
      noVecs, "vec_id", "embedding", Seq(1.0f, 0.0f), candidates = 5,
      k = 3).count() === 0L)
    assert(graft.query.EventOps.typePmi(
      Seq.empty[(Long, String)].toDF("user_id", "event_type"),
      "user_id", "event_type").count() === 0L)
    spark.catalog.clearCache()
  }

  test("pageRank over overlap edges: hub doc outranks the chain ends") {
    // hub shares a distinct 4-token run with EACH spoke; spokes share
    // nothing with each other → star in the overlap graph
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d zz yy xx"),
      (2L, "e f g h qq rr ss"),
      (3L, "uu vv ww zz1 yy1 xx1")).toDF("doc_id", "text")
    val pairs = Dedup.shingleOverlapPairs(
      docs, "doc_id", "text", minShared = 2, maxPostings = 1000)
    val r = Graph.pageRankInt(
      docs.select(col("doc_id")), pairs, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(0L) > r(2L))
    assert(r(1L) > r(3L)) // spoke beats isolated
    assert(r(3L) === 150000000L)
  }

  test("pairs endpoints outside the vertex frame are ignored: no " +
    "foreign ids in the output, no mass leaking in from them") {
    val verts = Seq(1L, 2L).toDF("id")
    // 99 is not a vertex: the 2-99 edge must vanish entirely — vertex 2
    // must NOT split its out-mass with 99 nor absorb mass from it
    val pairs = Seq((1L, 2L), (2L, 99L)).toDF("id_a", "id_b")
    val r = Graph.pageRankInt(verts, pairs, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // identical to the clean two-vertex cycle: mass conserved at 1e9
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("checkpointed long run: 50 supersteps complete with bounded " +
    "plan depth and agree with the uncheckpointed form") {
    val verts = Seq(0L, 1L, 2L, 3L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
      .toDF("id_a", "id_b")
    // 12 rounds spans one checkpoint boundary (every 8): results must
    // be bit-identical to a checkpoint-free run of the same 12 rounds
    val chk = Graph.pageRankInt(verts, pairs, iterations = 12)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val plain = Graph.pageRankInt(verts, pairs, iterations = 12,
      checkpointEvery = 1000)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(chk === plain)
    // 50 rounds: the analyzed plan must stay bounded (a checkpoint
    // resets lineage, so depth reflects at most checkpointEvery
    // rounds, not all 50)
    val long = Graph.pageRankInt(verts, pairs, iterations = 50)
    val depth = long.queryExecution.analyzed.collect { case p => p }.size
    assert(depth < 200, s"plan nodes = $depth")
    assert(long.count() === 4L)
    spark.catalog.clearCache()
  }

  test("integer fixpoint early exit: stopDeltaE9=0 stops at the exact " +
    "fixpoint and further rounds do not change ranks") {
    // two-vertex cycle reaches its fixpoint immediately (mass
    // conserved at 1e9): with stopDeltaE9=0 a 40-round budget stops
    // after round 1's delta check yet returns the exact ranks
    val verts = Seq(1L, 2L).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Graph.pageRankInt(verts, pairs, iterations = 40,
      stopDeltaE9 = Some(0L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
    // star graph, same budget both sides: a delta-0 exit is a TRUE
    // fixpoint (deterministic map), so stopping early must be
    // indistinguishable from running the full budget
    val sverts = Seq(0L, 1L, 2L, 3L).toDF("id")
    val spairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val early = Graph.pageRankInt(sverts, spairs, iterations = 100,
      stopDeltaE9 = Some(0L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val fixed = Graph.pageRankInt(sverts, spairs, iterations = 100)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(early === fixed)
    spark.catalog.clearCache()
  }
}
