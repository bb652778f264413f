package graft

import org.apache.spark.sql.functions._
import graft.query.{EventOps, Stats, TimeSeries}

/** Hand-computed cases for the round-5 ClickHouse-aggregate operators:
  * interval-union length, LTTB downsampling, gap-constrained sequence
  * match, entropy, exact weighted quantiles. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("intervalLengthSum: overlap merges, touching merges, gaps don't") {
    // key 1: [0,10) ∪ [5,15) ∪ [15,20) = [0,20) → 20 (overlap + touch)
    // key 2: [0,5) ∪ [10,12) → 7 (gap stays split)
    // key 3: nested [0,100) ∪ [10,20) → 100
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L),
      (2L, 0L, 5L), (2L, 10L, 12L),
      (3L, 0L, 100L), (3L, 10L, 20L)
    ).toDF("k", "s", "e")
    val out = TimeSeries.intervalLengthSum(iv, "k", "s", "e")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 20L, 2L -> 7L, 3L -> 100L))
  }

  test("lttb: passthrough under nBuckets, ends kept, peak survives") {
    // 30 points: flat line with one spike at x=17 — any faithful
    // downsample keeps the spike (it forms the largest triangle in its
    // bucket); first and last points always survive
    val pts = (0L until 30L).map(x =>
      (1L, x, if (x == 17) 1000L else 10L)).toDF("k", "x", "y")
    val kept = TimeSeries.largestTriangleThreeBuckets(pts, "k", "x", "y", 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(kept.size === 6)
    assert(kept.contains((0L, 10L)) && kept.contains((29L, 10L)), "ends")
    assert(kept.contains((17L, 1000L)), "spike dropped")
    // a small series passes through whole
    val small = (0L until 4L).map(x => (1L, x, x)).toDF("k", "x", "y")
    assert(TimeSeries.largestTriangleThreeBuckets(small, "k", "x", "y", 6)
      .count() === 4)
  }

  test("sequenceMatchGaps: DP beats the greedy scan; gaps gate strictly") {
    // user 1: A@0, A@60, B@100 with gap 50 — greedy (anchor first A)
    // fails, the feasible chain A@60→B@100 exists → matched
    // user 2: A@0, B@100 gap 50 → no feasible chain
    // user 3: A@0, B@30, C@200 gap 50 → B feasible but C too far
    // user 4: full chain A@0 B@40 C@80
    val ev = Seq(
      (1L, 0L, 1L, "A"), (1L, 60L, 2L, "A"), (1L, 100L, 3L, "B"),
      (2L, 0L, 4L, "A"), (2L, 100L, 5L, "B"),
      (3L, 0L, 6L, "A"), (3L, 30L, 7L, "B"), (3L, 200L, 8L, "C"),
      (4L, 0L, 9L, "A"), (4L, 40L, 10L, "B"), (4L, 80L, 11L, "C")
    ).toDF("u", "us", "id", "ty")
    val two = EventOps.sequenceMatchGaps(ev, "u", "us", "id", "ty",
      Seq("A", "B"), maxGapUs = 50L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(two === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
    val three = EventOps.sequenceMatchGaps(ev, "u", "us", "id", "ty",
      Seq("A", "B", "C"), maxGapUs = 50L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(three === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("sequenceMatchGaps equals brute-force search on random fixtures") {
    // independent oracle: exhaustive recursive search for ANY strictly
    // row-ordered chain with per-adjacent gap <= cap — the definition,
    // with none of the DP's structure
    def bruteForce(
        evs: Seq[(Long, Long, String)], steps: Seq[String],
        gap: Long): Boolean = {
      val sorted = evs.sortBy(e => (e._1, e._2))
      def ok(from: Int, prevTime: Long, step: Int): Boolean =
        if (step == steps.size) true
        else (from until sorted.size).exists { i =>
          val (t, _, ty) = sorted(i)
          ty == steps(step) && (step == 0 || t - prevTime <= gap) &&
            ok(i + 1, t, step + 1)
        }
      ok(0, 0L, 0)
    }
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val types = Seq("A", "B", "C")
      val evs = for {
        u <- 0L until 40L
        i <- 0 until (1 + rnd.nextInt(8))
      } yield (u, rnd.nextInt(200).toLong, (u * 100 + i), types(rnd.nextInt(3)))
      val df = evs.toDF("u", "us", "id", "ty")
      val got = EventOps.sequenceMatchGaps(df, "u", "us", "id", "ty",
        Seq("A", "B", "C"), maxGapUs = 40L)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val byUser = evs.groupBy(_._1)
      for ((u, ues) <- byUser) {
        val want = bruteForce(
          ues.map(e => (e._2, e._3, e._4)), Seq("A", "B", "C"), 40L)
        // users with no A/B/C events are absent from the operator's
        // output by contract; these fixtures always have >= 1
        assert(got.get(u).contains(want), s"seed=$seed user=$u")
      }
    }
  }

  test("maxConcurrentBucketed equals the single sweep at any bucket width") {
    // random interval sets; bucket widths down to SMALLER than the
    // interval duration (every interval then crosses bucket boundaries)
    for (seed <- Seq(5, 19)) {
      val rnd = new scala.util.Random(seed)
      val ev = (0 until 400).map { i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong)
      }.toDF("g", "us", "id")
      val want = EventOps.maxConcurrent(ev, "g", "us", 57L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (width <- Seq(10L, 57L, 100L, 5000L)) {
        val got = EventOps.maxConcurrentBucketed(ev, "g", "us", 57L, width)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"seed=$seed width=$width")
      }
    }
  }

  test("uniqUpTo saturates at n+1, exact below") {
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 2),            // 2 distinct < cap
      ("b", 1), ("b", 2), ("b", 3),            // exactly cap
      ("c", 1), ("c", 2), ("c", 3), ("c", 4), ("c", 5) // above → n+1
    ).toDF("k", "v")
    val got = graft.query.Stats.uniqUpTo(df, "k", "v", n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 3L, "c" -> 4L))
  }

  test("sequenceNextNode: first match wins, end-of-stream yields null, no match no row") {
    val df = Seq(
      // u1: A B C A B D → first AB at t=1, next = C
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "C"),
      (1L, 4L, 4L, "A"), (1L, 5L, 5L, "B"), (1L, 6L, 6L, "D"),
      // u2: chain ends the stream → matched, next_node null
      (2L, 1L, 7L, "A"), (2L, 2L, 8L, "B"),
      // u3: no adjacent AB (A C B) → no row
      (3L, 1L, 9L, "A"), (3L, 2L, 10L, "C"), (3L, 3L, 11L, "B")
    ).toDF("u", "ts", "id", "ty")
    val got = EventOps.sequenceNextNode(df, "u", "ts", "id", "ty", Seq("A", "B"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("C"), 2L -> None))
  }

  test("arrayAggs: in-row folds match hand computation") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 2.0f)),
      (1L, Seq(3.5f)),
      (2L, Seq(0.25f, -1.0f))
    ).toDF("k", "arr")
    val got = graft.query.Stats.arrayAggs(df, "k", "arr")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // k=1: e6 = [1e6, 2e6, 2e6] + [3.5e6] → sum 8.5e6, max 3.5e6, uniq {1e6,2e6,3.5e6}=3
    // k=2: [250000, -1e6] → sum -750000, max 250000, uniq 2
    assert(got === Map(
      1L -> ((8500000L, 3500000L, 3L)),
      2L -> ((-750000L, 250000L, 2L))))
  }

  test("entropy: uniform = ln(k) in micro-nats; constant = 0") {
    // key 1: 4 equally-likely values → H = ln(4) nats ≈ 1.386294e6 µnats
    // key 2: one value → 0
    val df = (Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d")) ++
      Seq.fill(5)((2L, "z"))).toDF("k", "v")
    val h = Stats.entropy(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contract arithmetic: terms floor to e6 before the integer closed
    // form, so uniform-4 = floor(1e6·ln 4) − 0 div 4 exactly
    assert(h(1L) === math.floor(1e6 * math.log(4)).toLong)
    val t5 = math.floor(1e6 * 5 * math.log(5)).toLong
    assert(h(2L) === math.floor(1e6 * math.log(5)).toLong - t5 / 5L)
    assert(h(2L) <= 1L) // ≈ 0 up to the e6 floors
  }

  test("ema: recursion over sorted order, singleton passthrough") {
    // ema([10, 20, 40], α=.25) = .25·40 + .75·(.25·20 + .75·10) = 19.375
    // rows arrive out of order — the sort inside the operator fixes it
    val df = Seq((1L, 3L, 3L, 40L), (1L, 1L, 1L, 10L), (1L, 2L, 2L, 20L),
      (2L, 1L, 4L, 7L)).toDF("k", "us", "id", "vc")
    val out = Stats.ema(df, "k", "us", "id", "vc", alpha = 0.25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 19375000L)
    assert(out(2L) === 7000000L) // single point: ema = x0
  }

  test("quantileExactWeighted: weights shift the median") {
    // values 1..4 with weight 1 → median (q=1/2, cumw*2 >= tw) = 2
    // same values, weight 10 on the 4 → median jumps to 4
    val flat = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L))
      .toDF("k", "v", "w")
    assert(Stats.quantileExactWeighted(flat, "k", "v", "w", 1, 2)
      .head().getLong(1) === 2L)
    val skew = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 10L))
      .toDF("k", "v", "w")
    assert(Stats.quantileExactWeighted(skew, "k", "v", "w", 1, 2)
      .head().getLong(1) === 4L)
    // q=0 → minimum, q=1 → maximum (boundary rationals)
    assert(Stats.quantileExactWeighted(flat, "k", "v", "w", 0, 1)
      .head().getLong(1) === 1L)
    assert(Stats.quantileExactWeighted(flat, "k", "v", "w", 1, 1)
      .head().getLong(1) === 4L)
  }

  test("quantilesExact: one pass matches per-quantile selection; " +
    "nearest-rank rule on 1..100") {
    val d = (1L to 100L).map(v => (1L, v)).toDF("k", "v")
    val row = Stats.quantilesExact(
      d, "k", "v",
      Seq(("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100), ("p100", 1, 1)))
      .head()
    // smallest v with cw*denom >= tw*num over n=100: ceil(q*100)
    assert(row.getLong(1) === 50L)
    assert(row.getLong(2) === 95L)
    assert(row.getLong(3) === 99L)
    assert(row.getLong(4) === 100L)
    // agrees with the single-quantile operator on every requested q
    val w1 = d.withColumn("w", lit(1L))
    for ((num, denom, exp) <- Seq((1, 2, 50L), (19, 20, 95L), (99, 100, 99L)))
      assert(Stats.quantileExactWeighted(w1, "k", "v", "w", num, denom)
        .head().getLong(1) === exp)
  }
}
