package graft

import org.apache.spark.sql.functions._
import graft.query.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest at-or-before, null when no history") {
    val probes = Seq(
      (1L, 5L, "p1"), // key 1, t=5
      (1L, 10L, "p2"),
      (1L, 2L, "p3"), // before any history for key 1
      (2L, 100L, "p4"), // key 2 has no history at all
      (3L, 7L, "p5")
    ).toDF("k", "t", "probe")
    val history = Seq(
      (1L, 3L, "h1"),
      (1L, 5L, "h2"), // same instant as p1 -> inclusive match
      (1L, 9L, "h3"),
      (3L, 7L, "h4")
    ).toDF("hk", "ht", "payload")

    val out = AsOfJoin
      .backward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    assert(out("p1") === Some("h2")) // t=5 matches history at exactly 5
    assert(out("p2") === Some("h3")) // latest <= 10 is 9
    assert(out("p3") === None) // nothing at or before 2
    assert(out("p4") === None) // key with no history
    assert(out("p5") === Some("h4")) // equal-time match on another key
  }

  test("forward as-of: earliest at-or-after, null when nothing follows") {
    val probes = Seq(
      (1L, 5L, "p1"), // equal-time inclusive
      (1L, 4L, "p2"), // between h1 and h2 -> h2
      (1L, 10L, "p3"), // after all history
      (2L, 1L, "p4"), // key with no history
      (3L, 6L, "p5")
    ).toDF("k", "t", "probe")
    val history = Seq(
      (1L, 3L, "h1"),
      (1L, 5L, "h2"),
      (1L, 9L, "h3"),
      (3L, 7L, "h4")
    ).toDF("hk", "ht", "payload")

    val out = AsOfJoin
      .forward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    assert(out("p1") === Some("h2")) // t=5 matches history at exactly 5
    assert(out("p2") === Some("h2")) // earliest >= 4 is 5
    assert(out("p3") === None) // nothing at or after 10
    assert(out("p4") === None) // key with no history
    assert(out("p5") === Some("h4"))
  }

  test("null keys never match; both directions carry incrementally") {
    val probes = Seq(
      (Option(1L), 5L, "p1"),
      (Option.empty[Long], 5L, "p2") // null key: no match either way
    ).toDF("k", "t", "probe")
    val history = Seq(
      (Option(1L), 3L, "h1"), (Option(1L), 7L, "h2"),
      (Option.empty[Long], 1L, "hnull") // null-key history is dropped
    ).toDF("hk", "ht", "payload")
    for ((dir, want) <- Seq(
        ("backward", Map("p1" -> Some("h1"), "p2" -> None)),
        ("forward", Map("p1" -> Some("h2"), "p2" -> None)))) {
      val joined =
        if (dir == "backward")
          AsOfJoin.backward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
        else
          AsOfJoin.forward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
      val out = joined.collect()
        .map(r => r.getString(2) -> Option(r.getString(3))).toMap
      assert(out === want, dir)
      // scale contract: the carry must be an unbounded-PRECEDING frame
      // (incremental, O(n) per partition); an unbounded-FOLLOWING frame
      // re-evaluates the suffix per row — O(n^2) on a long key history
      val plan = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("unboundedfollowing"), s"$dir frame")
    }
  }

  test("null times never match: probes carry nothing, history is dropped") {
    // SQL inequality semantics: rightTime >= NULL (and <= NULL) is never
    // true. The sort-order trap this pins: under the forward direction's
    // descending scan a null-time probe is NULLS LAST — without the
    // bypass it would sort after all history and pick up the
    // minimum-time row.
    val probes = Seq(
      (1L, Option(5L), "p1"),
      (1L, Option.empty[Long], "pnullt") // null time: no match either way
    ).toDF("k", "t", "probe")
    val history = Seq(
      (1L, Option(3L), "h1"), (1L, Option(7L), "h2"),
      (1L, Option.empty[Long], "hnullt") // null-time history matches nothing
    ).toDF("hk", "ht", "payload")
    for ((dir, want) <- Seq(
        ("backward", Map("p1" -> Some("h1"), "pnullt" -> None)),
        ("forward", Map("p1" -> Some("h2"), "pnullt" -> None)))) {
      val joined =
        if (dir == "backward")
          AsOfJoin.backward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
        else
          AsOfJoin.forward(probes, history, "k", "hk", "t", "ht", Seq("payload"))
      val out = joined.collect()
        .map(r => r.getString(2) -> Option(r.getString(3))).toMap
      assert(out === want, dir)
    }
  }

  test("forward/backward round shapes agree on dense random fixtures") {
    for (seed <- Seq(7, 23, 91)) runRandomDifferential(seed)
  }

  private def runRandomDifferential(seed: Int): Unit = {
    // brute-force differential on a random key/time grid
    val rnd = new scala.util.Random(seed)
    val probes = (0 until 120).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, s"p$i"))
    val hist = (0 until 80).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(50).toLong * 2L, s"h$i"))
    // dedup history per (k,t) deterministically (min payload), as the
    // operator contract requires for unique matches
    val histD = hist.groupBy(h => (h._1, h._2))
      .map(_._2.minBy(_._3)).toSeq
    val pDf = probes.toDF("k", "t", "probe")
    val hDf = histD.toDF("hk", "ht", "payload")
    val fwd = AsOfJoin.forward(pDf, hDf, "k", "hk", "t", "ht", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    val bwd = AsOfJoin.backward(pDf, hDf, "k", "hk", "t", "ht", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    probes.foreach { case (k, t, name) =>
      val wantF = histD.filter(h => h._1 == k && h._2 >= t)
        .sortBy(h => (h._2, h._3)).headOption.map(_._3)
      assert(fwd(name) === wantF, s"forward probe $name (k=$k t=$t) seed=$seed")
      val wantB = histD.filter(h => h._1 == k && h._2 <= t)
        .sortBy(h => (h._2, h._3)).lastOption.map(_._3)
      assert(bwd(name) === wantB, s"backward probe $name (k=$k t=$t) seed=$seed")
    }
  }
}
