package graft

import graft.query.EventOps

/** Semantics pins for the funnel/retention operators on crafted event
  * frames (the oracle covers them statistically at sf scale; these pin
  * the ordering/window edge cases one user at a time). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // funnel window (µs-equivalent units)

  test("funnel: step ordering, window expiry and null gating") {
    val events = Seq(
      // u1: clean A→B→C inside the window → 3
      (1L, 0L, "A"), (1L, 10L, "B"), (1L, 20L, "C"),
      // u2: B before A only → stops at 1 (B must be strictly after A)
      (2L, 5L, "B"), (2L, 10L, "A"),
      // u3: B outside the window of the FIRST A → 1
      (3L, 0L, "A"), (3L, 101L, "B"),
      // u4: no A at all, later steps present → 0
      (4L, 0L, "B"), (4L, 1L, "C"),
      // u5: C before B (C must follow B) → 2
      (5L, 0L, "A"), (5L, 20L, "B"), (5L, 10L, "C"),
      // u6: second A would open a better window, but windowFunnel
      // anchors at the FIRST A: B at 150 is outside [0, 100] → 1
      (6L, 0L, "A"), (6L, 120L, "A"), (6L, 150L, "B"),
      // u7: boundary — B exactly at t0+W is included, C after B at the
      // same bound stays (strictly-after only between steps)
      (7L, 0L, "A"), (7L, 100L, "B"))
      .toDF("user_id", "us", "ty")
    val out = EventOps
      .funnel(events, "user_id", "us", "ty", Seq("A", "B", "C"), W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 2L, 6L -> 1L, 7L -> 2L))
  }

  test("funnel: single-step degenerates to presence") {
    val events = Seq((1L, 0L, "A"), (2L, 0L, "B")).toDF("user_id", "us", "ty")
    val out = EventOps.funnel(events, "user_id", "us", "ty", Seq("A"), W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 0L))
  }

  test("retention: cohort = earliest day; offsets count distinct returners") {
    val act = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), // cohort: day 10
      (1L, 11L), (2L, 11L), // day+1: two return
      (1L, 13L), // day+3: one returns
      (4L, 11L), (4L, 13L), // non-cohort user: never counted
      (2L, 10L)) // duplicate activity: still one user
      .toDF("user_id", "day")
    val out = EventOps.retention(act, "user_id", "day", Seq(0L, 1L, 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 3L, 1L -> 2L, 3L -> 1L))
  }
}
