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
}
