package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.BoundedTopK

/** The size-bounded top-k aggregate behind the s1-family per-query
  * ranking tail (knnJoin / hardNegatives / labelNoiseScreen). The
  * load-bearing property: results are IDENTICAL to the unbounded
  * window-rank formulation while the aggregation buffer never exceeds
  * k entries — including across partial/merge phases, which the
  * multi-partition cases force through serialize/deserialize. */
class BoundedTopKSpec extends AnyFunSuite with SparkSpec {

  private def topkCol(k: Int) = ColumnBridge.column(
    BoundedTopK(
      ColumnBridge.expression(col("s")),
      ColumnBridge.expression(col("i")), k).toAggregateExpression())

  /** (group, score, id) rows → (group, score, id) best-first via the
    * bounded aggregate, with the input spread over `parts` partitions
    * so partial buffers must merge. */
  private def run(
      rows: Seq[(Long, Long, Long)], k: Int, parts: Int = 7)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    rows.toDF("g", "s", "i")
      .repartition(parts)
      .groupBy("g")
      .agg(topkCol(k).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.score"), col("col.id"), col("pos"))
      .orderBy("g", "pos")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  /** Reference: plain Scala sort + take per group. */
  private def expected(
      rows: Seq[(Long, Long, Long)], k: Int): Seq[(Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3))
        .sortBy { case (s, i) => (-s, i) }
        .take(k)
        .map { case (s, i) => (g, s, i) }
    }

  test("equals sort+take on random multi-group data across partitions") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { j =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong - 25L, j.toLong)
    }
    for (k <- Seq(1, 3, 10)) {
      assert(run(rows, k) === expected(rows, k), s"k=$k")
    }
  }

  test("ties on score break by id ascending") {
    val rows = Seq((1L, 7L, 30L), (1L, 7L, 10L), (1L, 7L, 20L),
      (1L, 9L, 99L))
    assert(run(rows, 3) ===
      Seq((1L, 9L, 99L), (1L, 7L, 10L), (1L, 7L, 20L)))
  }

  test("k larger than the group returns the whole group sorted") {
    val rows = Seq((1L, 1L, 1L), (1L, 5L, 2L), (2L, 3L, 3L))
    assert(run(rows, 100) ===
      Seq((1L, 5L, 2L), (1L, 1L, 1L), (2L, 3L, 3L)))
  }

  test("null score or id rows are ignored, not ranked") {
    import spark.implicits._
    val got = Seq(
      (1L, Some(5L), Some(1L)),
      (1L, None, Some(2L)),      // null score: dropped
      (1L, Some(9L), None),      // null id: dropped
      (1L, Some(3L), Some(4L)))
      .toDF("g", "s", "i")
      .repartition(3)
      .groupBy("g")
      .agg(topkCol(2).as("t"))
      .select(explode(col("t")))
      .select(col("col.score"), col("col.id"))
      .orderBy(col("score").desc)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((5L, 1L), (3L, 4L)))
  }

  test("group with only null scores yields an empty array (explode " +
    "drops it); negative scores and Long extremes rank correctly") {
    import spark.implicits._
    val empty = Seq((1L, Option.empty[Long], 1L)).toDF("g", "s", "i")
      .groupBy("g").agg(topkCol(2).as("t"))
      .select(size(col("t"))).collect()
    assert(empty.map(_.getInt(0)).toSeq === Seq(0))

    val rows = Seq(
      (1L, Long.MinValue, 1L), (1L, Long.MaxValue, 2L),
      (1L, -1L, 3L), (1L, 0L, 4L))
    assert(run(rows, 3) ===
      Seq((1L, Long.MaxValue, 2L), (1L, 0L, 4L), (1L, -1L, 3L)))
  }

  test("heap buffer: offer/absorb stay bounded at k and sort best-first") {
    val buf = new BoundedTopK.Buffer(3)
    val rnd = new scala.util.Random(7)
    val all = (0 until 500).map(j => (rnd.nextInt(40).toLong, j.toLong))
    all.foreach { case (s, i) => buf.offer(s, i) }
    assert(buf.size === 3)
    val other = new BoundedTopK.Buffer(3)
    val more = (500 until 600).map(j => (rnd.nextInt(80).toLong, j.toLong))
    more.foreach { case (s, i) => other.offer(s, i) }
    buf.absorb(other)
    assert(buf.size === 3)
    val want = (all ++ more).sortBy { case (s, i) => (-s, i) }.take(3)
    assert(buf.sortedBestFirst().toSeq === want)
  }
}
