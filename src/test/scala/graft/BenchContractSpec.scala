package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness keeps only the last ~2000 characters of stdout, so the
  * one-line JSON Bench prints must fit that window even after the sbt footer
  * (~110 chars) is appended. Guards the compact-key scheme as the query pack
  * grows: keys must stay unique and the worst-case line must stay under budget.
  */
class BenchContractSpec extends AnyFunSuite {

  test("compact bench keys (family prefix) are unique across the query pack") {
    val names = SparkEntry.queries.keys.toSeq
    val shorts = names.map(_.takeWhile(_ != '_'))
    val dups = shorts.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate compact bench keys: $dups")
  }

  test("compact bench line fits the 2000-char capture window with headroom") {
    // the adaptive value format caps realistic values at 5 chars
    // ("10.00" / "100.0"; whole seconds above 100 — a 10000 s query is
    // a broken bench, not a formatting case). Model EVERY query at the
    // 5-char worst PLUS 20 phantom future queries (the required growth
    // headroom), plus a generous sf-path width (env-var controlled, so
    // model 64 chars rather than the literal default path).
    val worstSf = "x" * 64
    val names = SparkEntry.queries.keys.toSeq.sorted ++
      (1 to 20).map(i => s"x$i$i" + "_future")
    val qs = names
      .map(k => "\"" + k.takeWhile(_ != '_') + "\":100.0")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":1234567.890,"unit":"sec","queries":$qs,"sf":"$worstSf"}"""
    assert(line.length < 1800, s"bench line too long for capture window: ${line.length}")
  }
}
