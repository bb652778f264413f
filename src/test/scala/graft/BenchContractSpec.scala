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

  test("emitted bench line fits the 2000-char capture window at any pack size") {
    // Bench emits the per-query compact line while it fits 1700 chars
    // and falls back to per-family subtotals beyond that. Model the
    // 5-char worst value ("100.0") for EVERY query plus 20 phantom
    // future queries and a 64-char sf path: whichever branch the
    // selection logic takes must stay under budget.
    val worstSf = "x" * 64
    val names = SparkEntry.queries.keys.toSeq.sorted ++
      (1 to 20).map(i => s"x$i$i" + "_future")
    val qs = names
      .map(k => "\"" + k.takeWhile(_ != '_') + "\":100.0")
      .mkString("{", ",", "}")
    // vs_idle worst case: 5 entries with the longest query name in the
    // pack and 7-char seconds ("12345.678"/"1234.567") per field
    val longest = names.maxBy(_.length)
    val worstVsIdle = {
      val entries = Seq.fill(5)(
        s"""{"q":"$longest","s":12345.678,"idle":1234.567,"x":10.0}""")
        .mkString("[", ",", "]")
      s""","vs_idle":{"idle_total":123456.789,"total_x":10.00,"worst":$entries}"""
    }
    val perQuery =
      s"""{"metric":"total","value":1234567.890,"unit":"sec","queries":$qs$worstVsIdle,"sf":"$worstSf"}"""
    val fams = names.map(_.takeWhile(!_.isDigit)).distinct.sorted
      .map(f => "\"" + f + "\":12345.678").mkString("{", ",", "}")
    val family =
      s"""{"metric":"total","value":1234567.890,"unit":"sec","families":$fams,"n_queries":${names.size}$worstVsIdle,"full":"BENCH_FULL.json","sf":"$worstSf"}"""
    val emitted = if (perQuery.length <= 1700) perQuery else family
    assert(emitted.length < 1800,
      s"emitted bench line too long for capture window: ${emitted.length}")
    // the family fallback (what the driver has actually captured since
    // the pack crossed 1700 chars) must keep headroom for vs_idle
    assert(family.length < 1000, s"family line unexpectedly wide: ${family.length}")
  }

  test("BenchBands: render/parse round-trip, anchor-only widening, " +
    "dual-gate violations") {
    val bands = Map("q1_agg" -> (0.5, 1.25), "d18_semdedup" -> (3.0, 4.5))
    // round-trip through the exact BENCH_FULL embedding
    val line = s"""{"metric":"total","queries":{"q1_agg":0.6},""" +
      s""""bands":${BenchBands.render(bands)},"sf":"x"}"""
    assert(BenchBands.parse(line) === bands)
    // a line with no bands key parses empty (first-run bootstrap)
    assert(BenchBands.parse("""{"queries":{"a":1.0}}""") === Map.empty)
    // non-anchor runs pass committed bands through UNTOUCHED (a loaded
    // driver run must not be able to loosen the gate) — but bands of
    // queries that left the pack are dropped
    val results = Seq("q1_agg" -> 9.9, "s30_new" -> 1.0)
    assert(BenchBands.merge(bands, results, anchor = false) ===
      Map("q1_agg" -> (0.5, 1.25)))
    // anchor runs widen measured bands and seed new queries; failed
    // runs (sentinel -1) never touch a band
    val merged = BenchBands.merge(
      bands, Seq("q1_agg" -> 2.0, "s30_new" -> 1.0, "d18_semdedup" -> -1.0),
      anchor = true)
    assert(merged("q1_agg") === ((0.5, 2.0)))
    assert(merged("s30_new") === ((1.0, 1.0)))
    assert(merged("d18_semdedup") === ((3.0, 4.5))) // kept, not widened
    // violations need BOTH gates: >= 1.5x hi AND >= 0.5 s absolute
    val b = Map("fast" -> (0.1, 0.2), "slow" -> (2.0, 3.0))
    assert(BenchBands.violations(b, Seq("fast" -> 0.35)) === Nil) // rel only
    assert(BenchBands.violations(b, Seq("slow" -> 3.6)) === Nil) // abs only
    assert(BenchBands.violations(b, Seq("slow" -> 4.6)) === Seq("slow"))
    assert(BenchBands.violations(b, Seq("unknown" -> 99.0)) === Nil)
  }
}
