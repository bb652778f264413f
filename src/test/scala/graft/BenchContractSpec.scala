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
    // worst-case round-13 additions: partial + single_run_from + env
    // blocks can all ride the same line
    val longest0 = names.maxBy(_.length)
    val worstExtras =
      s""","partial":true,"completed":999,"n_queries":999,"single_run_from":"$longest0""""
    val worstEnv =
      s""","env":{"fsync_ms":12345.67,"fsync_p95_ms":12345.67,"steal_pct":100.00,"load1":123.45}"""
    val perQuery =
      s"""{"metric":"total","value":1234567.890,"unit":"sec"$worstExtras,"queries":$qs$worstVsIdle$worstEnv,"sf":"$worstSf"}"""
    val fams = names.map(_.takeWhile(!_.isDigit)).distinct.sorted
      .map(f => "\"" + f + "\":12345.678").mkString("{", ",", "}")
    val family =
      s"""{"metric":"total","value":1234567.890,"unit":"sec"$worstExtras,"families":$fams,"n_queries":${names.size}$worstVsIdle$worstEnv,"full":"BENCH_FULL.json","sf":"$worstSf"}"""
    val emitted = if (perQuery.length <= 1700) perQuery else family
    assert(emitted.length < 1800,
      s"emitted bench line too long for capture window: ${emitted.length}")
    // the family fallback (what the driver has actually captured since
    // the pack crossed 1700 chars) must keep headroom for vs_idle
    assert(family.length < 1200, s"family line unexpectedly wide: ${family.length}")
  }

  test("partial survivability line: parseable driver-format JSON, fits the window") {
    // the round-12 driver bench died rc=124/parsed:null because the
    // only summary line came after ALL queries; the partial line
    // printed at each family boundary must itself stand as the round's
    // artifact. Pin: valid JSON, carries metric/value/unit + progress +
    // env, and stays far inside the ~2000-char tail window even with
    // every family present.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234)
    val env =
      """{"fsync_ms":1.73,"fsync_p95_ms":15.03,"steal_pct":2.11,"load1":0.12}"""
    val line = BenchFormat.partialLine(
      results, results.size + 10, env, "/root/testdata/sf0.1")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line) // throws on malformed JSON
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("partial").asBoolean())
    assert(node.get("completed").asInt() === results.size)
    assert(node.get("n_queries").asInt() === results.size + 10)
    assert(node.get("value").asDouble() > 0)
    assert(node.get("families").isObject)
    assert(node.get("env").get("fsync_ms").asDouble() === 1.73)
    assert(line.length < 1000,
      s"partial line too wide for the capture window: ${line.length}")
    // a mid-family snapshot (kill between boundaries) is just as valid
    val mid = BenchFormat.partialLine(
      results.take(3), results.size, env, "sf")
    assert(mapper.readTree(mid).get("completed").asInt() === 3)
  }

  test("host fingerprint: probe returns sane values; degraded gates on fsync/steal") {
    val fp = HostFingerprint.probe(writes = 10)
    // the probe must never throw and must yield either a real
    // measurement or the -1 unavailable sentinel
    assert(fp.fsyncMs > 0 || fp.fsyncMs == -1.0)
    assert(fp.fsyncP95Ms >= fp.fsyncMs || fp.fsyncP95Ms == -1.0)
    // json round-trips through a strict parser
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(fp.json).get("fsync_ms").isNumber)
    // the widening gate: healthy r13-idle values pass, the measured
    // round-12 pathology (6.25 ms fsync / 5.4 % steal) is refused
    import HostFingerprint.Fp
    assert(!Fp(1.7, 15.0, 2.1, 0.1).degraded)
    assert(Fp(6.25, 27.4, 2.1, 0.1).degraded, "r12 fsync pathology must gate")
    assert(Fp(1.7, 3.0, 5.4, 0.1).degraded, "r12 steal pathology must gate")
    // post-run ~3 % steal transients on a healthy host must NOT gate
    assert(!Fp(1.7, 3.0, 3.4, 0.1).degraded)
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
    // widening is CLAMPED: one anchor grows hi at most to
    // max(2x, +0.5s) — a 13.7x mid-run transient (r13 anchor E: q1
    // 2.6 s vs 0.19 record) must not instantly make the gate vacuous
    val clamped = BenchBands.merge(
      Map("q1_agg" -> (0.19, 0.23)), Seq("q1_agg" -> 2.617), anchor = true)
    assert(clamped("q1_agg") === ((0.19, 0.73))) // 0.23+0.5 > 2x0.23
    assert(BenchBands.widenHi(3.0, 40.0) === 6.0) // 2x branch
    assert(BenchBands.widenHi(3.0, 4.0) === 4.0) // within one step
    assert(BenchBands.widenHi(3.0, 2.0) === 3.0) // never shrinks
    // violations need BOTH gates: >= 1.5x hi AND >= 0.5 s absolute
    val b = Map("fast" -> (0.1, 0.2), "slow" -> (2.0, 3.0))
    assert(BenchBands.violations(b, Seq("fast" -> 0.35)) === Nil) // rel only
    assert(BenchBands.violations(b, Seq("slow" -> 3.6)) === Nil) // abs only
    assert(BenchBands.violations(b, Seq("slow" -> 4.6)) === Seq("slow"))
    assert(BenchBands.violations(b, Seq("unknown" -> 99.0)) === Nil)
  }
}
