package graft.ext

/** Generated DuckDB replay of [[Similarity.ivfBuild]]'s seeded Lloyd
  * iterations — the substrate behind the s4/s6/d18 full-replay oracles.
  *
  * Replayability rests on three determinism choices in the engine:
  *  - the initial centroids are seeded Gaussians
  *    ([[Similarity.initialCentroids]]) — inlined here as double
  *    literals (Scala `Double.toString` round-trips exactly);
  *  - per-cell means are computed from e6-quantized EXACT integer
  *    sums (associative — partition order cannot change them), with
  *    one double division s/(n·10⁶) per coordinate;
  *  - cell assignment is the lexicographic (score, idx) struct-max,
  *    replayed as `row_number() OVER (ORDER BY score DESC, ci DESC)`.
  *
  * The generated text defines CTEs: `v` (id, e), `cents0..cents{iters}`
  * (ci, cv) and `asg` — the FINAL assignment (id, e, ci) against
  * `cents{iters}`, matching `ivfBuild(...).assigned`.
  */
object KmeansOracle {

  private def dotListQ(vec: String, cv: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($vec[i] AS DOUBLE) * $cv[i]))"

  private def normQ(vec: String): String =
    s"sqrt(list_sum(list_transform($vec, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** One assignment CTE: each vector of `src` to its best cell of
    * `cents`. */
  private def assignCte(
      name: String, cents: String, dim: Int,
      src: String = "v"): String =
    s"""$name AS (
       |  SELECT id, e, ci FROM (
       |    SELECT id, e, ci,
       |      row_number() OVER (PARTITION BY id ORDER BY sc DESC, ci DESC)
       |        AS rn
       |    FROM (
       |      SELECT v.id, v.e, c.ci,
       |        ${dotListQ("v.e", "c.cv", dim)} / ${normQ("v.e")} AS sc
       |      FROM $src v, $cents c))
       |  WHERE rn = 1)""".stripMargin

  /** CTE chain `v, vt, cents0, a1, cents1, …, cents{iters}, asg`.
    * Caller prepends `WITH [RECURSIVE]` and appends its own consumers.
    * `vt` is the deterministic pmd5-ordered Lloyd TRAINING sample
    * (min(n, trainCap) rows, default 50·k — the engine's
    * [[Similarity.trainSampleFrame]] contract); iteration CTEs assign
    * `vt`, the final `asg` assigns the FULL corpus. */
  def lloydCtes(
      k: Int = 16, iters: Int = 3, dim: Int = 64, seed: Long = 42L,
      trainCap: Int = 0, trainWhere: String = ""): String = {
    val cap = Similarity.lloydTrainCap(trainCap, k)
    val init = Similarity.initialCentroids(k, dim, seed)
    val c0rows = init.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(", ")}])"
    }.mkString(",\n    ")
    // s32's incremental-append replay trains on a RESTRICTED base (the
    // already-indexed half) while `asg` still assigns the full corpus;
    // the default empty predicate keeps the d18/s4/s6 oracle text
    // byte-stable
    val tw = if (trainWhere.isEmpty) "" else s"\n  WHERE $trainWhere"
    val sb = new StringBuilder
    sb ++= s"""v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
              |vt AS (
              |  SELECT id, e FROM v$tw
              |  ORDER BY ${DedupQueries.pmSql("CAST(id AS VARCHAR)")}, id
              |  LIMIT $cap),
              |cents0(ci, cv) AS (VALUES
              |    $c0rows),
              |""".stripMargin
    for (it <- 1 to iters) {
      val prev = s"cents${it - 1}"
      sb ++= assignCte(s"a$it", prev, dim, src = "vt") + ",\n"
      // e6-integer per-(cell, dim) sums -> exact means; empty cells
      // keep the previous centroid
      sb ++= s"""s$it AS (
                |  SELECT a.ci, t.i,
                |    sum(CAST(round(CAST(a.e[t.i] AS DOUBLE) * 1000000)
                |      AS BIGINT)) AS s,
                |    count(*) AS n
                |  FROM a$it a, range(1, ${dim + 1}) t(i) GROUP BY 1, 2),
                |cents$it AS (
                |  SELECT p.ci, coalesce(u.cv, p.cv) AS cv
                |  FROM $prev p LEFT JOIN (
                |    SELECT ci, list(CAST(s AS DOUBLE)
                |      / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS cv
                |    FROM s$it GROUP BY ci) u USING (ci)),
                |""".stripMargin
    }
    sb ++= assignCte("asg", s"cents$iters", dim)
    sb.result()
  }

  /** Replay of [[Similarity.metaCentroids]] + two-level routed
    * assignment ([[Similarity.assignCellsRouted]]) — append after
    * [[lloydCtes]]. Derives the meta-Lloyd over `$cents` (the final
    * centroid CTE) with the identical arithmetic: seeded-Gaussian
    * super-centroid init inlined as literals, (score, idx) struct-max
    * ties to the HIGHER group (`ORDER BY sc DESC, gi DESC`),
    * e6-integer means (DuckDB round == Spark ROUND: half-up away from
    * zero — the engine mirrors it with BigDecimal HALF_UP), empty
    * groups keep their previous super-centroid. Appends CTEs
    * `{p}m0..{p}m{metaIters}`, `{p}grp` (ci → gi), `{p}gsup` (groups
    * that won ≥ 1 centroid — the only routable targets), `{p}rt`
    * (vector → group — `probes` rows per vector, the multi-probe
    * route) and `$out` — the routed assignment (id, e, ci) of `$src`
    * matching the engine's two-level path: the final rn = 1 window
    * takes the struct-max over the UNION of the probed groups'
    * centroids, which is exactly `greatest` over per-group bests
    * (centroid→group is a function, so the union has no duplicate
    * candidates). The `p` prefix makes the block chainable per
    * training iteration ([[routedLloydCtes]]); defaults (including
    * probes = 1, emitted as the original `rn = 1` predicate) keep the
    * d18 text byte-stable. */
  def routedCtes(
      cents: String, r: Int, metaIters: Int = 2, dim: Int = 64,
      seed: Long = 42L, p: String = "", src: String = "v",
      out: String = "asgr", materialized: Boolean = false,
      probes: Int = 1): String = {
    // DuckDB inlines CTEs by default; a chain of routed blocks where
    // each level references the previous ~5 times re-evaluates the
    // whole subtree exponentially (observed: the s29 oracle ran for
    // minutes inlined, sub-second materialized). MATERIALIZED pins
    // each level to one evaluation; d18's single-block call keeps the
    // byte-stable default.
    val M = if (materialized) "MATERIALIZED " else ""
    val init = Similarity.initialCentroids(r, dim, seed)
    val m0rows = init.zipWithIndex.map { case (c, g) =>
      s"($g, [${c.mkString(", ")}])"
    }.mkString(",\n    ")
    def metaAssign(name: String, sup: String): String =
      s"""$name AS $M(
         |  SELECT ci, cv, gi FROM (
         |    SELECT ci, cv, gi,
         |      row_number() OVER (PARTITION BY ci ORDER BY sc DESC, gi DESC)
         |        AS rn
         |    FROM (
         |      SELECT c.ci, c.cv, m.gi,
         |        ${dotListQ("c.cv", "m.gv", dim)} / ${normQ("c.cv")} AS sc
         |      FROM $cents c, $sup m))
         |  WHERE rn = 1)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""${p}m0(gi, gv) AS $M(VALUES
              |    $m0rows),
              |""".stripMargin
    for (it <- 1 to metaIters) {
      val prev = s"${p}m${it - 1}"
      sb ++= metaAssign(s"${p}ma$it", prev) + ",\n"
      sb ++= s"""${p}ms$it AS $M(
                |  SELECT a.gi, t.i,
                |    sum(CAST(round(a.cv[t.i] * 1000000) AS BIGINT)) AS s,
                |    count(*) AS n
                |  FROM ${p}ma$it a, range(1, ${dim + 1}) t(i) GROUP BY 1, 2),
                |${p}m$it AS $M(
                |  SELECT p.gi, coalesce(u.gv, p.gv) AS gv
                |  FROM $prev p LEFT JOIN (
                |    SELECT gi, list(CAST(s AS DOUBLE)
                |      / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS gv
                |    FROM ${p}ms$it GROUP BY gi) u USING (gi)),
                |""".stripMargin
    }
    sb ++= metaAssign(s"${p}grp", s"${p}m$metaIters") + ",\n"
    sb ++= s"""${p}gsup AS $M(
              |  SELECT DISTINCT g.gi, m.gv
              |  FROM ${p}grp g JOIN ${p}m$metaIters m USING (gi)),
              |${p}rt AS $M(
              |  SELECT id, e, gi FROM (
              |    SELECT id, e, gi,
              |      row_number() OVER (PARTITION BY id ORDER BY sc DESC, gi DESC)
              |        AS rn
              |    FROM (
              |      SELECT v.id, v.e, s.gi,
              |        ${dotListQ("v.e", "s.gv", dim)} / ${normQ("v.e")} AS sc
              |      FROM $src v, ${p}gsup s))
              |  WHERE ${if (probes == 1) "rn = 1" else s"rn <= $probes"}),
              |$out AS $M(
              |  SELECT id, e, ci FROM (
              |    SELECT id, e, ci,
              |      row_number() OVER (PARTITION BY id ORDER BY sc DESC, ci DESC)
              |        AS rn
              |    FROM (
              |      SELECT r.id, r.e, c.ci,
              |        ${dotListQ("r.e", "c.cv", dim)} / ${normQ("r.e")} AS sc
              |      FROM ${p}rt r
              |      JOIN ${p}grp g ON g.gi = r.gi
              |      JOIN $cents c ON c.ci = g.ci))
              |  WHERE rn = 1)""".stripMargin
    sb.result()
  }

  /** Replay of the ROUTED-TRAINING build path
    * ([[Similarity.ivfBuild]] with `k > routedAbove`): every Lloyd
    * iteration assigns the training sample through the TWO-LEVEL route
    * — a meta-Lloyd over the CURRENT centroids (recomputed per
    * iteration as they move, r = ⌈√k⌉), then only the winning group's
    * centroids — and the FINAL corpus assignment routes through the
    * final centroids' meta. Each iteration chains one [[routedCtes]]
    * block (prefix `t{it}`) whose output feeds the same e6-integer
    * means as the flat [[lloydCtes]]; the final block (prefix `f`)
    * emits `asgr` over the full corpus. This is the PRODUCTION
    * trajectory for corpus-pinned k — the s29 vehicle forces
    * `routedAbove` below a fixture-scale k (the s18 trick) so the path
    * carries a hash oracle, not just spec pins.
    *
    * Routed builds probe the top-2 groups
    * ([[Similarity.RouteProbesBalanced]] — ivfBuild's default whenever
    * it routes), so `probes` defaults to 2 here: every `rt` level
    * carries two rows per vector and the per-level rn = 1 window takes
    * the struct-max over both probed groups' centroids. */
  def routedLloydCtes(
      k: Int = 16, iters: Int = 3, dim: Int = 64, seed: Long = 42L,
      trainCap: Int = 0, metaIters: Int = 2,
      probes: Int = Similarity.RouteProbesBalanced): String = {
    val cap = Similarity.lloydTrainCap(trainCap, k)
    val r = math.ceil(math.sqrt(k.toDouble)).toInt
    val init = Similarity.initialCentroids(k, dim, seed)
    val c0rows = init.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(", ")}])"
    }.mkString(",\n    ")
    // every CTE here is MATERIALIZED: each routed level references the
    // previous ~5 times, and DuckDB's default inlining re-evaluates the
    // whole subtree per reference — exponential in `iters` (the
    // unmaterialized s29 oracle ran for minutes; materialized it's
    // sub-second)
    val sb = new StringBuilder
    sb ++= s"""v AS MATERIALIZED (SELECT vec_id AS id, embedding AS e FROM embeddings),
              |vt AS MATERIALIZED (
              |  SELECT id, e FROM v
              |  ORDER BY ${DedupQueries.pmSql("CAST(id AS VARCHAR)")}, id
              |  LIMIT $cap),
              |cents0(ci, cv) AS MATERIALIZED (VALUES
              |    $c0rows),
              |""".stripMargin
    for (it <- 1 to iters) {
      val prev = s"cents${it - 1}"
      sb ++= routedCtes(prev, r, metaIters, dim, seed,
        p = s"t$it", src = "vt", out = s"a$it", materialized = true,
        probes = probes) + ",\n"
      sb ++= s"""s$it AS MATERIALIZED (
                |  SELECT a.ci, t.i,
                |    sum(CAST(round(CAST(a.e[t.i] AS DOUBLE) * 1000000)
                |      AS BIGINT)) AS s,
                |    count(*) AS n
                |  FROM a$it a, range(1, ${dim + 1}) t(i) GROUP BY 1, 2),
                |cents$it AS MATERIALIZED (
                |  SELECT p.ci, coalesce(u.cv, p.cv) AS cv
                |  FROM $prev p LEFT JOIN (
                |    SELECT ci, list(CAST(s AS DOUBLE)
                |      / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS cv
                |    FROM s$it GROUP BY ci) u USING (ci)),
                |""".stripMargin
    }
    sb ++= routedCtes(s"cents$iters", r, metaIters, dim, seed, p = "f",
      materialized = true, probes = probes)
    sb.result()
  }

  /** Replay of [[Similarity.pqBuild]]'s per-subspace Lloyd training
    * over an arbitrary source CTE `$src` of rows (id, `$rCol`) whose
    * vector elements cast to DOUBLE (raw float embeddings for s7,
    * residual doubles for s9).
    *
    * Appends CTEs `{p}sub, {p}b0 … {p}b{iters}, {p}codes` where
    * `{p}codes` = (id, codes LIST ordered by subspace) — matching
    * `pqBuild(...).encoded`. Assignment score is the argmax-L2
    * identity `sv·c − |c|²/2` with |c|²/2 recomputed from the same
    * codebook doubles on both engines; ties break toward the higher
    * code (the engine's struct-max). */
  def pqCtes(
      src: String, rCol: String, m: Int = 8, k: Int = 16,
      iters: Int = 3, subDim: Int = 8, seed: Long = 42L,
      p: String = "pq", trainCap: Int = 0,
      trainWhere: String = ""): String = {
    val cap = Similarity.lloydTrainCap(trainCap, k)
    // s34's incremental-append replay trains the codebooks on a
    // RESTRICTED base (the pre-append half's residuals) while {p}subf
    // still encodes the full source — frozen-codebook append is the
    // same argmin expression over both halves. The default empty
    // predicate keeps the s8/s9/s28 oracle text byte-stable.
    val tw = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val init = Similarity.initialCodebooks(m, k, subDim, seed)
    val b0rows = (for {
      j <- 0 until m; code <- 0 until k
    } yield s"($j, $code, [${init(j)(code).mkString(", ")}])")
      .mkString(",\n    ")
    def assign(name: String, books: String, sub: String): String =
      s"""$name AS (
         |  SELECT id, j, sv, code FROM (
         |    SELECT id, j, sv, code,
         |      row_number() OVER (PARTITION BY id, j
         |        ORDER BY sc DESC, code DESC) AS rn
         |    FROM (
         |      SELECT s.id, s.j, s.sv, b.code,
         |        list_sum(list_transform(range(1, ${subDim + 1}),
         |          i -> s.sv[i] * b.cv[i]))
         |        - list_sum(list_transform(b.cv, x -> x * x)) / 2.0 AS sc
         |      FROM $sub s JOIN $books b ON b.j = s.j))
         |  WHERE rn = 1)""".stripMargin
    // training subvectors come from the deterministic pmd5-ordered
    // sample ({p}smp — the engine's trainSampleFrame contract); the
    // final encode ({p}af) assigns the FULL source
    val sb = new StringBuilder
    sb ++= s"""${p}smp AS (
              |  SELECT * FROM $src$tw
              |  ORDER BY ${DedupQueries.pmSql("CAST(id AS VARCHAR)")}, id
              |  LIMIT $cap),
              |${p}sub AS (
              |  SELECT id, j, list_transform(range(1, ${subDim + 1}),
              |    i -> CAST($rCol[j * $subDim + i] AS DOUBLE)) AS sv
              |  FROM ${p}smp, range(0, $m) t(j)),
              |${p}subf AS (
              |  SELECT id, j, list_transform(range(1, ${subDim + 1}),
              |    i -> CAST($rCol[j * $subDim + i] AS DOUBLE)) AS sv
              |  FROM $src, range(0, $m) t(j)),
              |${p}b0(j, code, cv) AS (VALUES
              |    $b0rows),
              |""".stripMargin
    for (it <- 1 to iters) {
      sb ++= assign(s"${p}a$it", s"${p}b${it - 1}", s"${p}sub") + ",\n"
      sb ++= s"""${p}s$it AS (
                |  SELECT a.j, a.code, t.i,
                |    sum(CAST(round(sv[t.i] * 1000000) AS BIGINT)) AS s,
                |    count(*) AS n
                |  FROM ${p}a$it a, range(1, ${subDim + 1}) t(i)
                |  GROUP BY 1, 2, 3),
                |${p}b$it AS (
                |  SELECT pb.j, pb.code, coalesce(u.cv, pb.cv) AS cv
                |  FROM ${p}b${it - 1} pb LEFT JOIN (
                |    SELECT j, code, list(CAST(s AS DOUBLE)
                |      / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS cv
                |    FROM ${p}s$it GROUP BY 1, 2) u USING (j, code)),
                |""".stripMargin
    }
    sb ++= assign(s"${p}af", s"${p}b$iters", s"${p}subf") + ",\n"
    sb ++= s"""${p}codes AS (
              |  SELECT id, list(code ORDER BY j) AS codes
              |  FROM ${p}af GROUP BY id)""".stripMargin
    sb.result()
  }
}
