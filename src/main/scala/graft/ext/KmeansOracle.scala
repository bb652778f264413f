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
      trainCap: Int = 0): String = {
    val cap = Similarity.lloydTrainCap(trainCap, k)
    val init = Similarity.initialCentroids(k, dim, seed)
    val c0rows = init.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(", ")}])"
    }.mkString(",\n    ")
    val sb = new StringBuilder
    sb ++= s"""v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
              |vt AS (
              |  SELECT id, e FROM v
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
      p: String = "pq", trainCap: Int = 0): String = {
    val cap = Similarity.lloydTrainCap(trainCap, k)
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
              |  SELECT * FROM $src
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
