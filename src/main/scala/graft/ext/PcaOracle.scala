package graft.ext

/** Generated DuckDB replay of [[Pca.topComponent]] — every intermediate
  * is an exact integer (e4-quantized inputs, HUGEINT moment sums,
  * truncate-toward-zero e6 normalizations: DuckDB `//` ≡ Scala BigInt
  * `/`), so the full covariance + fixed-round power iteration replays
  * bit-for-bit as a MATERIALIZED-CTE chain (the t11 lesson: each round
  * references its predecessor twice, so un-materialized CTEs inline
  * exponentially): `q` (quantized vectors), `nn/fs/ps`
  * (moments), `cm` (symmetric e6 matrix), `v0, w1, v1 … v{iters}`.
  */
object PcaOracle {

  def sql(
      table: String = "embeddings", vecCol: String = "embedding",
      dim: Int = 64, iters: Int = 60, scale: Long = 10000L): String =
    s"WITH ${ctes(table, vecCol, dim, iters, scale)}\n" +
      s"SELECT CAST(i AS BIGINT) AS dim_idx, CAST(v AS BIGINT) AS eig_e6\n" +
      s"FROM v$iters"

  /** The CTE body alone (`q … v{iters}`), for composition — s14 appends
    * the dominant-direction-removal projection and a cosine re-rank. */
  def ctes(
      table: String = "embeddings", vecCol: String = "embedding",
      dim: Int = 64, iters: Int = 60, scale: Long = 10000L): String = {
    val sb = new StringBuilder
    sb ++= s"""q AS MATERIALIZED (
              |  SELECT list_transform($vecCol, x ->
              |    CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT)) AS e
              |  FROM $table
              |), nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q),
              |fs AS (
              |  SELECT t.i, sum(e[t.i]) AS s
              |  FROM q, range(1, ${dim + 1}) t(i) GROUP BY 1
              |), ps AS MATERIALIZED (
              |  SELECT t.i, u.j, sum(CAST(e[t.i] AS HUGEINT) * e[u.j]) AS s
              |  FROM q, range(1, ${dim + 1}) t(i), range(1, ${dim + 1}) u(j)
              |  WHERE u.j >= t.i GROUP BY 1, 2
              |), m AS MATERIALIZED (
              |  SELECT p.i, p.j, nn.n * p.s - f1.s * f2.s AS m
              |  FROM ps p, nn, fs f1, fs f2
              |  WHERE f1.i = p.i AND f2.i = p.j
              |), mx AS (SELECT greatest(max(abs(m)), 1) AS mx FROM m),
              |cm AS MATERIALIZED (
              |  SELECT i, j, (m * 1000000) // mx AS c FROM m, mx
              |  UNION ALL
              |  SELECT j, i, (m * 1000000) // mx AS c FROM m, mx WHERE i <> j
              |), v0 AS (
              |  SELECT t.i, CAST(1000000 AS HUGEINT) AS v
              |  FROM range(1, ${dim + 1}) t(i)
              |)""".stripMargin
    for (it <- 1 to iters) {
      sb ++= s""",
                |w$it AS MATERIALIZED (
                |  SELECT c.i, sum(c.c * v.v) AS w
                |  FROM cm c JOIN v${it - 1} v ON v.i = c.j GROUP BY 1
                |), x$it AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS m FROM w$it),
                |v$it AS MATERIALIZED (
                |  SELECT i, (w * 1000000) // m AS v FROM w$it, x$it
                |)""".stripMargin
    }
    sb.result()
  }
}
