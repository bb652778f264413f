package graft.query

import org.apache.spark.sql.functions._

/** Query-pack surface for [[StatTests]] over `events`. Every oracle
  * replays the identical formulation: integer milli-unit floors per row
  * before any sum, integer rank/ECDF arithmetic, and — where a double
  * appears (t statistics, χ² cell terms) — the textually identical
  * expression tree over exact integer aggregates, so DuckDB reproduces
  * each statistic bit-for-bit. Final columns are strings/int64 only
  * (driver-compare contract; DuckDB HUGEINT sums are CAST to BIGINT).
  */
object StatQueries {

  // shared oracle CTEs: per-group moments / (pair, value) frequencies
  private val momentsCte =
    """m AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(floor(value*1000) AS BIGINT)) AS s,
      |    sum(CAST(floor(value*1000) AS BIGINT)
      |      * CAST(floor(value*1000) AS BIGINT)) AS ss
      |  FROM events GROUP BY 1
      |)""".stripMargin

  private val pairFreqCte =
    """f AS (
      |  SELECT event_type AS g, CAST(floor(value*1000) AS BIGINT) AS v,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), gs AS (SELECT DISTINCT event_type AS ga FROM events),
      |pr AS (
      |  SELECT a.ga AS ga, b.ga AS gb FROM gs a, gs b WHERE a.ga < b.ga
      |), pf AS (
      |  SELECT pr.ga, pr.gb, f.v,
      |    sum(CASE WHEN f.g = pr.ga THEN f.c ELSE 0 END) AS c1,
      |    sum(CASE WHEN f.g = pr.gb THEN f.c ELSE 0 END) AS c2
      |  FROM f JOIN pr ON f.g = pr.ga OR f.g = pr.gb
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  // unrolled-epoch oracle for q77: each epoch is a cross-join of the
  // 1-row weight state with the data, aggregated to exact HUGEINT
  // gradient sums, then a truncating-division update — the SQL replay
  // of Stats.gdLinearRegression's driver loop.
  private def gdOracle(epochs: Int): String = {
    val base =
      """WITH d AS (
        |  SELECT CAST(user_id % 100 AS BIGINT) AS x,
        |    CAST(CAST(round(value*100) AS BIGINT) * 1000000 AS HUGEINT) AS y6
        |  FROM events
        |), e0 AS (SELECT CAST(0 AS HUGEINT) AS w, CAST(0 AS HUGEINT) AS b)""".stripMargin
    val steps = (1 to epochs).map { k =>
      s""", g$k AS (
         |  SELECT e.w, e.b, sum((e.w*d.x + e.b - d.y6)*d.x) AS gw,
         |    sum(e.w*d.x + e.b - d.y6) AS gb, count(*) AS n
         |  FROM e${k - 1} e, d GROUP BY e.w, e.b
         |), e$k AS (
         |  SELECT w - (2*gw) // (n*10000) AS w,
         |    b - (2*gb) // (n*10) AS b, n FROM g$k
         |)""".stripMargin
    }.mkString
    base + steps +
      s"""
         |SELECT CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w_e6,
         |  CAST(b AS BIGINT) AS b_e6 FROM e$epochs""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // deterministic batch-GD linear regression (the ClickHouse
    // stochasticLinearRegression shape, distribution-safe): value
    // cents against the user-id bucket, 8 exact integer epochs.
    Q("q77_gd_linreg", gdOracle(8)) { (s, dir) =>
      Stats.gdLinearRegression(
        Tables.load(s, dir, "events"),
        col("user_id") % 100,
        Tables.cents(col("value")) * 1000000L, epochs = 8)
    },

    // Student + Welch t over every event_type pair. Raw rows reduce to
    // five (n, Σv, Σv²) rows in one shuffle; the statistics are one
    // fixed double tree over those exact integers.
    Q(
      "q60_ttests",
      s"""WITH $momentsCte, p AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2,
        |    a.n AS n1, a.s AS s1, a.ss AS ss1,
        |    b.n AS n2, b.s AS s2, b.ss AS ss2
        |  FROM m a, m b WHERE a.event_type < b.event_type
        |), e AS (
        |  SELECT t1, t2, n1, n2,
        |    CAST(s1 AS DOUBLE)/n1 AS m1, CAST(s2 AS DOUBLE)/n2 AS m2,
        |    (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n1)
        |      /(n1-1) AS v1,
        |    (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/n2)
        |      /(n2-1) AS v2
        |  FROM p
        |)
        |SELECT t1 AS event_type1, t2 AS event_type2,
        |  CAST(floor((m1-m2)/(sqrt(((n1-1)*v1 + (n2-1)*v2)/(n1+n2-2))
        |    * sqrt(1.0/n1 + 1.0/n2)) * 1e6) AS BIGINT) AS student_t_e6,
        |  CAST(floor((m1-m2)/sqrt(v1/n1 + v2/n2) * 1e6) AS BIGINT)
        |    AS welch_t_e6,
        |  CAST(floor(((v1/n1 + v2/n2)*(v1/n1 + v2/n2))
        |    /((v1/n1)*(v1/n1)/(n1-1) + (v2/n2)*(v2/n2)/(n2-1)) * 1e3)
        |    AS BIGINT) AS welch_df_e3
        |FROM e""".stripMargin) { (s, dir) =>
      StatTests.tTests(Tables.load(s, dir, "events"), "event_type", "value")
    },

    // Mann–Whitney rank-sum, fully integer via 2×avg-rank = 2·cum+c+1.
    Q(
      "q61_mann_whitney",
      s"""WITH $pairFreqCte, w AS (
        |  SELECT ga, gb, c1, c2,
        |    coalesce(sum(c1+c2) OVER (PARTITION BY ga, gb ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM pf
        |)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |  CAST(sum(c1*(2*cb + c1 + c2 + 1)) - sum(c1)*(sum(c1)+1)
        |    AS BIGINT) AS u1_x2
        |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      StatTests.mannWhitneyU(
        Tables.load(s, dir, "events"), "event_type", "value")
    },

    // Kolmogorov–Smirnov distance as the exact integer numerator
    // max |cum1·n2 − cum2·n1| (D = ks_num/(n1·n2)).
    Q(
      "q62_ks_test",
      s"""WITH $pairFreqCte, w AS (
        |  SELECT ga, gb,
        |    sum(c1) OVER (PARTITION BY ga, gb ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    sum(c2) OVER (PARTITION BY ga, gb ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
        |    sum(c1) OVER (PARTITION BY ga, gb) AS tn1,
        |    sum(c2) OVER (PARTITION BY ga, gb) AS tn2
        |  FROM pf
        |)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST(max(tn1) AS BIGINT) AS n1, CAST(max(tn2) AS BIGINT) AS n2,
        |  CAST(max(abs(cum1*tn2 - cum2*tn1)) AS BIGINT) AS ks_num
        |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      StatTests.ksTest(Tables.load(s, dir, "events"), "event_type", "value")
    },

    // skewPop / kurtPop from exact integer raw moments (unit-floored
    // values so Σv⁴ stays in int64).
    Q(
      "q69_moment_stats",
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(floor(value) AS BIGINT)) AS s1,
        |    sum(CAST(floor(value) AS BIGINT)*CAST(floor(value) AS BIGINT)) AS s2,
        |    sum(CAST(floor(value) AS BIGINT)*CAST(floor(value) AS BIGINT)
        |      *CAST(floor(value) AS BIGINT)) AS s3,
        |    sum(CAST(floor(value) AS BIGINT)*CAST(floor(value) AS BIGINT)
        |      *CAST(floor(value) AS BIGINT)*CAST(floor(value) AS BIGINT)) AS s4
        |  FROM events GROUP BY 1
        |), e AS (
        |  SELECT event_type,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
        |    CAST(s4 AS DOUBLE) AS d4
        |  FROM m
        |), c AS (
        |  SELECT event_type,
        |    d2/nd - mu*mu AS m2,
        |    d3/nd - 3.0*mu*(d2/nd) + 2.0*mu*mu*mu AS m3,
        |    d4/nd - 4.0*mu*(d3/nd) + 6.0*mu*mu*(d2/nd) - 3.0*mu*mu*mu*mu AS m4
        |  FROM e
        |)
        |SELECT event_type,
        |  CAST(floor(m3/sqrt(m2*m2*m2) * 1e6) AS BIGINT) AS skew_e6,
        |  CAST(floor((m4/(m2*m2) - 3.0) * 1e6) AS BIGINT) AS kurt_e6
        |FROM c""".stripMargin) { (s, dir) =>
      StatTests.momentStats(
        Tables.load(s, dir, "events"), "event_type", "value")
    },

    // Cramér's V: event_type × value-bucket contingency over the FULL
    // r×c grid; χ² cell terms e6-floored before the (now integer) sum.
    Q(
      "q63_cramers_v",
      """WITH obs AS (
        |  SELECT event_type AS a,
        |    CAST(floor(value*1000) AS BIGINT) // 50000 AS b, count(*) AS o
        |  FROM events GROUP BY 1, 2
        |), rt AS (SELECT a, sum(o) AS nr FROM obs GROUP BY 1),
        |ct AS (SELECT b, sum(o) AS nc FROM obs GROUP BY 1),
        |meta AS (
        |  SELECT (SELECT count(*) FROM rt) AS r,
        |    (SELECT count(*) FROM ct) AS c,
        |    (SELECT sum(o) FROM obs) AS n
        |), grid AS (
        |  SELECT rt.nr, ct.nc, coalesce(obs.o, 0) AS o, meta.r, meta.c, meta.n
        |  FROM rt CROSS JOIN ct CROSS JOIN meta
        |  LEFT JOIN obs ON obs.a = rt.a AND obs.b = ct.b
        |), t AS (
        |  SELECT r, c, n,
        |    CAST(floor(
        |      (o - CAST(nr AS DOUBLE)*nc/n)*(o - CAST(nr AS DOUBLE)*nc/n)
        |        /(CAST(nr AS DOUBLE)*nc/n) * 1e6) AS BIGINT) AS t6
        |  FROM grid
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(sum(t6) AS BIGINT) AS chi2_e6,
        |  CAST(floor(sqrt(CAST(sum(t6) AS BIGINT)/1e6/n/least(r-1, c-1))
        |    * 1e6) AS BIGINT) AS cramers_v_e6
        |FROM t GROUP BY r, c, n""".stripMargin) { (s, dir) =>
      StatTests.cramersV(
        Tables.load(s, dir, "events")
          .withColumn("_bucket",
            expr("CAST(floor(value*1000) AS BIGINT) div 50000")),
        "event_type", "_bucket")
    },

    // Benford first-digit profile (data-quality audit): observed
    // first-significant-digit counts vs the Benford expectation
    // log10(1+1/d), χ² terms e6-floored per digit (the q63 ladder) so
    // the sum is integer. One scan, 9-row frame.
    Q(
      "q85_benford_profile",
      """WITH e AS (
        |  SELECT CAST(substr(CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS d
        |  FROM events WHERE CAST(round(value*100) AS BIGINT) > 0
        |), o AS (
        |  SELECT d, count(*) AS obs FROM e GROUP BY d
        |), n AS (SELECT sum(obs) AS n FROM o),
        |t AS (
        |  SELECT o.d, o.obs, n.n,
        |    CAST(n.n AS DOUBLE) * ln(1.0 + 1.0/o.d) / ln(10.0) AS exp
        |  FROM o, n
        |)
        |SELECT d, CAST(obs AS BIGINT) AS obs,
        |  CAST(floor(exp * 100) AS BIGINT) AS expected_c2,
        |  CAST(floor((obs - exp)*(obs - exp)/exp * 1e6) AS BIGINT)
        |    AS chi2_term_e6
        |FROM t""".stripMargin) { (s, dir) =>
      val vc = Tables.cents(col("value"))
      val o = Tables.load(s, dir, "events")
        .where(vc > 0)
        .select(substring(vc.cast("string"), 1, 1).cast("long").as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("obs"))
      val n = o.agg(sum(col("obs")).as("n"))
      val expCol = col("n").cast("double") *
        log(lit(1.0) + lit(1.0) / col("d")) / log(lit(10.0))
      o.crossJoin(broadcast(n))
        .select(col("d"), col("obs"),
          floor(expCol * 100).cast("long").as("expected_c2"),
          floor((col("obs") - expCol) * (col("obs") - expCol) / expCol *
            lit(1e6)).cast("long").as("chi2_term_e6"))
    },

    // exact median absolute deviation (robust dispersion): the q52
    // integer-threshold lower median, applied twice — once over values,
    // once over |value − median| after a broadcast join of the 5-row
    // median frame. Both windows run over distinct-value frames, all
    // integer.
    Q(
      "q84_mad",
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events
        |), g1 AS (
        |  SELECT event_type, vc, count(*) AS c FROM e GROUP BY 1, 2
        |), c1 AS (
        |  SELECT event_type, vc,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM g1
        |), med AS (
        |  SELECT event_type, min(vc) AS median_c
        |  FROM c1 WHERE 2 * cw >= n GROUP BY event_type
        |), d AS (
        |  SELECT e.event_type, abs(e.vc - m.median_c) AS dv
        |  FROM e JOIN med m ON e.event_type = m.event_type
        |), g2 AS (
        |  SELECT event_type, dv, count(*) AS c FROM d GROUP BY 1, 2
        |), c2 AS (
        |  SELECT event_type, dv,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY dv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM g2
        |), mad AS (
        |  SELECT event_type, min(dv) AS mad_c
        |  FROM c2 WHERE 2 * cw >= n GROUP BY event_type
        |)
        |SELECT med.event_type, CAST(median_c AS BIGINT) AS median_c,
        |  CAST(mad_c AS BIGINT) AS mad_c
        |FROM med JOIN mad ON med.event_type = mad.event_type""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        def lowerMedian(df: org.apache.spark.sql.DataFrame, vCol: String,
            out: String) = {
          val cum = Window.partitionBy(col("event_type")).orderBy(col(vCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val tot = Window.partitionBy(col("event_type"))
          df.groupBy(col("event_type"), col(vCol))
            .agg(count(lit(1)).as("_c"))
            .withColumn("_cw", sum(col("_c")).over(cum))
            .withColumn("_n", sum(col("_c")).over(tot))
            .where(col("_cw") * 2 >= col("_n"))
            .groupBy(col("event_type"))
            .agg(min(col(vCol)).as(out))
        }
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), Tables.cents(col("value")).as("vc"))
        val med = lowerMedian(e, "vc", "median_c")
        val dev = e.join(broadcast(med), "event_type")
          .select(col("event_type"),
            abs(col("vc") - col("median_c")).as("dv"))
        lowerMedian(dev, "dv", "mad_c")
          .join(broadcast(med), "event_type")
          .select(col("event_type"), col("median_c"), col("mad_c"))
    },

    // Spearman ρ between value and arrival time per type (ClickHouse
    // rankCorr): integer 2×avg-ranks, exact int64 Pearson sufficient
    // stats, one fixed double tree at the end.
    Q(
      "q70_rank_corr",
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
        |    epoch_us(ts) AS y
        |  FROM events
        |), r AS (
        |  SELECT event_type,
        |    2*rank() OVER (PARTITION BY event_type ORDER BY x)
        |      + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
        |    2*rank() OVER (PARTITION BY event_type ORDER BY y)
        |      + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
        |  FROM e
        |), m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(rx) AS sx, sum(ry) AS sy, sum(rx*rx) AS sxx,
        |    sum(ry*ry) AS syy, sum(rx*ry) AS sxy
        |  FROM r GROUP BY 1
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS rho_e6
        |FROM m""".stripMargin) { (s, dir) =>
      StatTests.spearmanRho(
        Tables.load(s, dir, "events"), "event_type",
        Tables.cents(col("value")), expr("ts div 1000"))
    },

    // Theil's U — U(event_type | hour-of-day) — via the q51 entropy
    // ladder over the persisted contingency grid.
    Q(
      "q71_theils_u",
      """WITH ab AS (
        |  SELECT event_type AS a, (epoch_us(ts) // 3600000000) % 24 AS b,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), am AS (SELECT a, sum(c) AS ca FROM ab GROUP BY 1),
        |a2 AS (
        |  SELECT sum(ca) AS n,
        |    sum(CAST(floor(1e6 * ca * ln(ca)) AS BIGINT)) AS sa
        |  FROM am
        |), bm AS (SELECT b, sum(c) AS cb FROM ab GROUP BY 1),
        |b2 AS (
        |  SELECT sum(CAST(floor(1e6 * cb * ln(cb)) AS BIGINT)) AS sb FROM bm
        |), c2 AS (
        |  SELECT sum(CAST(floor(1e6 * c * ln(c)) AS BIGINT)) AS sab FROM ab
        |), h AS (
        |  SELECT n,
        |    CAST(floor(1e6 * ln(n)) AS BIGINT) - sa // n AS h_a_e6,
        |    (sb - sab) // n AS h_cond_e6
        |  FROM a2, b2, c2
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(h_a_e6 AS BIGINT) AS h_a_e6,
        |  CAST(h_cond_e6 AS BIGINT) AS h_cond_e6,
        |  CAST(floor(1e6 * (CAST(h_a_e6 AS DOUBLE) - CAST(h_cond_e6 AS DOUBLE))
        |    / CAST(h_a_e6 AS DOUBLE)) AS BIGINT) AS theils_u_e6
        |FROM h""".stripMargin) { (s, dir) =>
      StatTests.theilsU(
        Tables.load(s, dir, "events"),
        col("event_type"),
        (expr("(ts div 1000) div 3600000000") % 24).as("_hr"))
    },

    // categoricalInformationValue (ClickHouse): WOE + IV term per
    // user-bucket for the purchase/other label split.
    Q(
      "q73_categorical_iv",
      """WITH g AS (
        |  SELECT user_id % 20 AS category,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS good,
        |    sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS bad
        |  FROM events GROUP BY 1
        |), t AS (SELECT sum(good) AS gt, sum(bad) AS bt FROM g)
        |SELECT category, CAST(good AS BIGINT) AS good,
        |  CAST(bad AS BIGINT) AS bad,
        |  CAST(floor((ln(CAST(good AS DOUBLE) * CAST(bt AS DOUBLE))
        |    - ln(CAST(bad AS DOUBLE) * CAST(gt AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS woe_e6,
        |  CAST(floor((CAST(good AS DOUBLE)/CAST(gt AS DOUBLE)
        |      - CAST(bad AS DOUBLE)/CAST(bt AS DOUBLE))
        |    * (ln(CAST(good AS DOUBLE) * CAST(bt AS DOUBLE))
        |      - ln(CAST(bad AS DOUBLE) * CAST(gt AS DOUBLE))) * 1e9)
        |    AS BIGINT) AS iv_term_e9
        |FROM g, t WHERE good > 0 AND bad > 0""".stripMargin) { (s, dir) =>
      StatTests.categoricalIV(
        Tables.load(s, dir, "events"),
        col("user_id") % 20,
        (col("event_type") === "purchase").cast("long"))
    },

    // one-pass pairwise Pearson MATRIX (ClickHouse corrMatrix) over
    // lineitem's four numeric measures in cents: a single aggregation
    // carries n, every Σx and every Σx·y as exact Decimal sums, then
    // each of the 6 correlations is one fixed double tree (q34's
    // discipline, matrix-wide). Oracle replays the identical sums in
    // HUGEINT and the identical trees.
    Q("q87_corr_matrix", corrMatrixOracleSql) { (s, dir) =>
      Stats.corrMatrixE6(
        Tables.load(s, dir, "lineitem"),
        CorrMatrixVars.map { case (n, c) => n -> Tables.cents(col(c)) })
    }
  )

  /** (output var name, lineitem column) — shared by q87 and its oracle.
    * `lazy` because `all`'s Q entries force the oracle SQL during
    * object init, before ordinary vals declared below `all` would be
    * assigned (the d3 "null" lesson). */
  private lazy val CorrMatrixVars = Seq(
    ("quantity_c", "l_quantity"), ("price_c", "l_extendedprice"),
    ("discount_c", "l_discount"), ("tax_c", "l_tax"))

  private lazy val corrMatrixOracleSql: String = {
    val vs = CorrMatrixVars
    val defs = vs.map { case (n, c) => s"CAST(round($c*100) AS BIGINT) AS $n" }
      .mkString(",\n    ")
    val sums = vs.map { case (n, _) => s"sum($n) AS s_$n" }
    val prods = for {
      i <- vs.indices; j <- i until vs.size
    } yield s"sum(CAST(${vs(i)._1} AS HUGEINT)*CAST(${vs(j)._1} AS HUGEINT))" +
      s" AS ss_${vs(i)._1}_${vs(j)._1}"
    def dbl(c: String) = s"CAST($c AS DOUBLE)"
    val arms = for {
      i <- vs.indices; j <- (i + 1) until vs.size
    } yield {
      val (a, b) = (vs(i)._1, vs(j)._1)
      val cov = s"(${dbl("n")}*${dbl(s"ss_${a}_$b")} - ${dbl(s"s_$a")}*${dbl(s"s_$b")})"
      val va = s"(${dbl("n")}*${dbl(s"ss_${a}_$a")} - ${dbl(s"s_$a")}*${dbl(s"s_$a")})"
      val vb = s"(${dbl("n")}*${dbl(s"ss_${b}_$b")} - ${dbl(s"s_$b")}*${dbl(s"s_$b")})"
      s"""SELECT '$a' AS var_a, '$b' AS var_b,
         |  CASE WHEN $va > 0 AND $vb > 0
         |    THEN CAST(floor($cov / (sqrt($va) * sqrt($vb)) * 1e6) AS BIGINT)
         |  END AS corr_e6
         |FROM m""".stripMargin
    }
    s"""WITH d AS (
       |  SELECT
       |    $defs
       |  FROM lineitem
       |), m AS (
       |  SELECT count(*) AS n,
       |    ${(sums ++ prods).mkString(",\n    ")}
       |  FROM d
       |)
       |${arms.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
