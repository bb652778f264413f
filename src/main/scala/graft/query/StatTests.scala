package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests from the ClickHouse aggregate surface —
  * `studentTTest`, `welchTTest`, `mannWhitneyUTest`,
  * `kolmogorovSmirnovTest` — plus `cramersV` over a contingency table.
  *
  * Scale shape shared by all of them: ONE aggregation shuffle reduces
  * the raw stream to a tiny sufficient-statistic frame — moment sums
  * per group for the t-tests, a (group-pair, value) frequency table for
  * the rank/ECDF tests, an r×c contingency grid for Cramér's V — and
  * every window afterwards runs over that reduced frame (|distinct
  * values| rows, never |rows|). Raw rows are touched exactly once.
  *
  * Exactness discipline (the t18/q51 ladder): inputs are floored to
  * integer milli-units per ROW before any sum, so the shuffled
  * aggregates are exact integers whatever the partial-agg order; the
  * test statistic is then one fixed double expression tree over those
  * integers, which any engine replays bit-equally (IEEE ops on
  * identical inputs in identical order). Rank statistics (U, KS) never
  * leave the integers at all: ties use the 2×rank trick
  * (2·avgrank = 2·cum_before + c + 1) and the KS distance is kept as
  * the integer numerator |cum1·n2 − cum2·n1|.
  */
object StatTests {

  /** Per-group moment sums of `valE3Col` (an integer column): n, Σv,
    * Σv² — the sufficient statistics for both t-tests. Σv² of
    * milli-unit longs stays within int64 up to ~10⁸ rows per group at
    * |v|≤10⁶·e3; beyond that switch valE3 to a coarser unit (the
    * statistic is scale-invariant). */
  private def moments(df: DataFrame, groupCol: String, valE3Col: Column) =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(valE3Col).as("s"),
        sum(valE3Col * valE3Col).as("ss"))

  /** All unordered group pairs (a < b) of the moments frame, columns
    * suffixed 1/2. The frame is k rows for k groups — the self-join is
    * a broadcast of a handful of rows, never a shuffle. */
  private def pairs(m: DataFrame, groupCol: String): DataFrame = {
    val a = m.columns.foldLeft(m)((d, c) => d.withColumnRenamed(c, c + "1"))
    val b = m.columns.foldLeft(m)((d, c) => d.withColumnRenamed(c, c + "2"))
    a.join(broadcast(b), col(groupCol + "1") < col(groupCol + "2"))
  }

  /** Student (pooled-variance) and Welch (unpooled) t statistics plus
    * the Welch–Satterthwaite degrees of freedom, for every unordered
    * pair of groups. Output: (groupCol+"1", groupCol+"2",
    * student_t_e6, welch_t_e6, welch_df_e3) — e-floored longs. */
  def tTests(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val vE3 = floor(col(valCol) * 1000).cast("long")
    val p = pairs(moments(df, groupCol, vE3), groupCol)
    val m1 = col("s1").cast("double") / col("n1")
    val m2 = col("s2").cast("double") / col("n2")
    val var1 = (col("ss1").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("n1")) /
      (col("n1") - 1)
    val var2 = (col("ss2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double") / col("n2")) /
      (col("n2") - 1)
    val sp2 = ((col("n1") - 1) * var1 + (col("n2") - 1) * var2) /
      (col("n1") + col("n2") - 2)
    val studentT = (m1 - m2) /
      (sqrt(sp2) * sqrt(lit(1.0) / col("n1") + lit(1.0) / col("n2")))
    val a = var1 / col("n1")
    val b = var2 / col("n2")
    val welchT = (m1 - m2) / sqrt(a + b)
    val welchDf = ((a + b) * (a + b)) /
      ((a * a) / (col("n1") - 1) + (b * b) / (col("n2") - 1))
    p.select(col(groupCol + "1"), col(groupCol + "2"),
      floor(studentT * 1e6).cast("long").as("student_t_e6"),
      floor(welchT * 1e6).cast("long").as("welch_t_e6"),
      floor(welchDf * 1e3).cast("long").as("welch_df_e3"))
  }

  /** The shared (pair, value) frequency frame behind the rank/ECDF
    * tests: per unordered group pair and distinct milli-unit value,
    * the two groups' counts c1/c2. Built from the per-GROUP frequency
    * table (one shuffle over raw rows) fanned out to its ≤k−1 pairs by
    * a broadcast join — raw rows are never replicated, only the
    * value-level counts. */
  private def pairFreq(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val vE3 = floor(col(valCol) * 1000).cast("long")
    val freq = df.groupBy(col(groupCol).as("_g"), vE3.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val gs = df.select(col(groupCol).as("_ga")).distinct()
    val pr = gs.crossJoin(broadcast(gs.select(col("_ga").as("_gb"))))
      .where(col("_ga") < col("_gb"))
    freq.join(broadcast(pr), col("_g") === col("_ga") || col("_g") === col("_gb"))
      .groupBy(col("_ga"), col("_gb"), col("_v"))
      .agg(
        sum(when(col("_g") === col("_ga"), col("_c")).otherwise(0L)).as("_c1"),
        sum(when(col("_g") === col("_gb"), col("_c")).otherwise(0L)).as("_c2"))
  }

  /** Mann–Whitney U (two-sided rank-sum) per group pair, kept fully
    * INTEGER via the 2× trick: with ties, a value's average rank is
    * cum_before + (c+1)/2, so 2·Σranks₁ = Σ c1·(2·cum_before + c + 1)
    * and 2·U₁ = that − n1·(n1+1). Output: (group_a, group_b, n1, n2,
    * u1_x2). The window runs over the |distinct values| frame. */
  def mannWhitneyU(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val pf = pairFreq(df, groupCol, valCol)
    val w = Window.partitionBy(col("_ga"), col("_gb")).orderBy(col("_v"))
    pf.withColumn("_cb",
        coalesce(sum(col("_c1") + col("_c2"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col("_ga").as("group_a"), col("_gb").as("group_b"))
      .agg(
        sum(col("_c1")).as("n1"), sum(col("_c2")).as("n2"),
        sum(col("_c1") * (lit(2) * col("_cb") + col("_c1") + col("_c2") + 1))
          .as("_r2"))
      .select(col("group_a"), col("group_b"), col("n1"), col("n2"),
        (col("_r2") - col("n1") * (col("n1") + 1)).as("u1_x2"))
  }

  /** Kolmogorov–Smirnov distance per group pair as the exact integer
    * numerator: D = max over values of |ECDF₁ − ECDF₂| =
    * max |cum1·n2 − cum2·n1| / (n1·n2). Output: (group_a, group_b,
    * n1, n2, ks_num) with D = ks_num/(n1·n2). */
  def ksTest(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val pf = pairFreq(df, groupCol, valCol)
    val w = Window.partitionBy(col("_ga"), col("_gb")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("_ga"), col("_gb"))
    pf.withColumn("_cum1", sum(col("_c1")).over(w))
      .withColumn("_cum2", sum(col("_c2")).over(w))
      .withColumn("_n1", sum(col("_c1")).over(tot))
      .withColumn("_n2", sum(col("_c2")).over(tot))
      .groupBy(col("_ga").as("group_a"), col("_gb").as("group_b"))
      .agg(max(col("_n1")).as("n1"), max(col("_n2")).as("n2"),
        max(abs(col("_cum1") * col("_n2") - col("_cum2") * col("_n1")))
          .as("ks_num"))
  }

  /** Population skewness and excess-kurtosis per group — ClickHouse
    * `skewPop` / `kurtPop` — from exact INTEGER raw moments. Values
    * floor to whole units before any sum (higher moments are why:
    * Σv⁴ of milli-units would overflow int64; unit-floored values keep
    * Σv⁴ < 2⁶³ up to ~10⁸ rows at |v| ≤ 500), so n, Σv…Σv⁴ shuffle as
    * exact integers and the statistics are one fixed double tree over
    * them: m_k = central moments via the binomial expansion,
    * skew = m₃/m₂^1.5, kurt = m₄/m₂² − 3. Output: (groupCol,
    * skew_e6, kurt_e6). */
  def momentStats(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val v = floor(col(valCol)).cast("long")
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"),
        sum(v * v).as("s2"), sum(v * v * v).as("s3"),
        sum(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - m * m
    val m3 = col("s3").cast("double") / n -
      lit(3.0) * m * (col("s2").cast("double") / n) + lit(2.0) * m * m * m
    val m4 = col("s4").cast("double") / n -
      lit(4.0) * m * (col("s3").cast("double") / n) +
      lit(6.0) * m * m * (col("s2").cast("double") / n) -
      lit(3.0) * m * m * m * m
    agg.select(col(groupCol),
      floor(m3 / sqrt(m2 * m2 * m2) * 1e6).cast("long").as("skew_e6"),
      floor((m4 / (m2 * m2) - lit(3.0)) * 1e6).cast("long").as("kurt_e6"))
  }

  /** Spearman rank correlation between two columns per group —
    * ClickHouse `rankCorr` — kept integer until the last division via
    * the 2×avg-rank trick shared with [[mannWhitneyU]]: a tied block
    * spanning dense positions [rank, rank+c−1] has
    * 2·avgrank = 2·rank() + c − 1, an exact integer per row. ρ is then
    * Pearson over the 2×ranks, whose sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²) shuffle as exact int64 (Σ(2r)² ≤ 4n³ —
    * fits int64 to ~10⁶ rows per group; switch the six sums to
    * Decimal(38,0) beyond that, ρ is scale-invariant), and the final ρ
    * is one fixed double tree over them. Two sorts share one hash
    * exchange on the group key (same partitioning, different window
    * order). Output: (groupCol, n, rho_e6). */
  def spearmanRho(
      df: DataFrame, groupCol: String, xCol: Column, yCol: Column): DataFrame = {
    val g = col(groupCol)
    val base = df.select(g, xCol.as("_x"), yCol.as("_y"))
    val rx = (lit(2L) * rank().over(Window.partitionBy(g).orderBy(col("_x"))) +
      count(lit(1)).over(Window.partitionBy(g, col("_x"))) - 1).cast("long")
    val ry = (lit(2L) * rank().over(Window.partitionBy(g).orderBy(col("_y"))) +
      count(lit(1)).over(Window.partitionBy(g, col("_y"))) - 1).cast("long")
    val m = base.withColumn("_rx", rx).withColumn("_ry", ry)
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        sum(col("_rx")).as("sx"), sum(col("_ry")).as("sy"),
        sum(col("_rx") * col("_rx")).as("sxx"),
        sum(col("_ry") * col("_ry")).as("syy"),
        sum(col("_rx") * col("_ry")).as("sxy"))
    val nd = col("n").cast("double")
    val cov = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    // zero-variance guard (the q47 lesson): a constant column makes
    // vx·vy = 0 and floor(NaN) would throw under ANSI — null instead
    m.select(g, col("n"),
      when(vx > 0 && vy > 0,
        floor(cov / sqrt(vx * vy) * 1e6).cast("long")).as("rho_e6"))
  }

  /** Theil's uncertainty coefficient U(A|B) — how much knowing B
    * reduces uncertainty about A — from the q51 entropy ladder:
    * H(A) = ln n − (Σ_a c_a·ln c_a)/n and
    * H(A|B) = (Σ_b n_b·ln n_b − Σ_ab c_ab·ln c_ab)/n, every c·ln c
    * term e6-floored to an integer BEFORE its sum. One shuffle reduces
    * raw rows to the (a,b) contingency counts; the persisted grid (r×c
    * rows) feeds both marginals, so the raw stream is scanned once.
    * Output single row: (n, h_a_e6, h_cond_e6, theils_u_e6). */
  def theilsU(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val ab = df.select(aCol.as("_a"), bCol.as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def lnTerm(c: Column) =
      floor(lit(1e6) * c.cast("double") * log(c.cast("double"))).cast("long")
    val aMarg = ab.groupBy(col("_a")).agg(sum(col("_c")).as("_ca"))
      .agg(sum(col("_ca")).as("n"), sum(lnTerm(col("_ca"))).as("sa"))
    val bMarg = ab.groupBy(col("_b")).agg(sum(col("_c")).as("_cb"))
      .agg(sum(lnTerm(col("_cb"))).as("sb"))
    val cells = ab.agg(sum(lnTerm(col("_c"))).as("sab"))
    val j = aMarg.crossJoin(bMarg).crossJoin(cells)
      .withColumn("h_a_e6",
        floor(lit(1e6) * log(col("n").cast("double"))).cast("long") -
          expr("sa div n"))
      .withColumn("h_cond_e6", expr("(sb - sab) div n"))
    // single-category A ⇒ H(A)=0 ⇒ U undefined — null, not a throw
    j.select(col("n"), col("h_a_e6"), col("h_cond_e6"),
      when(col("h_a_e6") > 0,
        floor(lit(1e6) *
          (col("h_a_e6").cast("double") - col("h_cond_e6").cast("double")) /
          col("h_a_e6").cast("double")).cast("long")).as("theils_u_e6"))
  }

  /** Weight-of-evidence and information value per category for a
    * binary label — ClickHouse `categoricalInformationValue`. One
    * shuffle reduces rows to per-category (good, bad) counts; totals
    * ride along as a broadcast 1-row frame. WOE_i =
    * ln(good_i·B) − ln(bad_i·G) and its IV term
    * (good_i/G − bad_i/B)·WOE_i are fixed double trees over exact
    * integers; categories with a zero cell are excluded (their WOE is
    * ±∞ — same contract as ClickHouse's NaN row, made explicit).
    * Output: (catCol, good, bad, woe_e6, iv_term_e9). */
  def categoricalIV(
      df: DataFrame, catCol: Column, labelCol: Column): DataFrame = {
    val g = df.select(catCol.as("category"), labelCol.cast("long").as("_l"))
      .groupBy(col("category"))
      .agg(sum(col("_l")).as("good"),
        sum(lit(1L) - col("_l")).as("bad"))
    val tot = g.agg(sum(col("good")).as("_gt"), sum(col("bad")).as("_bt"))
    val woe = log(col("good").cast("double") * col("_bt")) -
      log(col("bad").cast("double") * col("_gt"))
    g.crossJoin(broadcast(tot))
      .where(col("good") > 0 && col("bad") > 0)
      .select(col("category"), col("good"), col("bad"),
        floor(woe * 1e6).cast("long").as("woe_e6"),
        floor((col("good").cast("double") / col("_gt") -
          col("bad").cast("double") / col("_bt")) * woe * 1e9)
          .cast("long").as("iv_term_e9"))
  }

  /** Cramér's V association between two categorical columns, over the
    * FULL r×c grid (absent cells count 0 — they still carry expected
    * mass). χ² terms are e6-floored per CELL before the sum (the
    * ladder: the only double sum becomes an integer sum), then
    * V = sqrt((χ²/n)/min(r−1, c−1)) is one fixed tree over the integer
    * χ² sum. One DAG, no driver-side scalar probes: n/r/c ride along as
    * a broadcast 1-row frame, and the contingency table (the only frame
    * consumed by several branches) is persisted — it is r×c rows, so
    * the raw stream is scanned exactly once. Output single row:
    * (n, chi2_e6, cramers_v_e6). */
  def cramersV(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowT = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_nr"))
    val colT = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_nc"))
    val meta = rowT.agg(count(lit(1)).as("_r"), sum(col("_nr")).as("_n"))
      .crossJoin(colT.agg(count(lit(1)).as("_c")))
    val grid = rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("_a", "_b"), "left")
      .withColumn("_o", coalesce(col("_o"), lit(0L)))
      .crossJoin(broadcast(meta))
    val e = col("_nr").cast("double") * col("_nc") / col("_n")
    val term = (col("_o") - e) * (col("_o") - e) / e
    grid.select(col("_n"), col("_r"), col("_c"),
        floor(term * lit(1e6)).cast("long").as("_t6"))
      .groupBy(col("_n"), col("_r"), col("_c"))
      .agg(sum(col("_t6")).as("chi2_e6"))
      .select(col("_n").as("n"), col("chi2_e6"),
        floor(sqrt(col("chi2_e6") / lit(1e6) / col("_n") /
          least(col("_r") - 1, col("_c") - 1)) * 1e6)
          .cast("long").as("cramers_v_e6"))
  }
}
