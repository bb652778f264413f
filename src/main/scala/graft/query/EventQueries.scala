package graft.query

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch views of
  * the streaming window family (SURVEY.md §2.6 note, §5.2-5): tumbling
  * windows, session windows (gap-based), top-k per group. All integer
  * arithmetic on the raw-nanos cursor → exact oracle parity.
  */
object EventQueries {
  import Tables.cents

  private val HourUs = 3600L * 1000000L

  val all: Seq[Q] = Seq(
    // tumbling window: 1-hour buckets on the event-time cursor. In
    // Structured Streaming this is `groupBy(window($"ts", "1 hour"))`;
    // the batch view is the same bucketing arithmetic.
    Q(
      "q13_tumbling_hourly",
      """SELECT (epoch_us(ts) // 3600000000) AS hour_bucket, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events
        |GROUP BY hour_bucket, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(
          expr(s"(ts div 1000) div $HourUs").as("hour_bucket"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_value_c"))
    },

    // session windows: per-user sessions split at >30 min inactivity —
    // the lag + cumulative-sum sessionization idiom (what
    // `session_window` does in Structured Streaming, expressed with
    // analytic windows so DuckDB can oracle it).
    Q(
      "q14_user_sessions",
      """WITH marked AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), sessions AS (
        |  SELECT user_id, tus,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  CAST((max(tus) - min(tus)) // 1000000 AS BIGINT) AS duration_sec
        |FROM sessions GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("tus", expr("ts div 1000"))
        .withColumn("new_session",
          when(col("tus") - lag(col("tus"), 1).over(byUser) > 1800000000L ||
            lag(col("tus"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          expr("(max(tus) - min(tus)) div 1000000").as("duration_sec"))
    },

    // top-3 busiest users per event type: rank window over an aggregate
    // (the "leaderboard" shape).
    Q(
      "q15_top_users_per_type",
      """SELECT event_type, user_id, n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY count(*) DESC, user_id ASC) AS rk
        |  FROM events GROUP BY event_type, user_id) t
        |WHERE rk <= 3""".stripMargin) { (s, dir) =>
      val agg = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id").asc)
      agg.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select("event_type", "user_id", "n")
    },

    // cube: full grouping-sets family coverage (rollup is q11).
    Q(
      "q16_cube_counts",
      """SELECT event_type, (user_id % 10) AS user_bucket, count(*) AS n
        |FROM events
        |GROUP BY CUBE (event_type, (user_id % 10))""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("user_bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // as-of join: each event matched to the user's latest order at or
    // before the event time (custom operator — Spark has no native
    // as-of join; DuckDB 1.0 does, giving a real oracle). Orders are
    // deduped per (cust, time) first so ties are deterministic in both
    // engines.
    Q(
      "q21_asof_latest_order",
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, o.o_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin) {
      (s, dir) =>
        val e = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val o = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
          .select(col("o_custkey"),
            // NTZ → TIMESTAMP under the UTC session, then µs → ns
            (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L)
              .as("ots"),
            col("o_orderkey"))
        graft.query.AsOfJoin
          .backward(e, o, "user_id", "o_custkey", "ts", "ots",
            Seq("o_orderkey"))
          .select(col("event_id"), col("user_id"), col("o_orderkey"))
    },

    // range join: consecutive-activity pairs — events of the same user
    // within 10 minutes of each other (banded equi-join formulation;
    // DuckDB checks the naive inequality join).
    Q(
      "q22_events_within_10min",
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000""".stripMargin) {
      (s, dir) =>
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("tus"))
        RangeJoin
          .selfWithinGap(e, "user_id", "event_id", "tus", 600000000L)
          .select(col("k").as("user_id"), col("id_a"), col("id_b"),
            col("gap"))
    },

    // dataset profiling (the data-quality pass every training pipeline
    // runs): per-column null/distinct counts — exact ints, oracled.
    Q(
      "q23_profile_orders",
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  count(DISTINCT o_custkey) AS d_custkey,
        |  count(DISTINCT o_orderstatus) AS d_status,
        |  count(DISTINCT o_orderpriority) AS d_priority,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("null_custkey"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        countDistinct(col("o_orderpriority")).as("d_priority"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    },

    // stratified sampling via content hashing — deterministic across
    // partitionings/cluster sizes (a partition-seeded RNG like
    // `sampleBy` resamples whenever the layout changes; hash sampling
    // is reproducible anywhere, which is what a training pipeline
    // needs). md5-prefix threshold ⇒ oracle-able in DuckDB.
    Q(
      "q24_stratified_sample",
      """SELECT event_type, count(*) AS n_sampled
        |FROM events
        |WHERE CASE WHEN event_type IN ('click','view')
        |  THEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
        |       IN ('0','1','2','3','4','5','6','7')
        |  ELSE TRUE END
        |GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        val keep = when(col("event_type").isin("click", "view"),
          substring(md5(col("event_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"))
          .otherwise(lit(true))
        Tables.load(s, dir, "events")
          .where(keep)
          .groupBy("event_type").agg(count(lit(1)).as("n_sampled"))
    },

    // pivot (wide aggregation): hour-of-day x event_type matrix via
    // Spark's native pivot operator — one shuffle, values list explicit
    // so no pre-pass collects distinct keys; oracle is the CASE-sum
    // formulation.
    Q(
      "q26_pivot_hour_by_type",
      """SELECT ((epoch_us(ts) // 3600000000) % 24) AS hour_of_day,
        |  CAST(sum(CASE WHEN event_type='click' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_c,
        |  CAST(sum(CASE WHEN event_type='error' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_c,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_c,
        |  CAST(sum(CASE WHEN event_type='signup' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_c,
        |  CAST(sum(CASE WHEN event_type='view' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_c
        |FROM events GROUP BY hour_of_day""".stripMargin) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.load(s, dir, "events")
        .withColumn("hour_of_day", expr(s"((ts div 1000) div $HourUs) % 24"))
        .groupBy("hour_of_day")
        .pivot("event_type", types)
        .agg(sum(cents(col("value"))))
      types.foldLeft(pivoted) { (df, t) =>
        df.withColumn(s"${t}_c", coalesce(col(t), lit(0L))).drop(t)
      }
    },

    // ntile quartiles (the bucketing window): deterministic because the
    // window orders by (value, event_id) — a unique key — so tie
    // placement is identical on any engine.
    Q(
      "q27_ntile_quartiles",
      """WITH b AS (
        |  SELECT event_type,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS quartile,
        |    CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events
        |)
        |SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
        |  count(*) AS n, CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM b GROUP BY event_type, quartile""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          ntile(4).over(w).cast("long").as("quartile"),
          cents(col("value")).as("value_c"))
        .groupBy("event_type", "quartile")
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_value_c"))
    },

    // explicit GROUPING SETS (beyond rollup q11 / cube q16).
    Q(
      "q19_grouping_sets",
      """SELECT event_type, (user_id % 7) AS user_mod, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), ((user_id % 7)), ())""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .createOrReplaceTempView("events_gs")
        s.sql(
          """SELECT event_type, (user_id % 7) AS user_mod, count(*) AS n,
            |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
            |FROM events_gs
            |GROUP BY GROUPING SETS ((event_type), ((user_id % 7)), ())""".stripMargin)
    },

    // exact multi-quantile percentiles in one pass (ClickHouse
    // quantilesExact(0.5, 0.95, 0.99) over cents). Deterministic where
    // the earlier percentile_approx sketch was engine-specific: the
    // selection rule is the q52 integer-threshold idiom (smallest cent
    // value whose cumulative count reaches the rational q of the
    // total), all three quantiles off ONE grouped cumulative window —
    // so the DuckDB oracle replays it exactly. (q25 keeps the
    // per-quantile quantile_disc selection shape; this is the shared-
    // scan aggregate form.)
    Q(
      "q20_value_percentiles",
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc FROM events
        |), g AS (
        |  SELECT event_type, vc, count(*) AS w FROM e GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, vc,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY event_type) AS tw
        |  FROM g
        |)
        |SELECT event_type,
        |  min(CASE WHEN cw * 2 >= tw * 1 THEN vc END) AS p50_c,
        |  min(CASE WHEN cw * 20 >= tw * 19 THEN vc END) AS p95_c,
        |  min(CASE WHEN cw * 100 >= tw * 99 THEN vc END) AS p99_c
        |FROM c GROUP BY event_type""".stripMargin) { (s, dir) =>
      Stats.quantilesExact(
        Tables.load(s, dir, "events")
          .select(col("event_type"), Tables.cents(col("value")).as("vc")),
        "event_type", "vc",
        Seq(("p50_c", 1, 2), ("p95_c", 19, 20), ("p99_c", 99, 100)))
    },

    // exact discrete quantiles — q20's sketch made exact. Selection (not
    // interpolation): the answer is a raw data value picked at the
    // nearest-rank ceil(q*n) in the per-group sort (DuckDB
    // quantile_disc's rule, probed empirically: the smallest value whose
    // cume_dist >= q), so no float arithmetic can drift between engines.
    // Scales as one sort per group key (window), never a per-group
    // collect.
    Q(
      "q25_exact_quantiles",
      """SELECT event_type,
        |  CAST(round(quantile_disc(value, 0.5)*100) AS BIGINT) AS p50_c,
        |  CAST(round(quantile_disc(value, 0.95)*100) AS BIGINT) AS p95_c,
        |  CAST(round(quantile_disc(value, 0.99)*100) AS BIGINT) AS p99_c
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val byType = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val n = Window.partitionBy(col("event_type"))
      def rankOf(q: Double) = ceil(lit(q) * col("n")).cast("long")
      def pick(q: Double) =
        max(when(col("rn") === rankOf(q), cents(col("value")))).as(s"p${(q*100).toInt}_c")
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
        .withColumn("rn", row_number().over(byType).cast("long"))
        .withColumn("n", count(lit(1)).over(n))
        .groupBy(col("event_type"))
        .agg(pick(0.5), pick(0.95), pick(0.99))
    },

    // retention cohort analysis (ClickHouse `retention()` shape): users
    // active on the dataset's first day, re-counted at fixed day
    // offsets. Distinct (user, day) activity is one shuffle; the
    // 1-row min-day frame broadcasts; the cohort semi-join shuffles on
    // user_id (AQE may broadcast it when small). Integer day arithmetic
    // on the µs cursor → exact oracle parity.
    Q(
      "q28_retention",
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), d0 AS (SELECT min(day) AS day0 FROM act),
        |cohort AS (SELECT user_id FROM act, d0 WHERE day = day0)
        |SELECT CAST(a.day - d0.day0 AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM act a, d0 JOIN cohort c ON a.user_id = c.user_id
        |WHERE a.day - d0.day0 IN (0, 1, 3, 7, 14)
        |GROUP BY day_offset""".stripMargin) { (s, dir) =>
      EventOps.retention(
        Tables.load(s, dir, "events")
          .select(col("user_id"),
            expr("(ts div 1000) div 86400000000").as("day")),
        "user_id", "day", Seq(0L, 1L, 3L, 7L, 14L))
    },

    // ordered-step funnel (ClickHouse `windowFunnel` shape): view →
    // click → purchase, every step within 24 h of the FIRST step, each
    // step strictly after the previous. Three groupBy-user aggregation
    // passes; no per-user event collection, so a power-user with
    // millions of events costs aggregation, not memory. NULL
    // propagation does the step gating: a missing step-1 makes the
    // step-2 `when` null → min(null)=null → steps tops out. (See
    // EventOps.funnel's scaladoc for the pinPasses scan/barrier trade.)
    Q(
      "q29_funnel",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |a AS (SELECT user_id, min(us) FILTER (WHERE event_type='view') AS ta
        |      FROM e GROUP BY user_id),
        |b AS (SELECT e.user_id, a.ta,
        |        min(us) FILTER (WHERE event_type='click'
        |          AND us > a.ta AND us <= a.ta + 86400000000) AS tb
        |      FROM e JOIN a ON e.user_id = a.user_id GROUP BY e.user_id, a.ta),
        |c AS (SELECT e.user_id, b.ta, b.tb,
        |        min(us) FILTER (WHERE event_type='purchase'
        |          AND us > b.tb AND us <= b.ta + 86400000000) AS tc
        |      FROM e JOIN b ON e.user_id = b.user_id GROUP BY e.user_id, b.ta, b.tb)
        |SELECT CAST(CASE WHEN tc IS NOT NULL THEN 3 WHEN tb IS NOT NULL THEN 2
        |            WHEN ta IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
        |  count(*) AS n_users
        |FROM c GROUP BY steps""".stripMargin) { (s, dir) =>
      EventOps.funnel(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_type")),
        "user_id", "us", "event_type",
        Seq("view", "click", "purchase"), windowUs = 86400000000L)
        .groupBy("steps")
        .agg(count(lit(1)).as("n_users"))
    },

    // windowFunnel strict_order (ClickHouse): any event of another
    // type strictly between two consecutive matches breaks the chain.
    // Same per-pass aggregation shape as q29 with one extra min()
    // riding each pass.
    Q(
      "q74_funnel_strict_order",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |a AS (SELECT user_id, min(us) FILTER (WHERE event_type='view') AS ta
        |      FROM e GROUP BY user_id),
        |b0 AS (SELECT e.user_id, a.ta,
        |        min(us) FILTER (WHERE event_type='click'
        |          AND us > a.ta AND us <= a.ta + 86400000000) AS tbr,
        |        min(us) FILTER (WHERE event_type <> 'click' AND us > a.ta) AS mb
        |      FROM e JOIN a ON e.user_id = a.user_id GROUP BY e.user_id, a.ta),
        |b AS (SELECT user_id, ta,
        |        CASE WHEN tbr IS NOT NULL AND (mb IS NULL OR mb >= tbr)
        |          THEN tbr END AS tb
        |      FROM b0),
        |c0 AS (SELECT e.user_id, b.ta, b.tb,
        |        min(us) FILTER (WHERE event_type='purchase'
        |          AND us > b.tb AND us <= b.ta + 86400000000) AS tcr,
        |        min(us) FILTER (WHERE event_type <> 'purchase' AND us > b.tb) AS mc
        |      FROM e JOIN b ON e.user_id = b.user_id GROUP BY e.user_id, b.ta, b.tb),
        |c AS (SELECT user_id, ta, tb,
        |        CASE WHEN tcr IS NOT NULL AND (mc IS NULL OR mc >= tcr)
        |          THEN tcr END AS tc
        |      FROM c0)
        |SELECT CAST(CASE WHEN tc IS NOT NULL THEN 3 WHEN tb IS NOT NULL THEN 2
        |            WHEN ta IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
        |  count(*) AS n_users
        |FROM c GROUP BY steps""".stripMargin) { (s, dir) =>
      EventOps.funnel(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_type")),
        "user_id", "us", "event_type",
        Seq("view", "click", "purchase"), windowUs = 86400000000L,
        mode = "strict_order")
        .groupBy("steps")
        .agg(count(lit(1)).as("n_users"))
    },

    // windowFunnel strict_dedup (ClickHouse): a REPEAT of an
    // already-matched step type strictly between matches breaks the
    // chain (view,view,click stops at the second view).
    Q(
      "q75_funnel_strict_dedup",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |a AS (SELECT user_id, min(us) FILTER (WHERE event_type='view') AS ta
        |      FROM e GROUP BY user_id),
        |b0 AS (SELECT e.user_id, a.ta,
        |        min(us) FILTER (WHERE event_type='click'
        |          AND us > a.ta AND us <= a.ta + 86400000000) AS tbr,
        |        min(us) FILTER (WHERE event_type = 'view' AND us > a.ta) AS mb
        |      FROM e JOIN a ON e.user_id = a.user_id GROUP BY e.user_id, a.ta),
        |b AS (SELECT user_id, ta,
        |        CASE WHEN tbr IS NOT NULL AND (mb IS NULL OR mb >= tbr)
        |          THEN tbr END AS tb
        |      FROM b0),
        |c0 AS (SELECT e.user_id, b.ta, b.tb,
        |        min(us) FILTER (WHERE event_type='purchase'
        |          AND us > b.tb AND us <= b.ta + 86400000000) AS tcr,
        |        min(us) FILTER (WHERE event_type IN ('view','click')
        |          AND us > b.tb) AS mc
        |      FROM e JOIN b ON e.user_id = b.user_id GROUP BY e.user_id, b.ta, b.tb),
        |c AS (SELECT user_id, ta, tb,
        |        CASE WHEN tcr IS NOT NULL AND (mc IS NULL OR mc >= tcr)
        |          THEN tcr END AS tc
        |      FROM c0)
        |SELECT CAST(CASE WHEN tc IS NOT NULL THEN 3 WHEN tb IS NOT NULL THEN 2
        |            WHEN ta IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
        |  count(*) AS n_users
        |FROM c GROUP BY steps""".stripMargin) { (s, dir) =>
      EventOps.funnel(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_type")),
        "user_id", "us", "event_type",
        Seq("view", "click", "purchase"), windowUs = 86400000000L,
        mode = "strict_dedup")
        .groupBy("steps")
        .agg(count(lit(1)).as("n_users"))
    },

    // fixed-width histogram over integer cents — the value-distribution
    // profile; pure scan + one aggregation, exact ints.
    Q(
      "q30_value_histogram",
      """SELECT (CAST(round(value*100) AS BIGINT) // 5000) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("bucket", expr("CAST(round(value*100) AS BIGINT) div 5000"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
    },

    // mergeable histogram-quantile sketch — the quantile companion to
    // q36's portable HLL: per (event_type, day) a fixed-width cents
    // histogram is the daily SKETCH (500-cent buckets, a few hundred
    // ints per group at any data size); merging = summing buckets
    // (associative, any re-aggregation tree), and p50/p95 read off the
    // merged cumulative counts with the q52 integer-threshold rule
    // (smallest bucket whose 2·cum ≥ n / 20·cum ≥ 19·n), reported as
    // the bucket's inclusive upper bound. The whole pipeline is
    // engine-portable integer arithmetic → full hash oracle; accuracy
    // is ±bucket width by construction, the mergeable trade q20's
    // exact pass can't make at 100 TB dashboard cadence.
    Q(
      "q86_histogram_quantile_sketch",
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    (CAST(round(value*100) AS BIGINT) // 500) AS bucket,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2, 3
        |), merged AS (
        |  SELECT event_type, bucket, sum(c) AS c FROM daily GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bucket, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM merged
        |)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN 2*cum >= n THEN bucket END)*500 + 499 AS BIGINT)
        |    AS p50_upper_c,
        |  CAST(min(CASE WHEN 20*cum >= 19*n THEN bucket END)*500 + 499 AS BIGINT)
        |    AS p95_upper_c
        |FROM cum GROUP BY event_type""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .selectExpr("event_type", "(ts div 1000) div 86400000000 AS day",
          s"CAST(round(value*100) AS BIGINT) div ${EventOps.HistBucketCents} AS bucket")
        .groupBy("event_type", "day", "bucket")
        .agg(count(lit(1)).as("c"))
      EventOps.histogramQuantiles(daily)
    },

    // correlated EXISTS through the SQL front-end (TPC-H Q4 shape) —
    // Catalyst rewrites the subquery to a left-semi join; the identical
    // SQL text runs on the oracle.
    Q(
      "q32_exists_subquery",
      """SELECT o_orderpriority, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_ex")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_ex")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n FROM orders_ex o
          |WHERE EXISTS (SELECT 1 FROM lineitem_ex l
          |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          |GROUP BY o_orderpriority""".stripMargin)
    },

    // RANGE-frame window (value-based frame — the ROWS-frame family is
    // q5/q14): per-user rolling 10-minute sum on the µs cursor. Peers
    // with equal order values enter the frame together on any engine;
    // integer cents → exact.
    Q(
      "q33_range_frame",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CAST(round(value*100) AS BIGINT) AS value_c FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS rolling_c
        |FROM e""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-600000000L, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("us"), cents(col("value")).as("value_c"))
        .select(col("event_id"), col("user_id"),
          sum(col("value_c")).over(w).as("rolling_c"))
    },

    // correlated scalar subquery shape via join:
    Q(
      "q17_events_vs_user_avg",
      """SELECT e.event_id, e.user_id,
        |  CAST(round(e.value*100) AS BIGINT) AS value_c,
        |  CASE WHEN CAST(round(e.value*100) AS BIGINT) * u.cnt > u.total_c
        |       THEN 1 ELSE 0 END AS above_avg
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS cnt,
        |        sum(CAST(round(value*100) AS BIGINT)) AS total_c
        |      FROM events GROUP BY user_id) u
        |  ON e.user_id = u.user_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val u = e.groupBy(col("user_id")).agg(
        count(lit(1)).as("cnt"),
        sum(cents(col("value"))).as("total_c"))
      e.join(u, Seq("user_id"))
        .select(
          col("event_id"), col("user_id"),
          cents(col("value")).as("value_c"),
          when(cents(col("value")) * col("cnt") > col("total_c"), 1)
            .otherwise(0).as("above_avg"))
    },

    // time-series gap fill (ClickHouse `WITH FILL` / PostgreSQL
    // generate_series idiom): zero rows for hours with no events. The
    // dense hour frame comes from one sequence() over the min/max
    // bounds — never a calendar table scan — and the hourly aggregate
    // is persisted skinny before its two consumers (bounds + join).
    Q(
      "q35_gapfill_hourly",
      """WITH a AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hb, count(*) AS n,
        |    sum(CAST(round(value*100) AS BIGINT)) AS sv
        |  FROM events GROUP BY hb
        |), b AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(hb) FROM a), (SELECT max(hb) FROM a))) AS hour_bucket
        |)
        |SELECT hour_bucket, coalesce(n, 0) AS n,
        |  CAST(coalesce(sv, 0) AS BIGINT) AS sum_value_c
        |FROM b LEFT JOIN a ON a.hb = b.hour_bucket""".stripMargin) { (s, dir) =>
      val hourly = Tables.load(s, dir, "events")
        .groupBy(expr(s"(ts div 1000) div $HourUs").as("hour_bucket"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sv"))
        .persist()
      hourly.count() // eager: bounds + join both read it in one action
      val frame = hourly
        .agg(min(col("hour_bucket")).as("lo"), max(col("hour_bucket")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("hour_bucket"))
      frame.join(hourly, Seq("hour_bucket"), "left")
        .select(
          col("hour_bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sv"), lit(0L)).as("sum_value_c"))
    },

    // behavioral transition matrix (the ClickHouse flow/sankey idiom):
    // per-user lag gives (from → to) event-type transitions, one
    // shuffle on user for the lag + one tiny aggregation.
    Q(
      "q82_transition_matrix",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
        |), t AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS from_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_id"), col("event_type"))
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .where(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("from_type"), col("to_type"), col("n"))
    },

    // sliding-window distinct cardinality: distinct users per 1h
    // window hopping 15min — the q42 4-offset explode (an event
    // belongs to exactly 4 hop windows; never a range join) feeding
    // count(DISTINCT) per window.
    Q(
      "q83_sliding_distinct",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 900000000 AS hop FROM events
        |), h AS (
        |  SELECT user_id, (hop - k) * 900000000 AS win_start
        |  FROM e, unnest(range(0, 4)) AS t(k)
        |)
        |SELECT win_start, count(DISTINCT user_id) AS n_users
        |FROM h GROUP BY win_start""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000) div 900000000").as("hop"))
        .select(col("user_id"),
          explode(sequence(lit(0L), lit(3L))).as("k"),
          col("hop"))
        .select(col("user_id"),
          ((col("hop") - col("k")) * 900000000L).as("win_start"))
        .groupBy(col("win_start"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },

    // native session_window operator (Spark's gap-based sessionizer —
    // the same physical operator Structured Streaming uses for
    // streaming sessions), pinned against the manual islands
    // formulation: a session merges events with gap < 30min and spans
    // [first, last + gap) — so the islands oracle breaks on
    // diff >= gap and reconstructs end = max + gap. q14 keeps the
    // lag-cumsum formulation (its break is diff > gap); this entry
    // pins the NATIVE operator's boundary semantics.
    Q(
      "q80_session_window",
      """WITH marked AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, tus,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id, CAST(min(tus) AS BIGINT) AS start_us,
        |  CAST(max(tus) + 1800000000 AS BIGINT) AS end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("tsm"))
        .groupBy(col("user_id"),
          session_window(col("tsm"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))
    },

    // LOCF gap fill (last observation carried forward): the q35 dense
    // frame per TYPE, holes filled by last(val IGNORE NULLS) over the
    // hour order — the standard time-series imputation companion to
    // zero-filling. Window runs over the dense hourly frame
    // (types × hours rows), never raw events.
    Q(
      "q79_locf_fill",
      """WITH a AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
        |    max(CAST(round(value*100) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT event_type, min(hb) AS lo, max(hb) AS hi
        |  FROM a GROUP BY 1
        |), frame AS (
        |  SELECT event_type, unnest(generate_series(lo, hi)) AS hour_bucket
        |  FROM bounds
        |), j AS (
        |  SELECT f.event_type, f.hour_bucket, a.v
        |  FROM frame f LEFT JOIN a
        |    ON a.event_type = f.event_type AND a.hb = f.hour_bucket
        |)
        |SELECT event_type, hour_bucket,
        |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled,
        |  CAST(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY hour_bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS value_locf
        |FROM j""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr(s"(ts div 1000) div $HourUs").as("hb"))
        .agg(max(cents(col("value"))).as("v"))
        .persist()
      hourly.count() // eager: bounds + join both read it in one action
      val frame = hourly
        .groupBy(col("event_type"))
        .agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hour_bucket"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("hour_bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      frame
        .join(hourly,
          frame("event_type") === hourly("event_type") &&
            col("hour_bucket") === col("hb"), "left")
        .select(frame("event_type"), col("hour_bucket"), col("v"))
        .select(col("event_type"), col("hour_bucket"),
          when(col("v").isNull, 1L).otherwise(0L).as("filled"),
          last(col("v"), ignoreNulls = true).over(w).as("value_locf"))
    },

    // mergeable-sketch pre-aggregation (the 100 TB distinct-count
    // pattern): one PORTABLE HyperLogLog register vector per day
    // (m=256 registers; register = max rank-of-leading-one over the
    // md5-bucketed keys), union-merged with a per-register max, then
    // the standard HLL estimate with the linear-counting small-range
    // branch. Re-aggregation reads |days|·m skinny register rows, not
    // the raw data — same asymptote as a binary sketch blob, but every
    // step is engine-portable integer arithmetic, so the whole
    // pipeline (daily sketch → union → estimate) carries a DuckDB
    // hash oracle where an opaque DataSketches blob cannot (q12 keeps
    // the engine-internal sketch as the rows-only contrast).
    Q("q36_hll_daily_union", q36OracleSql) { (s, dir) =>
      val pm =
        "CAST(conv(substr(md5(CAST(user_id AS STRING)),1,15),16,10) AS BIGINT)"
      val daily = Tables.load(s, dir, "events")
        .selectExpr("(ts div 1000) div 86400000000 AS day", s"$pm AS hv")
        .selectExpr("day", "hv % 256 AS idx", "hv div 256 AS w")
        .withColumn("rho", expr(hllRhoLadder("w")))
        .groupBy(col("day"), col("idx"))
        .agg(max(col("rho")).as("r"))
      val regs = daily.groupBy(col("idx")).agg(max(col("r")).as("mr"))
      val a = regs.agg(
        count(lit(1)).as("occupied"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mr)")).as("s_present"))
      val nd = daily.agg(countDistinct(col("day")).as("n_days"))
      a.crossJoin(broadcast(nd))
        .selectExpr("CAST(n_days AS BIGINT) AS n_days", hllEstimateExpr)
    },

    // Count-Min sketch top-20 user frequencies — the mergeable POINT-
    // FREQUENCY sketch beside q36's HLL (distinct) and q38's
    // Misra–Gries (top-k): 4×256 integer counters built PER DAY and
    // merged by addition, probed for every distinct user, top-20 by
    // (estimate, id). Width 256 ≪ |users| forces real collisions, so
    // estimates genuinely over-count — and both engines replay the
    // identical integer pipeline, so the hash oracle still pins it.
    Q("q88_cms_topk_freq", q88OracleSql) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .selectExpr("user_id", "(ts div 1000) div 86400000000 AS day")
      Stats.cmsEstimates(ev, "user_id", col("day"))
        .orderBy(col("est_count").desc, col("user_id").asc)
        .limit(20)
    },

    // FORWARD as-of join ("time to next event"): each view matched to
    // the user's earliest purchase at-or-after it. Purchases are deduped
    // per (user, time) first so ties are deterministic in both engines;
    // the oracle is the naive inequality join + rank — fine at sf, while
    // the engine side is the single-shuffle union-and-carry.
    Q(
      "q37_asof_next_purchase",
      """WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type='view'),
        |p AS (SELECT user_id AS p_user, epoch_us(ts) AS pus,
        |        min(event_id) AS p_event_id
        |      FROM events WHERE event_type='purchase' GROUP BY 1, 2),
        |j AS (SELECT v.event_id, p.p_event_id, p.pus - v.us AS gap_us,
        |        row_number() OVER (PARTITION BY v.event_id
        |          ORDER BY p.pus, p.p_event_id) AS rk
        |      FROM v JOIN p ON p.p_user = v.user_id AND p.pus >= v.us)
        |SELECT v.event_id, v.user_id, j.p_event_id, j.gap_us
        |FROM v LEFT JOIN j ON j.event_id = v.event_id AND j.rk = 1""".stripMargin) {
      (s, dir) =>
        val e = Tables.load(s, dir, "events")
        val v = e.where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
        val p = e.where(col("event_type") === "purchase")
          .groupBy(col("user_id").as("p_user"), expr("ts div 1000").as("pus"))
          .agg(min(col("event_id")).as("p_event_id"))
        AsOfJoin.forward(v, p, "user_id", "p_user", "us", "pus",
          Seq("p_event_id", "pus"))
          .select(col("event_id"), col("user_id"), col("p_event_id"),
            (col("pus") - col("us")).as("gap_us"))
    },

    // non-overlapping ordered-pair count (ClickHouse sequenceCount
    // '(?1)(?2)'): scan-greedy view→purchase occurrences per user. The
    // sequential automaton collapses to a lag window (count B events
    // directly preceded by an A among A/B events — A-run→B-run
    // boundaries), so it parallelizes per key and oracles exactly.
    Q(
      "q39_sequence_count",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events WHERE event_type IN ('view','purchase')
        |), r AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS prev
        |  FROM e
        |)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN event_type='purchase' AND prev='view'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sequences
        |FROM r GROUP BY user_id""".stripMargin) { (s, dir) =>
      EventOps.sequenceCount(
        Tables.load(s, dir, "events")
          .withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_id", "event_type", "view", "purchase")
    },

    // max concurrent intervals (ClickHouse maxIntersections): each
    // event opens a 5-minute half-open interval [ts, ts+5min); the
    // boundary sweep (+1/-1, ends before starts at the same instant,
    // running sum, max) finds the peak concurrency per event type
    // without ever materializing pairwise overlaps.
    Q(
      "q40_max_concurrent",
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS d, 1 AS tie FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS d, 0 AS tie
        |  FROM events
        |), r AS (
        |  SELECT event_type,
        |    sum(d) OVER (PARTITION BY event_type ORDER BY t, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b
        |)
        |SELECT event_type, CAST(max(live) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY event_type""".stripMargin) { (s, dir) =>
      EventOps.maxConcurrent(
        Tables.load(s, dir, "events")
          .withColumn("us", expr("ts div 1000")),
        "event_type", "us", 300000000L)
    },

    // maxIntersectionsPosition (ClickHouse): the first sweep position
    // reaching the maximum overlap — the q40 sweep plus one window +
    // filter over the swept frame.
    Q(
      "q78_max_concurrent_position",
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS d, 1 AS tie FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS d, 0 AS tie
        |  FROM events
        |), r AS (
        |  SELECT event_type, t, d,
        |    sum(d) OVER (PARTITION BY event_type ORDER BY t, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b
        |), m AS (
        |  SELECT event_type, t, d, live,
        |    max(live) OVER (PARTITION BY event_type) AS mx
        |  FROM r
        |)
        |SELECT event_type, CAST(max(mx) AS BIGINT) AS max_concurrent,
        |  CAST(min(t) AS BIGINT) AS position_us
        |FROM m WHERE live = mx AND d = 1
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      EventOps.maxConcurrentPosition(
        Tables.load(s, dir, "events")
          .withColumn("us", expr("ts div 1000")),
        "event_type", "us", 300000000L)
    },

    // least-squares regression family (regr_slope/regr_intercept /
    // ClickHouse simpleLinearRegression) via the q34 discipline: the
    // five partial sums are exact BIGINTs, the closed form runs the
    // IDENTICAL double expression tree on both engines, floored to e6
    // ints — engine-exact with no aggregate-order drift.
    Q(
      "q47_linear_regression",
      """WITH e AS (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS x,
        |    CAST(round(value*100) AS BIGINT) AS y FROM events
        |), s AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM e GROUP BY event_type
        |)
        |SELECT event_type, n,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
        |    CAST(floor(1e6 * (CAST(n*sxy - sx*sy AS DOUBLE) /
        |      CAST(n*sxx - sx*sx AS DOUBLE))) AS BIGINT) END AS slope_e6,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
        |    CAST(floor(1e6 * ((CAST(sy AS DOUBLE) -
        |      (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) *
        |      CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))) AS BIGINT) END AS intercept_e6
        |FROM s""".stripMargin) { (s, dir) =>
      val sums = Tables.load(s, dir, "events")
        .select(col("event_type"),
          (expr(s"((ts div 1000) div $HourUs)") % 24).as("x"),
          cents(col("value")).as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      // zero x-variance (single event / all in one hour): slope is
      // undefined — NULL on both engines, never double/0 = Infinity
      val denom = col("n") * col("sxx") - col("sx") * col("sx")
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        denom.cast("double")
      sums.select(col("event_type"), col("n"),
        when(denom =!= 0,
          floor(lit(1e6) * slope).cast("long")).as("slope_e6"),
        when(denom =!= 0,
          floor(lit(1e6) * ((col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double"))).cast("long")).as("intercept_e6"))
    },

    // dynamic-key map aggregation (ClickHouse sumMap): hour -> count
    // maps per type, rendered as sorted "key:value" CSV so the map
    // content hashes identically on any engine (map column types don't
    // cross the driver compare; q26's pivot is the static-key twin).
    Q(
      "q48_summap_hourly",
      """WITH h AS (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type,
        |  array_to_string(list_sort(list(
        |    CAST(hour AS VARCHAR) || ':' || CAST(n AS VARCHAR))), ',') AS hour_counts
        |FROM h GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (expr(s"((ts div 1000) div $HourUs)") % 24).as("hour"))
        .agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(concat_ws(",", sort_array(collect_list(
          concat(col("hour").cast("string"), lit(":"), col("n").cast("string")))))
          .as("hour_counts"))
    },

    // minMap/maxMap/avgMap (the q48 sumMap machinery with the other
    // merge ops): per type, a map hour → min|max|avg of the milli-unit
    // value, rendered as the sorted "k:v" CSV so map content hashes
    // identically on any engine. avg stays integer (sum div n).
    Q(
      "q67_minmax_map",
      """WITH h AS (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
        |    min(CAST(floor(value*1000) AS BIGINT)) AS mn,
        |    max(CAST(floor(value*1000) AS BIGINT)) AS mx,
        |    sum(CAST(floor(value*1000) AS BIGINT)) AS sv, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type,
        |  array_to_string(list_sort(list(
        |    CAST(hour AS VARCHAR) || ':' || CAST(mn AS VARCHAR) || '|' ||
        |    CAST(mx AS VARCHAR) || '|' || CAST(sv // n AS VARCHAR))), ',')
        |    AS hour_stats
        |FROM h GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("_v", floor(col("value") * 1000).cast("long"))
        .groupBy(col("event_type"),
          (expr(s"((ts div 1000) div $HourUs)") % 24).as("hour"))
        .agg(min(col("_v")).as("mn"), max(col("_v")).as("mx"),
          sum(col("_v")).as("sv"), count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(concat_ws(",", sort_array(collect_list(
          concat(col("hour").cast("string"), lit(":"),
            col("mn").cast("string"), lit("|"),
            col("mx").cast("string"), lit("|"),
            expr("sv div n").cast("string")))))
          .as("hour_stats"))
    },

    // array-aggregation family (ClickHouse groupArray/groupUniqArray):
    // collect_list/collect_set are partition-order-nondeterministic, so
    // the engine-portable discipline is sort-then-render — sorted
    // arrays joined to CSV strings hash identically on any engine and
    // stay driver-safe (no array columns cross the compare).
    Q(
      "q46_group_arrays",
      """SELECT user_id, count(*) AS n_events,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
        |  array_to_string((list_sort(list(event_id)))[1:5], ',') AS first5_csv
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          concat_ws(",", sort_array(collect_set(col("event_type"))))
            .as("types_csv"),
          concat_ws(",", slice(sort_array(collect_list(col("event_id"))), 1, 5))
            .as("first5_csv"))
    },

    // ClickHouse array-function family over each user's time-ordered
    // milli-unit value array: arrayCumSum, arrayDifference (first
    // element 0), arrayCompact (consecutive dedup), arrayEnumerateUniq
    // (per-value occurrence counter). All integer arithmetic inside
    // per-row lambdas — the q46 bounded-cardinality contract (one
    // user's events fit a row) — rendered as CSV for the compare.
    // Restricted to user_id < 30 to bound the quadratic in-row lambdas.
    Q(
      "q68_array_funcs",
      """WITH v AS (
        |  SELECT user_id,
        |    list(CAST(floor(value*1000) AS BIGINT)
        |      ORDER BY epoch_us(ts), event_id) AS vals
        |  FROM events WHERE user_id < 30 GROUP BY user_id
        |)
        |SELECT user_id,
        |  array_to_string(list_transform(range(1, len(vals)+1),
        |    i -> list_sum(vals[1:i])), ',') AS cumsum_csv,
        |  array_to_string(list_transform(range(1, len(vals)+1),
        |    i -> CASE WHEN i = 1 THEN 0 ELSE vals[i] - vals[i-1] END), ',')
        |    AS diff_csv,
        |  array_to_string(list_transform(
        |    list_filter(range(1, len(vals)+1),
        |      i -> i = 1 OR vals[i] != vals[i-1]),
        |    i -> vals[i]), ',') AS compact_csv,
        |  array_to_string(list_transform(range(1, len(vals)+1),
        |    i -> len(list_filter(vals[1:i], y -> y = vals[i]))), ',')
        |    AS enumuniq_csv
        |FROM v""".stripMargin) { (s, dir) =>
      val vals = transform(
        sort_array(collect_list(struct(
          expr("ts div 1000").as("us"), col("event_id").as("id"),
          floor(col("value") * 1000).cast("long").as("v")))),
        s => s.getField("v"))
      Tables.load(s, dir, "events")
        .where(col("user_id") < 30)
        .groupBy(col("user_id"))
        .agg(vals.as("_v"))
        .select(col("user_id"),
          concat_ws(",",
            aggregate(col("_v"),
              struct(array().cast("array<long>").as("a"), lit(0L).as("s")),
              (acc, x) => struct(
                concat(acc.getField("a"),
                  array(acc.getField("s") + x)).as("a"),
                (acc.getField("s") + x).as("s")),
              acc => acc.getField("a"))).as("cumsum_csv"),
          concat_ws(",",
            zip_with(col("_v"),
              concat(slice(col("_v"), 1, 1),
                slice(col("_v"), lit(1),
                  greatest(size(col("_v")) - 1, lit(0)))),
              (x, p) => x - p)).as("diff_csv"),
          concat_ws(",",
            transform(
              filter(transform(col("_v"), (x, i) => struct(x.as("x"), i.as("i"))),
                st => st.getField("i") === 0 ||
                  element_at(col("_v"), st.getField("i")) =!= st.getField("x")),
              st => st.getField("x"))).as("compact_csv"),
          concat_ws(",",
            transform(col("_v"), (x, i) =>
              size(filter(slice(col("_v"), lit(1), i + 1), y => y === x))))
            .as("enumuniq_csv"))
    },

    // ranking-window matrix under ties: rank/dense_rank gap semantics,
    // percent_rank=(rank-1)/(n-1) and cume_dist=rank_of_last_peer/n are
    // IEEE-exact from integer inputs in both engines -> floor-e6 ints
    // oracle exactly even on tied values. Rows are identified by
    // event_id, so tie placement never affects the output.
    Q(
      "q44_rank_matrix",
      """WITH e AS (SELECT event_id, event_type,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_id, event_type,
        |  CAST(rank() OVER w AS BIGINT) AS rk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |  CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS prk_e6,
        |  CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_e6
        |FROM e WINDOW w AS (PARTITION BY event_type ORDER BY vc)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            cents(col("value")).as("vc"))
          .select(col("event_id"), col("event_type"),
            rank().over(w).cast("long").as("rk"),
            dense_rank().over(w).cast("long").as("drk"),
            floor(percent_rank().over(w) * 1000000).cast("long").as("prk_e6"),
            floor(cume_dist().over(w) * 1000000).cast("long").as("cd_e6"))
    },

    // value-window matrix: lead/lag with defaults, first/last over
    // sliding frames, nth_value over a growing frame — ordered by the
    // unique (us, event_id) so every cell is engine-deterministic.
    Q(
      "q45_value_windows",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id,
        |  lag(vc, 1, -1) OVER w AS prev_vc,
        |  lead(vc, 2, -1) OVER w AS next2_vc,
        |  first_value(vc) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS first3,
        |  last_value(vc) OVER (w ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS last3,
        |  nth_value(vc, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ever
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("us"), cents(col("value")).as("vc"))
          .select(col("event_id"), col("user_id"),
            lag(col("vc"), 1, -1).over(w).as("prev_vc"),
            lead(col("vc"), 2, -1).over(w).as("next2_vc"),
            first(col("vc")).over(w.rowsBetween(-2, 0)).as("first3"),
            last(col("vc")).over(w.rowsBetween(0, 2)).as("last3"),
            nth_value(col("vc"), 2)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("second_ever"))
    },

    // argMin/argMax family (ClickHouse argMax): value-at-extremum in
    // ONE aggregation pass — no self-join, no window sort. Determinism:
    // the ordering key is (us, event_id) packed as fixed-width digit
    // strings, identical lexicographic=numeric ordering in both engines
    // (DuckDB 1.0 arg_max takes no struct keys). Both halves pad to 19
    // digits — the full non-negative int64 width — so the
    // lexicographic=numeric equivalence holds for ANY event_id the
    // fixtures could ever emit, not just below 10^10.
    Q(
      "q41_argmax_latest",
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS vc,
        |    lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0') ||
        |      lpad(CAST(event_id AS VARCHAR), 19, '0') AS ok
        |  FROM events
        |)
        |SELECT user_id,
        |  arg_max(event_id, ok) AS last_event_id,
        |  arg_min(event_id, ok) AS first_event_id,
        |  arg_max(vc, ok) AS last_value_c
        |FROM e GROUP BY user_id""".stripMargin) { (s, dir) =>
      val key = concat(
        lpad(expr("ts div 1000").cast("string"), 19, "0"),
        lpad(col("event_id").cast("string"), 19, "0"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          cents(col("value")).as("vc"), key.as("ok"))
        .groupBy("user_id")
        .agg(
          max_by(col("event_id"), col("ok")).as("last_event_id"),
          min_by(col("event_id"), col("ok")).as("first_event_id"),
          max_by(col("vc"), col("ok")).as("last_value_c"))
    },

    // hopping (sliding) window aggregation — the batch view of
    // Structured Streaming's window($"ts", "1 hour", "15 minutes"):
    // each event lands in 4 overlapping windows, materialized by a
    // 4-element explode (never a range self-join), then one shuffle on
    // (win_start, type).
    Q(
      "q42_hopping_1h_15min",
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type,
        |    CAST(round(value*100) AS BIGINT) AS vc FROM events
        |), x AS (
        |  SELECT us, event_type, vc, unnest(generate_series(0, 3)) AS k FROM e
        |)
        |SELECT ((us // 900000000) - k) * 900000000 AS win_start, event_type,
        |  count(*) AS n, CAST(sum(vc) AS BIGINT) AS sum_value_c
        |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(expr("ts div 1000").as("us"), col("event_type"),
          cents(col("value")).as("vc"))
        .withColumn("k", explode(sequence(lit(0L), lit(3L))))
        .withColumn("win_start",
          (expr("us div 900000000") - col("k")) * 900000000L)
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_value_c"))
    },

    // exact φ-heavy hitters via sketch-then-verify (ClickHouse `topK`
    // upgraded to exact): pass 1 is a map-only Misra–Gries candidate
    // scan, pass 2 an exact count of ≤ ⌈2/φ⌉ candidates — the raw
    // stream is never shuffled on the item key (a plain GROUP BY over
    // billions of distinct keys is the thing this avoids at 100 TB).
    Q(
      "q38_heavy_hitters",
      """WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, count(*) AS n FROM e GROUP BY user_id
        |HAVING count(*) >= ceil(0.008 * (SELECT count(*) FROM e))""".stripMargin) {
      (s, dir) =>
        graft.ext.Frequent.heavyHitters(
          Tables.load(s, dir, "events").select("user_id"), "user_id", 0.008)
    },

    // weighted φ-heavy hitters (ClickHouse topKWeighted, exact): users
    // carrying ≥ φ of total event value — the revenue-concentration
    // twin of q38, weighted Misra–Gries candidates + exact verify.
    Q(
      "q43_heavy_hitters_weighted",
      """WITH e AS (
        |  SELECT user_id, CAST(round(value*100) AS BIGINT) AS vc FROM events
        |  WHERE user_id IS NOT NULL
        |    AND CAST(round(value*100) AS BIGINT) > 0
        |)
        |SELECT user_id, CAST(sum(vc) AS BIGINT) AS w FROM e GROUP BY user_id
        |HAVING sum(vc) >= ceil(0.008 * (SELECT sum(vc) FROM e))""".stripMargin) {
      (s, dir) =>
        graft.ext.Frequent.heavyHittersWeighted(
          Tables.load(s, dir, "events")
            .select(col("user_id"), cents(col("value")).as("vc")),
          "user_id", "vc", 0.008)
    },

    // event-type co-occurrence PMI over per-user distinct type sets —
    // the association-mining primitive (which behaviors travel
    // together beyond what independence predicts). e6-floored ln on
    // the identical left-associated double tree (t14/t18 discipline).
    Q(
      "q89_type_pmi",
      """WITH ut AS (
        |  SELECT DISTINCT user_id AS u, event_type AS t FROM events
        |), n AS (SELECT count(DISTINCT u) AS nu FROM ut),
        |ux AS (SELECT t, count(*) AS c FROM ut GROUP BY t),
        |p AS (
        |  SELECT a.t AS ta, b.t AS tb, count(*) AS uxy
        |  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2
        |)
        |SELECT ta, tb, CAST(uxy AS BIGINT) AS uxy,
        |  CAST(floor(ln(
        |    CAST(uxy AS DOUBLE) * CAST(nu AS DOUBLE)
        |      / CAST(xa.c AS DOUBLE) / CAST(xb.c AS DOUBLE)) * 1e6)
        |    AS BIGINT) AS pmi_e6
        |FROM p
        |JOIN ux xa ON xa.t = p.ta
        |JOIN ux xb ON xb.t = p.tb, n""".stripMargin) { (s, dir) =>
      graft.query.EventOps.typePmi(
        Tables.load(s, dir, "events"), "user_id", "event_type")
    }
  )

  // ---- q36 portable-HLL shared fragments now live in PortableHll
  // (single source of truth for q36 AND q12's Spark exprs and DuckDB
  // oracles; only integer-div / shift syntax differs between
  // engines). Local forwarders keep the call sites short.
  private def hllRhoLadder(w: String): String = PortableHll.rhoLadder(w)
  // lazy: forced from `all`'s Q construction during object init, before
  // plain vals declared below `all` are assigned (the d3 "null" lesson)
  private lazy val hllEstimateExpr: String = PortableHll.estimateExpr

  /** q36 oracle: the identical pipeline in DuckDB syntax (md5 idiom,
    * `//` integer division, `<<` shift). */
  private lazy val q36OracleSql: String =
    s"""WITH h AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
       |  FROM events
       |), b AS (
       |  SELECT day, hv % 256 AS idx, hv // 256 AS w FROM h
       |), r AS (
       |  SELECT day, idx, ${hllRhoLadder("w")} AS rho FROM b
       |), d AS (
       |  SELECT day, idx, max(rho) AS r FROM r GROUP BY 1, 2
       |), u AS (
       |  SELECT idx, max(r) AS mr FROM d GROUP BY 1
       |), a AS (
       |  SELECT count(*) AS occupied,
       |    sum((1::BIGINT << (53 - mr)))::BIGINT AS s_present
       |  FROM u
       |), nd AS (SELECT count(DISTINCT day) AS n_days FROM d)
       |SELECT CAST(n_days AS BIGINT) AS n_days, $hllEstimateExpr
       |FROM a, nd""".stripMargin

  /** q88 oracle: the identical CMS pipeline in DuckDB syntax — per-day
    * 4×256 counter cells, merged by addition, min-over-rows estimates,
    * top-20. Row hash = pmd5 of `key || '#' || row`. */
  private lazy val q88OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), cells AS (
      |  SELECT day, t.j,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR) || '#' ||
      |      CAST(t.j AS VARCHAR)),1,15))::BIGINT % 256 AS b,
      |    count(*) AS c
      |  FROM e, range(0, 4) t(j)
      |  GROUP BY 1, 2, 3
      |), merged AS (
      |  SELECT j, b, sum(c) AS c FROM cells GROUP BY 1, 2
      |), pb AS (
      |  SELECT DISTINCT user_id, t.j,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR) || '#' ||
      |      CAST(t.j AS VARCHAR)),1,15))::BIGINT % 256 AS b
      |  FROM e, range(0, 4) t(j)
      |), est AS (
      |  SELECT user_id, CAST(min(coalesce(m.c, 0)) AS BIGINT) AS est_count
      |  FROM pb p LEFT JOIN merged m ON m.j = p.j AND m.b = p.b
      |  GROUP BY 1
      |)
      |SELECT user_id, est_count FROM est
      |ORDER BY est_count DESC, user_id ASC LIMIT 20""".stripMargin
}
