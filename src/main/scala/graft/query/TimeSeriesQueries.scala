package graft.query

import org.apache.spark.sql.functions._

/** Query-pack surface for the round-5 ClickHouse-aggregate additions:
  * LTTB downsampling, interval-union length, Shannon entropy, exact
  * weighted quantiles, and gap-constrained sequence matching. All five
  * are hash-oracled — the operators were designed integer-first /
  * fixed-double-tree so DuckDB replays them bit-exactly.
  */
object TimeSeriesQueries {

  val all: Seq[Q] = Seq(

    // LTTB downsampling to 12 points per series (ClickHouse
    // largestTriangleThreeBuckets; fixed-anchor variant — see
    // TimeSeries scaladoc for why the textbook's sequential anchor is
    // the wrong 100 TB shape). Points pre-aggregated to one per
    // (series, microsecond) so the rank order is total and both
    // engines bucket identically.
    Q(
      "q49_lttb_downsample",
      """WITH p AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    max(CAST(round(value*100) AS BIGINT)) AS vc
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY us, vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM p
        |), inner_pts AS (
        |  SELECT event_type, us, vc, rn, n, ((rn - 2) * 10) // (n - 2) AS b
        |  FROM r WHERE rn > 1 AND rn < n AND n > 12
        |), ends AS (
        |  SELECT event_type, us, vc FROM r WHERE (rn = 1 OR rn = n) AND n > 12
        |), small AS (
        |  SELECT event_type, us, vc FROM r WHERE n <= 12
        |), cent AS (
        |  SELECT event_type, b, sum(us) AS sx, sum(vc) AS sy, count(*) AS c
        |  FROM inner_pts GROUP BY 1, 2
        |), edges AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = 1 THEN us END) AS fx,
        |    max(CASE WHEN rn = 1 THEN vc END) AS fy,
        |    max(CASE WHEN rn = n THEN us END) AS lx,
        |    max(CASE WHEN rn = n THEN vc END) AS ly
        |  FROM r WHERE n > 12 GROUP BY event_type
        |), anch AS (
        |  SELECT event_type, b,
        |    lag(sx) OVER w AS axs, lag(sy) OVER w AS ays, lag(c) OVER w AS ac,
        |    lead(sx) OVER w AS cxs, lead(sy) OVER w AS cys, lead(c) OVER w AS cc
        |  FROM cent WINDOW w AS (PARTITION BY event_type ORDER BY b)
        |), a2 AS (
        |  SELECT a.event_type, a.b,
        |    coalesce(CAST(axs AS DOUBLE) / ac, CAST(e.fx AS DOUBLE)) AS ax,
        |    coalesce(CAST(ays AS DOUBLE) / ac, CAST(e.fy AS DOUBLE)) AS ay,
        |    coalesce(CAST(cxs AS DOUBLE) / cc, CAST(e.lx AS DOUBLE)) AS cx,
        |    coalesce(CAST(cys AS DOUBLE) / cc, CAST(e.ly AS DOUBLE)) AS cy
        |  FROM anch a JOIN edges e USING (event_type)
        |), scored AS (
        |  SELECT i.event_type, i.us, i.vc,
        |    row_number() OVER (PARTITION BY i.event_type, i.b
        |      ORDER BY abs((ax - cx) * (CAST(i.vc AS DOUBLE) - ay) -
        |        (ax - CAST(i.us AS DOUBLE)) * (cy - ay)) DESC, i.rn ASC) AS pick
        |  FROM inner_pts i JOIN a2 USING (event_type, b)
        |)
        |SELECT event_type, us, vc FROM small
        |UNION ALL SELECT event_type, us, vc FROM ends
        |UNION ALL SELECT event_type, us, vc FROM scored WHERE pick = 1""".stripMargin) {
      (s, dir) =>
        val pts = Tables.load(s, dir, "events")
          .select(col("event_type"), expr("ts div 1000").as("us"),
            Tables.cents(col("value")).as("vc"))
          .groupBy("event_type", "us").agg(max("vc").as("vc"))
        TimeSeries.largestTriangleThreeBuckets(
          pts, "event_type", "us", "vc", nBuckets = 12)
    },

    // interval-union length (ClickHouse intervalLengthSum): each event
    // opens a 5-minute half-open interval; overlapped stretches count
    // once per series.
    Q(
      "q50_interval_length_sum",
      """WITH iv AS (
        |  SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
        |  FROM events
        |), m AS (
        |  SELECT event_type, s, e,
        |    max(e) OVER (PARTITION BY event_type ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv
        |), i AS (
        |  SELECT event_type, s, e,
        |    sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY event_type ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m
        |), g AS (
        |  SELECT event_type, isl, max(e) - min(s) AS len FROM i GROUP BY 1, 2
        |)
        |SELECT event_type, CAST(sum(len) AS BIGINT) AS interval_length_sum
        |FROM g GROUP BY event_type""".stripMargin) { (s, dir) =>
      TimeSeries.intervalLengthSum(
        Tables.load(s, dir, "events")
          .select(col("event_type"), expr("ts div 1000").as("s"),
            (expr("ts div 1000") + 300000000L).as("e")),
        "event_type", "s", "e")
    },

    // Shannon entropy of the per-series user distribution (ClickHouse
    // entropy()), micro-nats. Fully distributive: per-count terms floor
    // to e6 integers BEFORE summing (the t18 discipline), so no
    // floating sum order exists to disagree on.
    Q(
      "q51_entropy",
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2
        |), a AS (
        |  SELECT event_type, sum(c) AS n,
        |    sum(CAST(floor(1e6 * c * ln(c)) AS BIGINT)) AS s
        |  FROM c GROUP BY event_type
        |)
        |SELECT event_type,
        |  CAST(CAST(floor(1e6 * ln(n)) AS BIGINT) - s // n AS BIGINT)
        |    AS entropy_e6
        |FROM a""".stripMargin) { (s, dir) =>
      Stats.entropy(
        Tables.load(s, dir, "events"), "event_type", "user_id")
    },

    // exact weighted median (ClickHouse quantileExactWeighted(0.5)):
    // integer threshold comparison, no floating boundary.
    Q(
      "q52_weighted_median",
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc,
        |    event_id % 10 + 1 AS w
        |  FROM events
        |), g AS (
        |  SELECT event_type, vc, sum(w) AS w FROM e GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, vc,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY event_type) AS tw
        |  FROM g
        |)
        |SELECT event_type, min(vc) AS q_value
        |FROM c WHERE cw * 2 >= tw * 1 GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        Stats.quantileExactWeighted(
          Tables.load(s, dir, "events")
            .select(col("event_type"), Tables.cents(col("value")).as("vc"),
              (col("event_id") % 10 + 1).as("w")),
          "event_type", "vc", "w", num = 1, denom = 2)
    },

    // deltaSum (ClickHouse): sum of POSITIVE deltas of the value series
    // per type, in (time, id) order — the counter-reset-tolerant rate
    // aggregate. One lag window, integer math.
    Q(
      "q54_delta_sum",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events
        |), d AS (
        |  SELECT event_type,
        |    vc - lag(vc) OVER (PARTITION BY event_type ORDER BY us, event_id) AS dv
        |  FROM e
        |)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT) AS delta_sum
        |FROM d GROUP BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("us"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_type"), expr("ts div 1000").as("us"),
          col("event_id"), Tables.cents(col("value")).as("vc"))
        .withColumn("dv", col("vc") - lag(col("vc"), 1).over(w))
        .groupBy("event_type")
        .agg(sum(when(col("dv") > 0, col("dv")).otherwise(0L))
          .as("delta_sum"))
    },

    // the ClickHouse -If combinator family (countIf/sumIf/minIf/maxIf):
    // conditional aggregation without subqueries or self-joins — one
    // pass, integer outputs.
    Q(
      "q55_conditional_aggs",
      """SELECT event_type,
        |  CAST(count(CASE WHEN value > 50 THEN 1 END) AS BIGINT) AS n_high,
        |  CAST(coalesce(sum(CASE WHEN user_id < 5000
        |    THEN CAST(round(value*100) AS BIGINT) END), 0) AS BIGINT) AS sum_low_users,
        |  min(CASE WHEN user_id < 5000 THEN user_id END) AS min_low_user,
        |  max(CASE WHEN value > 50 THEN user_id END) AS max_high_user
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(when(col("value") > 50, 1)).as("n_high"),
          coalesce(sum(when(col("user_id") < 5000,
            Tables.cents(col("value")))), lit(0L)).as("sum_low_users"),
          min(when(col("user_id") < 5000, col("user_id")))
            .as("min_low_user"),
          max(when(col("value") > 50, col("user_id")))
            .as("max_high_user"))
    },

    // groupBitAnd / groupBitOr / groupBitXor (ClickHouse bitwise
    // aggregates) over the user-id domain per type.
    Q(
      "q56_bit_aggs",
      """SELECT event_type,
        |  bit_and(user_id) AS band,
        |  bit_or(user_id) AS bor,
        |  bit_xor(user_id) AS bxor
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(
          expr("bit_and(user_id)").as("band"),
          expr("bit_or(user_id)").as("bor"),
          expr("bit_xor(user_id)").as("bxor"))
    },

    // boundingRatio (ClickHouse): slope of the value series between its
    // first and last point per type — value-at-extremum via the q41
    // fixed-width packed ordering key, one double division, e6 floor.
    Q(
      "q57_bounding_ratio",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(round(value*100) AS BIGINT) AS vc,
        |    lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0') ||
        |      lpad(CAST(event_id AS VARCHAR), 19, '0') AS ok
        |  FROM events
        |), a AS (
        |  SELECT event_type,
        |    arg_min(vc, ok) AS y0, arg_max(vc, ok) AS y1,
        |    arg_min(us, ok) AS x0, arg_max(us, ok) AS x1
        |  FROM e GROUP BY event_type
        |)
        |SELECT event_type,
        |  CAST(floor(1e6 * (CAST(y1 - y0 AS DOUBLE) / CAST(x1 - x0 AS DOUBLE)))
        |    AS BIGINT) AS ratio_e6
        |FROM a WHERE x1 > x0""".stripMargin) { (s, dir) =>
      val key = concat(
        lpad(expr("ts div 1000").cast("string"), 19, "0"),
        lpad(col("event_id").cast("string"), 19, "0"))
      Tables.load(s, dir, "events")
        .select(col("event_type"), expr("ts div 1000").as("us"),
          Tables.cents(col("value")).as("vc"), key.as("ok"))
        .groupBy("event_type")
        .agg(
          min_by(col("vc"), col("ok")).as("y0"),
          max_by(col("vc"), col("ok")).as("y1"),
          min_by(col("us"), col("ok")).as("x0"),
          max_by(col("us"), col("ok")).as("x1"))
        .where(col("x1") > col("x0"))
        .select(col("event_type"),
          floor(lit(1e6) * ((col("y1") - col("y0")).cast("double") /
            (col("x1") - col("x0")).cast("double")))
            .cast("long").as("ratio_e6"))
    },

    // the 100 TB maxIntersections: bucketed sweep + stitched offsets.
    // The ORACLE is q40's single-sweep SQL — hash equality proves the
    // per-bucket decomposition exact, not just plausible (events span
    // ~30 days, so the 1-hour buckets force ~720 real stitches/series).
    Q(
      "q59_max_concurrent_bucketed",
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
      EventOps.maxConcurrentBucketed(
        Tables.load(s, dir, "events")
          .withColumn("us", expr("ts div 1000")),
        "event_type", "us", durationUs = 300000000L,
        bucketUs = 3600000000L)
    },

    // uniqUpTo(3): exact distinct count capped at n+1 — per user, how
    // many distinct event types (saturating at 4). The two-phase
    // distinct bounds the shuffle to distinct (key, value) rows.
    Q(
      "q64_uniq_up_to",
      """SELECT user_id,
        |  CAST(least(count(DISTINCT event_type), 4) AS BIGINT) AS uniq_up_to
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Stats.uniqUpTo(Tables.load(s, dir, "events"),
        "user_id", "event_type", n = 3)
    },

    // sequenceNextNode('forward','first_match'): the event type that
    // follows the first adjacent view→click in each user's stream.
    Q(
      "q65_sequence_next_node",
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
        |), l AS (
        |  SELECT user_id, us, event_id, event_type,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id) AS e1,
        |    lead(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id) AS nx
        |  FROM s
        |), m AS (
        |  SELECT user_id, nx,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
        |  FROM l WHERE event_type = 'view' AND e1 = 'click'
        |)
        |SELECT user_id, nx AS next_node FROM m WHERE rn = 1""".stripMargin) {
      (s, dir) =>
        EventOps.sequenceNextNode(
          Tables.load(s, dir, "events")
            .withColumn("us", expr("ts div 1000")),
          "user_id", "us", "event_id", "event_type", Seq("view", "click"))
          .select(col("user_id"), col("next_node"))
    },

    // the -Array combinator family (sumArray / maxArray / uniqArray)
    // over the embedding vectors, in e6-floored integer units; sum and
    // max fold in-row (no explode), only the distinct count unnests.
    Q(
      "q66_array_aggs",
      """WITH u AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST(floor(CAST(t.x AS DOUBLE)*1e6) AS BIGINT) AS v
        |  FROM embeddings, UNNEST(embedding) AS t(x)
        |)
        |SELECT label, CAST(sum(v) AS BIGINT) AS sum_arr_e6,
        |  CAST(max(v) AS BIGINT) AS max_arr_e6,
        |  CAST(count(DISTINCT v) AS BIGINT) AS uniq_arr
        |FROM u GROUP BY 1""".stripMargin) { (s, dir) =>
      Stats.arrayAggs(
        Tables.load(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"), col("embedding")),
        "label", "embedding")
    },

    // exponential moving average (ClickHouse exponentialMovingAverage):
    // the order-sensitive recursion ema = α·x + (1−α)·ema over the
    // (time, id)-sorted series. Oracle replays the IDENTICAL sequential
    // fold (DuckDB list_reduce seeds from the first element exactly
    // like the recursion), so even this floating recursion hash-matches.
    Q(
      "q58_ema",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events
        |), l AS (
        |  SELECT event_type,
        |    list(CAST(vc AS DOUBLE) ORDER BY us, event_id) AS vals
        |  FROM e GROUP BY event_type
        |)
        |SELECT event_type,
        |  CAST(floor(list_reduce(vals, (acc, x) -> 0.25 * x + 0.75 * acc)
        |    * 1e6) AS BIGINT) AS ema_e6
        |FROM l""".stripMargin) { (s, dir) =>
      Stats.ema(
        Tables.load(s, dir, "events")
          .select(col("event_type"), expr("ts div 1000").as("us"),
            col("event_id"), Tables.cents(col("value")).as("vc")),
        "event_type", "us", "event_id", "vc", alpha = 0.25)
    },

    // gap-constrained sequence existence (ClickHouse
    // sequenceMatch('(?1)(?t<=1h)(?2)(?t<=1h)(?3)')): view → click →
    // purchase with each consecutive gap <= 1 hour. The dynamic program
    // (not the greedy scan — see EventOps scaladoc) as one carry window
    // per step.
    Q(
      "q53_sequence_match",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |), s1 AS (
        |  SELECT *, CASE WHEN event_type = 'view' THEN us END AS f0 FROM e
        |), s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click'
        |    AND max(f0) OVER w1 IS NOT NULL
        |    AND us - max(f0) OVER w1 <= 3600000000 THEN us END AS f1
        |  FROM s1 WINDOW w1 AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), s3 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase'
        |    AND max(f1) OVER w2 IS NOT NULL
        |    AND us - max(f1) OVER w2 <= 3600000000 THEN us END AS f2
        |  FROM s2 WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, CAST(count(f2) > 0 AS BIGINT) AS matched
        |FROM s3 GROUP BY user_id""".stripMargin) { (s, dir) =>
      EventOps.sequenceMatchGaps(
        Tables.load(s, dir, "events")
          .withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_id", "event_type",
        Seq("view", "click", "purchase"), maxGapUs = 3600000000L)
        .select(col("user_id"), col("matched").cast("long").as("matched"))
    },

    // groupArrayMovingSum(3) / groupArrayMovingAvg(3) (ClickHouse):
    // per-type hourly totals, trailing-3 window sums rendered as the
    // ordered array the ClickHouse aggregate would return (the q46
    // sort-then-render discipline; avg uses ClickHouse's integer
    // division by the window SIZE, not the element count — Spark
    // `div`, DuckDB `//`, and ClickHouse intDiv all truncate toward
    // zero, so the three agree on negative sums too). The window
    // runs over the hourly-totals frame (|hours| rows), never raw rows.
    Q(
      "q72_moving_aggs",
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    sum(CAST(round(value*100) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, hr,
        |    sum(v) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms
        |  FROM h
        |)
        |SELECT event_type,
        |  array_to_string(list(CAST(ms AS BIGINT) ORDER BY hr), ',')
        |    AS moving_sum_csv,
        |  array_to_string(list(CAST(ms // 3 AS BIGINT) ORDER BY hr), ',')
        |    AS moving_avg_csv
        |FROM m GROUP BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(-2, 0)
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 3600000000").as("hr"))
        .agg(sum(Tables.cents(col("value"))).as("v"))
        .withColumn("ms", sum(col("v")).over(w))
        .groupBy("event_type")
        .agg(
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("hr"), col("ms")))),
            st => st.getField("ms").cast("string"))).as("moving_sum_csv"),
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("hr"),
              expr("ms div 3").as("ma")))),
            st => st.getField("ma").cast("string"))).as("moving_avg_csv"))
    },

    // sparkbar (ClickHouse): per-type hour-of-day activity as an
    // 8-level unicode bar string. Levels are exact integer math —
    // greatest(1, c·8 div max) — over the 24-bucket frame, rendered
    // in hour order (q46 sort-then-render); the unicode literals ride
    // the same UTF-8 path both engines already hash byte-equal.
    Q(
      "q76_sparkbar",
      """WITH h AS (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, hod, c,
        |    max(c) OVER (PARTITION BY event_type) AS mx
        |  FROM h
        |), l AS (
        |  SELECT event_type, hod, c, mx,
        |    ['▁','▂','▃','▄','▅','▆','▇','█'][
        |      CAST(greatest(1, (c * 8) // mx) AS INT)] AS bar
        |  FROM m
        |)
        |SELECT event_type, CAST(max(mx) AS BIGINT) AS max_bucket,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  string_agg(bar, '' ORDER BY hod) AS sparkbar
        |FROM l GROUP BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val bars = array(
        Seq("▁", "▂", "▃", "▄",
          "▅", "▆", "▇", "█").map(lit): _*)
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (expr("(ts div 1000) div 3600000000") % 24).as("hod"))
        .agg(count(lit(1)).as("c"))
        .withColumn("mx",
          max(col("c")).over(Window.partitionBy(col("event_type"))))
        .withColumn("bar", element_at(bars,
          greatest(lit(1), expr("(c * 8) div mx")).cast("int")))
        .groupBy("event_type")
        .agg(max(col("mx")).as("max_bucket"), sum(col("c")).as("n"),
          concat_ws("", transform(
            sort_array(collect_list(struct(col("hod"), col("bar")))),
            st => st.getField("bar"))).as("sparkbar"))
    }
  )
}
