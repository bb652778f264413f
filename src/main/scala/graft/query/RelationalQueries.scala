package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.IntegerType

/** The read-side query surface of the engine (SURVEY.md §3.3, §2.5–2.7).
  *
  * The reference delegates all of this to ClickHouse over its 8 tables
  * (/root/reference/README.md:115-332); here the same query shapes run as
  * Catalyst plans over the driver's TPC-H-ish tables. Every query is
  * written scale-first:
  *   - dimension joins are explicitly `broadcast()` (region/nation/
  *     customer are tiny relative to the fact tables at any SF);
  *   - money aggregates go through integer cents (see Tables.cents) so
  *     partial/final aggregation is order-independent and type-stable
  *     against the DuckDB oracle;
  *   - top-k always carries a unique-key tiebreak so LIMIT is
  *     deterministic across engines;
  *   - filters are plain column predicates → pushed to the parquet scan.
  *
  * Oracle output discipline: **strings and int64 only** (driver's DuckDB
  * 1.0.0 renders HUGEINT/DECIMAL as float and truncates parquet ns
  * timestamps to µs — both sides of each query are written to land on
  * identical int64/string values).
  */
object RelationalQueries {
  import Tables.cents

  val all: Seq[Q] = Seq(
    // ---- A: aggregation (SURVEY §2.5; ClickHouse generic SQL side) ----
    // revenue_e4 = Σ cents(price) × (100 − cents-of-discount): exact
    // integer arithmetic in units of 1e-4 currency.
    Q(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
        |  count(*) AS count_order,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(cents(col("l_quantity"))).as("sum_qty_c"),
            sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
            sum(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount")))).as("sum_disc_price_e4"),
            count(lit(1)).as("count_order"),
            countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // ---- multi-way star join + agg (dims broadcast) ----
    Q(
      "q2_revenue_by_nation",
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))).as("revenue_e4"),
          count(lit(1)).as("n_items"))
    },

    // ---- O: sort + deterministic top-k (§2.7) ----
    Q(
      "q3_topk_orders",
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_price_c
        |FROM orders
        |ORDER BY total_price_c DESC, o_orderkey ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            cents(col("o_totalprice")).as("total_price_c"))
          .orderBy(col("total_price_c").desc, col("o_orderkey").asc)
          .limit(10)
    },

    // ---- W: ranking window — latest order per customer (§2.6; the
    // explorer "account history head" shape, SURVEY §3.3-2) ----
    Q(
      "q4_latest_order_per_customer",
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },

    // ---- W: frame window (running sum) + analytic lag (§2.6 W1/W3) ----
    Q(
      "q5_running_qty_by_supplier",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty_c,
        |  CAST(lag(CAST(round(l_quantity*100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS prev_qty_c
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(cents(col("l_quantity")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_qty_c"),
          lag(cents(col("l_quantity")), 1).over(w).as("prev_qty_c"))
    },

    // ---- semi join: EXISTS (§2.4 read-side joins) ----
    Q(
      "q6_custs_with_orders",
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(
          Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
    },

    // ---- anti join: NOT EXISTS ----
    Q(
      "q7_custs_without_orders",
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(
          Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
    },

    // ---- set ops (§2.7 O4) ----
    Q(
      "q8_nation_setops",
      """SELECT 'both' AS side, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT SELECT s_nationkey FROM supplier) t
        |UNION ALL
        |SELECT 'cust_only' AS side, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  EXCEPT SELECT s_nationkey FROM supplier) t""".stripMargin) {
      (s, dir) =>
        val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("k"))
        val p = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
        val both = c.intersect(p).agg(count(lit(1)).as("n"))
          .select(lit("both").as("side"), col("n"))
        val co = c.except(p).agg(count(lit(1)).as("n"))
          .select(lit("cust_only").as("side"), col("n"))
        both.unionAll(co)
    },

    // full outer join (completes the join-type matrix: inner/left/
    // semi/anti/cross/as-of/range elsewhere): per-nation high-balance
    // customer vs supplier counts — the acctbal filters make each side
    // miss different nations, so both null-extension directions are
    // exercised. Aggregate-then-join: the join runs on two tiny
    // pre-aggregated frames, never on the raw tables.
    Q(
      "q31_full_outer",
      """WITH c AS (SELECT c_nationkey AS nkey, count(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
        |s AS (SELECT s_nationkey AS nkey, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT CAST(coalesce(c.nkey, s.nkey) AS BIGINT) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nkey = s.nkey""".stripMargin) {
      (s, dir) =>
        val c = Tables.load(s, dir, "customer")
          .where(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_cust"))
        val p = Tables.load(s, dir, "supplier")
          .where(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(p, col("ck") === col("sk"), "full_outer")
          .select(
            // int64 out per the oracle-output discipline (nationkey is
            // int32 in the parquet)
            coalesce(col("ck"), col("sk")).cast("long").as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    },

    // ---- JSON scalar extraction over the event stream table (§2.8 F4/F8
    // analog: get_json_object ≙ serde probing of args/event payloads) ----
    Q(
      "q9_events_json",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_value_c"),
          max(get_json_object(col("props"), "$.k").cast(IntegerType))
            .as("max_k"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // ---- time-range scan on the raw-nanos cursor (§3.3-8:
    // block_timestamp minmax scans; F11 keeps canonical Long nanos).
    // Oracle parity at µs: driver's DuckDB truncates parquet ns → µs. ----
    Q(
      "q10_events_time_range",
      """SELECT event_type, count(*) AS n,
        |  min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |FROM events
        |WHERE epoch_us(ts) >= 1704067200000000
        |  AND epoch_us(ts) <  1704153600000000
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .where(col("ts") >= 1704067200000000000L &&
          col("ts") < 1704153600000000000L)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          // integer div: ts/1000 via `/` would round-trip through double
          // and lose ulps at 1.7e18
          min(expr("ts div 1000")).as("first_us"),
          max(expr("ts div 1000")).as("last_us"))
    },

    // ---- rollup (grouping-sets family; free on the Spark query half,
    // SURVEY §2.5 note) ----
    Q(
      "q11_rollup_acctbal",
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("sum_bal_c"))
    },

    // ---- approx distinct users per event_type via the PORTABLE
    // m=256 HLL (PortableHll — q36's register pipeline, grouped by
    // event_type instead of day), so the pack's last rows-only entry
    // carries a full DuckDB hash replay. Spark's ENGINE-INTERNAL
    // HLL++ sketch (approx_count_distinct, whose binary internals no
    // independent engine can replay) stays exercised as the spec-
    // pinned contrast: EventOpsSpec asserts it lands within its
    // configured relative error of the exact count and brackets this
    // portable estimate. ----
    Q(
      "q12_approx_distinct_users",
      s"""WITH h AS (
         |  SELECT event_type,
         |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
         |  FROM events WHERE user_id IS NOT NULL
         |), b AS (
         |  SELECT event_type, hv % 256 AS idx, hv // 256 AS w FROM h
         |), r AS (
         |  SELECT event_type, idx, ${PortableHll.rhoLadder("w")} AS rho FROM b
         |), d AS (
         |  SELECT event_type, idx, max(rho) AS mr FROM r GROUP BY 1, 2
         |), a AS (
         |  SELECT event_type, count(*) AS occupied,
         |    sum((1::BIGINT << (53 - mr)))::BIGINT AS s_present
         |  FROM d GROUP BY 1
         |)
         |SELECT event_type, ${PortableHll.estimateExpr} FROM a""".stripMargin) {
      (s, dir) =>
        val pm =
          "CAST(conv(substr(md5(CAST(user_id AS STRING)),1,15),16,10) AS BIGINT)"
        val regs = Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull)
          .selectExpr("event_type", s"$pm AS hv")
          .selectExpr("event_type", "hv % 256 AS idx", "hv div 256 AS w")
          .withColumn("rho", expr(PortableHll.rhoLadder("w")))
          .groupBy(col("event_type"), col("idx"))
          .agg(max(col("rho")).as("mr"))
        regs.groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("occupied"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mr)")).as("s_present"))
          .selectExpr("event_type", PortableHll.estimateExpr)
    },

    // ---- DETERMINISTIC approximate distinct (linear counting,
    // Whang et al.): hash each key into m=4096 md5 buckets, estimate
    // n̂ = −m·ln(1 − V/m) from the occupied-bucket count V. Unlike the
    // HLL sketch (q12, engine-internal → rows-only), every step here
    // is engine-portable — the t17 md5 idiom for the bucket, an exact
    // integer V, one fixed double tree for the estimate — so an
    // APPROXIMATE operator carries an exact hash oracle. The only
    // shuffle key is the 4096-value bucket id. ----
    Q(
      "q81_linear_counting",
      """WITH b AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 3))::BIGINT
        |      AS bucket
        |  FROM events
        |), v AS (
        |  SELECT event_type, count(DISTINCT bucket) AS occupied
        |  FROM b GROUP BY event_type
        |)
        |SELECT event_type, CAST(occupied AS BIGINT) AS occupied,
        |  CAST(floor(-4096.0 * ln(1.0 - CAST(occupied AS DOUBLE)/4096.0))
        |    AS BIGINT) AS est_distinct
        |FROM v WHERE occupied < 4096""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 3), 16, 10)
            .cast("long").as("bucket"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("bucket")).as("occupied"))
        .where(col("occupied") < 4096)
        .select(col("event_type"), col("occupied"),
          floor(lit(-4096.0) *
            log(lit(1.0) - col("occupied").cast("double") / 4096.0))
            .cast("long").as("est_distinct"))
    },

    // ---- statistical aggregate done scale-right: Pearson correlation
    // decomposed into six exact integer partial sums (one pass, fully
    // partial-aggregable — no second pass over the data like the
    // textbook mean-centered form). Built-in corr() differs across
    // engines (update-order-dependent float accumulation); the
    // decomposition's sums are exact decimals, and the identical final
    // double expression tree evaluates bit-equal on both engines. ----
    Q(
      "q34_corr_qty_price",
      """WITH p AS (
        |  SELECT CAST(round(l_quantity*100) AS BIGINT) AS qc,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS pc
        |  FROM lineitem
        |), s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS n0,
        |    CAST(sum(CAST(qc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(qc*qc AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(pc*pc AS DECIMAL(38,0))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(qc*pc AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        |  FROM p
        |)
        |SELECT n0 AS n,
        |  CAST(floor(1e6 * (n*sxy - sx*sy) /
        |    (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))) AS BIGINT) AS corr_e6
        |FROM s""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("pc"))
      val agg = li.agg(
        count(lit(1)).as("n0"),
        sum(col("qc").cast("decimal(38,0)")).as("sx0"),
        sum(col("pc").cast("decimal(38,0)")).as("sy0"),
        sum((col("qc") * col("qc")).cast("decimal(38,0)")).as("sxx0"),
        sum((col("pc") * col("pc")).cast("decimal(38,0)")).as("syy0"),
        sum((col("qc") * col("pc")).cast("decimal(38,0)")).as("sxy0"))
      val n = col("n0").cast("double")
      val (sx, sy) = (col("sx0").cast("double"), col("sy0").cast("double"))
      val (sxx, syy, sxy) =
        (col("sxx0").cast("double"), col("syy0").cast("double"),
          col("sxy0").cast("double"))
      agg.select(
        col("n0").as("n"),
        floor(lit(1e6) * (n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
          .cast("long").as("corr_e6"))
    },

    // ---- point lookup by primary key (§3.3-1: "tx by hash"; served by
    // parquet row-group stats + bloom filters at scale) ----
    Q(
      "q18_point_lookup",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_price_c
        |FROM orders WHERE o_orderkey = 1000""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .where(col("o_orderkey") === 1000)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), cents(col("o_totalprice")).as("total_price_c"))
    }
  )
}
