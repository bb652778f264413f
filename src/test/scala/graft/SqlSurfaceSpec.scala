package graft

import graft.query.Tables

/** The spark.sql(...) surface: a user of the reference queries its
  * ClickHouse tables with SQL; here the same SQL runs over the
  * registered views (SURVEY.md §3.3 — Catalyst owns
  * parse→analyze→optimize→physical).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views serve the explorer query shapes via raw SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")

    // §3.3-2 account-history shape
    val hist = spark.sql(
      """SELECT o_custkey, count(*) AS n,
        |       max(o_orderdate) AS latest
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 20
        |GROUP BY o_custkey""".stripMargin)
    assert(hist.count() > 0)

    // correlated subquery (rewritten by Catalyst, §4.2)
    val sub = spark.sql(
      """SELECT c_custkey FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_nationkey = c.c_nationkey)""".stripMargin)
    assert(sub.count() > 0)

    // join + window over views
    val win = spark.sql(
      """SELECT * FROM (
        |  SELECT n_name, c_name, c_acctbal,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY c_acctbal DESC) AS rk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |WHERE rk = 1""".stripMargin)
    assert(win.count() > 0)

    // events JSON path via SQL
    val js = spark.sql(
      """SELECT get_json_object(props, '$.k') AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY n DESC LIMIT 5""".stripMargin)
    assert(js.count() === 5)
  }
}
