package graft

import org.apache.spark.sql.functions._
import graft.query.{Skew, Tables}

/** Salting must not change join/aggregation semantics. */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a skewed key distribution") {
    val dir = "/root/testdata/sf0.001"
    // lineitem ⋈ part: l_partkey is a real many-to-one key
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val p = Tables.load(spark, dir, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(p, Seq("l_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"),
        sum(Tables.cents(col("l_quantity"))).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(li, p, Seq("l_partkey"), salts = 8)
      .groupBy("p_brand").agg(count(lit(1)).as("n"),
        sum(Tables.cents(col("l_quantity"))).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted collect_set equals plain collect_set") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.load(spark, dir, "events")
    val plain = e.groupBy("event_type")
      .agg(collect_set(col("user_id")).as("user_id_set"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val salted = Skew.saltedCollectSet(e, Seq("event_type"), "user_id", 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(salted === plain)
  }
}
