package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import graft.expr.Base58

/** SQL-surface registration of the custom Catalyst expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("base58 is callable from raw SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT base58(unhex(sha2(cast('hello' AS BINARY), 256))) AS h")
      .head().getString(0)
    val want = Base58.encode(
      MessageDigest.getInstance("SHA-256").digest("hello".getBytes(UTF_8)))
    assert(got === want)
    // null-safe
    assert(spark.sql("SELECT base58(cast(NULL AS BINARY)) AS h")
      .head().isNullAt(0))
    // empty input
    assert(spark.sql("SELECT base58(cast('' AS BINARY)) AS h")
      .head().getString(0) === "")
  }
}
