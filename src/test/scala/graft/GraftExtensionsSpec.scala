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

  test("base58 over a non-binary argument fails at analysis, not runtime") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT base58('abc') AS h").head()
    }
    // AnalysisException (clean type error), never ClassCastException
    assert(!e.isInstanceOf[ClassCastException], s"got $e")
    assert(e.getMessage.toLowerCase.contains("type") ||
      e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }

  test("wrong arity gives a clear error from both registration paths") {
    GraftExtensions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT base58(cast('' AS BINARY), 1)").head()
    }
    assert(e1.getMessage.contains("exactly one"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d))").head()
    }
    assert(e2.getMessage.contains("exactly two"), e2.getMessage)
  }

  test("nfc_normalize: composed == normalized(decomposed); SQL + typed") {
    GraftExtensions.register(spark)
    val composed = "caf\u00e9" // e-acute precomposed
    val decomposed = "cafe\u0301" // e + combining acute
    assert(composed != decomposed) // different code points...
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') = '$composed' AS eq, " +
        s"nfc_normalize(CAST(NULL AS STRING)) AS n, " +
        s"nfc_normalize('plain ascii') AS id").head()
    assert(r.getBoolean(0)) // ...same text after NFC
    assert(r.isNullAt(1))
    assert(r.getString(2) === "plain ascii")
    // analysis-time type check (SQL-registered surface)
    val e = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(42)").head()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
    // normalize_text end-to-end: case + composition + spacing collapse
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("  CAF\u00c9   x ", "cafe\u0301 x").toDF("t")
      .select(graft.functions.normalize_text(col("t")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(out === Set(composed + " x"))
  }

  test("vec_dot declares nullable: length mismatch on non-nullable inputs") {
    GraftExtensions.register(spark)
    // array(...) literals are non-nullable children; a mismatch must
    // surface as a real NULL (not constant-folded away / janino failure).
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(1.0d)) AS d, " +
        "isnull(vec_dot(array(1.0d, 2.0d), array(1.0d))) AS isn").head()
    assert(r.isNullAt(0))
    assert(r.getBoolean(1))
    // and the happy path still computes in the same (codegen) shape
    val ok = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(ok.getDouble(0) === 11.0)
  }

  test("bounded_top_k is callable from raw SQL as a grouped aggregate; " +
    "k must be a literal") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 5L, 11L), (1L, 9L, 12L), (1L, 9L, 10L), (1L, 1L, 13L),
      (2L, 4L, 20L))
      .toDF("g", "s", "i").createOrReplaceTempView("btk_in")
    val rows = spark.sql(
      """SELECT g, t.score, t.id
        |FROM (SELECT g, bounded_top_k(s, i, 2) AS tk
        |      FROM btk_in GROUP BY g)
        |LATERAL VIEW explode(tk) AS t
        |ORDER BY g, t.score DESC, t.id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // group 1: the two 9s tie -> lower id first; 5 misses the k=2 cut
    assert(rows === Seq((1L, 9L, 10L), (1L, 9L, 12L), (2L, 4L, 20L)))
    val err = intercept[Exception] {
      spark.sql("SELECT bounded_top_k(s, i, s) FROM btk_in").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.toLowerCase.contains("literal"), err.getMessage)
  }

  test("bounded_top_k rejects k <= 0 and k beyond Int range at the " +
    "builder with the usage message (no silent Long truncation)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 5L, 11L)).toDF("g", "s", "i")
      .createOrReplaceTempView("btk_range_in")
    Seq("0", "-3", s"${Int.MaxValue.toLong + 1}L", "4294967297L")
      .foreach { k =>
        val err = intercept[Exception] {
          spark.sql(
            s"SELECT g, bounded_top_k(s, i, $k) FROM btk_range_in GROUP BY g")
            .collect()
        }
        assert(err.getMessage.contains("bounded_top_k"), s"k=$k: $err")
        assert(err.getMessage.contains("must be in [1,"), s"k=$k: $err")
      }
    // a large in-range k still plans and runs (buffer is O(k))
    val ok = spark.sql(
      """SELECT g, size(bounded_top_k(s, i, 100000)) AS n
        |FROM btk_range_in GROUP BY g""".stripMargin).head()
    assert(ok.getInt(1) === 1)
  }
}
