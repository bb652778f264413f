package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, functions => F}

/** Table registry over the driver-generated parquet test data
  * (TESTDATA.md): TPC-H-ish star schema + `events` stream table +
  * `documents`/`embeddings` LLM-pipeline tables.
  *
  * Plays the role of the reference's schema contract
  * (/root/reference/README.md:115-332 declares ClickHouse DDL for its 8
  * tables); here the contract is "parquet at `dir`/<name>.parquet", and
  * Catalyst gets the declared schema from the parquet footer, enabling
  * column pruning + predicate pushdown with zero custom code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Session conf this engine requires. `nanosAsLong` mirrors the
    * reference's canonical-nanos choice (actions.rs:346 keeps
    * timestamp_nanosec as u64): Spark has no ns TimestampType, so the
    * `events.ts` TIMESTAMP(NANOS) parquet column is read as raw Long
    * nanos; µs TimestampType views are derived, never stored.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // parquet column indexes + bloom filters are read by default in 4.x
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so both the DataFrame API and
    * spark.sql(...) surfaces work against the same snapshot. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Exact decimal view of a 2-decimal-digit double column. All money /
    * quantity aggregation in the oracle-compared query pack goes through
    * decimals: decimal addition is associative, so Spark's partial
    * aggregation order (partitioned, shuffled) and DuckDB's single-node
    * order produce bit-identical results — a double sum would not.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Integer-cents view of a 2-decimal-digit double column. The
    * oracle-compared query pack emits ONLY strings and int64: the
    * driver's DuckDB (1.0.0) maps HUGEINT/DECIMAL to float in pandas and
    * rounds scale-reducing decimal casts half-to-even where Spark rounds
    * half-up, so any decimal/double output column risks a spurious hash
    * mismatch. Integer cents are exact, associative, and render
    * identically under every normalization. */
  def cents(c: Column): Column = F.round(c * 100, 0).cast("long")
}
