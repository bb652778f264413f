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
    * timestamp_nanosec as u64): Spark has no ns TimestampType, so a
    * TIMESTAMP(NANOS) parquet `events.ts` is read as raw Long nanos;
    * µs TimestampType views are derived, never stored.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // parquet column indexes + bloom filters are read by default in 4.x
    // time-range predicates over the derived nanos ts reach the parquet
    // scan (sessions built without GraftExtensions get the rule here;
    // extraOptimizations is idempotent-guarded)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.NanosPredicatePushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.NanosPredicatePushdown
    }
  }

  /** The engine-wide contract is `events.ts` = Long epoch NANOS (F11 —
    * the reference keeps timestamp_nanosec as u64). The fixture has
    * shipped the column both as parquet TIMESTAMP(NANOS) (read as Long
    * via `nanosAsLong`) and as timestamp[us]; for the latter the nanos
    * view is derived here ONCE at load, so every downstream operator
    * and every oracle keeps the integer-nanos contract regardless of
    * the physical encoding. Time-range predicates on the derived
    * column are re-written back onto the native timestamp by
    * [[graft.plans.NanosPredicatePushdown]] so parquet row-group
    * pruning still sees a plain `ts ⋈ literal` filter. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") nanosView(df) else df
  }

  /** Normalize an events-shaped frame — batch OR streaming (it is a
    * pure projection) — to the Long-nanos `ts` contract. Identity when
    * ts is already a Long. */
  def nanosView(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.TimestampType =>
        df.withColumn(
          "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000L)
      case _ => df
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
