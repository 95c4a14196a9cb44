package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `\$dir/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects outright; read nanos as long and convert to a microsecond
    // timestamp (the driver-generated data is microsecond-aligned, so the
    // ns->us integer division is exact).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** Cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against a
  * DuckDB run of `SparkEntry.oracleSql`. Floating-point aggregation order
  * differs between engines (and between runs), so every money/value sum goes
  * through DECIMAL(12,2): the testdata money columns are 2-decimal values
  * stored as doubles, so the cast is exact and identical in both engines,
  * decimal sums are exact, and the final single cast to DOUBLE is correctly
  * rounded and bit-identical on both sides.
  */
object Det {
  /** Exact 2-decimal representation of a money-ish double column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Deterministic SUM of a 2-decimal double column, returned as double. */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic AVG = exact-decimal sum / count, both engines identical. */
  def moneyAvg(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(c)

  /** lit(1.00) as DECIMAL(3,2) for exact (1 - discount) style arithmetic. */
  val oneDec: Column = lit(new java.math.BigDecimal("1.00"))
}
