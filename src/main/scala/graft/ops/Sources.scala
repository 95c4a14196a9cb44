package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text source/sink round-trips — CSV and JSON-lines, the two ingest
  * formats every lakehouse bronze layer meets before parquet. Each gate
  * writes a table out in the text format, reads it back under an EXPLICIT
  * schema (the production pattern: schema inference over 100 TB of text is
  * a full extra scan), and aggregates the read-back frame; the oracle
  * computes the same aggregate from the original parquet, so any value,
  * null, quoting, or type corruption in the round-trip breaks the
  * cross-engine hash. `SourcesSpec` covers the row-level equivalence at
  * test scale; these gates pin it end-to-end through the oracle.
  *
  * Scale posture: text writes/reads are partition-parallel (one file per
  * task, splittable line-by-line on read); the aggregate is a standard
  * partial+final hash aggregate. Nothing here is driver-side.
  */
object Sources {

  private val RoundTripRoot = "/tmp/graft_src_roundtrip"

  /** Write each round-trip dump at most once per JVM (same memoize-after-
    * success stance as the Medallion oracle dumps: bench reruns must not
    * re-pay or re-race the write; a failed write retries next call). */
  private val dumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def writeOnce(path: String)(write: => Unit): Unit =
    if (!dumped.contains(path)) synchronized {
      if (!dumped.contains(path)) {
        write
        dumped.add(path)
      }
    }

  private def san(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** q49: CSV round-trip — customer out through the CSV sink (header,
    * default quoting) and back under its explicit schema, then a per-
    * segment aggregate over the read-back frame. */
  def q49CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val path = s"$RoundTripRoot/csv_customer_${san(dir)}"
    writeOnce(path) {
      cust.write.mode("overwrite").option("header", "true").csv(path)
    }
    val back = s.read.option("header", "true").schema(cust.schema).csv(path)
    back.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        Det.moneySum($"c_acctbal").as("total_acctbal"),
        min($"c_custkey").as("min_custkey"),
        max($"c_custkey").as("max_custkey"))
      .orderBy($"c_mktsegment")
  }

  /** q50: JSON-lines round-trip — orders out through the JSON sink
    * (timestamps serialized as ISO-8601 text) and back under its explicit
    * schema, then a per-status aggregate over the read-back frame. */
  def q50JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val path = s"$RoundTripRoot/json_orders_${san(dir)}"
    writeOnce(path) {
      ord.write.mode("overwrite").json(path)
    }
    val back = s.read.schema(ord.schema).json(path)
    back.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        Det.moneySum($"o_totalprice").as("total_price"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderdate").as("last_order"))
      .orderBy($"o_orderstatus")
  }

  /** q51: ORC round-trip — supplier out through the columnar ORC sink and
    * back (self-describing schema, no explicit re-declare needed), then a
    * per-nation aggregate over the read-back frame. Completes the
    * text-and-columnar source/sink matrix next to parquet (everywhere) and
    * q49/q50. */
  def q51OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.load(s, dir, "supplier")
    val path = s"$RoundTripRoot/orc_supplier_${san(dir)}"
    writeOnce(path) {
      sup.write.mode("overwrite").orc(path)
    }
    val back = s.read.orc(path)
    back.groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        Det.moneySum($"s_acctbal").as("total_acctbal"),
        min($"s_name").as("first_name"))
      .orderBy($"s_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_csv_roundtrip" -> q49CsvRoundtrip,
    "q50_json_roundtrip" -> q50JsonRoundtrip,
    "q51_orc_roundtrip" -> q51OrcRoundtrip)

  val oracles: Map[String, String] = Map(
    "q49_csv_roundtrip" ->
      """SELECT c_mktsegment,
        | count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
        | min(c_custkey) AS min_custkey,
        | max(c_custkey) AS max_custkey
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q50_json_roundtrip" ->
      """SELECT o_orderstatus,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        | min(o_orderdate) AS first_order,
        | max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q51_orc_roundtrip" ->
      """SELECT s_nationkey,
        | count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
        | min(s_name) AS first_name
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}
