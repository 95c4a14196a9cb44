package graft.ops

import graft.medallion.{BronzeGen, Gold, Silver}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion stages exposed through the driver's query contract.
  *
  * These run on seeded generated data (the reference's own data model), not
  * the testdata tables, so they have no DuckDB oracle — the driver records
  * rows-only checks. Full semantics are covered by MedallionSpec (unit
  * oracles) and the gold intra-engine SQL cross-check.
  */
object Medallion {
  private val Epoch = 1754982000L
  private val Rows = 5000L

  private def bronzeDf(s: SparkSession): DataFrame =
    BronzeGen.generate(s, Rows, 8, payloadKb = 1, seed = 42, baseEpochS = Epoch)

  private def silverDf(s: SparkSession): DataFrame =
    Silver.enrich(bronzeDf(s),
      clockDate = to_date(timestamp_seconds(lit(Epoch))),
      clockTs = timestamp_seconds(lit(Epoch)),
      clockEpochS = lit(Epoch))

  /** Bronze generator output (payloads dropped to keep the dump small). */
  def m01Bronze(s: SparkSession, dir: String): DataFrame =
    bronzeDf(s).drop("interaction_payload").orderBy(col("id"))

  /** Silver enrichment: all derived columns over seeded bronze. */
  def m02Silver(s: SparkSession, dir: String): DataFrame =
    silverDf(s).drop("interaction_payload", "interaction_payload_clean",
      "enriched_payload").orderBy(col("id"))

  /** Gold executive KPIs over the seeded medallion chain. */
  def m03Gold(s: SparkSession, dir: String): DataFrame =
    Gold.kpis(silverDf(s)).orderBy(col("interaction_date"))

  /** Scale-path gold variant: HLL approx distinct instead of exact Expand. */
  def m04GoldApprox(s: SparkSession, dir: String): DataFrame =
    Gold.kpisApprox(silverDf(s)).orderBy(col("interaction_date"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_bronze_generate" -> m01Bronze,
    "m02_silver_enrich" -> m02Silver,
    "m03_gold_kpis" -> m03Gold,
    "m04_gold_kpis_approx" -> m04GoldApprox)

  val oracles: Map[String, String] = Map.empty
}
