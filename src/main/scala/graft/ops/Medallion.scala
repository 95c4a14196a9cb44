package graft.ops

import graft.medallion.{BronzeGen, Gold, Silver}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion stages exposed through the driver's query contract — the
  * reference's own program (bronze generate -> silver enrich -> gold KPIs,
  * k8s/spark/41-spark-job-scripts-configmap.yaml:46-121, 188-318, 382-403)
  * pinned against DuckDB oracles.
  *
  * Oracle strategy: these stages run on seeded *generated* data (the
  * reference's data model), not the driver testdata tables, so each query
  * first dumps its deterministic, engine-neutral input frame to a fixed
  * parquet path and the oracle SQL re-derives the stage from that dump:
  *  - m01: bronze dump itself (cross-engine readability of every column);
  *  - m02: the full ~30-column silver enrichment re-expressed in DuckDB SQL
  *    over the bronze dump;
  *  - m03: the gold KPI aggregate re-expressed in DuckDB SQL over the
  *    silver dump (deterministic decimal-sum variant, Gold.kpisDet).
  * Timestamps are carried as epoch seconds (BIGINT) in the dumps and
  * outputs — engine-neutral; hour/dow/week derivations happen in UTC on
  * both sides (make_timestamp in DuckDB is naive-UTC; the Spark session
  * runs with spark.sql.session.timeZone=UTC).
  *
  * The approx_count_distinct scale variant of the gold KPIs
  * ([[graft.medallion.Gold.kpisApprox]]) is deliberately NOT a driver
  * gate: HLL sketch internals are engine-specific by design, so a DuckDB
  * hash-compare is impossible and a rows-only row would read as a
  * permanent gray gate. Its correctness contract lives in MedallionSpec
  * (per-date approx vs exact within 3·rsd) and ApproxAggSpec instead.
  */
object Medallion {
  private val Epoch = 1754982000L
  private val Rows = 5000L
  private val DumpDir = "/tmp/graft_mdp_oracle"
  private val BronzeDump = s"$DumpDir/bronze"
  private val SilverDump = s"$DumpDir/silver"

  /** The generation clock's UTC date (what clockDate resolves to). */
  private val ClockDate = java.time.Instant.ofEpochSecond(Epoch)
    .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private def bronzeDf(s: SparkSession): DataFrame =
    BronzeGen.generate(s, Rows, 8, payloadKb = 1, seed = 42, baseEpochS = Epoch)

  private def silverDf(s: SparkSession): DataFrame =
    Silver.enrich(bronzeDf(s),
      clockDate = to_date(timestamp_seconds(lit(Epoch))),
      clockTs = timestamp_seconds(lit(Epoch)),
      clockEpochS = lit(Epoch))

  /** Engine-neutral bronze frame: payload dropped (oracle-irrelevant bulk),
    * timestamp as epoch seconds. */
  private def bronzeNeutral(s: SparkSession): DataFrame =
    bronzeDf(s)
      .withColumn("event_epoch_s", unix_timestamp(col("event_timestamp")))
      .drop("event_timestamp", "interaction_payload")

  /** Engine-neutral silver frame: payload-derived columns dropped,
    * timestamps as epoch seconds. */
  private def silverNeutral(s: SparkSession): DataFrame =
    silverDf(s)
      .withColumn("event_epoch_s", unix_timestamp(col("event_timestamp")))
      .withColumn("processing_epoch_s", unix_timestamp(col("processing_timestamp")))
      .drop("event_timestamp", "processing_timestamp",
        "interaction_payload", "interaction_payload_clean", "enriched_payload")

  /** Write each oracle dump at most once per JVM: the dump content is a
    * pure function of the code + seed, so repeated query invocations (the
    * bench runs every query fn 5x) need not pay — or have their timings
    * biased by — the single-file write, and re-running a query can never
    * race the oracle's read of a previous dump. */
  private val dumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def dump(df: => DataFrame, path: String): Unit =
    if (!dumped.contains(path)) synchronized {
      // memoize only AFTER the write succeeds: a failed/partial dump must
      // be retried by the next invocation, not frozen for the JVM lifetime
      if (!dumped.contains(path)) {
        df.coalesce(1).write.mode("overwrite").parquet(path)
        dumped.add(path)
      }
    }

  /** Bronze generator output, dumped for the oracle to read back. */
  def m01Bronze(s: SparkSession, dir: String): DataFrame = {
    val b = bronzeNeutral(s)
    dump(b, BronzeDump)
    b.orderBy(col("id"))
  }

  /** Silver enrichment: all derived columns over seeded bronze; the oracle
    * re-derives them in DuckDB SQL from the bronze dump. */
  def m02Silver(s: SparkSession, dir: String): DataFrame = {
    dump(bronzeNeutral(s), BronzeDump)
    silverNeutral(s).orderBy(col("id"))
  }

  /** Gold executive KPIs (deterministic decimal-sum variant) over the
    * seeded medallion chain; the oracle re-aggregates the silver dump. */
  def m03Gold(s: SparkSession, dir: String): DataFrame = {
    dump(silverNeutral(s), SilverDump)
    Gold.kpisDet(silverDf(s)).orderBy(col("interaction_date"))
  }

  /** Scale-path gold variant: HLL approx distinct instead of exact Expand.
    * Spec-checked (MedallionSpec 3·rsd bound), not driver-gated — see the
    * object Scaladoc. */
  def m04GoldApprox(s: SparkSession, dir: String): DataFrame =
    Gold.kpisApprox(silverDf(s)).orderBy(col("interaction_date"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_bronze_generate" -> m01Bronze,
    "m02_silver_enrich" -> m02Silver,
    "m03_gold_kpis" -> m03Gold)

  /** DuckDB re-derivation of Silver.enrich (CM:188-318) over the bronze
    * dump. Engine-mapping notes: DuckDB dayofweek is 0-based Sunday (Spark
    * 1-based, hence +1); hour/dayofweek/... return BIGINT (cast to INTEGER
    * to match Spark's int columns); regexp_replace needs the 'g' flag and
    * backslash backreferences; make_timestamp(micros) is naive UTC. */
  private def silverSql(from: String): String = s"""
    WITH b AS (
      SELECT *, make_timestamp(event_epoch_s * 1000000) AS __ts
      FROM $from
      WHERE data_quality_flag <> 'duplicate_suspected'
    ), s AS (
      SELECT b.*,
        regexp_replace(lower(trim(email_raw)), '\\.duplicate', '', 'g') AS email_clean,
        regexp_replace(regexp_replace(phone_raw, '[^0-9]', '', 'g'), '^1?(\\d{10})$$', '(\\1)') AS phone_clean,
        CASE WHEN upper(state_raw) IN ('CA','CALIFORNIA') THEN 'CA'
             WHEN upper(state_raw) IN ('TX','TEXAS') THEN 'TX'
             WHEN upper(state_raw) IN ('NY','NEW YORK') THEN 'NY'
             ELSE upper(state_raw) END AS state_standardized,
        CASE WHEN upper(city_raw) IN ('NEW YORK','NYC') THEN 'New York'
             ELSE city_raw END AS city_standardized,
        CAST(__ts AS DATE) AS interaction_date,
        CAST(hour(__ts) AS INTEGER) AS interaction_hour,
        CAST(dayofweek(__ts) + 1 AS INTEGER) AS interaction_day_of_week,
        CAST(weekofyear(__ts) AS INTEGER) AS interaction_week_of_year,
        CAST(month(__ts) AS INTEGER) AS interaction_month,
        dayofweek(__ts) IN (0, 6) AS is_weekend,
        hour(__ts) BETWEEN 9 AND 17 AS is_business_hours,
        (hour(__ts) BETWEEN 12 AND 14) OR (hour(__ts) BETWEEN 18 AND 20) AS is_peak_hours,
        CASE WHEN transaction_amount > 500 THEN 'high_value'
             WHEN transaction_amount > 100 THEN 'medium_value'
             WHEN transaction_amount > 0 THEN 'low_value'
             ELSE 'browser_only' END AS customer_value_tier,
        CASE WHEN transaction_amount > 1000 THEN 'large'
             WHEN transaction_amount > 250 THEN 'medium'
             WHEN transaction_amount > 0 THEN 'small'
             ELSE 'none' END AS transaction_size_category,
        CAST(CASE WHEN page_views = 0 THEN 0 WHEN page_views <= 2 THEN 1
                  WHEN page_views <= 5 THEN 2 WHEN page_views <= 10 THEN 3
                  ELSE 4 END AS INTEGER) AS engagement_score,
        CASE WHEN page_views > 10 THEN 'deep' WHEN page_views > 3 THEN 'medium'
             WHEN page_views > 0 THEN 'shallow' ELSE 'bounce' END AS session_depth_category,
        CASE WHEN time_on_site_seconds > 1800 THEN 'long'
             WHEN time_on_site_seconds > 300 THEN 'medium'
             WHEN time_on_site_seconds > 0 THEN 'short'
             ELSE 'none' END AS time_spent_category,
        CASE WHEN channel = 'mobile_app' THEN 'mobile_first'
             WHEN channel = 'web' THEN 'web_first'
             WHEN channel = 'store' THEN 'physical_first'
             ELSE 'omnichannel' END AS channel_preference,
        transaction_amount * (1 + points_earned / 1000.0) AS lifetime_value_estimate,
        CAST(30 - date_diff('day', CAST(__ts AS DATE), DATE '$ClockDate') AS INTEGER) AS customer_recency_score,
        page_views / greatest(time_on_site_seconds / 60.0, 1.0) AS engagement_velocity,
        CASE WHEN satisfaction_score <= 2 THEN 'high_risk'
             WHEN satisfaction_score <= 3 THEN 'medium_risk'
             WHEN satisfaction_score IS NULL THEN 'unknown_risk'
             ELSE 'low_risk' END AS churn_risk_indicator,
        CASE WHEN utm_source IS NOT NULL THEN utm_source ELSE 'direct' END AS attribution_channel,
        CASE WHEN utm_source IS NOT NULL AND utm_medium IS NOT NULL THEN 'high'
             WHEN utm_source IS NOT NULL THEN 'medium'
             ELSE 'low' END AS attribution_quality,
        CASE WHEN interaction_type = 'browse' THEN 'awareness'
             WHEN interaction_type = 'abandoned_cart' THEN 'consideration'
             WHEN interaction_type = 'purchase' THEN 'conversion'
             WHEN interaction_type = 'support' THEN 'retention'
             ELSE 'other' END AS customer_journey_stage,
        CASE WHEN device_type = 'mobile' THEN 'mobile'
             WHEN device_type = 'tablet' THEN 'tablet'
             ELSE 'desktop' END AS device_category,
        CASE WHEN browser LIKE '%chrome%' THEN 'chromium'
             WHEN browser LIKE '%safari%' THEN 'webkit'
             WHEN browser LIKE '%firefox%' THEN 'gecko'
             ELSE 'other' END AS browser_family
      FROM b
    )
    SELECT s.* EXCLUDE (__ts),
      concat_ws('|', device_type, browser, channel) AS interaction_context,
      concat_ws(':', device_category, browser_family, channel,
        attribution_channel, customer_value_tier) AS full_context_fingerprint,
      'silver_enriched_v2' AS data_lineage,
      CAST($Epoch AS BIGINT) AS processing_epoch_s,
      CAST(CASE WHEN data_quality_flag = 'clean' THEN 1.0
                WHEN data_quality_flag = 'format_inconsistent' THEN 0.8
                WHEN data_quality_flag = 'incomplete_data' THEN 0.6
                ELSE 0.3 END AS DOUBLE) AS data_quality_score
    FROM s ORDER BY id"""

  /** DuckDB re-derivation of Gold.kpisDet (CM:382-403, intended count_if
    * semantics — SURVEY §1.4-3) over the silver dump. Decimal sums match
    * Spark's exactly; int sums cast to BIGINT (DuckDB sum(int) is HUGEINT). */
  private def goldSql(from: String): String = s"""
    SELECT interaction_date,
      count(DISTINCT customer_id) AS daily_active_customers,
      count(DISTINCT email_clean) AS unique_email_addresses,
      count(DISTINCT support_ticket_id) AS support_tickets_created,
      CAST(SUM(CAST(transaction_amount AS DECIMAL(18,6))) AS DOUBLE) AS total_daily_revenue,
      CAST(SUM(CAST(transaction_amount AS DECIMAL(18,6))) AS DOUBLE)
        / COUNT(transaction_amount) AS avg_transaction_value,
      MAX(transaction_amount) AS largest_transaction,
      COUNT(*) FILTER (WHERE transaction_amount > 0) AS total_transactions,
      CAST(SUM(CASE WHEN channel = 'web' THEN CAST(transaction_amount AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS web_revenue,
      CAST(SUM(CASE WHEN channel = 'mobile_app' THEN CAST(transaction_amount AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS mobile_revenue,
      CAST(SUM(CASE WHEN channel = 'store' THEN CAST(transaction_amount AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS store_revenue,
      CAST(SUM(engagement_score) AS DOUBLE) / COUNT(engagement_score) AS avg_engagement_score,
      CAST(SUM(time_on_site_seconds) AS DOUBLE) / COUNT(time_on_site_seconds) AS avg_time_on_site,
      COUNT(*) FILTER (WHERE customer_journey_stage = 'conversion') AS daily_conversions,
      COUNT(*) FILTER (WHERE loyalty_member = true) AS loyalty_member_interactions,
      CAST(SUM(points_earned) AS BIGINT) AS total_points_earned,
      CAST(SUM(points_redeemed) AS BIGINT) AS total_points_redeemed,
      CAST(SUM(satisfaction_score) AS DOUBLE) / COUNT(satisfaction_score) AS avg_satisfaction_score,
      COUNT(*) FILTER (WHERE churn_risk_indicator = 'high_risk') AS high_churn_risk_customers,
      CAST(SUM(CAST(lifetime_value_estimate AS DECIMAL(18,6))) AS DOUBLE) AS total_estimated_ltv
    FROM $from
    GROUP BY interaction_date ORDER BY interaction_date"""

  val oracles: Map[String, String] = Map(
    "m01_bronze_generate" ->
      s"SELECT * FROM read_parquet('$BronzeDump/*.parquet') ORDER BY id",
    "m02_silver_enrich" ->
      silverSql(s"read_parquet('$BronzeDump/*.parquet')"),
    "m03_gold_kpis" ->
      goldSql(s"read_parquet('$SilverDump/*.parquet')"))
}
