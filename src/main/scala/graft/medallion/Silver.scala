package graft.medallion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver-layer cleansing / standardization / enrichment expression library.
  *
  * Pure `Column => Column` functions (unit-testable without a cluster) plus
  * the full enrichment transform, re-expressing the reference silver job
  * (k8s/spark/41-spark-job-scripts-configmap.yaml:188-318): keep every
  * bronze column, drop `duplicate_suspected` rows (~5%), add ~35 derived
  * columns. The clock is injectable so recency/processing columns are
  * deterministic under test (the reference hardwires current_date/
  * current_timestamp — SURVEY §1.4-5).
  *
  * The whole transform is a single narrow projection: no shuffle until the
  * partitioned write, which is exactly how it should scale — the only
  * exchange at 100 TB is the write-side hash distribution by
  * (interaction_date, channel).
  */
object Silver {

  /** CM:194 — lowercase, trim, strip the synthetic ".duplicate" marker. */
  def emailClean(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\.duplicate", "")

  /** CM:195-199 — strip non-digits, then wrap a bare 10-digit (optionally
    * 1-prefixed) number in parens: "(##########)". Reference-exact,
    * including the odd output shape (SURVEY §1.4-6). */
  def phoneClean(c: Column): Column =
    regexp_replace(regexp_replace(c, "[^0-9]", ""), "^1?(\\d{10})$", "($1)")

  /** CM:202-206 — collapse dirty state variants to 2-letter codes. */
  def stateStandardized(c: Column): Column =
    when(upper(c).isin("CA", "CALIFORNIA"), "CA")
      .when(upper(c).isin("TX", "TEXAS"), "TX")
      .when(upper(c).isin("NY", "NEW YORK"), "NY")
      .otherwise(upper(c))

  /** CM:208-210 — unify New York spellings. */
  def cityStandardized(c: Column): Column =
    when(upper(c).isin("NEW YORK", "NYC"), "New York").otherwise(c)

  /** CM:223-227 */
  def customerValueTier(amount: Column): Column =
    when(amount > 500, "high_value").when(amount > 100, "medium_value")
      .when(amount > 0, "low_value").otherwise("browser_only")

  /** CM:229-233 */
  def transactionSizeCategory(amount: Column): Column =
    when(amount > 1000, "large").when(amount > 250, "medium")
      .when(amount > 0, "small").otherwise("none")

  /** CM:236-237 */
  def engagementScore(pageViews: Column): Column =
    when(pageViews === 0, 0).when(pageViews <= 2, 1).when(pageViews <= 5, 2)
      .when(pageViews <= 10, 3).otherwise(4)

  /** CM:239-243 */
  def sessionDepthCategory(pageViews: Column): Column =
    when(pageViews > 10, "deep").when(pageViews > 3, "medium")
      .when(pageViews > 0, "shallow").otherwise("bounce")

  /** CM:245-249 */
  def timeSpentCategory(seconds: Column): Column =
    when(seconds > 1800, "long").when(seconds > 300, "medium")
      .when(seconds > 0, "short").otherwise("none")

  /** CM:251-255 */
  def channelPreference(channel: Column): Column =
    when(channel === "mobile_app", "mobile_first")
      .when(channel === "web", "web_first")
      .when(channel === "store", "physical_first")
      .otherwise("omnichannel")

  /** CM:262-266 — null satisfaction means unknown risk. */
  def churnRiskIndicator(satisfaction: Column): Column =
    when(satisfaction <= 2, "high_risk").when(satisfaction <= 3, "medium_risk")
      .when(satisfaction.isNull, "unknown_risk").otherwise("low_risk")

  /** CM:278-283 */
  def customerJourneyStage(interactionType: Column): Column =
    when(interactionType === "browse", "awareness")
      .when(interactionType === "abandoned_cart", "consideration")
      .when(interactionType === "purchase", "conversion")
      .when(interactionType === "support", "retention")
      .otherwise("other")

  /** CM:286-290 */
  def deviceCategory(deviceType: Column): Column =
    when(deviceType === "mobile", "mobile").when(deviceType === "tablet", "tablet")
      .otherwise("desktop")

  /** CM:292-295 */
  def browserFamily(browser: Column): Column =
    when(browser.like("%chrome%"), "chromium")
      .when(browser.like("%safari%"), "webkit")
      .when(browser.like("%firefox%"), "gecko")
      .otherwise("other")

  /** CM:314-318 */
  def dataQualityScore(flag: Column): Column =
    when(flag === "clean", 1.0).when(flag === "format_inconsistent", 0.8)
      .when(flag === "incomplete_data", 0.6).otherwise(0.3)

  /** Full silver enrichment (CM:188-318). `clockDate`/`clockTs` inject the
    * processing clock; pass `current_date()`/`current_timestamp()` for
    * production parity or literals for deterministic tests. */
  def enrich(bronze: DataFrame, clockDate: Column = current_date(),
             clockTs: Column = current_timestamp(),
             clockEpochS: Column = unix_timestamp()): DataFrame = {
    val filtered = bronze.filter(col("data_quality_flag") =!= "duplicate_suspected")
    val ts = col("event_timestamp")

    // One withColumns call = one analyzer pass (vs 35 chained withColumn).
    val derived = Seq(
      "email_clean" -> emailClean(col("email_raw")),
      "phone_clean" -> phoneClean(col("phone_raw")),
      "state_standardized" -> stateStandardized(col("state_raw")),
      "city_standardized" -> cityStandardized(col("city_raw")),
      "interaction_date" -> to_date(ts),
      "interaction_hour" -> hour(ts),
      "interaction_day_of_week" -> dayofweek(ts),
      "interaction_week_of_year" -> weekofyear(ts),
      "interaction_month" -> month(ts),
      "is_weekend" -> dayofweek(ts).isin(1, 7),
      "is_business_hours" -> hour(ts).between(9, 17),
      "is_peak_hours" -> (hour(ts).between(12, 14) || hour(ts).between(18, 20)),
      "customer_value_tier" -> customerValueTier(col("transaction_amount")),
      "transaction_size_category" -> transactionSizeCategory(col("transaction_amount")),
      "engagement_score" -> engagementScore(col("page_views")),
      "session_depth_category" -> sessionDepthCategory(col("page_views")),
      "time_spent_category" -> timeSpentCategory(col("time_on_site_seconds")),
      "channel_preference" -> channelPreference(col("channel")),
      "lifetime_value_estimate" ->
        (col("transaction_amount") * (lit(1) + col("points_earned") / 1000.0)),
      "customer_recency_score" -> (lit(30) - datediff(clockDate, to_date(ts))),
      "engagement_velocity" ->
        (col("page_views") / greatest(col("time_on_site_seconds") / 60.0, lit(1.0))),
      "churn_risk_indicator" -> churnRiskIndicator(col("satisfaction_score")),
      "attribution_channel" ->
        when(col("utm_source").isNotNull, col("utm_source")).otherwise("direct"),
      "attribution_quality" ->
        when(col("utm_source").isNotNull && col("utm_medium").isNotNull, "high")
          .when(col("utm_source").isNotNull, "medium").otherwise("low"),
      "customer_journey_stage" -> customerJourneyStage(col("interaction_type")),
      "device_category" -> deviceCategory(col("device_type")),
      "browser_family" -> browserFamily(col("browser")))

    val withBase = filtered.withColumns(derived.toMap)

    // Second pass for columns that reference first-pass derivations; third
    // for the one referencing a second-pass column (withColumns entries
    // cannot see siblings from the same call).
    withBase.withColumns(Map(
      "interaction_context" ->
        concat_ws("|", col("device_type"), col("browser"), col("channel")),
      "full_context_fingerprint" ->
        concat_ws(":", col("device_category"), col("browser_family"),
          col("channel"), col("attribution_channel"), col("customer_value_tier")),
      "interaction_payload_clean" -> col("interaction_payload"),
      "data_lineage" -> lit("silver_enriched_v2"),
      "processing_timestamp" -> clockTs,
      "data_quality_score" -> dataQualityScore(col("data_quality_flag"))))
      .withColumn("enriched_payload",
        concat_ws("|", col("interaction_payload"), col("full_context_fingerprint"),
          clockEpochS.cast(StringType)))
  }
}
