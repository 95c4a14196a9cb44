package graft.medallion

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seedable Customer-360 bronze generator.
  *
  * Re-expresses the reference's synthetic interaction generator
  * (k8s/spark/41-spark-job-scripts-configmap.yaml:46-121) with *intended*
  * semantics (SURVEY.md §1.4):
  *  - `event_timestamp` is a true TIMESTAMP with random time-of-day
  *    (the reference's `date_sub(current_timestamp(), n)` collapses to a
  *    DATE, making every hour-derived column degenerate — §1.4-1);
  *  - every `rand()` takes an explicit per-column seed and `uuid()` is
  *    replaced by a deterministic uuid-shaped hash, so the same (seed, rows,
  *    partitions) always generates bit-identical data — the property the
  *    reference lacks that makes golden testing possible (§1.4-5);
  *  - chained CASE WHEN rand() branches keep the reference's
  *    independent-draw shape (NOT single-draw cut-points), preserving its
  *    actual category distributions (§1.4-4).
  *
  * Scale posture: the generator is a pure narrow pipeline over
  * `spark.range(0, rows, 1, partitions)` — no shuffle, one WholeStageCodegen
  * span, embarrassingly parallel at any partition count (the reference runs
  * it 768-way for 1 TB).
  */
object BronzeGen {

  /** Reference sizing math (CM:35-40): rows from target bytes & payload. */
  def rowsFor(targetGb: Double, payloadKb: Int, partitions: Int): Long = {
    val estRowBytes = 300L + payloadKb.toLong * 1024L
    val targetBytes = (targetGb * 1024 * 1024 * 1024).toLong
    math.max(targetBytes / estRowBytes, partitions.toLong * 100L)
  }

  /** Deterministic uuid-shaped string derived from the row id and a salt. */
  private def detUuid(salt: String): Column = {
    val h = md5(concat(lit(salt), col("id").cast(StringType)))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Generate `rows` synthetic customer interactions.
    *
    * @param baseEpochS fixed "now" in epoch seconds — the generation clock.
    *                   Timestamps land in the 30 days before it.
    */
  def generate(spark: SparkSession, rows: Long, partitions: Int,
               payloadKb: Int, seed: Long, baseEpochS: Long): DataFrame = {
    var seedCounter = seed
    def r(): Column = { seedCounter += 1; rand(seedCounter) }

    val base = spark.range(0, rows, 1, partitions)

    // --- identifiers & a true random timestamp in the trailing 30 days ---
    val eventTs = timestamp_seconds(
      lit(baseEpochS) - (r() * lit(30L * 24 * 3600)).cast(LongType))
    val customerId = floor(r() * 500000).cast(LongType)

    val withIds = base.select(
      col("id"),
      eventTs.as("event_timestamp"),
      detUuid("evt").as("event_id"),
      detUuid("sess").as("session_id"),
      customerId.as("customer_id"))

    // --- raw contact fields (dirty on purpose, cleaned in silver) ---
    val emailRaw = concat(
      lit("user"), col("customer_id").cast(StringType),
      when(r() < 0.1, ".DUPLICATE").otherwise(""),
      lit("@"),
      when(r() < 0.3, "gmail.com").when(r() < 0.5, "yahoo.com")
        .when(r() < 0.7, "company.com").otherwise("outlook.com"))
    val phoneRaw = when(r() < 0.8,
      concat(lit("("), lpad((r() * 999).cast(IntegerType).cast(StringType), 3, "0"),
        lit(") "), lpad((r() * 999).cast(IntegerType).cast(StringType), 3, "0"),
        lit("-"), lpad((r() * 9999).cast(IntegerType).cast(StringType), 4, "0")))
      .otherwise(concat(lit("+1"),
        lpad((r() * 1000000000).cast(LongType).cast(StringType), 10, "0")))

    // --- interaction + transaction ---
    val interactionType = when(r() < 0.3, "purchase").when(r() < 0.5, "browse")
      .when(r() < 0.7, "support").when(r() < 0.85, "login")
      .otherwise("abandoned_cart")

    val withCore = withIds.select(col("*"),
      emailRaw.as("email_raw"),
      phoneRaw.as("phone_raw"),
      interactionType.as("interaction_type"),
      concat(lit("PRD"), lpad((r() * 10000).cast(IntegerType).cast(StringType), 5, "0"))
        .as("product_id"),
      when(r() < 0.2, "electronics").when(r() < 0.4, "clothing")
        .when(r() < 0.6, "home_garden").when(r() < 0.8, "books")
        .otherwise("sports").as("product_category"))

    val txnAmount = when(col("interaction_type") === "purchase", r() * 1000 + 10)
      .otherwise(0.0)

    val withTxn = withCore.select(col("*"),
      txnAmount.as("transaction_amount"),
      when(r() < 0.7, "USD").when(r() < 0.85, "EUR")
        .when(r() < 0.95, "GBP").otherwise("CAD").as("currency"),
      when(r() < 0.4, "web").when(r() < 0.7, "mobile_app")
        .when(r() < 0.85, "store").when(r() < 0.95, "call_center")
        .otherwise("social_media").as("channel"),
      when(r() < 0.5, "desktop").when(r() < 0.8, "mobile").otherwise("tablet")
        .as("device_type"),
      when(r() < 0.4, "chrome").when(r() < 0.6, "safari")
        .when(r() < 0.8, "firefox").otherwise("edge").as("browser"),
      concat_ws(".",
        (r() * 255).cast(IntegerType), (r() * 255).cast(IntegerType),
        (r() * 255).cast(IntegerType), (r() * 255).cast(IntegerType))
        .as("ip_address"),
      when(r() < 0.1, "New York").when(r() < 0.2, "NYC")
        .when(r() < 0.3, "Los Angeles").when(r() < 0.4, "Chicago")
        .when(r() < 0.5, "Houston").when(r() < 0.6, "Phoenix")
        .when(r() < 0.7, "Philadelphia").when(r() < 0.8, "San Antonio")
        .when(r() < 0.9, "San Diego").otherwise("Dallas").as("city_raw"),
      when(r() < 0.15, "CA").when(r() < 0.25, "California")
        .when(r() < 0.35, "TX").when(r() < 0.45, "Texas")
        .when(r() < 0.55, "NY").when(r() < 0.65, "New York")
        .otherwise("FL").as("state_raw"),
      lpad((r() * 99999).cast(IntegerType).cast(StringType), 5, "0").as("zip_code"))

    // --- behavioral metrics (dependent on interaction_type) ---
    val pageViews = when(col("interaction_type").isin("browse", "purchase"),
      (r() * 20 + 1).cast(IntegerType)).otherwise(0)
    val withBehavior = withTxn.select(col("*"), pageViews.as("page_views"))
      .select(col("*"),
        when(col("page_views") > 0, (r() * 3600 + 30).cast(IntegerType))
          .otherwise(0).as("time_on_site_seconds"),
        when(col("page_views") === 1, 1.0).otherwise(0.0).as("bounce_rate"),
        when(col("interaction_type") === "support",
          concat(lit("TKT"), (r() * 100000).cast(IntegerType).cast(StringType)))
          .otherwise(lit(null).cast(StringType)).as("support_ticket_id"))
      .select(col("*"),
        when(col("support_ticket_id").isNotNull,
          when(r() < 0.3, "billing").when(r() < 0.6, "technical")
            .otherwise("general_inquiry"))
          .otherwise(lit(null).cast(StringType)).as("issue_category"),
        when(col("support_ticket_id").isNotNull, (r() * 5 + 1).cast(IntegerType))
          .otherwise(lit(null).cast(IntegerType)).as("satisfaction_score"),
        when(r() < 0.4, concat(lit("CMP"), (r() * 1000).cast(IntegerType).cast(StringType)))
          .otherwise(lit(null).cast(StringType)).as("campaign_id"))
      .select(col("*"),
        when(col("campaign_id").isNotNull,
          when(r() < 0.3, "google").when(r() < 0.6, "facebook")
            .when(r() < 0.8, "email").otherwise("direct"))
          .otherwise(lit(null).cast(StringType)).as("utm_source"))
      .select(col("*"),
        when(col("utm_source").isNotNull,
          when(r() < 0.5, "cpc").when(r() < 0.8, "organic").otherwise("referral"))
          .otherwise(lit(null).cast(StringType)).as("utm_medium"),
        (r() < 0.6).as("loyalty_member"))
      .select(col("*"),
        when(col("loyalty_member"),
          when(r() < 0.7, "bronze").when(r() < 0.9, "silver").otherwise("gold"))
          .otherwise(lit(null).cast(StringType)).as("loyalty_tier"),
        when(col("loyalty_member") && col("interaction_type") === "purchase",
          (col("transaction_amount") * 10).cast(IntegerType)).otherwise(0)
          .as("points_earned"),
        when(col("loyalty_member") && r() < 0.1, (r() * 1000).cast(IntegerType))
          .otherwise(0).as("points_redeemed"),
        when(r() < 0.7, "primary_system").when(r() < 0.85, "legacy_import")
          .when(r() < 0.95, "manual_entry").otherwise("third_party_api")
          .as("data_source"),
        when(r() < 0.05, "duplicate_suspected").when(r() < 0.1, "incomplete_data")
          .when(r() < 0.15, "format_inconsistent").otherwise("clean")
          .as("data_quality_flag"))

    // --- payload: one 64-hex sha2 block repeated to payloadKb (CM:100-116) ---
    val payloadExpr = sha2(concat_ws("|",
      detUuid("pay"),
      (r() * 1e18).cast(LongType).cast(StringType),
      col("customer_id").cast(StringType),
      col("session_id"),
      col("product_id"),
      (lit(baseEpochS) * 1000000L + (r() * 1000000).cast(LongType)).cast(StringType),
      col("interaction_type"),
      col("channel"),
      hex((r() * 4294967296L).cast(LongType)),
      reverse((r() * 1e16).cast(LongType).cast(StringType))), 256)
    val repeatCount = math.max(1, payloadKb * 1024 / 64)

    withBehavior.select(col("*"),
      repeat(payloadExpr, repeatCount).as("interaction_payload"),
      (r() * 999999999999999999L).cast(LongType).cast(StringType).as("entropy_break1"),
      reverse(hex((r() * 4294967296L).cast(LongType))).as("entropy_break2"),
      detUuid("ent").as("entropy_break3"),
      concat(col("browser"), lit("/"), (r() * 100 + 1).cast(IntegerType).cast(StringType),
        lit("."), (r() * 10).cast(IntegerType).cast(StringType)).as("raw_user_agent"),
      sha2(concat(col("ip_address"), col("device_type"), col("browser")), 256)
        .as("session_fingerprint"))
  }
}
