package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface: string cleaning, hashing, date/time derivation,
  * CASE bucketization, null handling — the silver-layer expression library of
  * the reference re-expressed over the testdata tables
  * (k8s/spark/41-spark-job-scripts-configmap.yaml:188-318).
  *
  * All functions are built-in `org.apache.spark.sql.functions` — fully
  * codegen'd, no UDFs (the reference's deliberate perf posture, SURVEY §2.5).
  */
object Scalars {
  import Det._

  /** String functions: lower/upper/lpad/concat_ws/regexp_replace/substring/
    * length/reverse/trim/like/repeat (reference CM:194-199, CM:53-121). */
  def q20StringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select(
        $"c_custkey",
        lower($"c_name").as("name_lower"),
        upper($"c_mktsegment").as("seg_upper"),
        lpad($"c_custkey".cast(StringType), 10, "0").as("key_pad"),
        concat_ws("-", $"c_mktsegment", $"c_custkey".cast(StringType)).as("seg_key"),
        regexp_replace($"c_name", "[0-9]", "").as("name_nodigits"),
        regexp_replace($"c_name", "[^0-9]", "").as("name_digits"),
        substring($"c_name", 1, 8).as("name_prefix"),
        length($"c_name").cast(LongType).as("name_len"),
        reverse($"c_name").as("name_rev"),
        trim(concat(lit("  "), $"c_mktsegment", lit("  "))).as("seg_trim"),
        $"c_name".like("%1%").as("has_one"),
        repeat($"c_mktsegment", 2).as("seg_twice"))
      .orderBy($"c_custkey")
  }

  /** Hash / fingerprint functions: md5, sha2-256, hex, and a 60-bit integer
    * hash derived from md5 (engine-portable; reference uses sha2 CM:100-121). */
  def q21HashFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select(
        $"c_custkey",
        md5($"c_name").as("name_md5"),
        sha2($"c_name", 256).as("name_sha256"),
        upper(hex($"c_mktsegment")).as("seg_hex"),
        conv(substring(md5($"c_name"), 1, 15), 16, 10).cast(LongType).as("name_hash60"))
      .orderBy($"c_custkey")
  }

  /** Date functions over date-grained timestamps: year/month/day/dayofweek/
    * weekofyear/quarter/last_day/date_add/datediff/trunc (CM:213-220, 259). */
  def q22DateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast(LongType).as("o_year"),
        month($"o_orderdate").cast(LongType).as("o_month"),
        dayofmonth($"o_orderdate").cast(LongType).as("o_day"),
        dayofweek($"o_orderdate").cast(LongType).as("o_dow"),
        weekofyear($"o_orderdate").cast(LongType).as("o_week"),
        quarter($"o_orderdate").cast(LongType).as("o_quarter"),
        last_day($"o_orderdate".cast(DateType)).as("o_month_end"),
        date_add($"o_orderdate".cast(DateType), 30).as("o_due"),
        datediff(lit("2002-01-01").cast(DateType), $"o_orderdate").cast(LongType).as("days_to_2002"),
        trunc($"o_orderdate".cast(DateType), "month").as("o_month_start"),
        ($"o_orderdate".cast(DateType) >= lit("1998-01-01").cast(DateType) &&
          $"o_orderdate".cast(DateType) < lit("1999-01-01").cast(DateType)).as("in_1998"))
      .orderBy($"o_orderkey")
  }

  /** Time-of-day functions over a true timestamp column (events.ts):
    * hour/minute/second, date cast, epoch seconds, hour buckets —
    * the is_business_hours/is_peak_hours family of the reference (CM:214-220)
    * done on a column that actually has a time-of-day (SURVEY §1.4-1). */
  def q23TimeFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        $"event_id",
        hour($"ts").cast(LongType).as("h"),
        minute($"ts").cast(LongType).as("m"),
        second($"ts").cast(LongType).as("sec"),
        $"ts".cast(DateType).as("event_date"),
        unix_timestamp($"ts").as("epoch_s"),
        unix_timestamp(date_trunc("hour", $"ts")).as("hour_bucket_s"),
        hour($"ts").between(9, 17).as("is_business_hours"),
        (dayofweek($"ts") === 1 || dayofweek($"ts") === 7).as("is_weekend"))
      .orderBy($"event_id")
  }

  /** CASE-WHEN bucketization + IN-list + LIKE predicates rolled into a
    * grouped summary (the silver customer_value_tier / churn-risk shapes,
    * CM:223-233, CM:262-266). */
  def q24CaseBucketize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select(
        when($"o_totalprice" > 300000, "platinum")
          .when($"o_totalprice" > 150000, "high_value")
          .when($"o_totalprice" > 50000, "mid_value")
          .otherwise("standard").as("value_tier"),
        $"o_orderpriority".isin("1-URGENT", "2-HIGH").as("is_urgent"),
        when($"o_orderstatus" === "F", "finished")
          .when($"o_orderstatus" === "O", "open")
          .otherwise("partial").as("status_name"),
        $"o_totalprice")
      .groupBy($"value_tier", $"is_urgent", $"status_name")
      .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("revenue"))
      .orderBy($"value_tier", $"is_urgent", $"status_name")
  }

  /** Null semantics: typed-null production (CASE with no ELSE), coalesce,
    * isNull/isNotNull, nullif (reference CM:80-91 nullable columns). */
  def q25NullHandling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        $"event_id",
        when($"value" > 100, $"value").as("big_value"),
        coalesce(when($"value" > 100, $"value"), lit(-1.0)).as("big_or_neg"),
        when($"value" > 100, $"value").isNull.as("is_small"),
        when($"value" > 100, $"value").isNotNull.as("is_big"),
        expr("nullif(event_type, 'view')").as("type_or_null"))
      .orderBy($"event_id")
  }

  /** The gold executive-KPI aggregate re-expressed over events: per-day wide
    * aggregate with countDistinct, exact decimal sums, conditional counts
    * with *intended* semantics (count_if, not the reference's count(bool)
    * bug — SURVEY §1.4-3), conditional sums, avg/max/min
    * (reference CM:382-403). */
  def q26GoldKpisDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy($"ts".cast(DateType).as("event_date"))
      .agg(
        countDistinct($"user_id").as("daily_active_users"),
        count(lit(1)).as("n_events"),
        moneySum($"value").as("total_value"),
        moneyAvg($"value").as("avg_value"),
        max($"value").as("max_value"),
        min($"value").as("min_value"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(when($"event_type" === "purchase", dec($"value"))).cast(DoubleType)
          .as("purchase_value"),
        countDistinct(when($"event_type" === "signup", $"user_id")).as("signup_users"))
      .orderBy($"event_date")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_string_funcs" -> q20StringFuncs,
    "q21_hash_funcs" -> q21HashFuncs,
    "q22_date_funcs" -> q22DateFuncs,
    "q23_time_funcs" -> q23TimeFuncs,
    "q24_case_bucketize" -> q24CaseBucketize,
    "q25_null_handling" -> q25NullHandling,
    "q26_gold_kpis_daily" -> q26GoldKpisDaily)

  val oracles: Map[String, String] = Map(
    "q20_string_funcs" ->
      """SELECT c_custkey,
        | lower(c_name) AS name_lower,
        | upper(c_mktsegment) AS seg_upper,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        | concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
        | regexp_replace(c_name, '[0-9]', '', 'g') AS name_nodigits,
        | regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits,
        | substr(c_name, 1, 8) AS name_prefix,
        | length(c_name) AS name_len,
        | reverse(c_name) AS name_rev,
        | trim('  ' || c_mktsegment || '  ') AS seg_trim,
        | c_name LIKE '%1%' AS has_one,
        | repeat(c_mktsegment, 2) AS seg_twice
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q21_hash_funcs" ->
      """SELECT c_custkey,
        | md5(c_name) AS name_md5,
        | sha256(c_name) AS name_sha256,
        | upper(hex(c_mktsegment)) AS seg_hex,
        | CAST(concat('0x', substr(md5(c_name), 1, 15)) AS BIGINT) AS name_hash60
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q22_date_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS o_year,
        | month(o_orderdate) AS o_month,
        | day(o_orderdate) AS o_day,
        | dayofweek(o_orderdate) + 1 AS o_dow,
        | weekofyear(o_orderdate) AS o_week,
        | quarter(o_orderdate) AS o_quarter,
        | last_day(CAST(o_orderdate AS DATE)) AS o_month_end,
        | CAST(o_orderdate AS DATE) + 30 AS o_due,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month_start,
        | (CAST(o_orderdate AS DATE) >= DATE '1998-01-01' AND CAST(o_orderdate AS DATE) < DATE '1999-01-01') AS in_1998
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q23_time_funcs" ->
      """SELECT event_id,
        | hour(ts) AS h,
        | minute(ts) AS m,
        | CAST(floor(second(ts)) AS BIGINT) AS sec,
        | CAST(ts AS DATE) AS event_date,
        | CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        | CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_bucket_s,
        | hour(ts) BETWEEN 9 AND 17 AS is_business_hours,
        | (dayofweek(ts) + 1 = 1 OR dayofweek(ts) + 1 = 7) AS is_weekend
        |FROM events ORDER BY event_id""".stripMargin,
    "q24_case_bucketize" ->
      """SELECT
        | CASE WHEN o_totalprice > 300000 THEN 'platinum'
        |      WHEN o_totalprice > 150000 THEN 'high_value'
        |      WHEN o_totalprice > 50000 THEN 'mid_value'
        |      ELSE 'standard' END AS value_tier,
        | o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
        | CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |      WHEN o_orderstatus = 'O' THEN 'open'
        |      ELSE 'partial' END AS status_name,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q25_null_handling" ->
      """SELECT event_id,
        | CASE WHEN value > 100 THEN value END AS big_value,
        | coalesce(CASE WHEN value > 100 THEN value END, -1.0) AS big_or_neg,
        | (CASE WHEN value > 100 THEN value END) IS NULL AS is_small,
        | (CASE WHEN value > 100 THEN value END) IS NOT NULL AS is_big,
        | nullif(event_type, 'view') AS type_or_null
        |FROM events ORDER BY event_id""".stripMargin,
    "q26_gold_kpis_daily" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | count(DISTINCT user_id) AS daily_active_users,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value,
        | max(value) AS max_value,
        | min(value) AS min_value,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value,
        | count(DISTINCT CASE WHEN event_type = 'signup' THEN user_id END) AS signup_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
