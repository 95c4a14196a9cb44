package graft.medallion

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer executive KPI aggregate.
  *
  * Re-expresses the reference gold job (k8s/spark/41-spark-job-scripts-
  * configmap.yaml:382-403) with *intended* semantics:
  *  - the published script cannot run (Python builtin sum/max shadowing,
  *    SURVEY §1.4-2) — the intent is Spark sum/avg/max, implemented here;
  *  - `count(boolean_expr)` in the reference counts every row (§1.4-3);
  *    the intended conditional counts use count_if here.
  *
  * One wide hash aggregate: partial aggregation map-side, single exchange on
  * interaction_date (~30 groups), final aggregate. The three countDistinct
  * columns expand to a multi-phase distinct aggregate — at 100 TB scale the
  * `approx_count_distinct` variant (`kpisApprox`) replaces the exact
  * Expand-based plan with mergeable HLL sketches and should be preferred.
  */
object Gold {
  import org.apache.spark.sql.Column

  /** The 19 KPI aggregates, parameterized by the three strategies that
    * differ between the production and deterministic-gate variants: the
    * distinct count, the double sum, and the average. ONE list — the gate
    * variant can never drift from what production computes. */
  private def allAggs(distinct: Column => Column, dblSum: Column => Column,
                      mean: Column => Column): Seq[Column] = Seq(
    distinct(col("customer_id")).as("daily_active_customers"),
    distinct(col("email_clean")).as("unique_email_addresses"),
    distinct(col("support_ticket_id")).as("support_tickets_created"),
    dblSum(col("transaction_amount")).as("total_daily_revenue"),
    mean(col("transaction_amount")).as("avg_transaction_value"),
    max(col("transaction_amount")).as("largest_transaction"),
    count_if(col("transaction_amount") > 0).as("total_transactions"),
    dblSum(when(col("channel") === "web", col("transaction_amount")).otherwise(0))
      .as("web_revenue"),
    dblSum(when(col("channel") === "mobile_app", col("transaction_amount")).otherwise(0))
      .as("mobile_revenue"),
    dblSum(when(col("channel") === "store", col("transaction_amount")).otherwise(0))
      .as("store_revenue"),
    mean(col("engagement_score")).as("avg_engagement_score"),
    mean(col("time_on_site_seconds")).as("avg_time_on_site"),
    count_if(col("customer_journey_stage") === "conversion").as("daily_conversions"),
    count_if(col("loyalty_member") === true).as("loyalty_member_interactions"),
    sum(col("points_earned")).as("total_points_earned"),
    sum(col("points_redeemed")).as("total_points_redeemed"),
    mean(col("satisfaction_score")).as("avg_satisfaction_score"),
    count_if(col("churn_risk_indicator") === "high_risk").as("high_churn_risk_customers"),
    dblSum(col("lifetime_value_estimate")).as("total_estimated_ltv"))

  private def build(silver: DataFrame, distinct: Column => Column,
                    dblSum: Column => Column = c => sum(c),
                    mean: Column => Column = c => avg(c)): DataFrame = {
    val aggs = allAggs(distinct, dblSum, mean)
    silver.groupBy(col("interaction_date")).agg(aggs.head, aggs.tail: _*)
  }

  def kpis(silver: DataFrame): DataFrame =
    build(silver, c => countDistinct(c))

  /** Cross-engine-deterministic variant of [[kpis]]: same aggregate list
    * (shared via `allAggs`), but every double sum goes through an exact
    * DECIMAL(18,6) cast (double summation order differs between engines
    * and runs; decimal sums are exact and order-free, and the
    * double->decimal cast rounds HALF_UP identically in Spark and DuckDB,
    * even on exact ties) and every avg is the explicit exact-sum / count
    * (decimal sums for double inputs, integer sums otherwise).
    * This is the form the correctness gate pins against its DuckDB oracle;
    * production callers keep [[kpis]] (plain double sums, no cast cost). */
  def kpisDet(silver: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def dec(c: Column): Column = c.cast(DecimalType(18, 6))
    def decSum(c: Column): Column = sum(dec(c)).cast(DoubleType)
    // one uniform exact average: the DECIMAL(18,6) sum is exact for double
    // inputs by rounding-identical casts and TRIVIALLY exact for int
    // inputs (int -> decimal is lossless, and the final double equals the
    // plain integer-sum double the oracle computes) — no per-column
    // type dispatch to silently get wrong
    def mean(c: Column): Column = decSum(c) / count(c)
    build(silver, c => countDistinct(c), decSum, mean)
  }

  /** 100 TB-scale variant: HLL sketches instead of exact distinct Expand.
    *
    * rsd defaults to Spark's 0.05 (HLL precision p=9, 48 buffer longs per
    * sketch). Tighter rsd grows the flat HLL buffer exponentially — 0.01
    * means p=17, ~12K longs per sketch, a ~37000-field aggregation row whose
    * generated code alone takes a minute to JIT. If a deployment needs <2%
    * error at scale, the right tool is [[kpisSketch]] — a mergeable sketch
    * aggregate with a byte-array buffer, not a tighter flat-buffer HLL. */
  def kpisApprox(silver: DataFrame, rsd: Double = 0.05): DataFrame =
    build(silver, c => approx_count_distinct(c, rsd))

  /** The sub-2%-error scale variant [[kpisApprox]]'s doc prescribes: the
    * distinct counts run through the KMV byte-array sketch
    * ([[graft.functions.KmvCountDistinct]] — ~1.1% rse at the default
    * k=8192, one 64 KB buffer per sketch instead of p=17 HLL's ~12K-long
    * flat aggregation row), with genuine partial aggregation: map tasks
    * reduce to one state before the exchange (ApproxAggSpec pins both the
    * error bound and the partial-merge plan shape). */
  def kpisSketch(silver: DataFrame, k: Int = 8192): DataFrame =
    build(silver, c => graft.functions.KmvCountDistinct.kmvCountDistinct(c, k))
}
