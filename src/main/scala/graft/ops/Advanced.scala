package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Advanced scalar/aggregate surface: JSON extraction, exact percentiles,
  * moment statistics, ordered collect aggregates, pivot.
  *
  * Statistical aggregates (variance/stddev/correlation) are NOT computed
  * with the built-ins here: their streaming accumulations are float-order
  * dependent, which breaks cross-engine hash verification. Instead the
  * moments are assembled from exact integer/decimal sums (deterministic in
  * any engine) with the final couple of double ops shared with the oracle.
  * Percentiles are exercised on integer-valued columns with dyadic
  * percentile fractions, where both engines' interpolation formulas are
  * exact.
  */
object Advanced {
  import Det._

  /** q13: JSON scalar functions over the events props column. */
  def q13JsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast(LongType).as("k_val"),
        length($"props").cast(LongType).as("props_len"),
        get_json_object($"props", "$.missing").as("missing_val"),
        ($"props".contains("\"k\"")).as("has_k"))
      .orderBy($"event_id")
  }

  /** q14: exact percentiles/median per group on an integer-valued column. */
  def q14Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.75)").as("p75_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }

  /** q15: variance / stddev / correlation from exact sums (see class doc). */
  def q15ExactMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"l_quantity".cast(LongType) // integer-valued
    val y = (dec($"l_discount") * 100).cast(LongType) // discount in "cents"
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(
        $"l_returnflag", $"n",
        (($"sxx" - $"sx" * $"sx" / $"n".cast(DoubleType)) / ($"n" - 1)).as("var_qty"),
        sqrt(($"sxx" - $"sx" * $"sx" / $"n".cast(DoubleType)) / ($"n" - 1)).as("stddev_qty"),
        (($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType) *
            ($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType))).as("corr_qty_disc"))
      .orderBy($"l_returnflag")
  }

  /** q16: ordered collect aggregates rendered as strings (deterministic,
    * engine-portable form of collect_set/collect_list). */
  def q16CollectSorted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        concat_ws(",", sort_array(collect_set($"o_orderstatus"))).as("statuses"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"o_orderpriority")
  }

  /** q17: pivot — daily event counts spread across event_type columns
    * (explicit value list so the plan needs no extra distinct pass). */
  def q17Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.load(s, dir, "events")
      .groupBy($"ts".cast(DateType).as("event_date"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    pivoted.select($"event_date" +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy($"event_date")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_json_funcs" -> q13JsonFuncs,
    "q14_percentiles" -> q14Percentiles,
    "q15_exact_moments" -> q15ExactMoments,
    "q16_collect_sorted" -> q16CollectSorted,
    "q17_pivot" -> q17Pivot)

  val oracles: Map[String, String] = Map(
    "q13_json_funcs" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        | length(props) AS props_len,
        | json_extract_string(props, '$.missing') AS missing_val,
        | contains(props, '"k"') AS has_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q14_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS p25_qty,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.75) AS p75_qty,
        | min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_exact_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |   sum(CAST(l_quantity AS BIGINT)) AS sx,
        |   sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |   sum(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sy,
        |   sum(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS syy,
        |   sum(CAST(l_quantity AS BIGINT) * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | (sxx - sx * sx / CAST(n AS DOUBLE)) / (n - 1) AS var_qty,
        | sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (n - 1)) AS stddev_qty,
        | CAST(n * sxy - sx * sy AS DOUBLE)
        |   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_disc
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q16_collect_sorted" ->
      """SELECT o_orderpriority,
        | array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        | count(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q17_pivot" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
