package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator surface: hash aggregate, broadcast + shuffle joins,
  * window functions, set operations, semi/anti joins, rollup, sessionization.
  *
  * Mirrors the reference's aggregation surface (gold job,
  * k8s/spark/41-spark-job-scripts-configmap.yaml:382-403) and extends it with
  * the join/window/set-op operators a complete engine needs (SURVEY.md §2.5).
  *
  * Scale notes (100 TB posture):
  *  - dimension joins broadcast explicitly (region/nation/customer are tiny
  *    relative to fact tables; no shuffle of the fact side);
  *  - fact-fact joins shuffle on the join key and rely on AQE for skew;
  *  - aggregates are partial (map-side combine) by construction — all are
  *    built-in declarative aggregates;
  *  - window queries partition by a high-cardinality key (user_id, custkey)
  *    so state per partition stays bounded.
  */
object Relational {
  import Det._

  /** TPC-H Q1-shaped pricing summary: wide hash aggregate with map-side
    * partial aggregation; one shuffle on the (returnflag, linestatus) key. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast(LongType).as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (oneDec - dec($"l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        moneyAvg($"l_extendedprice").as("avg_price"),
        max($"l_extendedprice").as("max_price"),
        min($"l_extendedprice").as("min_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Filter + projection; predicate and column pruning push to parquet. */
  def q02FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate".between("1996-01-01", "1996-12-31") &&
        $"l_quantity" < 10 && $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Star-schema rollup: orders joined to broadcast dimensions
    * (customer -> nation -> region), revenue per (region, nation). */
  def q03DimJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("revenue"))
      .orderBy($"r_name", $"n_name")
  }

  /** Fact-fact shuffle join lineitem x orders, revenue by order priority.
    * At scale: both sides shuffle on orderkey; AQE coalesces/splits skew. */
  def q04FactJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(
        sum(dec($"l_extendedprice") * (oneDec - dec($"l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Window top-N: top-3 orders per customer by totalprice (deterministic
    * tiebreak on orderkey). One shuffle on custkey, bounded state. */
  def q05WindowTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.load(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  /** Running / lag window over an event stream per user: running decimal sum
    * (exact), previous-event value, event index. */
  def q06WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(
        $"user_id", $"event_id",
        row_number().over(w).cast(LongType).as("seq"),
        sum(dec($"value")).over(wRun).cast(DoubleType).as("running_value"),
        lag($"value", 1).over(w).as("prev_value"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"user_id", $"seq")
  }

  /** Set operations: UNION/INTERSECT/EXCEPT (distinct semantics) between
    * high-balance customers and customers with finished orders. */
  def q07SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rich = Tables.load(s, dir, "customer")
      .filter($"c_acctbal" > 5000).select($"c_custkey".as("k"))
    val fin = Tables.load(s, dir, "orders")
      .filter($"o_orderstatus" === "F").select($"o_custkey".as("k")).distinct()
    rich.intersect(fin).withColumn("op", lit("both"))
      .union(rich.except(fin).withColumn("op", lit("rich_only")))
      .union(fin.except(rich).withColumn("op", lit("fin_only")))
      .orderBy($"op", $"k")
  }

  /** Left-semi (EXISTS) and left-anti (NOT EXISTS) joins: customers with and
    * without urgent orders. Semi/anti avoid materializing the right side. */
  def q08SemiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val urgent = Tables.load(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    val withU = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select($"c_custkey", lit(true).as("has_urgent"))
    val noU = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select($"c_custkey", lit(false).as("has_urgent"))
    withU.union(noU).orderBy($"c_custkey")
  }

  /** ROLLUP grouping-sets aggregate over region/nation with explicit
    * null-ordering (Spark and ANSI SQL agree on rollup null indicators). */
  def q09Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), moneySum($"c_acctbal").as("total_balance"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Gap-based sessionization (30-min inactivity) over events per user:
    * classic streaming-adjacent batch op — lag + running sum session ids.
    * Single shuffle on user_id; at 100 TB this is the standard scalable
    * sessionization shape (state bounded per user partition). */
  def q10Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sec = unix_timestamp($"ts")
    graft.api.Graft.sessionize(Tables.load(s, dir, "events"),
        $"user_id", $"ts", $"event_id", gapSeconds = 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max(sec) - min(sec)).as("duration_s"),
        moneySum($"value").as("session_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** q12: the q04 join with explicit key salting — the manual skew
    * mitigation for when one join key dominates (AQE skew-join's static
    * cousin): the fact side gets a deterministic salt from its own key,
    * the build side is replicated across all salts, and the join runs on
    * (key, salt) so a hot key spreads over the salt reducers. Thin binding
    * of [[graft.api.Graft.saltedJoin]]; must produce exactly q04's results
    * — same oracle. */
  def q12SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    graft.api.Graft.saltedJoin(li, o,
        li("l_orderkey"), o("o_orderkey"), li("l_linenumber"), salts = 8)
      .groupBy($"o_orderpriority")
      .agg(
        sum(dec($"l_extendedprice") * (oneDec - dec($"l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_salted_join" -> q12SaltedJoin,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_pushdown" -> q02FilterPushdown,
    "q03_dim_join" -> q03DimJoin,
    "q04_fact_join" -> q04FactJoin,
    "q05_window_topn" -> q05WindowTopN,
    "q06_window_running" -> q06WindowRunning,
    "q07_setops" -> q07SetOps,
    "q08_semi_anti" -> q08SemiAnti,
    "q09_rollup" -> q09Rollup,
    "q10_sessionize" -> q10Sessionize)

  val oracles: Map[String, String] = Map(
    // identical semantics to q04 — salting must not change results
    "q12_salted_join" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        | sum(l_quantity) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        | max(l_extendedprice) AS max_price,
        | min(l_extendedprice) AS min_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_quantity < 10 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_dim_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q04_fact_join" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_window_topn" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q06_window_running" ->
      """SELECT user_id, event_id,
        | row_number() OVER w AS seq,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, seq""".stripMargin,
    "q07_setops" ->
      """WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        | fin AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        |SELECT k, 'both' AS op FROM (SELECT k FROM rich INTERSECT SELECT k FROM fin)
        |UNION ALL
        |SELECT k, 'rich_only' AS op FROM (SELECT k FROM rich EXCEPT SELECT k FROM fin)
        |UNION ALL
        |SELECT k, 'fin_only' AS op FROM (SELECT k FROM fin EXCEPT SELECT k FROM rich)
        |ORDER BY op, k""".stripMargin,
    "q08_semi_anti" ->
      """SELECT c_custkey, EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q09_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q10_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |    - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap,
        |  ts
        | FROM events),
        |s AS (
        | SELECT user_id, event_id, value, sec,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM e)
        |SELECT user_id, session_id, count(*) AS n_events,
        | max(sec) - min(sec) AS duration_s,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
}
