package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-entry and remaining relational surface: correlated subqueries through
  * `spark.sql` (parser -> decorrelation -> join rewrite), the full ranking
  * window-function family, unpivot/melt, and bag-semantics set operations.
  */
object SqlSurface {
  import Det._

  /** q30: correlated scalar subquery via the SQL entry path — Catalyst
    * decorrelates it into an aggregate + join; results must match DuckDB
    * running the *same text*. */
  def q30ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_nationkey,
        | CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |           / count(*) * 1.5
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q31: ranking window family — rank/dense_rank/ntile/percent_rank/
    * cume_dist with a deterministic total order (tiebreak on orderkey). */
  def q31RankFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        rank().over(w).cast(LongType).as("rnk"),
        dense_rank().over(w).cast(LongType).as("drnk"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** q32: unpivot/melt — the channel-revenue columns of a gold-style frame
    * melted back to (date, channel, revenue) rows. */
  def q32Unpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Tables.load(s, dir, "events")
      .groupBy($"ts".cast(DateType).as("event_date"))
      .agg(
        sum(when($"event_type" === "click", dec($"value"))).cast(DoubleType).as("click"),
        sum(when($"event_type" === "purchase", dec($"value"))).cast(DoubleType).as("purchase"),
        sum(when($"event_type" === "view", dec($"value"))).cast(DoubleType).as("view"))
    // Dataset.unpivot KEEPS null-valued rows (unlike SQL UNPIVOT's default
    // EXCLUDE NULLS); filter to match the oracle's NOT NULL semantics —
    // otherwise a date missing one event type diverges at the gate.
    wide.unpivot(Array($"event_date"), Array($"click", $"purchase", $"view"),
      "etype", "total_value")
      .where($"total_value".isNotNull)
      .orderBy($"event_date", $"etype")
  }

  /** q33: bag-semantics set ops — INTERSECT ALL / EXCEPT ALL on the
    * multiset of (custkey, orderstatus) pairs split by order priority. */
  def q33SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val urgent = o.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_custkey".as("k"), $"o_orderstatus".as("st"))
    val rest = o.filter(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_custkey".as("k"), $"o_orderstatus".as("st"))
    urgent.intersectAll(rest).withColumn("op", lit("in_both_bag"))
      .union(urgent.exceptAll(rest).withColumn("op", lit("urgent_only_bag")))
      .groupBy($"op", $"st")
      .agg(count(lit(1)).as("n"), countDistinct($"k").as("n_keys"))
      .orderBy($"op", $"st")
  }

  /** q34: interval (range) join — follow-up orders within 30 days: equi on
    * custkey plus a non-equi date-range condition. Planned as a sort-merge
    * join on the equi key with the range predicate applied inside the
    * merge — the scalable shape (never a cartesian). */
  def q34IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val a = o.select($"o_custkey".as("k"), $"o_orderkey".as("first_order"),
      $"o_orderdate".cast(DateType).as("d0"))
    val b = o.select($"o_custkey".as("k"), $"o_orderkey".as("next_order"),
      $"o_orderdate".cast(DateType).as("d1"))
    a.join(b, Seq("k"))
      .where($"next_order" =!= $"first_order" &&
        $"d1" >= $"d0" && $"d1" < date_add($"d0", 30))
      .groupBy($"k", $"first_order")
      .agg(count(lit(1)).as("n_followups"),
        min($"next_order").as("first_followup"))
      .orderBy($"k", $"first_order")
  }

  /** q27: EXISTS / NOT EXISTS chain (the TPC-H Q4/Q21 shape): per nation,
    * the customers that placed at least one order but never an urgent one.
    * Catalyst decorrelates the EXISTS into a left-semi join and the NOT
    * EXISTS into a left-anti join — both shuffle on the correlation key
    * (never a per-row subquery re-execution), the only shape that survives
    * a 100 TB orders side; the same text runs in DuckDB. */
  def q27ExistsChain(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q27Sql)
  }

  private val q27Sql =
    """SELECT c_nationkey, count(*) AS n_cust
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
      |                  AND o2.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q28: scalar subqueries in HAVING — customers with more orders than the
    * global mean orders-per-customer. Both subqueries are uncorrelated
    * single-row aggregates: Catalyst plans each as an independent subquery
    * stage whose scalar folds into the post-aggregation filter (computed
    * once, not per group). Integral `/` is double division in both
    * engines, so the same text is the oracle. */
  def q28HavingSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q28Sql)
  }

  private val q28Sql =
    """SELECT o_custkey, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) > (SELECT count(*) FROM orders)
      |                   / (SELECT count(DISTINCT o_custkey) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  /** q29: uncorrelated IN-subquery, two levels deep — suppliers in nations
    * of the ASIA/EUROPE regions. Each IN rewrites to a left-semi join
    * against a tiny distinct key set that Spark broadcasts (region and
    * nation are classic broadcast dims), so the supplier side never
    * shuffles. Money sum goes through the DECIMAL(12,2) discipline. */
  def q29InSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "supplier").createOrReplaceTempView("supplier")
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
    Tables.load(s, dir, "region").createOrReplaceTempView("region")
    s.sql(q29Sql)
  }

  private val q29Sql =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      | CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM supplier
      |WHERE s_nationkey IN (
      |  SELECT n_nationkey FROM nation
      |  WHERE n_regionkey IN (
      |    SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE')))
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** q52: recursive CTE (Spark 4's WITH RECURSIVE) — a hierarchy walk over
    * a binary tree derived from the nation keys (parent = key div 2): each
    * node reports its depth and the path length back to the root. The
    * iterative-closure operator family (what d06's connected components do
    * programmatically) expressed declaratively through the SQL entry;
    * recursion depth is log2(|nation|), each step a self-join the optimizer
    * plans like any other. */
  def q52RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        |  FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT CAST(n.n_nationkey AS BIGINT), t.depth + CAST(1 AS BIGINT)
        |  FROM nation n JOIN tree t ON (n.n_nationkey div 2) = t.node
        |  WHERE n.n_nationkey > 0)
        |SELECT node, depth FROM tree ORDER BY node""".stripMargin)
  }

  /** q56: LATERAL correlated subquery — per-customer top-2 orders through
    * the SQL entry (`FROM customer, LATERAL (...)`), the per-row-subplan
    * surface DuckDB runs with the same text. Catalyst rewrites the
    * correlated lateral into a join (DomainJoin decorrelation), so at
    * scale this plans as a window/join, never a per-row re-execution. */
  def q56Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q56Sql)
  }

  private val q56Sql =
    """SELECT c_custkey, o_orderkey,
      | CAST(o_totalprice AS DOUBLE) AS o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2) t
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** q57: GROUP BY ALL / ORDER BY ALL — the modern SQL shorthand (every
    * non-aggregate output column groups; every output column orders) that
    * Spark 4 and DuckDB both parse, exercised with the same text in both
    * engines. */
  def q57GroupByAll(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(q57Sql)
  }

  private val q57Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(count(*) AS BIGINT) AS n_lines,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_group_by_all" -> q57GroupByAll,
    "q56_lateral_join" -> q56Lateral,
    "q27_exists_chain" -> q27ExistsChain,
    "q28_having_subquery" -> q28HavingSubquery,
    "q29_in_subquery" -> q29InSubquery,
    "q34_interval_join" -> q34IntervalJoin,
    "q30_scalar_subquery" -> q30ScalarSubquery,
    "q31_rank_funcs" -> q31RankFuncs,
    "q32_unpivot" -> q32Unpivot,
    "q33_setops_all" -> q33SetOpsAll,
    "q52_recursive_cte" -> q52RecursiveCte)

  val oracles: Map[String, String] = Map(
    "q56_lateral_join" -> q56Sql,
    "q57_group_by_all" -> q57Sql,
    "q27_exists_chain" -> q27Sql,
    "q28_having_subquery" -> q28Sql,
    "q29_in_subquery" -> q29Sql,
    "q52_recursive_cte" ->
      """WITH RECURSIVE tree AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        |  FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT CAST(n.n_nationkey AS BIGINT), t.depth + 1
        |  FROM nation n JOIN tree t ON (n.n_nationkey // 2) = t.node
        |  WHERE n.n_nationkey > 0)
        |SELECT node, depth FROM tree ORDER BY node""".stripMargin,
    "q34_interval_join" ->
      """WITH o AS (SELECT o_custkey AS k, o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT a.k, a.o_orderkey AS first_order,
        | count(*) AS n_followups,
        | min(b.o_orderkey) AS first_followup
        |FROM o a JOIN o b ON a.k = b.k AND b.o_orderkey <> a.o_orderkey
        |  AND b.d >= a.d AND b.d < a.d + 30
        |GROUP BY a.k, a.o_orderkey ORDER BY a.k, a.o_orderkey""".stripMargin,
    "q30_scalar_subquery" ->
      """SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |           / count(*) * 1.5
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "q31_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | percent_rank() OVER w AS prnk,
        | cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q32_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(ts AS DATE) AS event_date,
        |   CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
        |   CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view
        |  FROM events GROUP BY 1)
        |SELECT event_date, etype, total_value FROM (
        |  SELECT event_date, 'click' AS etype, click AS total_value FROM wide
        |  UNION ALL SELECT event_date, 'purchase', purchase FROM wide
        |  UNION ALL SELECT event_date, 'view', view FROM wide)
        |WHERE total_value IS NOT NULL
        |ORDER BY event_date, etype""".stripMargin,
    "q33_setops_all" ->
      """WITH urgent AS (
        |  SELECT o_custkey AS k, o_orderstatus AS st FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |rest AS (
        |  SELECT o_custkey AS k, o_orderstatus AS st FROM orders
        |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')),
        |tagged AS (
        |  SELECT k, st, 'in_both_bag' AS op FROM (SELECT k, st FROM urgent INTERSECT ALL SELECT k, st FROM rest)
        |  UNION ALL
        |  SELECT k, st, 'urgent_only_bag' AS op FROM (SELECT k, st FROM urgent EXCEPT ALL SELECT k, st FROM rest))
        |SELECT op, st, count(*) AS n, count(DISTINCT k) AS n_keys
        |FROM tagged GROUP BY op, st ORDER BY op, st""".stripMargin)
}
