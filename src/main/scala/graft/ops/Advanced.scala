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
      .select(q15Moments($"l_returnflag"): _*)
      .orderBy($"l_returnflag")
  }

  /** q15 final projection. Every moment term is cast to Double BEFORE any
    * product: a Long*Long product (sx*sx, n*sxy, ...) silently wraps once
    * the sums pass ~3e9 (lineitem sf>=50) while the DuckDB oracle's HUGEINT
    * math would not. Identical double expressions evaluate bit-identically
    * in both engines at any scale. */
  private def q15Moments(key: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val (n, sx, sxx, sy, syy, sxy) =
      (d(col("n")), d(col("sx")), d(col("sxx")),
        d(col("sy")), d(col("syy")), d(col("sxy")))
    val variance = (sxx - sx * sx / n) / d(col("n") - 1)
    Seq(
      key, col("n"),
      variance.as("var_qty"),
      sqrt(variance).as("stddev_qty"),
      ((n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("corr_qty_disc"))
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

  /** q18: time-series resample with gap filling — hourly per-user buckets
    * densified over each user's own active span via sequence+explode and a
    * left join, missing buckets filled with zeros. The explode side is
    * generated (no shuffle); the join shuffles once on (user, bucket). */
  def q18ResampleGapfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .select($"user_id", (unix_timestamp($"ts") - unix_timestamp($"ts") % 3600).as("bucket_s"),
        $"value")
    val actual = e.groupBy($"user_id", $"bucket_s")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
    val spans = e.groupBy($"user_id")
      .agg(min($"bucket_s").as("b0"), max($"bucket_s").as("b1"))
    val dense = spans.select($"user_id",
      explode(sequence($"b0", $"b1", lit(3600L))).as("bucket_s"))
    dense.join(actual, Seq("user_id", "bucket_s"), "left")
      .select($"user_id", $"bucket_s",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"total_value", lit(0.0)).as("total_value"))
      .orderBy($"user_id", $"bucket_s")
  }

  /** q19: range-frame window — per event, the sum/count of the same user's
    * events in the trailing hour (RANGE, not ROWS: peers by time value). */
  def q19RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"sec")
      .rangeBetween(-3600L, Window.currentRow)
    Tables.load(s, dir, "events")
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"), $"value")
      .select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_last_hour"),
        sum(dec($"value")).over(w).cast(DoubleType).as("value_last_hour"))
      .orderBy($"event_id")
  }

  /** q35: the native session_window operator (the same operator Structured
    * Streaming session windows use), batch mode: per (user, session) counts.
    * Spark merges events strictly closer than the gap (new session when the
    * microsecond delta >= gap), so the oracle reproduces that boundary on
    * exact integer microseconds. */
  def q35SessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("session_value"))
      .select($"user_id",
        unix_timestamp($"session_window.start").as("session_start_s"),
        $"n_events", $"session_value")
      .orderBy($"user_id", $"session_start_s")
  }

  /** q36: array-function surface over tokenized text, rendered as strings
    * (engine-portable form of array results). */
  def q36ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = split(trim($"text"), "\\s+")
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id",
        size(t).cast(LongType).as("n"),
        element_at(t, 1).as("first_token"),
        element_at(t, -1).as("last_token"),
        concat_ws(",", slice(t, 1, 3)).as("first3"),
        array_contains(t, "spark").as("has_spark"),
        array_position(t, "data").cast(LongType).as("data_pos"),
        concat_ws(",", sort_array(array_distinct(slice(t, 1, 5)))).as("first5_sorted"),
        concat_ws(",", reverse(slice(t, 1, 3))).as("first3_rev"))
      .orderBy($"doc_id")
  }

  /** q37: second string-function family: initcap/translate/split_part/
    * position/left/right/ascii/chr. */
  def q37StringFuncs2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select(
        $"c_custkey",
        initcap(lower($"c_mktsegment")).as("seg_title"),
        translate($"c_name", "#0", "_x").as("name_translated"),
        substring_index($"c_name", "#", 1).as("name_head"),
        substring_index($"c_name", "#", -1).as("name_tail"),
        instr($"c_name", "#").cast(LongType).as("hash_pos"),
        expr("left(c_name, 4)").as("name_left"),
        expr("right(c_name, 4)").as("name_right"),
        ascii($"c_mktsegment").cast(LongType).as("seg_first_code"),
        chr(lit(65) + ($"c_custkey" % 26)).as("letter"))
      .orderBy($"c_custkey")
  }

  /** q38: math functions restricted to exactly-defined IEEE operations
    * (sqrt is correctly rounded; abs/sign/ceil/floor/pmod are exact) —
    * transcendentals (exp/ln) are deliberately excluded: their last-ulp
    * results differ between libm implementations and cannot hash-match. */
  def q38MathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        sqrt($"l_quantity").as("sqrt_qty"),
        abs($"l_discount" - 0.05).as("abs_disc_delta"),
        signum($"l_quantity" - 25).as("sign_qty"),
        ceil($"l_extendedprice" / 1000).cast(LongType).as("price_k_ceil"),
        floor($"l_extendedprice" / 1000).cast(LongType).as("price_k_floor"),
        pmod($"l_orderkey", lit(97L)).as("key_mod"),
        pow(lit(2.0), $"l_linenumber").as("pow2_line"),
        greatest($"l_tax", $"l_discount").as("max_rate"),
        least($"l_tax", $"l_discount").as("min_rate"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** q39: vector distance metrics over embeddings — dot, cosine, and L2 via
    * the dot identity sqrt(aa - 2ab + bb), every term a strict left fold so
    * both engines produce bit-identical doubles. */
  def q39VectorDistances(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dotF = graft.functions.VectorFunctions.dotF64 _
    def d(c: org.apache.spark.sql.Column) = transform(c, x => x.cast(DoubleType))
    val emb = Tables.load(s, dir, "embeddings")
      .select($"vec_id", d($"embedding").as("v"))
    val a = emb.where($"vec_id" < 5).toDF("id_a", "va")
    val b = emb.where($"vec_id" >= 5 && $"vec_id" < 50).toDF("id_b", "vb")
    val ab = dotF($"va", $"vb")
    val aa = dotF($"va", $"va")
    val bb = dotF($"vb", $"vb")
    a.crossJoin(b)
      .select($"id_a", $"id_b",
        ab.as("dot"),
        (ab / (sqrt(aa) * sqrt(bb))).as("cosine"),
        sqrt(aa - lit(2.0) * ab + bb).as("l2"))
      .orderBy($"id_a", $"id_b")
  }

  /** q40: regex family — extract, extract-all counts, rlike predicates. */
  def q40RegexFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id",
        regexp_extract($"text", "([a-z]+)", 1).as("first_word"),
        regexp_extract($"text", "(\\w+) (\\w+)", 2).as("second_word"),
        size(expr("regexp_extract_all(text, 'a[a-z]*', 0)")).cast(LongType)
          .as("n_a_words"),
        $"text".rlike("query").as("mentions_query"),
        $"text".rlike("^the ").as("starts_the"))
      .orderBy($"doc_id")
  }

  /** q41: conditional expression surface — if / nvl / nvl2 / ifnull and
    * nested searched CASE. */
  def q41Conditionals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val maybe = when($"value" > 100, $"value") // null when small
    Tables.load(s, dir, "events")
      .select(
        $"event_id",
        expr("if(value > 100, 'big', 'small')").as("size_label"),
        expr("nvl(if(value > 100, value, null), -1.0)").as("nvl_value"),
        expr("nvl2(if(value > 100, value, null), 'present', 'absent')").as("nvl2_label"),
        expr("ifnull(if(value > 100, value, null), 0.0)").as("ifnull_value"),
        when($"event_type" === "purchase",
          when($"value" > 100, "big_purchase").otherwise("small_purchase"))
          .otherwise("non_purchase").as("nested_case"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_regex_funcs" -> q40RegexFuncs,
    "q41_conditionals" -> q41Conditionals,
    "q38_math_funcs" -> q38MathFuncs,
    "q39_vector_distances" -> q39VectorDistances,
    "q35_session_window" -> q35SessionWindow,
    "q36_array_funcs" -> q36ArrayFuncs,
    "q37_string_funcs2" -> q37StringFuncs2,
    "q18_resample_gapfill" -> q18ResampleGapfill,
    "q19_range_frame" -> q19RangeFrame,
    "q13_json_funcs" -> q13JsonFuncs,
    "q14_percentiles" -> q14Percentiles,
    "q15_exact_moments" -> q15ExactMoments,
    "q16_collect_sorted" -> q16CollectSorted,
    "q17_pivot" -> q17Pivot)

  val oracles: Map[String, String] = Map(
    "q40_regex_funcs" ->
      """SELECT doc_id,
        | regexp_extract(text, '([a-z]+)', 1) AS first_word,
        | regexp_extract(text, '(\w+) (\w+)', 2) AS second_word,
        | CAST(len(regexp_extract_all(text, 'a[a-z]*', 0)) AS BIGINT) AS n_a_words,
        | regexp_matches(text, 'query') AS mentions_query,
        | regexp_matches(text, '^the ') AS starts_the
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_conditionals" ->
      """SELECT event_id,
        | CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS size_label,
        | coalesce(CASE WHEN value > 100 THEN value END, -1.0) AS nvl_value,
        | CASE WHEN (CASE WHEN value > 100 THEN value END) IS NOT NULL
        |      THEN 'present' ELSE 'absent' END AS nvl2_label,
        | ifnull(CASE WHEN value > 100 THEN value END, 0.0) AS ifnull_value,
        | CASE WHEN event_type = 'purchase' THEN
        |   CASE WHEN value > 100 THEN 'big_purchase' ELSE 'small_purchase' END
        | ELSE 'non_purchase' END AS nested_case
        |FROM events ORDER BY event_id""".stripMargin,
    "q38_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | sqrt(l_quantity) AS sqrt_qty,
        | abs(l_discount - 0.05) AS abs_disc_delta,
        | CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_qty,
        | CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        | CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        | l_orderkey % 97 AS key_mod,
        | pow(2.0, l_linenumber) AS pow2_line,
        | greatest(l_tax, l_discount) AS max_rate,
        | least(l_tax, l_discount) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q39_vector_distances" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id AS id_a, v AS va FROM e WHERE vec_id < 5),
        |b AS (SELECT vec_id AS id_b, v AS vb FROM e WHERE vec_id >= 5 AND vec_id < 50)
        |SELECT id_a, id_b,
        | list_dot_product(va, vb) AS dot,
        | list_dot_product(va, vb)
        |   / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) AS cosine,
        | sqrt(list_dot_product(va, va) - 2.0 * list_dot_product(va, vb)
        |   + list_dot_product(vb, vb)) AS l2
        |FROM a, b ORDER BY id_a, id_b""".stripMargin,
    "q35_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS us,
        |   epoch_ns(ts) // 1000
        |     - lag(epoch_ns(ts) // 1000, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, value, us,
        |   CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        |  FROM e)
        |SELECT user_id,
        | CAST(min(us) // 1000000 AS BIGINT) AS session_start_s,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_s""".stripMargin,
    "q36_array_funcs" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
        |SELECT doc_id,
        | len(t) AS n,
        | t[1] AS first_token,
        | t[-1] AS last_token,
        | array_to_string(t[1:3], ',') AS first3,
        | list_contains(t, 'spark') AS has_spark,
        | CAST(coalesce(list_position(t, 'data'), 0) AS BIGINT) AS data_pos,
        | array_to_string(list_sort(list_distinct(t[1:5])), ',') AS first5_sorted,
        | array_to_string(list_reverse(t[1:3]), ',') AS first3_rev
        |FROM d ORDER BY doc_id""".stripMargin,
    "q37_string_funcs2" ->
      """SELECT c_custkey,
        | concat(upper(substr(lower(c_mktsegment), 1, 1)), substr(lower(c_mktsegment), 2)) AS seg_title,
        | translate(c_name, '#0', '_x') AS name_translated,
        | split_part(c_name, '#', 1) AS name_head,
        | split_part(c_name, '#', -1) AS name_tail,
        | CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        | left(c_name, 4) AS name_left,
        | right(c_name, 4) AS name_right,
        | CAST(ascii(c_mktsegment) AS BIGINT) AS seg_first_code,
        | chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS letter
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q18_resample_gapfill" ->
      """WITH e AS (
        |  SELECT user_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS bucket_s,
        |   value
        |  FROM events),
        |actual AS (
        |  SELECT user_id, bucket_s, count(*) AS n_events,
        |   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |  FROM e GROUP BY user_id, bucket_s),
        |spans AS (SELECT user_id, min(bucket_s) AS b0, max(bucket_s) AS b1 FROM e GROUP BY user_id),
        |dense AS (
        |  SELECT user_id, unnest(generate_series(b0, b1, 3600)) AS bucket_s FROM spans)
        |SELECT dense.user_id, dense.bucket_s,
        | coalesce(actual.n_events, 0) AS n_events,
        | coalesce(actual.total_value, 0.0) AS total_value
        |FROM dense LEFT JOIN actual USING (user_id, bucket_s)
        |ORDER BY user_id, bucket_s""".stripMargin,
    "q19_range_frame" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |  FROM events)
        |SELECT user_id, event_id,
        | count(*) OVER w AS n_last_hour,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_last_hour
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
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
        | (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |   / CAST(n - 1 AS DOUBLE) AS var_qty,
        | sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |   / CAST(n - 1 AS DOUBLE)) AS stddev_qty,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_disc
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
