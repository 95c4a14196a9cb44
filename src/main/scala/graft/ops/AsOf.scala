package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Per the extension preference order (compose built-ins before custom
  * plans), this is the union-tag + ordered-window composition: both sides
  * are unioned with a side tag, sorted within the key partition by
  * (event time, side), and `last(right_cols, ignoreNulls)` over the
  * running frame carries the most recent right-side row forward into each
  * left row. Exactly ONE shuffle on the join key and bounded per-key state —
  * the shape that scales to 100 TB (a sort-merge as-of), unlike the naive
  * inequality-join + aggregation which explodes to |L|x|R| per key.
  *
  * Semantics: for each left row, the right row with the greatest ts such
  * that ts_right <= ts_left (ties on ts broken toward the larger right
  * event_id, made deterministic by pre-deduplicating the right side to one
  * row per (key, ts)). Oracle: DuckDB's native ASOF JOIN.
  */
object AsOf {

  /** q11: for each purchase event, the most recent at-or-before
    * non-purchase event of the same user, plus the gap in seconds.
    * Thin binding of [[graft.api.Graft.asofJoin]] (the API dedupes right
    * rows per (key, ts) to the greatest (event_id, ...) tuple — the same
    * max-event_id tiebreak the oracle's row_number applies). */
  def q11AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.load(s, dir, "events")
    val right = events.filter($"event_type" =!= "purchase")
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
    val left = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        $"event_id".as("l_event_id"), $"value".as("l_value"))
    graft.api.Graft.asofJoin(left, right, "user_id", "ts",
        Seq("event_id", "event_type", "value", "ts"))
      .select(
        $"l_event_id".as("purchase_event_id"),
        $"user_id",
        $"l_value".as("purchase_value"),
        $"asof_event_id".as("prior_event_id"),
        $"asof_event_type".as("prior_type"),
        $"asof_value".as("prior_value"),
        (unix_timestamp($"ts") - unix_timestamp($"asof_ts")).as("gap_s"))
      .orderBy($"purchase_event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_asof_join" -> q11AsOfJoin)

  val oracles: Map[String, String] = Map(
    "q11_asof_join" ->
      """WITH r0 AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type <> 'purchase'),
        |r AS (SELECT user_id, ts, event_id, event_type, value FROM r0 WHERE rn = 1),
        |l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id AS purchase_event_id,
        | l.user_id,
        | l.value AS purchase_value,
        | r.event_id AS prior_event_id,
        | r.event_type AS prior_type,
        | r.value AS prior_value,
        | CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(r.ts)) AS BIGINT) AS gap_s
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY purchase_event_id""".stripMargin)
}
