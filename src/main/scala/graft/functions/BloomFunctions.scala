package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column DSL over Spark's own bloom-filter expressions.
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for the
  * runtime row-level filters its optimizer injects into large shuffle joins,
  * but does not register either publicly (resolving `bloom_filter_agg` in
  * SQL fails with UNRESOLVED_ROUTINE). These wrappers expose the exact same
  * machinery — the spark-sketch `BloomFilterImpl`, with its partial
  * aggregation and bitwise-OR merge — through the Column API, so library
  * operators can build the "sketch-prefilter, then exact-verify" shape
  * explicitly instead of hoping the optimizer injects it.
  *
  * Contract notes:
  *  - the aggregate's child and might_contain's probe value must be LONG
  *    (pair them with `xxhash64(col)` on both sides);
  *  - `BloomFilterMightContain` requires its filter side foldable, so the
  *    built filter is embedded as a binary literal — the collected artifact
  *    is the SKETCH (numBits/8 bytes, bounded by construction), never the
  *    data, the same driver-size posture as a broadcast hash join;
  *  - bloom construction is order-independent (inserts OR bits), so the
  *    serialized filter is deterministic for a given key set regardless of
  *    partitioning — and membership has NO false negatives, which is what
  *    makes an exact verify join downstream restore exact semantics.
  */
object BloomFunctions {

  /** `bloom_filter_agg(key, estimatedItems, numBits)` as a Column; `key`
    * must be LongType (use `xxhash64`). Returns NULL on an empty group. */
  def bloomAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    GraftShims.column(
      new BloomFilterAggregate(GraftShims.expression(key),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(bloom, key)` as a Column; `bloom` must be foldable
    * (a binary literal of a serialized filter) and `key` LongType. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftShims.column(
      BloomFilterMightContain(GraftShims.expression(bloom),
        GraftShims.expression(key)))
}
