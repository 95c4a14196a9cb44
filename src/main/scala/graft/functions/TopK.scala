package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate flowing into the top-k aggregator. */
final case class Scored(score: Double, id: Long)

/** Typed top-k aggregator: keeps the k best (score desc, id asc) candidates
  * per group.
  *
  * This is the scale-correct reduction for ANN top-k: with
  * `groupBy(query).agg(topK)` Spark runs it as a partial aggregate — every
  * partition reduces its candidates to k rows *before* the exchange, so the
  * shuffle carries O(groups x k) rows instead of every scored pair. The
  * window row_number formulation (s01) must shuffle and sort ALL candidate
  * scores per query; at a 100 TB corpus that is the difference between a
  * bounded merge and an unbounded sort.
  *
  * Buffers stay tiny (k elements, insertion into a sorted vector), so the
  * serialized buffer cost per partial is negligible.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  private def trim(sorted: Seq[Scored]): Seq[Scored] =
    if (sorted.lengthCompare(k) > 0) sorted.take(k) else sorted

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
    // fast reject: full buffer and the candidate is worse than the floor
    if (buf.lengthCompare(k) >= 0 && ord.gteq(in, buf.last)) buf
    else trim((buf :+ in).sorted(ord))
  }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    trim((a ++ b).sorted(ord))

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
