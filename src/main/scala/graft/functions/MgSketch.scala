package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency-sketch state: at most `m` counters plus the
  * total number of (non-null) items seen. The classic decrement-all step
  * is amortized O(1): each decrement event removes `m + 1` count units,
  * and only `total` units ever enter, so there are at most `total / (m+1)`
  * events however adversarial the stream. */
final class MgState(val m: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var total: Long = 0L

  def add(key: String, by: Long): Unit = {
    total += by
    val cur = counts.get(key)
    if (cur != 0L) { counts.put(key, cur + by); () }
    else if (counts.size < m) { counts.put(key, by); () }
    else {
      // full and unseen: decrement everything by min(by, current minimum
      // survivor count) — the batched form of `by` repetitions of the
      // textbook decrement-all (identical final state, fewer passes).
      var left = by
      while (left > 0 && counts.size >= m) {
        var min = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
        val dec = math.min(left, min)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue - dec
          if (v <= 0L) it.remove() else e.setValue(v)
        }
        left -= dec
      }
      if (left > 0) { counts.put(key, left); () }
    }
  }

  /** Keep only the `m` largest counters, subtracting the (m+1)-th largest
    * value from every survivor — the mergeable-summaries trim (Agarwal,
    * Cormode et al., PODS 2012): the summed error stays <= total/(m+1). */
  def trim(): Unit = if (counts.size > m) {
    val vals = new Array[Long](counts.size)
    var i = 0
    val it0 = counts.values().iterator()
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cut = vals(vals.length - m - 1) // (m+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue - cut
      if (v <= 0L) it.remove() else e.setValue(v)
    }
  }
}

/** Mergeable Misra–Gries heavy-hitter sketch over a string column:
  * `m` counters bound the state however many rows stream through, and the
  * residual estimate undercounts any token by AT MOST `total / (m+1)` —
  * so every token with true frequency above `total / (m+1)` is guaranteed
  * present in the output, whatever the partitioning or merge order
  * (candidate SUPERSET guarantee; the estimates themselves are
  * order-dependent, which is why [[graft.api.Graft.heavyHitters]] always
  * re-counts candidates exactly before reporting).
  *
  * Returns `struct(total, candidates array<struct<token, est>>)` with
  * candidates sorted (est DESC, token ASC).
  *
  * Scale shape: plans as ObjectHashAggregate with a genuine partial
  * phase — each map task reduces its token stream to one <= m-entry state
  * before the exchange, so a global sketch over 100 TB of tokens shuffles
  * one small buffer per partition instead of the full token vocabulary
  * (the exact `groupBy(token).count` it replaces shuffles every distinct
  * token). Merging is pointwise-sum + trim (Agarwal et al., "Mergeable
  * Summaries"), associative within the error bound and guarantee-preserving
  * under any merge tree. */
case class MgFrequencySketch(
    child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] with UnaryLike[Expression] {

  require(m >= 2, s"mg_sketch: counters must be >= 2, got $m")

  override def createAggregationBuffer(): MgState = new MgState(m)

  override def update(b: MgState, row: InternalRow): MgState = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MgState, o: MgState): MgState = {
    b.total += o.total
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.counts.get(e.getKey)
      b.counts.put(e.getKey, cur + e.getValue)
    }
    b.trim()
    b
  }

  override def eval(b: MgState): Any = {
    val entries = new Array[(String, Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    val rows: Array[Any] = sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    }
    InternalRow(b.total, new GenericArrayData(rows))
  }

  override def serialize(b: MgState): Array[Byte] = {
    var sz = 4 + 8 + 4
    val it0 = b.counts.keySet().iterator()
    while (it0.hasNext) sz += 4 + it0.next().getBytes(UTF_8).length + 8
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(b.m).putLong(b.total).putInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(UTF_8)
      bb.putInt(kb.length).put(kb).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new MgState(bb.getInt)
    st.total = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      st.counts.put(new String(kb, UTF_8), bb.getLong)
      i += 1
    }
    st
  }

  override def dataType: DataType = MgFrequencySketch.outType
  override def nullable: Boolean = false
  override def prettyName: String = "mg_frequency_sketch"
  override def withNewMutableAggBufferOffset(o: Int): MgFrequencySketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgFrequencySketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MgFrequencySketch =
    copy(child = c)
}

object MgFrequencySketch {
  val outType: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("candidates", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** Column DSL entry: `mgSketch(col, m)` — NULLs excluded (they are
    * neither counted in `total` nor eligible as candidates). */
  def mgSketch(c: Column, m: Int): Column =
    GraftShims.column(
      MgFrequencySketch(GraftShims.expression(c), m).toAggregateExpression())
}
