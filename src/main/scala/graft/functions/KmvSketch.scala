package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.types._

/** The k smallest DISTINCT unsigned 64-bit hashes seen — the whole KMV
  * (k-minimum-values) distinct sketch. Bounded at k longs however many
  * rows stream through; merging two states is set-union re-bounded to k,
  * associative and commutative, so partial aggregation and any merge tree
  * give identical state. */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })
  def add(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      if (set.add(h)) { set.pollLast(); () }
    }
}

/** Mergeable approximate COUNT DISTINCT with a COMPACT byte-array buffer —
  * the scale tool `graft.medallion.Gold.kpisApprox`'s doc prescribes for
  * sub-2% distinct error: Spark's flat-buffer HLL at rsd 0.01 needs p=17,
  * a ~37000-field aggregation row whose generated code alone takes a
  * minute to JIT; a KMV sketch carries the SAME information in
  * one 64 KB byte buffer per group (relative standard error
  * ~1/sqrt(k-2) = 1.1% at the default k=8192), serialized only at
  * partial-aggregate boundaries.
  *
  * The estimator is classic KMV: with U = the k-th smallest of n > k
  * distinct hash values mapped into [0, 1), E[U] = k/(n+1), so
  * `(k-1)/U` is the (bias-corrected) distinct estimate; below k distinct
  * hashes the sketch is EXACT (it holds every hash). Hashing is
  * `xxhash64` (engine-deterministic, so results are reproducible run to
  * run and partition-order-independent — set semantics); NULLs are
  * excluded, matching `approx_count_distinct`.
  *
  * Scale shape: plans as ObjectHashAggregate with a genuine partial
  * phase — each map task reduces its rows to one k-long state BEFORE the
  * exchange, the shuffle carries one ~64 KB buffer per partition per
  * group, and the final phase merges states (pinned by PlanQualitySpec).
  */
case class KmvCountDistinct(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression] {

  require(k >= 16, s"kmv: k must be >= 16, got $k")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, row: InternalRow): KmvState = {
    val v = child.eval(row)
    if (v != null) b.add(KmvCountDistinct.fmix64(v.asInstanceOf[Long]))
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvState): Any = {
    val n = b.set.size
    if (n < k) n.toLong
    else {
      // map the k-th smallest unsigned hash to [0,1) from its top 53 bits
      // (exact as a double); estimate (k-1)/U, half-up to a long
      val u = (b.set.last >>> 11).toDouble * (1.0 / (1L << 53).toDouble)
      math.round((k - 1).toDouble / u)
    }
  }

  override def serialize(b: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val state = new KmvState(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { state.set.add(bb.getLong); i += 1 }
    state
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_count_distinct"
  override def withNewMutableAggBufferOffset(o: Int): KmvCountDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvCountDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvCountDistinct =
    copy(child = c)
}

object KmvCountDistinct {
  /** MurmurHash3's 64-bit finalizer on top of xxhash64: KMV reads its
    * estimate off ORDER STATISTICS of the hash values, which is far more
    * sensitive to residual input structure than bucket-assignment uses —
    * measured on sequential long ids, raw xxhash64 left a consistent
    * +1..2% bias that the extra avalanche removes. Deterministic, so
    * estimates stay reproducible. */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Column DSL entry: `kmvCountDistinct(col, k)` — NULLs excluded (the
    * `approx_count_distinct` contract); any input type goes through the
    * engine's deterministic xxhash64. */
  def kmvCountDistinct(c: Column, k: Int = 8192): Column = {
    val hashed = when(c.isNotNull, xxhash64(c))
    GraftShims.column(
      KmvCountDistinct(GraftShims.expression(hashed), k)
        .toAggregateExpression())
  }
}
