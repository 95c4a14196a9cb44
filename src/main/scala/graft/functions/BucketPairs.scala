package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The in-bucket quadratic pair generation of LSH candidate mining as ONE
  * compiled call per bucket: input is a SORTED bucket array of signature
  * structs `(id, h1..hN)`, output the surviving candidate triples
  * `(id_a, id_b, n_match)` for every i < j member pair whose signatures
  * agree on at least `minAgreement` of the N hashes.
  *
  * Why an expression and not `transform`/`filter` lambdas: Spark's
  * higher-order functions are CodegenFallback — every element evaluates
  * through an interpreted lambda, so the quadratic stage (the mining
  * bottleneck: Σ bucket² raw pairs, ~10^6 locally and ~10^8 at the 10x
  * stress) paid interpretation per RAW pair. Here the whole bucket's
  * quadratic runs inside one JVM-compiled `compute` call — per-bucket
  * granularity amortizes the expression-eval overhead across the entire
  * loop (the [[SortedSetOverlap]] design, one level up).
  *
  * Semantics are IDENTICAL to the lambda formulation it replaces (same
  * i < j order off the pre-sorted bucket, same n_match count, same cut),
  * so oracles and downstream grouping are unchanged — INCLUDING nulls:
  * the old `when(a.h === b.h, 1)` never matched a null hash (null === x
  * and null === null are both non-true), so a null hash here counts as
  * agreeing with nothing, and a null struct element (whose pair rows all
  * had null n_match, failing the cut) is skipped. The null-aware scan
  * only runs when the materialization pass actually saw a null; the
  * common all-present bucket takes the original branch-free loop. Hash
  * fields must be LongType ([[MinHashSig]]'s output); the id field may
  * be any type — values are copied out of the (possibly buffer-backed)
  * input structs. */
case class BucketPairSurvivors(child: Expression, minAgreement: Int)
    extends UnaryExpression {

  private lazy val elemType: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idType: DataType = elemType.head.dataType
  private lazy val numHashes: Int = elemType.length - 1

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", idType), StructField("id_b", idType),
    StructField("n_match", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "bucket_pair_survivors"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(st: StructType, _)
        if st.length >= 2 && st.tail.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "bucket_pair_survivors needs array<struct<id, h1..hN: bigint>>, " +
          s"got ${other.sql}")
    }
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  /** Quadratic scan; shared by eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val nh = numHashes
    val idT = idType
    // materialize once: ids copied (buffer-backed values must not alias
    // the reused input page), hashes unpacked to a flat long matrix.
    // Null struct elements are dropped here (their pairs never survive
    // the cut — see scaladoc); null hash fields are flagged in a lazily
    // allocated mask so the all-present fast path stays branch-free.
    val ids = new Array[Any](n0)
    val hs = new Array[Long](n0 * nh)
    var nulls: Array[Boolean] = null // allocated on first null hash
    var n = 0
    var i0 = 0
    while (i0 < n0) {
      if (!arr.isNullAt(i0)) {
        val row = arr.getStruct(i0, nh + 1)
        ids(n) = InternalRow.copyValue(row.get(0, idT))
        var k = 0
        while (k < nh) {
          if (row.isNullAt(k + 1)) {
            if (nulls == null) nulls = new Array[Boolean](n0 * nh)
            nulls(n * nh + k) = true
          } else hs(n * nh + k) = row.getLong(k + 1)
          k += 1
        }
        n += 1
      }
      i0 += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    if (nulls == null) {
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var m = 0
          var k = 0
          while (k < nh) {
            if (hs(i * nh + k) == hs(j * nh + k)) m += 1
            k += 1
          }
          if (m >= minAgreement)
            out += InternalRow(ids(i), ids(j), m.toLong)
          j += 1
        }
        i += 1
      }
    } else {
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var m = 0
          var k = 0
          while (k < nh) {
            if (!nulls(i * nh + k) && !nulls(j * nh + k) &&
                hs(i * nh + k) == hs(j * nh + k)) m += 1
            k += 1
          }
          if (m >= minAgreement)
            out += InternalRow(ids(i), ids(j), m.toLong)
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bucketPairs", this,
        classOf[BucketPairSurvivors].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BucketPairSurvivors {
  def bucketPairs(bucket: Column, minAgreement: Int): Column =
    GraftShims.column(
      BucketPairSurvivors(GraftShims.expression(bucket), minAgreement))
}
