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
  * so oracles and downstream grouping are unchanged. Hash fields must be
  * LongType ([[MinHashSig]]'s output); the id field may be any type —
  * values are copied out of the (possibly buffer-backed) input structs. */
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
    val n = arr.numElements()
    val nh = numHashes
    val idT = idType
    // materialize once: ids copied (buffer-backed values must not alias
    // the reused input page), hashes unpacked to a flat long matrix
    val ids = new Array[Any](n)
    val hs = new Array[Long](n * nh)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, nh + 1)
      ids(i) = InternalRow.copyValue(row.get(0, idT))
      var k = 0
      while (k < nh) { hs(i * nh + k) = row.getLong(k + 1); k += 1 }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
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
