package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The in-bucket quadratic pair generation of LSH candidate mining as ONE
  * compiled call per bucket: input is a SORTED bucket array of signature
  * structs `(id, h1..hN)` plus the bucket's 0-based band index, output
  * the surviving candidate triples `(id_a, id_b, n_match)` for every
  * i < j member pair whose signatures agree on at least `minAgreement`
  * of the N hashes.
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
  * CROSS-BAND DEDUP INSIDE THE QUADRATIC (`banding` defined): a pair
  * sharing buckets in several bands used to be emitted once per band and
  * collapsed by a downstream `groupBy(id_a, id_b)` — a full exchange of
  * the survivor stream whose only job was dedup. With the banding known,
  * the quadratic itself can decide GLOBAL uniqueness locally: emit the
  * pair only from the FIRST band whose bucket keys collide (computed
  * from the signatures already in hand — for survivors only, so the raw
  * quadratic pays nothing). Band-key collision replicates the rendered
  * `concat_ws(":", band, h...)` string equality exactly — null hashes
  * are SKIPPED, so `(null, 7)` and `(7, null)` collide, matching what
  * the string keys did; hence the non-null subsequences are compared,
  * not the raw slots. Every emission is then globally unique and the
  * downstream groupBy disappears. With `banding = None` the old
  * emit-per-band behavior is kept (callers dedup themselves).
  *
  * Null semantics are otherwise IDENTICAL to the lambda formulation the
  * expression replaced: a null hash counts as agreeing with nothing in
  * `n_match`, and a null struct element is skipped. The null-aware scan
  * only runs when the materialization pass actually saw a null; the
  * common all-present bucket takes the original branch-free loop. Hash
  * fields must be LongType ([[MinHashSig]]'s output); the id field may
  * be any type — values are copied out of the (possibly buffer-backed)
  * input structs. */
case class BucketPairSurvivors(left: Expression, right: Expression,
                               minAgreement: Int,
                               banding: Option[(Int, Int)])
    extends BinaryExpression {

  private lazy val elemType: StructType = left.dataType
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
    (left.dataType, right.dataType) match {
      case (ArrayType(st: StructType, _), IntegerType)
        if st.length >= 2 && st.tail.forall(_.dataType == LongType) =>
        banding match {
          case Some((b, r)) if b * r != st.length - 1 =>
            TypeCheckResult.TypeCheckFailure(
              s"bucket_pair_survivors: banding $b x $r does not consume " +
                s"the ${st.length - 1}-hash signature")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (other, bandT) => TypeCheckResult.TypeCheckFailure(
        "bucket_pair_survivors needs (array<struct<id, h1..hN: bigint>>, " +
          s"int band), got (${other.sql}, ${bandT.sql})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  /** Quadratic scan; shared by eval and generated code. `band0` is the
    * 0-based band this bucket came from (ignored when `banding` is
    * None). */
  def compute(arr: ArrayData, band0: Int): ArrayData = {
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
    val (bands, rpb) = banding.getOrElse((0, 0))
    // first band whose rendered bucket keys collide for rows i and j
    // (all-present case: plain per-slot equality; null case: non-null
    // subsequence equality = concat_ws's skip-null string semantics)
    def firstBand(i: Int, j: Int): Int = {
      var b = 0
      while (b < bands) {
        var eq = true
        if (nulls == null) {
          var r = b * rpb
          val end = (b + 1) * rpb
          while (eq && r < end) {
            if (hs(i * nh + r) != hs(j * nh + r)) eq = false
            r += 1
          }
        } else {
          var ri = b * rpb
          var rj = b * rpb
          val end = (b + 1) * rpb
          while (eq && (ri < end || rj < end)) {
            while (ri < end && nulls(i * nh + ri)) ri += 1
            while (rj < end && nulls(j * nh + rj)) rj += 1
            if (ri < end && rj < end) {
              if (hs(i * nh + ri) != hs(j * nh + rj)) eq = false
              ri += 1; rj += 1
            } else if (ri < end || rj < end) eq = false // lengths differ
            else () // both exhausted: equal subsequences
          }
        }
        if (eq) return b
        b += 1
      }
      -1 // unreachable when called for a pair sharing this bucket
    }
    val dedup = banding.isDefined
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
          if (m >= minAgreement && (!dedup || firstBand(i, j) == band0))
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
          if (m >= minAgreement && (!dedup || firstBand(i, j) == band0))
            out += InternalRow(ids(i), ids(j), m.toLong)
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("bucketPairs", this,
        classOf[BucketPairSurvivors].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object BucketPairSurvivors {
  /** Emit-per-band form: callers collapse multi-band duplicates
    * themselves (a `groupBy(id_a, id_b)`). */
  def bucketPairs(bucket: Column, minAgreement: Int): Column =
    GraftShims.column(BucketPairSurvivors(GraftShims.expression(bucket),
      GraftShims.expression(org.apache.spark.sql.functions.lit(-1)),
      minAgreement, None))

  /** Globally-unique form: each surviving pair is emitted only from the
    * first band whose buckets collide — no downstream dedup needed.
    * `band` is the bucket's 0-based band index. */
  def bucketPairsFirstBand(bucket: Column, band: Column, minAgreement: Int,
                           bands: Int, rowsPerBand: Int): Column =
    GraftShims.column(BucketPairSurvivors(GraftShims.expression(bucket),
      GraftShims.expression(band), minAgreement, Some((bands, rowsPerBand))))
}
