package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature: all `numHashes` affine-permutation minima over
  * the character `shingle`-gram md5 hashes of a string, in ONE pass, as a
  * single expression returning `array<long>`.
  *
  * The composable formulation — CharNGrams explode -> Md5Int60 ->
  * groupBy(id).agg(min x8) — amplifies every document into hundreds of
  * shingle ROWS that flow through a hash-aggregate (map-side partials plus
  * an exchange). At 100 TB that amplification is the minhash stage's whole
  * cost profile. This expression keeps the per-shingle md5 work but
  * eliminates the row amplification and the aggregate entirely: documents
  * in, signatures out, a pure narrow projection inside WholeStageCodegen
  * (`doGenCode` delegates the loop to a compiled method — no fallback path,
  * so surrounding expressions stay fused).
  *
  * Value-identical to the composable formulation and to the DuckDB oracle
  * chain (`conv(substr(md5(s),1,15),16,10) % P`, then `min((a_i*h+b_i) % P)`
  * per permutation): the hash derivation is byte-for-byte the
  * [[Md5Int60]] one. Returns NULL for strings shorter than `shingle`
  * (the explode formulation produces no rows for them — callers filter).
  */
case class MinHashSig(child: Expression, shingle: Int,
                      params: Seq[(Long, Long)], p: Long)
    extends UnaryExpression {

  require(shingle > 0, s"shingle size must be positive, got $shingle")
  require(params.nonEmpty, "at least one permutation required")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string child, got ${child.dataType.sql}")
  }

  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray

  /** One pass over the shingles; shared by eval and generated code. */
  def compute(input: UTF8String): ArrayData = {
    val len = input.numChars()
    if (len < shingle) return null
    val n = as.length
    val mins = Array.fill(n)(Long.MaxValue)
    val digest = MinHashSig.localDigest.get()
    var i = 0
    while (i <= len - shingle) {
      digest.reset()
      val d = digest.digest(input.substringSQL(i + 1, shingle).getBytes)
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      val h0 = (v >>> 4) % p
      var j = 0
      while (j < n) {
        val hv = (as(j) * h0 + bs(j)) % p
        if (hv < mins(j)) mins(j) = hv
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
      s"""
         |${ev.value} = $ref.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  // MessageDigest is stateful and expression instances can be shared across
  // local-mode threads; one digest per thread.
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column DSL wrapper: array<long> signature, NULL for short strings. */
  def minhashSig(c: Column, shingle: Int, params: Seq[(Long, Long)],
                 p: Long): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(c), shingle, params, p))
}
