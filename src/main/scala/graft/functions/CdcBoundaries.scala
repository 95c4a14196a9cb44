package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions in ONE O(n) pass — the
  * native rolling-hash core of [[graft.api.Graft.cdcChunks]].
  *
  * Returns the 1-based character positions i in [window, n] where the
  * polynomial hash of the window ENDING at i (base [[graft.api.Graft.CdcB]]
  * mod the Mersenne prime [[graft.api.Graft.CdcM]], over Unicode
  * code points) is ≡ 0 mod `divisor` — bit-identical to the literal-power
  * sum `Σ code(c_{i-w+1+j})·B^{w-1-j} mod M` the DuckDB oracle evaluates
  * per position, but maintained incrementally:
  * `h ← (h·B + c_in − c_out·B^w) mod M`, O(1) per character.
  *
  * Why an expression and not `filter(sequence(...), hash-lambda)`: Spark
  * higher-order functions evaluate INTERPRETED, and any array the lambda
  * references risks being inlined and rebuilt per invocation — the
  * declarative form of this operator cost O(window·n) interpreted evals
  * per document at best and O(window·n²) when CollapseProject inlined the
  * code-point array (measured: a bench sweep stuck for 33 minutes in
  * Ascii.nullSafeEval). One compiled loop per document is the shape a
  * 100 TB chunking pass needs; the codegen path calls this same compute
  * method directly inside whole-stage codegen.
  *
  * Character codes are Unicode code points — equal to both engines'
  * `ascii()` on ASCII text and to DuckDB's on all text. All intermediate
  * values stay below 2^52, so long arithmetic is exact.
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")
  require(divisor >= 1, s"divisor must be >= 1, got $divisor")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries needs a string child, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** One pass over the code points; shared by eval and generated code. */
  def compute(input: UTF8String): ArrayData = {
    val M = graft.api.Graft.CdcM
    val B = graft.api.Graft.CdcB
    // B^window mod M for the outgoing-character term
    var bw = 1L
    var k = 0
    while (k < window) { bw = bw * B % M; k += 1 }
    val s = input.toString
    val ring = new Array[Int](window) // last `window` code points
    var h = 0L
    var out = new Array[Int](8)
    var nOut = 0
    var pos = 0 // 1-based character position of the code point read last
    var i = 0 // UTF-16 index into s
    while (i < s.length) {
      val c = s.codePointAt(i)
      i += Character.charCount(c)
      pos += 1
      val slot = (pos - 1) % window
      if (pos <= window) h = (h * B + c) % M
      else {
        val v = h * B + c - ring(slot) * bw // |v| < 2^52: exact in a long
        h = ((v % M) + M) % M
      }
      ring(slot) = c
      if (pos >= window && h % divisor == 0) {
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
        out(nOut) = pos
        nOut += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  // direct compiled-method call inside whole-stage codegen (a
  // CodegenFallback would route through a boxed row-eval per value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("cdcBnds", this, classOf[CdcBoundaries].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  def boundaries(text: Column, window: Int, divisor: Int): Column =
    GraftShims.column(CdcBoundaries(GraftShims.expression(text), window, divisor))
}
