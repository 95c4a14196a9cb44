package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit integer md5 prefix: numerically equal to
  * `conv(substring(md5(x), 1, 15), 16, 10)` — the first 15 hex digits of
  * the digest == (first 8 big-endian digest bytes) >>> 4 — but computed
  * straight from the digest bytes, skipping the 32-char hex string
  * materialization and the base-16 string parse. This is the inner hash of
  * the MinHash/SimHash/fingerprint family, evaluated millions of times per
  * stage, so the two avoided string passes are a real constant-factor win.
  *
  * The DuckDB oracles keep the conv-over-hex formulation; values are
  * identical by construction.
  */
case class Md5Int60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_int60"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_int60 needs a string child, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Digest + truncate; shared by eval and generated code. */
  def compute(input: UTF8String): Long = {
    val bytes = input.getBytes
    val digest = Md5Int60.localDigest.get()
    digest.reset()
    val d = digest.digest(bytes)
    // first 8 bytes big-endian, then drop the low nibble (hex digit 16)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  // direct compiled-method call inside whole-stage codegen (a
  // CodegenFallback would route through a boxed row-eval per value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("md5int60", this, classOf[Md5Int60].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Int60 {
  // MessageDigest is stateful and expression instances can be shared across
  // local-mode threads; one digest per thread.
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Int60(c: Column): Column =
    GraftShims.column(Md5Int60(GraftShims.expression(c)))
}
