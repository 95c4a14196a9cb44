package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The built-in way to express this — `aggregate(zip_with(a, b, _*_), 0d,
  * _+_)` — is a chain of higher-order functions that allocate an
  * intermediate array and evaluate lambdas per element outside whole-stage
  * codegen. For ANN/dedup workloads the dot product *is* the inner loop
  * (corpus x queries evaluations), so it deserves a first-class Catalyst
  * expression with `doGenCode`: one fused while-loop over the two unsafe
  * array buffers, no allocation, inlined into WholeStageCodegen.
  *
  * Semantics are a strict left fold (i = 0..n-1, acc += a(i)*b(i)) —
  * bit-identical to the higher-order formulation and to DuckDB's
  * list_dot_product, so oracle hash-matching is preserved.
  */
case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // ExpectsInputTypes is private[sql]; enforce array<double> inputs here so
  // SQL-path misuse (graft_dot over int arrays) fails analysis, not runtime.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<double> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def prettyName: String = "graft_dot"

  // Null semantics match the built-in aggregate(zip_with(...)) fold it
  // replaces: a null element or a length mismatch yields NULL (zip_with
  // pads the shorter side with nulls, and null poisons the fold).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register graft_dot in the session's function registry (idempotent), so
    * the expression is also reachable from SQL text. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductF64(exprs(0), exprs(1)), "scala_udf")

  /** Column-DSL wrapper around the native expression. */
  def dotF64(a: Column, b: Column): Column =
    GraftShims.column(
      DotProductF64(GraftShims.expression(a), GraftShims.expression(b)))
}
