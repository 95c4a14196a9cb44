package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection/union cardinalities of two SORTED, DISTINCT string arrays,
  * as a struct (n_inter, n_union).
  *
  * The built-in route — `size(array_intersect(a, b))` plus
  * `size(array_union(a, b))` — builds a hash set AND an output array per
  * call, twice per pair. For the Jaccard verify stage (tens of thousands of
  * candidate pairs x ~500-element shingle sets) that is pure allocation
  * churn: given both inputs sorted and deduplicated, a single two-pointer
  * merge produces both counts with zero allocation.
  *
  * Caller contract (enforced by the API layer, not checked here): inputs
  * are the output of sort_array(array_distinct(...)). Values equal the
  * built-in formulation exactly under that contract, so DuckDB oracles
  * (list_intersect / list_distinct(list_concat)) are unchanged.
  */
case class SortedSetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_inter", LongType, nullable = false),
    StructField("n_union", LongType, nullable = false)))

  override def prettyName: String = "sorted_set_overlap"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_set_overlap needs two array<string> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Two-pointer merge; shared by eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): InternalRow = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    InternalRow(inter, nx.toLong + ny.toLong - inter)
  }

  // direct compiled-method call inside whole-stage codegen (a
  // CodegenFallback would route through a boxed row-eval per pair)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("overlap", this,
        classOf[SortedSetOverlap].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedSetOverlap {
  def overlap(a: Column, b: Column): Column =
    GraftShims.column(SortedSetOverlap(GraftShims.expression(a), GraftShims.expression(b)))
}
