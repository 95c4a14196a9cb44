package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression: stream all character n-grams of a string.
  *
  * The built-in formulation — `explode(transform(sequence(1, length-n+1),
  * i => substr(s, i, n)))` — materializes the full shingle array per row
  * before exploding it (one `GenericArrayData` + n UTF8Strings resident at
  * once, twice the allocation churn). A `Generator` produces the rows
  * lazily: one shingle in flight at a time, no intermediate array, which is
  * what the MinHash stage wants when each 100 TB-scale document explodes
  * into hundreds of shingles.
  *
  * Output schema: a single string column `s` (same shape the dedup
  * pipeline consumed from the built-in formulation, so the swap is
  * plan-level only — results are bit-identical).
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n > 0, s"n-gram size must be positive, got $n")

  override def elementSchema: StructType =
    StructType(StructField("s", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val len = s.numChars()
      if (len < n) Iterator.empty
      else Iterator.tabulate(len - n + 1) { i =>
        InternalRow(s.substringSQL(i + 1, n))
      }
    }
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams needs a string child, got ${child.dataType.sql}")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGrams {
  /** Column DSL wrapper: explodes into one string column named `s`. */
  def charNGrams(c: Column, n: Int): Column =
    GraftShims.column(CharNGrams(GraftShims.expression(c), n))
}
