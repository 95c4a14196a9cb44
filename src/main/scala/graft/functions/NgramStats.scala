package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document word n-gram repetition statistics in ONE compiled pass:
  * input a token array, output `(n_ngrams, n_distinct_ngrams,
  * max_ngram_count)` — or null when the row has fewer than `n` tokens
  * (no n-grams; the caller drops such rows, matching the explode
  * formulation where they simply produced no group).
  *
  * Why an expression: the stats are a PURE per-row function — nothing
  * crosses documents — yet the composable formulation exploded every
  * document into ~token-count n-gram rows and paid two keyed shuffles
  * ((id, ngram) counts, then the per-id rollup) to compute what a local
  * hash map sees in one scan. This turns the t08/t11 repetition stage
  * from explode + 2 exchanges into a narrow codegen'd projection — the
  * shape that scales to a 100 TB corpus with zero shuffle.
  *
  * Exactness contract: n-grams are the space-joined windows of the input
  * tokens, identical to `concat_ws(" ", slice(toks, i, n))` — including
  * concat_ws's skip-null semantics — so counts (and the DuckDB oracle)
  * are unchanged. */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("n_distinct_ngrams", LongType, nullable = false),
    StructField("max_ngram_count", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "ngram_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_stats needs array<string>, got ${other.sql}")
    }
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  /** One scan + local hash map; shared by eval and generated code.
    * Returns null (no n-grams) for arrays shorter than n. */
  def compute(arr: ArrayData): InternalRow = {
    val sz = arr.numElements()
    if (sz < n) return null
    // materialize token strings once (UTF8String values may be
    // buffer-backed; toString copies)
    val toks = new Array[String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Long]()
    var maxCnt = 0L
    val total = sz - n + 1
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { // concat_ws skips nulls
          if (!first) sb.append(' ')
          sb.append(t)
          first = false
        }
        j += 1
      }
      val g = sb.toString
      val c = counts.merge(g, 1L, (a, b) => a + b)
      if (c > maxCnt) maxCnt = c
      i += 1
    }
    InternalRow(total.toLong, counts.size.toLong, maxCnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("ngramStats", this,
        classOf[NgramStats].getName)
      s"""
         |${ev.value} = $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NgramStats {
  def ngramStats(tokens: Column, n: Int): Column =
    GraftShims.column(NgramStats(GraftShims.expression(tokens), n))
}
