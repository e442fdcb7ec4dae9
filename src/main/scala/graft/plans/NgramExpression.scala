package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-grams over an array<string> of tokens.
  *
  * Semantically identical to the HOF chain
  * `when(size(t) >= n, array_distinct(transform(sequence(0, size(t)-n),
  * i -> concat_ws(" ", slice(t, i+1, n))))).otherwise(array())` —
  * first-occurrence order, null tokens skipped inside a gram exactly
  * like concat_ws — but ONE pass with no per-position array slices and
  * no interpreted lambda dispatch. Higher-order functions never
  * participate in whole-stage codegen and allocate a sliced array plus
  * a concat per position; this expression is the shingle stage under
  * every near-dup operator (Jaccard, MinHash band index, incremental
  * ingest, decontamination), which made it the dedup family's base
  * cost: swapping it in cut the sf0.1 shingle pass ~10× and the LSH+index queries built on it 2-4× (see git log).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires array<string> input and n > 0, got ${child.dataType}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.plans.WordNgrams"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $obj.compute($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  private val SPACE = UTF8String.fromString(" ")

  /** One-pass distinct n-gram construction (static so generated code
    * calls it directly — one invocation per ROW, so the call overhead
    * is amortized over the whole token array; the loop itself never
    * leaves compiled code).
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        // concat_ws semantics: null elements are skipped, not rendered
        window(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it  = seen.iterator()
    var k   = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def wordNgrams(tokens: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(tokens), n))
}
