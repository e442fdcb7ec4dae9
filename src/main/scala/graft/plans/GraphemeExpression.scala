package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native grapheme-cluster split: text → array of user-perceived
  * characters via `java.text.BreakIterator.getCharacterInstance` —
  * the unit the q182 code-point analytics CANNOT express (a combining
  * sequence like e + U+0301 is two code points but ONE grapheme, so
  * code-point counting sees "café" and its decomposed twin as
  * different lengths; grapheme counting does not).
  *
  * No SQL oracle exists for this unit — DuckDB ships no grapheme
  * splitter — so the contract is spec-pinned (CorpusSpec) instead of
  * DuckDB-gated: precomposed and decomposed spellings of the same
  * text must produce identical cluster COUNTS and identical
  * per-document entropy, and on text with no combining marks the
  * grapheme split must agree with the code-point split exactly.
  *
  * Scope: the JDK's character BreakIterator implements legacy grapheme
  * boundaries (combining marks, Hangul jamo) — not the full UAX #29
  * extended clusters (emoji ZWJ family sequences split). Documented
  * here because it bounds what the spec may pin.
  */
case class GraphemeClusters(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graphemes requires string, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    GraphemeClusters.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.plans.GraphemeClusters.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraphemeClusters {

  // BreakIterator is stateful and not thread-safe; one per task thread
  private val iter = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
  }

  /** Static so generated code calls it directly. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val bi  = iter.get()
    bi.setText(str)
    val out   = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = bi.first()
    var end   = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      out += UTF8String.fromString(str.substring(start, end))
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray[Any])
  }

  def graphemes(c: Column): Column =
    GraftBridge.column(GraphemeClusters(GraftBridge.expression(c)))
}
