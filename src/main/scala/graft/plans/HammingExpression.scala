package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hamming distance between two equal-length '0'/'1' bit
  * strings (the verify step of every bit-signature dedup candidate).
  *
  * Semantically identical to the HOF form
  * `aggregate(sequence(0, length(a)-1), 0, (acc,i) ->
  * acc + if(substr(a,i+1,1)=substr(b,i+1,1), 0, 1))` — including the
  * HOF's edge semantics: iteration runs over a's length, and a
  * position past b's end compares substr(b,..) = "" ≠ one char, i.e.
  * counts as a difference — but a single byte-compare loop instead of
  * an interpreted aggregate that allocates two substrings per bit per
  * pair. The signatures are ASCII '0'/'1', so byte comparison IS
  * character comparison.
  */
case class HammingBits(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"hamming_bits requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingBits.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.HammingBits.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingBits {

  /** Static so generated code calls it directly — ASCII bit strings,
    * so the byte arrays compare without decoding.
    */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    var d  = 0
    var i  = 0
    while (i < ab.length) {
      if (i >= bb.length || ab(i) != bb(i)) d += 1
      i += 1
    }
    d
  }

  def hammingBits(a: Column, b: Column): Column =
    GraftBridge.column(HammingBits(GraftBridge.expression(a), GraftBridge.expression(b)))
}
