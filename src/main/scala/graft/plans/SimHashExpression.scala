package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash bit-vote over an array of 16-hex-char hash
  * prefixes (each encoding one shingle's 64-bit hash, MSB-first).
  *
  * Bit-identical to the HOF reference form in
  * [[graft.operators.Dedup.simhash64Hof]] — bit j of a hex prefix is
  * `(value >>> (63-j)) & 1`, votes +1/-1 per shingle, bit set to '1'
  * on a positive vote — but computed in ONE pass over the shingles
  * instead of 64 per-bit aggregate() passes, each of which re-walks
  * the array interpreted (HOFs never codegen). A null element poisons
  * every per-bit aggregate in the HOF form (null acc propagates), so
  * here any null element yields the all-zero signature, matching
  * exactly.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_bits requires array<string>, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n  = xs.numElements()
    val votes = new Array[Int](64)
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) {
      if (xs.isNullAt(i)) anyNull = true
      else {
        val v = java.lang.Long.parseUnsignedLong(xs.getUTF8String(i).toString, 16)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((v >>> (63 - j)) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val chars = new Array[Char](64)
    var j = 0
    while (j < 64) {
      chars(j) = if (!anyNull && votes(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(chars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n       = ctx.freshName("n")
      val votes   = ctx.freshName("votes")
      val anyNull = ctx.freshName("anyNull")
      val i       = ctx.freshName("i")
      val j       = ctx.freshName("j")
      val v       = ctx.freshName("v")
      val chars   = ctx.freshName("chars")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; break; }
         |  long $v = java.lang.Long.parseUnsignedLong($a.getUTF8String($i).toString(), 16);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += (((($v >>> (63 - $j)) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |char[] $chars = new char[64];
         |for (int $j = 0; $j < 64; $j++) {
         |  $chars[$j] = (!$anyNull && $votes[$j] > 0) ? '1' : '0';
         |}
         |${ev.value} = $utf8.fromString(new String($chars));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  /** Column wrapper: 64-char '0'/'1' SimHash from hex-prefix hashes. */
  def simhashBits(hexes: Column): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(hexes)))
}
