package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native k-permutation MinHash signature over an array<long> of
  * per-shingle base hashes.
  *
  * Bit-identical to the HOF form
  * `transform(sequence(0, k-1), s -> array_min(transform(base, e ->
  * xxhash64(s, e))))` — same XXH64 chain (seed 42, int s then long e)
  * — but evaluated as ONE tight primitive loop: no k intermediate
  * arrays per row, no interpreted lambda dispatch, and it participates
  * in whole-stage codegen (higher-order functions never do). Pinned
  * equal to the HOF form on real documents in DedupSpec.
  *
  * Empty input produces k null elements, exactly like array_min over
  * an empty array (callers filter empty shingle sets anyway).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<bigint> input and k > 0, got ${child.dataType}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private val seed = 42L // xxhash64's default seed — keep parity with the SQL function

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n  = xs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val hs = XXH64.hashInt(s, seed)
      var m  = Long.MaxValue
      var i  = 0
      while (i < n) {
        // null element: xxhash64 skips null children, so the pair hash
        // degenerates to the seed-side hash — mirror that exactly
        val h = if (xs.isNullAt(i)) hs else XXH64.hashLong(xs.getLong(i), hs)
        if (h < m) m = h
        i += 1
      }
      out(s) = m
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh64   = classOf[XXH64].getName
    val generic = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n   = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s   = ctx.freshName("s")
      val i   = ctx.freshName("i")
      val hs  = ctx.freshName("hs")
      val m   = ctx.freshName("m")
      val h   = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $generic(new Object[$k]);
         |} else {
         |  long[] $out = new long[$k];
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $hs = $xxh64.hashInt($s, ${seed}L);
         |    long $m = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $h = $a.isNullAt($i) ? $hs : $xxh64.hashLong($a.getLong($i), $hs);
         |      if ($h < $m) $m = $h;
         |    }
         |    $out[$s] = $m;
         |  }
         |  ${ev.value} = new $generic($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  /** Column wrapper: native MinHash signature from base hashes. */
  def minhashSig(base: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(base), k))
}
