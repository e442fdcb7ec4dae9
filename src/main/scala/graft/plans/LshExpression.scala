package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-table hyperplane-LSH bucketing: emits every table's
  * sign-bucket string — and, on the probe side, every 1-bit-flip
  * neighbor bucket — in ONE pass over the vector.
  *
  * Value-identical to the relational form it replaces
  * (`concat(lit("t:"), concat_ws("", when(dot(v, plane_tp) >= 0 ...)))`
  * per table, [[graft.operators.Similarity.lshBucket]]): same
  * left-to-right double accumulation as [[DotProduct]], same
  * `"t:bits"` string format, same table order, and on the probe side
  * the same `[bucket, flip0, …, flip(r−1)]` per-table ordering as
  * `probeBuckets`. What changes is the plan: the old form was a
  * `tables × planesPerTable` tree of DotProduct nodes (~320 dots/row
  * at q31's 16×4×64-dim parameters, plus multi-second analyzer/codegen
  * cost on the 4096-literal tree); this is one expression that walks
  * the vector `tables × planesPerTable` times in a tight primitive
  * loop with zero intermediate allocation.
  *
  * One intentional deviation: a NULL input vector yields NULL (so
  * `explode` emits no buckets for it) where the old `when(null >= 0)`
  * chain silently produced the all-'0' bucket — a null embedding has
  * no meaningful sign pattern and should match nothing.
  */
case class LshTableBuckets(
    child: Expression,
    planes: Array[Double], // [tables][planesPerTable][dim], row-major flattened
    tables: Int,
    planesPerTable: Int,
    dim: Int,
    probe: Boolean
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if tables > 0 && planesPerTable > 0 && planes.length == tables * planesPerTable * dim =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets requires array<float|double> input and planes of length " +
          s"tables*planesPerTable*dim, got ${child.dataType}, ${planes.length} vs " +
          s"$tables*$planesPerTable*$dim")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared by interpreted eval and codegen (the generated code calls
    * back into this via a reference object — the loop dominates, so a
    * single virtual call per row is noise, and it keeps the expression
    * inside whole-stage codegen without duplicating the string logic).
    */
  def compute(input: ArrayData): ArrayData = {
    val isFloat  = elemIsFloat
    val n        = math.min(input.numElements(), dim) // DotProduct iterates min(len, dim)
    val perTable = if (probe) planesPerTable + 1 else 1
    val out      = new Array[Any](tables * perTable)
    val bits     = new Array[Boolean](planesPerTable)
    var t = 0
    var o = 0
    while (t < tables) {
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var acc  = 0.0
        var i    = 0
        while (i < n) {
          val x = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
          acc += x * planes(base + i)
          i += 1
        }
        bits(p) = acc >= 0
        p += 1
      }
      val prefix = t.toString + ":"
      val sb     = new java.lang.StringBuilder(prefix.length + planesPerTable)
      sb.append(prefix)
      var b = 0
      while (b < planesPerTable) { sb.append(if (bits(b)) '1' else '0'); b += 1 }
      val bucket = sb.toString
      out(o) = UTF8String.fromString(bucket)
      o += 1
      if (probe) {
        var f = 0
        while (f < planesPerTable) {
          val chars = bucket.toCharArray
          val idx   = prefix.length + f
          chars(idx) = if (chars(idx) == '1') '0' else '1'
          out(o) = UTF8String.fromString(new String(chars))
          o += 1
          f += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshTableBuckets", this, classOf[LshTableBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshExpression {

  /** All tables' bucket strings for a vector, one pass. `planes` as
    * produced by [[graft.operators.Similarity.hyperplanes]] per table,
    * flattened [t][p][i].
    */
  def lshBuckets(
      vec: Column,
      planes: Array[Double],
      tables: Int,
      planesPerTable: Int,
      dim: Int
  ): Column =
    GraftBridge.column(
      LshTableBuckets(GraftBridge.expression(vec), planes, tables, planesPerTable, dim,
        probe = false))

  /** All tables' buckets PLUS every 1-bit-flip probe bucket. */
  def lshProbeBuckets(
      vec: Column,
      planes: Array[Double],
      tables: Int,
      planesPerTable: Int,
      dim: Int
  ): Column =
    GraftBridge.column(
      LshTableBuckets(GraftBridge.expression(vec), planes, tables, planesPerTable, dim,
        probe = true))

  /** Flatten per-table hyperplanes into the [t][p][i] layout the
    * expression expects.
    */
  def flattenPlanes(allPlanes: Seq[Array[Array[Double]]]): Array[Double] =
    allPlanes.flatMap(_.flatMap(_.toSeq)).toArray
}
