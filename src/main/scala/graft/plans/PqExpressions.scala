package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a vector is
  * split into `m` subspaces of `dsub` dims; each subvector is replaced
  * by the id of its nearest of `ksub` per-subspace centroids. A 64-dim
  * float vector (256 B) becomes `m` small codes (8 B at m=8, ksub≤256)
  * — the 32× memory/scan compression that makes billion-vector ANN
  * corpora fit a cluster's RAM, which is the whole point at 100 TB.
  *
  * Query-side scoring is ADC (asymmetric distance computation): the
  * full-precision query is scored against the RECONSTRUCTED corpus
  * point, i.e. `score = Σ_j dot(q_sub_j, centroid_j(code_j))` — the
  * corpus scan touches only the codes, never the original vectors.
  *
  * All three kernels follow the [[LshTableBuckets]] codegen shape: a
  * shared `compute` hot loop over primitive arrays, called from
  * whole-stage codegen through one reference object per expression
  * (the loop dominates; a single virtual call per row is noise).
  * Accumulation is double, left-to-right within a subspace, subspaces
  * summed in order — deterministic, and the grouping every test/oracle
  * pins. Codebook layout is row-major `[m][ksub][dsub]` flattened.
  */
private[plans] trait PqKernel { self: Expression =>
  def codebook: Array[Double]
  def m: Int
  def ksub: Int
  def dsub: Int

  protected def codebookOk: Boolean =
    m > 0 && ksub > 0 && dsub > 0 && codebook.length == m * ksub * dsub
}

/** Encode a vector as its `m` per-subspace nearest-centroid ids
  * (squared-L2 argmin, ties to the smaller id — deterministic).
  * Elements past the input's length read as 0, mirroring
  * [[DotProduct]]'s min-length contract. NULL vector → NULL codes.
  */
case class PqEncode(
    child: Expression,
    codebook: Array[Double],
    m: Int,
    ksub: Int,
    dsub: Int
) extends UnaryExpression with PqKernel {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if codebookOk =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float|double> input and a m*ksub*dsub codebook, " +
          s"got ${child.dataType}, ${codebook.length} vs $m*$ksub*$dsub")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(input: ArrayData): ArrayData = {
    val isFloat = elemIsFloat
    val n       = input.numElements()
    val out     = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best  = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d    = 0.0
        var i    = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val x =
            if (idx >= n) 0.0
            else if (isFloat) input.getFloat(idx).toDouble
            else input.getDouble(idx)
          val diff = x - codebook(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep the smaller id
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reconstruct the snapped vector from its codes: the concatenation of
  * the chosen centroids, `m·dsub` doubles. decode(encode(v)) is the
  * quantization of v — what ADC implicitly scores against.
  */
case class PqDecode(
    child: Expression,
    codebook: Array[Double],
    m: Int,
    ksub: Int,
    dsub: Int
) extends UnaryExpression with PqKernel {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) if codebookOk => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_decode requires array<int> codes and a m*ksub*dsub codebook, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def compute(codes: ArrayData): ArrayData = {
    require(codes.numElements() == m, s"expected $m codes, got ${codes.numElements()}")
    val out = new Array[Any](m * dsub)
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < ksub, s"code $c out of range [0, $ksub)")
      val base = (j * ksub + c) * dsub
      var i = 0
      while (i < dsub) { out(j * dsub + i) = codebook(base + i); i += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC inner-product score of a full-precision query against a coded
  * corpus row: `Σ_j dot(q_sub_j, centroid_j(code_j))`. Equals
  * `dot(q, decode(codes))` up to the per-subspace summation grouping
  * (pinned ≈1e-12-close in the spec); the corpus side reads `m` ints
  * instead of `m·dsub` floats.
  */
case class PqAdc(
    left: Expression,  // query vector, array<float|double>
    right: Expression, // codes, array<int>
    codebook: Array[Double],
    m: Int,
    ksub: Int,
    dsub: Int
) extends BinaryExpression with PqKernel {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) if codebookOk =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<float|double>, array<int>), got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  private def queryIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(q: ArrayData, codes: ArrayData): Double = {
    require(codes.numElements() == m, s"expected $m codes, got ${codes.numElements()}")
    val isFloat = queryIsFloat
    val n       = q.numElements()
    var total   = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < ksub, s"code $c out of range [0, $ksub)")
      val base = (j * ksub + c) * dsub
      var acc  = 0.0
      var i    = 0
      while (i < dsub) {
        val idx = j * dsub + i
        val x =
          if (idx >= n) 0.0
          else if (isFloat) q.getFloat(idx).toDouble
          else q.getDouble(idx)
        acc += x * codebook(base + i)
        i += 1
      }
      total += acc
      j += 1
    }
    total
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqExpressions {
  def pqEncode(vec: Column, codebook: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebook, m, ksub, dsub))

  def pqDecode(codes: Column, codebook: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(PqDecode(GraftBridge.expression(codes), codebook, m, ksub, dsub))

  def pqAdc(query: Column, codes: Column, codebook: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(
      PqAdc(GraftBridge.expression(query), GraftBridge.expression(codes), codebook, m, ksub, dsub))
}
