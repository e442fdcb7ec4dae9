package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native argmin-over-centroids: `vec` is an array<double> row vector,
  * `cents` an array of (c: int, cent: array<double>, c2: double)
  * structs — the whole centroid MODEL as one data value, typically a
  * one-row broadcast. Returns the int id of the nearest centroid by
  * squared L2, ties to the smallest id.
  *
  * This is the scale shape of k-means assignment (the topology Spark
  * MLlib uses: broadcast the k·d model, assign in a map): one codegen
  * LOOP over the centroid array, so — unlike the k-literal projection
  * in [[graft.operators.Clustering]], which inlines k dot loops and
  * falls out of JIT/codegen past ~64 centroids — cost is n·k·d
  * arithmetic regardless of k, with no join, no shuffle, no n·k
  * intermediate stream, and nothing corpus-sized on the driver or in a
  * broadcast.
  *
  * Bit-equality contract with the literal path (pinned in
  * ClusteringSpec, required by the DuckDB oracle replays): the same
  * IEEE ops in the same order —
  *   vnorm = Σ v_i·v_i   left-to-right  (= [[DotProduct]](v, v))
  *   dot   = Σ v_i·c_i   left-to-right over min(len) elements
  *   dist  = (vnorm − 2.0·dot) + c2
  * where `c2` rides in pre-computed (the caller builds it with
  * [[VectorExpressions.vecDot]](cent, cent) — the identical
  * left-to-right Σ c_i², evaluated once per centroid instead of once
  * per row·centroid). Comparison is (dist, c) lexicographic — exactly
  * `array_min` over (d, c) structs and DuckDB's `ORDER BY dist, c`.
  * Null inputs and an empty centroid array yield null.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    val okCents = right.dataType match {
      case ArrayType(StructType(Array(a, b, c)), _) =>
        a.dataType == IntegerType &&
          (b.dataType match {
            case ArrayType(DoubleType, _) => true
            case _                        => false
          }) &&
          c.dataType == DoubleType
      case _ => false
    }
    if (okVec && okCents) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid requires (array<double>, array<struct<int, array<double>, double>>), " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dv = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val d  = dv.numElements()
    var vnorm = 0.0
    var i     = 0
    while (i < d) { val x = dv.getDouble(i); vnorm += x * x; i += 1 }
    var found = false
    var best  = 0.0
    var bestC = 0
    var j     = 0
    val k     = cs.numElements()
    while (j < k) {
      val row  = cs.getStruct(j, 3)
      val c    = row.getInt(0)
      val cent = row.getArray(1)
      val c2   = row.getDouble(2)
      val n    = math.min(d, cent.numElements())
      var dot  = 0.0
      var t    = 0
      while (t < n) { dot += dv.getDouble(t) * cent.getDouble(t); t += 1 }
      val dist = vnorm - 2.0 * dot + c2
      if (!found || dist < best || (dist == best && c < bestC)) {
        found = true; best = dist; bestC = c
      }
      j += 1
    }
    if (found) bestC else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d     = ctx.freshName("d")
      val vnorm = ctx.freshName("vnorm")
      val i     = ctx.freshName("i")
      val x     = ctx.freshName("x")
      val found = ctx.freshName("found")
      val best  = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val j     = ctx.freshName("j")
      val k     = ctx.freshName("k")
      val row   = ctx.freshName("row")
      val c     = ctx.freshName("c")
      val cent  = ctx.freshName("cent")
      val c2    = ctx.freshName("c2")
      val n     = ctx.freshName("n")
      val dot   = ctx.freshName("dot")
      val t     = ctx.freshName("t")
      val dist  = ctx.freshName("dist")
      s"""
         |int $d = $a.numElements();
         |double $vnorm = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double $x = $a.getDouble($i);
         |  $vnorm += $x * $x;
         |}
         |boolean $found = false;
         |double $best = 0.0;
         |int $bestC = 0;
         |int $k = $b.numElements();
         |for (int $j = 0; $j < $k; $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($j, 3);
         |  int $c = $row.getInt(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $row.getArray(1);
         |  double $c2 = $row.getDouble(2);
         |  int $n = java.lang.Math.min($d, $cent.numElements());
         |  double $dot = 0.0;
         |  for (int $t = 0; $t < $n; $t++) {
         |    $dot += $a.getDouble($t) * $cent.getDouble($t);
         |  }
         |  double $dist = $vnorm - 2.0 * $dot + $c2;
         |  if (!$found || $dist < $best || ($dist == $best && $c < $bestC)) {
         |    $found = true; $best = $dist; $bestC = $c;
         |  }
         |}
         |if ($found) { ${ev.value} = $bestC; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CentroidExpressions {
  /** Column wrapper: nearest-centroid id in one codegen'd loop over the
    * model array. `cents` element struct MUST be (c int, cent
    * array<double>, c2 double) with c2 = vecDot(cent, cent).
    */
  def nearestCentroid(vec: Column, cents: Column): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), GraftBridge.expression(cents)))
}
