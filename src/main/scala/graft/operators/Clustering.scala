package graft.operators

import graft.plans.VectorExpressions.vecDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the topic-
  * clustering stage of a curation pipeline (SemDeDup's cluster-then-
  * dedup, cluster-balanced sampling, topic mixture analysis).
  *
  * Cross-engine exact BY CONSTRUCTION (oracle-gated against DuckDB):
  *   - inputs quantize to a 1/1024 integer grid: float→double widening
  *     and the ×1024 scaling are both exact (power-of-two), and
  *     nearest-integer rounding of the identical double is the same on
  *     every engine;
  *   - centroid updates are BIGINT component sums — exact and
  *     aggregation-ORDER-INDEPENDENT, the property a float mean lacks —
  *     finished by ONE IEEE division per component (single IEEE ops are
  *     bit-identical cross-engine);
  *   - distances are left-to-right double dot products (native codegen
  *     [[graft.plans.DotProduct]], accumulation parity with DuckDB's
  *     `list_inner_product` proven since q29), expanded as
  *     |v|² − 2·v·c + |c|² so the comparison sees identical doubles;
  *   - argmin tie-breaks on cluster id (struct ordering = ORDER BY
  *     dist, cluster).
  *
  * Scale shape (the same topology Spark MLlib's KMeans uses): for
  * CONSTANT k (≤ [[joinAssignThreshold]]) centroids ride into the
  * assignment projection as LITERALS — k·d doubles baked into the
  * plan, so assignment is a pure map (no join, no shuffle, no
  * broadcast table); the update is one posexplode + (cluster, pos)
  * aggregation with map-side partial sums whose OUTPUT is k·d rows;
  * the only driver materializations are the k seed rows and the k·d
  * sum table per iteration (~512 values at k=8, d=64 — bounded
  * metadata, never corpus-sized). For CORPUS-GROWING k (SemDeDup's
  * k ∝ n rule) the model is a broadcast DataFrame end to end and
  * assignment is one native loop expression — see
  * [[kmeansDistributed]]; nothing k·d-sized crosses the driver per
  * iteration and both paths are bit-identical (ClusteringSpec). The
  * quantized projection materializes once ([[Materialize]]) so the
  * iteration loop re-reads a KB-per-row intermediate instead of
  * re-scanning the corpus per pass.
  *
  * Empty clusters drop (their ids vanish from later iterations), the
  * standard Lloyd convention and the one a relational replay follows
  * naturally.
  */
object Clustering {

  /** Centroid count past which [[kmeansModel]] switches from the
    * driver-model literal-projection form to the fully distributed
    * broadcast-model form (see [[kmeansDistributed]]). Test seam
    * (ClusteringSpec forces both paths on the same data and pins
    * bit-equality), defaulted to the measured codegen comfort bound —
    * same convention as `Warehouse.failpoint`.
    */
  @volatile private[graft] var joinAssignThreshold: Int = 64

  /** The measured codegen cliff: past this many LITERAL centroids the
    * one-projection assignment stops JIT/codegen-compiling and runs
    * interpreted (measured 32 s for k=80 over 20k vectors where the
    * compiled form is sub-second). The default [[joinAssignThreshold]]
    * sits exactly here; the guard exists for callers who pin the
    * threshold higher and silently walk off the cliff.
    */
  private[graft] val literalCodegenCliff: Int = 64

  /** Some(warning) when a literal-projection assignment over `k`
    * centroids would run past the codegen cliff (pure so the spec can
    * pin it; [[kmeansModel]] logs it). */
  private[graft] def literalCliffWarning(k: Int): Option[String] =
    if (k <= literalCodegenCliff) None
    else Some(
      s"literal-centroid assignment over $k centroids exceeds the codegen cliff " +
        s"($literalCodegenCliff): the generated projection will fall back to interpreted " +
        "eval (~30x slower). Lower Clustering.joinAssignThreshold so the distributed " +
        "broadcast-model path handles this k.")

  /** Quantize a float/double vector to the 1/1024 integer grid. */
  def quantized(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1024.0), 0).cast("long"))

  /** Per-key mean vectors on the quantized grid: BIGINT component sums
    * (exact, order-independent) finished by one IEEE division. The
    * collect is k·d rows — bounded by the key cardinality, never the
    * corpus. Keys ascend in the returned seq.
    */
  def centroids(df: DataFrame, keyCol: String, vecCol: String): Seq[(Int, Array[Double])] =
    df.select(col(keyCol).cast("int").as("k"), quantized(col(vecCol)).as("vq"))
      .select(col("k"), posexplode(col("vq")).as(Seq("pos", "v")))
      .groupBy("k", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(1)).map(r => r.getLong(2).toDouble / r.getLong(3)).toArray
      }
      .sortBy(_._1)

  /** Append `outCol` = the nearest centroid's key (squared-L2 argmin on
    * the quantized grid, tie-break on key). Centroids are PLAN
    * LITERALS, so this is a pure codegen projection — no join, no
    * broadcast table, no shuffle; every input column passes through.
    * This is both k-means assignment and nearest-centroid
    * CLASSIFICATION (predict = assign to per-label centroids).
    */
  def assignTo(
      df: DataFrame,
      vecCol: String,
      cents: Seq[(Int, Array[Double])],
      outCol: String): DataFrame =
    assignQ(df, transform(quantized(col(vecCol)), _.cast("double")), cents, outCol)

  /** Append `outCol` = the `nprobe` nearest centroid keys, nearest
    * first (array<int>) — the probe-selection half of an IVF search
    * over k-means cells. Same literal-centroid, pure-projection shape
    * as [[assignTo]]: array_sort over the (dist, key) structs IS the
    * dist-then-id order, sliced to nprobe.
    */
  def probeTo(
      df: DataFrame,
      vecCol: String,
      cents: Seq[(Int, Array[Double])],
      nprobe: Int,
      outCol: String): DataFrame = {
    val dv     = transform(quantized(col(vecCol)), _.cast("double"))
    val vNorm2 = vecDot(dv, dv)
    val candidates = cents.map { case (c, cent) =>
      var c2 = 0.0
      var i  = 0
      while (i < cent.length) { c2 += cent(i) * cent(i); i += 1 }
      val lc = typedLit(cent.toSeq)
      struct(
        (vNorm2 - lit(2.0) * vecDot(dv, lc) + lit(c2)).as("d"),
        lit(c).as("c"))
    }
    df.withColumn(outCol,
      transform(slice(array_sort(array(candidates: _*)), 1, nprobe), s => s.getField("c")))
  }

  /** [[assignTo]] over an ALREADY-quantized double vector column. */
  private def assignQ(
      df: DataFrame,
      dv: Column,
      cents: Seq[(Int, Array[Double])],
      outCol: String): DataFrame = {
    val vNorm2 = vecDot(dv, dv)
    val candidates = cents.map { case (c, cent) =>
      // |c|² is a plan-time constant; left-to-right like DotProduct.
      var c2 = 0.0
      var i  = 0
      while (i < cent.length) { c2 += cent(i) * cent(i); i += 1 }
      val lc = typedLit(cent.toSeq)
      struct(
        (vNorm2 - lit(2.0) * vecDot(dv, lc) + lit(c2)).as("d"),
        lit(c).as("c"))
    }
    df.withColumn(outCol, array_min(array(candidates: _*)).getField("c"))
  }

  /** `iters` assignment passes with `iters − 1` centroid updates
    * between them; seeds are the quantized vectors of the k smallest
    * ids. Returns (idCol, cluster int), one row per input row.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame =
    kmeansModel(df, idCol, vecCol, k, iters)._1

  /** [[kmeans]] plus the MODEL: the centroids the final assignment was
    * made against (what an IVF probe or a later [[assignTo]] needs).
    */
  def kmeansModel(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (DataFrame, Seq[(Int, Array[Double])]) = {
    require(k >= 1 && iters >= 1, s"kmeans needs k>=1, iters>=1, got k=$k iters=$iters")
    val base = Materialize(
      df.select(col(idCol).as("id"), quantized(col(vecCol)).as("vq"))
        .withColumn("dv", transform(col("vq"), _.cast("double"))))
    if (k <= Clustering.joinAssignThreshold) kmeansLiteral(base, idCol, k, iters)
    else kmeansDistributed(base, idCol, k, iters)
  }

  /** Small-k loop: centroids are a DRIVER-side k·d model baked into the
    * assignment projection as literals (pure codegen map, no join, no
    * broadcast table, no shuffle), and each Lloyd update collects k·d
    * sum rows — bounded metadata wherever k is a constant. `base` is
    * the materialized (id, vq, dv) projection.
    */
  private def kmeansLiteral(
      base: DataFrame,
      idCol: String,
      k: Int,
      iters: Int): (DataFrame, Seq[(Int, Array[Double])]) = {
    literalCliffWarning(k).foreach(w => System.err.println(s"[graft.Clustering] WARN: $w"))

    // Seed centroids: the k smallest ids' quantized vectors (k rows to
    // the driver — bounded by k, never by the corpus).
    var cents: Seq[(Int, Array[Double])] =
      base.orderBy("id").limit(k).collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](r.fieldIndex("vq")).map(_.toDouble).toArray
      }.toSeq

    // argmin over literal centroids: array_min of (dist, cluster)
    // structs — lexicographic struct ordering IS the dist-then-id
    // tie-break, and the whole thing is one codegen projection.
    def assign(): DataFrame = assignQ(base, col("dv"), cents, "cluster")

    var current = assign()
    for (_ <- 2 to iters) {
      // Exact integer component sums (same scheme as [[centroids]],
      // inlined over the already-quantized `vq` so nothing
      // re-quantizes); k·d collected rows; empty clusters produce no
      // rows and drop out.
      val sums = current
        .select(col("cluster"), posexplode(col("vq")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      cents = sums
        .groupBy(_.getInt(0))
        .toSeq
        .map { case (c, rows) =>
          val comps = rows.sortBy(_.getInt(1)).map(r => r.getLong(2).toDouble / r.getLong(3))
          c -> comps.toArray
        }
        .sortBy(_._1)
      current = assign()
    }
    (current.select(col("id").as(idCol), col("cluster")), cents)
  }

  /** Large-k loop: the scale shape. The centroid model lives as a
    * DATAFRAME end to end — nothing k·d-sized crosses the driver until
    * the one converged-model collect at the end, and nothing
    * corpus-sized is ever broadcast or joined:
    *
    *   - assignment collapses the model to ONE row (an array of k
    *     (c, cent, c2) structs, k·d doubles — the same bytes MLlib
    *     broadcasts), crossJoins it in as a broadcast, and picks the
    *     argmin with the native [[graft.plans.NearestCentroid]]
    *     expression — a single codegen LOOP per row, so it neither
    *     overflows codegen the way k inlined literal dot expressions
    *     do past [[literalCodegenCliff]] (measured: 32 s interpreted
    *     at k=80/20k rows) nor materializes the n·k pair stream the
    *     earlier join-argmin shape shuffled (and whose minima
    *     join-back broadcast an n-ROW frame — corpus-sized, the thing
    *     an 8 GB broadcast cap hard-fails at 10⁹ vectors);
    *   - each Lloyd update is the same exact BIGINT component-sum
    *     aggregation, but its k·d result stays distributed: component
    *     means are finished in-plan (`cast(s as double)/n` — the one
    *     IEEE division, bit-identical to the driver form) and
    *     re-assembled into per-cluster arrays by a deterministic
    *     array_sort-by-pos, then [[Materialize]]d so iteration i+1's
    *     broadcast subplan doesn't re-execute iteration i;
    *   - `c2` = Σ cent_i² is computed once per centroid IN-PLAN with
    *     [[graft.plans.VectorExpressions.vecDot]](cent, cent) — the
    *     identical left-to-right loop the literal path runs on the
    *     driver, so distances are bit-identical across paths (pinned
    *     in ClusteringSpec).
    *
    * Seeds are the same rule as the literal path — the k smallest ids'
    * quantized vectors, numbered 0..k−1 in id order — expressed
    * in-plan (row_number over the k-row TakeOrdered result; one k-row
    * task, model-sized). Empty clusters produce no sum rows and drop,
    * the shared Lloyd convention.
    */
  private def kmeansDistributed(
      base: DataFrame,
      idCol: String,
      k: Int,
      iters: Int): (DataFrame, Seq[(Int, Array[Double])]) = {
    import graft.plans.CentroidExpressions.nearestCentroid
    import org.apache.spark.sql.expressions.Window

    var centDf: DataFrame = Materialize(
      base
        .orderBy("id")
        .limit(k)
        .select(
          (row_number().over(Window.orderBy("id")) - 1).as("__kc"),
          col("dv").as("__kcent")))

    def assign(): DataFrame = {
      val model = centDf.agg(
        array_sort(collect_list(struct(
          col("__kc").as("c"),
          col("__kcent").as("cent"),
          vecDot(col("__kcent"), col("__kcent")).as("c2")))).as("__cents"))
      base
        .crossJoin(broadcast(model))
        .withColumn("cluster", nearestCentroid(col("dv"), col("__cents")))
        .drop("__cents")
    }

    var current = assign()
    for (_ <- 2 to iters) {
      // Exact integer component sums as in the literal path, finished
      // and re-arrayed without leaving the cluster. collect_list is
      // order-nondeterministic; array_sort on (pos, mean) structs
      // (pos unique per cluster) pins component order.
      centDf = Materialize(
        current
          .select(col("cluster").as("__kc"), posexplode(col("vq")).as(Seq("pos", "v")))
          .groupBy("__kc", "pos")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
          .groupBy("__kc")
          .agg(transform(
            array_sort(collect_list(struct(
              col("pos"),
              (col("s").cast("double") / col("n")).as("m")))),
            x => x.getField("m")).as("__kcent")))
      current = assign()
    }
    val model = centDf
      .orderBy("__kc")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .toSeq
    (current.select(col("id").as(idCol), col("cluster")), model)
  }
}
