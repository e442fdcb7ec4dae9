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
  * Scale shape (the same topology Spark MLlib's KMeans uses): centroids
  * ride into the assignment projection as LITERALS — k·d doubles baked
  * into the plan, so assignment is a pure map (no join, no shuffle, no
  * broadcast table); the update is one posexplode + (cluster, pos)
  * aggregation with map-side partial sums whose OUTPUT is k·d rows; the
  * only driver materializations are the k seed rows and the k·d sum
  * table per iteration (~512 values at k=8, d=64 — bounded metadata,
  * never corpus-sized). The quantized projection materializes once
  * ([[Materialize]]) so the iteration loop re-reads a KB-per-row
  * intermediate instead of re-scanning the corpus per pass.
  *
  * Empty clusters drop (their ids vanish from later iterations), the
  * standard Lloyd convention and the one a relational replay follows
  * naturally.
  */
object Clustering {

  /** Centroid count past which [[kmeansModel]]'s assignment switches
    * from the one-projection literal form to the broadcast-join argmin
    * (see the comment at the switch). Test seam (ClusteringSpec forces
    * both paths on the same data and pins bit-equality), defaulted to
    * the measured codegen comfort bound — same convention as
    * `Warehouse.failpoint`.
    */
  @volatile private[graft] var joinAssignThreshold: Int = 64

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
    val spark = df.sparkSession
    val base = Materialize(
      df.select(col(idCol).as("id"), quantized(col(vecCol)).as("vq"))
        .withColumn("dv", transform(col("vq"), _.cast("double"))))

    // Seed centroids: the k smallest ids' quantized vectors (k rows to
    // the driver — bounded by k, never by the corpus).
    var cents: Seq[(Int, Array[Double])] =
      base.orderBy("id").limit(k).collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](r.fieldIndex("vq")).map(_.toDouble).toArray
      }.toSeq

    // argmin over literal centroids: array_min of (dist, cluster)
    // structs — lexicographic struct ordering IS the dist-then-id
    // tie-break, and the whole thing is one codegen projection. Past
    // `joinAssignThreshold` centroids the single projection stops
    // compiling as one whole-stage method (the generated array of k
    // inlined dot loops overflows codegen and falls back to
    // interpreted eval — measured 32 s for k=80 over 20k vectors where
    // the compiled form is sub-second), so large k switches to the
    // broadcast-join argmin: one SMALL codegen dot per (row, centroid)
    // pair and a map-side-combined min(struct(d, c)) per row. The
    // distance expression is the SAME ops in the SAME order, so the
    // two paths pick bit-identical clusters (pinned in
    // ClusteringSpec); every oracle-gated scale runs k=8 — the literal
    // path — so cross-engine replay is untouched.
    def assign(): DataFrame =
      if (cents.lengthCompare(Clustering.joinAssignThreshold) <= 0)
        assignQ(base, col("dv"), cents, "cluster")
      else {
        // Two HashAggregate passes, never a struct-min: min over a
        // STRUCT falls back to SortAggregate, which sorts the n·k
        // joined stream and OOMs long before the arithmetic matters
        // (measured at n=200k, k=800 on a default heap). Pass 1 takes
        // the primitive min distance per row; pass 2 recomputes the
        // same bit-identical distance expression, keeps the exact
        // minima, and breaks ties to the smallest centroid id — the
        // literal path's (dist, id) lexicographic order, reproduced
        // with primitive-only aggregates. The minima frame joins back
        // under an EXPLICIT broadcast hint — not AQE's: the planner
        // cannot know the aggregate is small until its stage finishes,
        // so a planned sort-merge join starts shuffle-WRITING the n·k
        // pair stream concurrently (measured: the 1.6e8-pair stream
        // spilled >50 GB of shuffle before AQE could intervene). The
        // broadcast is n rows × 16 bytes — bounded by the corpus's ROW
        // COUNT, fine wherever a driver-side k·d centroid model is
        // fine, which is this operator's existing contract.
        val centDf = broadcast(
          spark.createDataFrame(cents.map { case (c, cent) =>
            var c2 = 0.0
            var i  = 0
            while (i < cent.length) { c2 += cent(i) * cent(i); i += 1 }
            (c, cent.toSeq, c2)
          }).toDF("__kc", "__kcent", "__kc2"))
        val d = vecDot(col("dv"), col("dv")) -
          lit(2.0) * vecDot(col("dv"), col("__kcent")) + col("__kc2")
        val pairs = base.select(col("id"), col("dv")).crossJoin(centDf)
        val dmin  = pairs.groupBy(col("id")).agg(min(d).as("__kdmin"))
        val arg = pairs
          .join(broadcast(dmin), Seq("id"))
          .filter(d === col("__kdmin"))
          .groupBy(col("id"))
          .agg(min(col("__kc")).as("cluster"))
        base.join(arg, Seq("id"))
      }

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
}
