package graft.operators

import graft.plans.LshExpression
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
    * Exact and brute-force BY DEFINITION (dense all-pairs has no
    * sub-quadratic exact algorithm), but the PLAN matters at scale:
    * this is [[cosinePairsBlocked]], a block-grid equi-join — NOT a
    * BroadcastNestedLoopJoin, which would ship one entire side to
    * every executor and die at the broadcast limit long before 100 TB.
    * For the approximate sub-quadratic path in the near-dup regime
    * (threshold ≥ ~0.8) use [[cosinePairsBucketed]].
    * Output (id_a, id_b), id_a < id_b.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame =
    cosinePairsBlocked(df, idCol, vecCol, threshold)

  /** Exact all-pairs cosine ≥ threshold via a block-grid self-join.
    *
    * Every row gets a block id (hash mod `blocks`); a broadcast grid of
    * the (blocks·(blocks+1)/2) unordered block pairs turns the
    * cartesian into an EQUI-join on block ids: shuffle-partitioned,
    * memory-bounded (a task buffers one block, ~n/blocks rows), with
    * parallelism `blocks` instead of a single nested-loop broadcast.
    * The O(n²) dot products are irreducible for an exact answer — the
    * blocking distributes them evenly and keeps every stage codegen.
    * Normalization is linear work recomputed per side rather than
    * cached: O(2n·d) is noise next to the n²·d pair dots, and a cache
    * here would pin an entry in the cache manager for the session
    * lifetime (nothing inside a one-shot operator should do that).
    */
  def cosinePairsBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocks: Int = 64
  ): DataFrame =
    cosinePairsBlockedScored(df, idCol, vecCol, threshold, blocks).drop("cos")

  /** [[cosinePairsBlocked]] keeping the cosine as a `cos` column —
    * the input shape [[graft.operators.Graph.capDegree]] (top-k edges
    * BY SIMILARITY per node) needs; same plan, one extra projected
    * double per pair.
    */
  def cosinePairsBlockedScored(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocks: Int = 64
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val normed = Dedup
      .computeParallel(df)
      .select(
        col(idCol).as("id"),
        normalized(col(vecCol)).as("vn"),
        pmod(hash(col(idCol)), lit(blocks)).as("blk")
      )
    val grid = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j)).toDF("ba", "bb")
    val a = normed.select(col("id").as("id_a"), col("vn").as("va"), col("blk").as("ba"))
    val b = normed.select(col("id").as("id_b"), col("vn").as("vb"), col("blk").as("bb"))
    a.join(broadcast(grid), Seq("ba"))
      .join(b, Seq("bb"))
      // intra-block pairs appear in both orders — keep one; cross-block
      // pairs appear exactly once (grid has i <= j only)
      .filter((col("ba") =!= col("bb")) || (col("id_a") < col("id_b")))
      .filter(dot(col("va"), col("vb")) >= threshold)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        dot(col("va"), col("vb")).as("cos")
      )
  }

  /** Approximate all-pairs cosine ≥ threshold via OR-amplified
    * hyperplane LSH: `tables` independent tables of `planesPerTable`
    * hyperplanes; candidates are bucket-equal pairs in ANY table,
    * then every candidate is verified with an exact dot product —
    * precision is exactly 1.0, recall is governed by banding.
    *
    * Recall math (honest version): a pair at angle θ collides with one
    * plane with p = 1 − θ/π, with a whole table with p^r, and is missed
    * by all tables with (1 − p^r)^L. At the near-dup operating point
    * this is the right 100 TB shape: cos ≥ 0.9 → p ≈ 0.86, r=8, L=10
    * → recall ≈ 0.97 with ~2^8 buckets/table pruning candidates.
    * At LOW thresholds (cos ≤ ~0.5 → p ≤ 0.67, barely above the 0.5 of
    * an orthogonal pair) no (r, L) separates signal from noise — the
    * candidate set degenerates toward all-pairs; use
    * [[cosinePairsBlocked]] there, because exactness at low thresholds
    * genuinely costs O(n²).
    */
  def cosinePairsBucketed(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planesPerTable: Int = 8,
      tables: Int = 10,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val normed = Dedup
      .computeParallel(df)
      .select(col(idCol).as("id"), normalized(col(vecCol)).as("vn"))
    cosineBucketCandidates(normed, planesPerTable, tables, dim, seed)
      .join(normed.select(col("id").as("id_a"), col("vn").as("va")), Seq("id_a"))
      .join(normed.select(col("id").as("id_b"), col("vn").as("vb")), Seq("id_b"))
      .filter(dot(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** LSH parameter plan for a corpus of `n` vectors: planes per table
    * sized for CONSTANT expected bucket occupancy (b = ⌈log₂(n /
    * occupancy)⌉, so bucket count grows WITH the corpus and the
    * random-collision candidate mass stays ~linear in n instead of
    * n²/2^b with a fixed b), tables sized to hold the recall target at
    * the resulting per-table collision probability p₁ = (1 − θ/π)^b
    * (T = ⌈ln(1−recall)/ln(1−p₁)⌉ — OR-amplification). The residual
    * growth is T ∝ p₁^−1 ≈ (n/occupancy)^ρ — the classic sub-quadratic
    * LSH exponent, the best plain hyperplane-LSH can do at a fixed
    * threshold. Defaults reproduce the historical fixed plan (b=8,
    * T≈10) at the sf0.1 corpus size, so small-corpus behavior is
    * unchanged and the scaling is pure headroom.
    */
  def lshPlan(
      n: Long,
      threshold: Double,
      targetOccupancy: Int = 8,
      targetRecall: Double = 0.84
  ): (Int, Int) = {
    require(n >= 1 && threshold > 0.0 && threshold < 1.0)
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall in (0,1): $targetRecall — 1.0 would demand infinitely many tables")
    require(targetOccupancy >= 1, s"targetOccupancy >= 1: $targetOccupancy")
    val b = math.max(4,
      math.ceil(math.log(math.max(2.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt)
    val p1 = math.pow(1.0 - math.acos(threshold) / math.Pi, b.toDouble)
    val t  = math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-p1)).toInt)
    (b, t)
  }

  /** [[cosinePairsBucketed]] with the parameters chosen by [[lshPlan]]
    * from the corpus's own size — the 100 TB form: a fixed (b, T)
    * keeps bucket COUNT constant while the corpus grows, so random
    * collisions (and with them candidate verification cost) grow n²;
    * the planned form grows the bucket count with n and pays only the
    * LSH exponent. Output is identical to the fixed form for any
    * (b, T) — candidates are exact-verified against `threshold` —
    * which is what lets the q79 oracle stay byte-stable across plans;
    * only the candidate mass (cost) changes. One count() pass to size
    * the plan.
    */
  def cosinePairsBucketedScaled(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      targetOccupancy: Int = 8,
      targetRecall: Double = 0.84,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val (b, t) = lshPlan(df.count(), threshold, targetOccupancy, targetRecall)
    cosinePairsBucketed(df, idCol, vecCol, threshold, b, t, dim, seed)
  }

  /** Candidate pairs of [[cosinePairsBucketed]] before exact
    * verification — exposed so callers (and the spec) can measure the
    * pruning ratio |candidates| / (n·(n−1)/2).
    * Expects a (id, vn) normalized input.
    */
  def cosineBucketCandidates(
      normed: DataFrame,
      planesPerTable: Int,
      tables: Int,
      dim: Int,
      seed: Long
  ): DataFrame = {
    val planesFlat = LshExpression.flattenPlanes(
      (0 until tables).map(t => hyperplanes(planesPerTable, dim, seed + t)))
    val bucketed = normed.select(
      col("id"),
      explode(LshExpression.lshBuckets(col("vn"), planesFlat, tables, planesPerTable, dim))
        .as("bucket"))
    bucketed
      .as("a")
      .join(bucketed.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
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
    val c = Dedup
      .computeParallel(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** Metadata-FILTERED exact top-k: each query's neighbors are drawn
    * only from corpus rows whose `matchCols` values EQUAL the query's
    * (the retrieval-with-constraints shape: same language, same tenant,
    * same source shard). The filter rides the broadcast-join condition,
    * so it prunes candidates BEFORE any cosine is computed — the plan
    * stays one corpus scan + per-query rank, and the scored volume
    * shrinks by the filter's selectivity instead of growing a
    * post-filter step that could starve k. Output
    * (query_id, rank, neighbor_id), rank dense within the filtered
    * candidate set.
    */
  /** Hard-negative mining for contrastive / metric training: per
    * anchor, the k most similar corpus vectors with a DIFFERENT label
    * — the near-misses a trained embedding must learn to push apart
    * (easy negatives teach nothing; random sampling finds mostly easy
    * ones). Same broadcast topology as [[bruteForceTopK]] with the
    * label INEQUALITY riding the join condition: the corpus is scanned
    * once and never shuffled, the anchor set broadcasts; at index
    * scale the probe swaps in like the q123/q124 family. Output
    * (query_id, rank, neighbor_id, neighbor_label), cosine-then-id
    * ranked.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"), col(labelCol).as("__q_label"))
    val c = Dedup
      .computeParallel(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label"))
    val scored = c
      .join(broadcast(q), col("__q_label") =!= col("neighbor_label"))
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("neighbor_label"))
  }

  def bruteForceTopKFiltered(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      matchCols: Seq[String],
      k: Int
  ): DataFrame = {
    val q = queries.select(
      (col(idCol).as("query_id") +: col(vecCol).as("qv") +:
        matchCols.map(c => col(c).as(s"__qm_$c"))): _*)
    val c = Dedup
      .computeParallel(corpus)
      .select(
        (col(idCol).as("neighbor_id") +: col(vecCol).as("cv") +:
          matchCols.map(col)): _*)
    val cond = matchCols
      .map(m => col(m) === col(s"__qm_$m"))
      .foldLeft(col("query_id") =!= col("neighbor_id"))(_ && _)
    val scored = c
      .join(broadcast(q), cond)
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

  /** Deterministic ±1 sign matrix for Johnson–Lindenstrauss random
    * projection (Achlioptas 2003: database-friendly projections — a
    * sign matrix preserves pairwise distances like a gaussian one).
    * Entry (j, i) is +1 iff the first hex digit of
    * sha256("j:i:seed") < '8' — a rule any engine can replay exactly
    * (the q59/q86 portability trick), which is what lets the
    * projection itself carry a value-exact oracle.
    */
  def signMatrix(dOut: Int, dim: Int, seed: Long = 42L): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Array.tabulate(dOut, dim) { (j, i) =>
      val hex = md.digest(s"$j:$i:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1 else -1
    }
  }

  /** Chunk→document embedding mean pooling, production form: one
    * explode + per-(group, position) average — codegen, partial
    * aggregation map-side, the standard step that turns chunk
    * embeddings (q67's chunking output, embedded) back into one
    * document vector. Double `avg` is aggregation-order-dependent
    * across runs at the last ulp; when bit-reproducibility matters
    * (content-addressed caches, cross-engine checks) use
    * [[meanPoolOrdered]] (q90's form).
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String, dim: Int): DataFrame =
    df
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(avg(col("x").cast("double")).as("pooled"))

  /** Mean pooling, DETERMINISTIC form: chunks collected per group,
    * sorted by id, summed left-to-right in double per position, then
    * divided by the chunk count — a fixed IEEE op sequence, so the
    * result is bit-identical across runs, partitionings, and engines
    * (DuckDB's ordered list_sum accumulates the same way — q90's
    * value-exact oracle). The collect_list bounds state by the
    * group's chunk count — fine when groups are documents (10²–10³
    * chunks), not for million-row groups; there [[meanPool]]'s
    * streaming-partial form is the right tool.
    * Output (grp, pos, pooled) long-form.
    */
  def meanPoolOrdered(df: DataFrame, groupCol: String, idCol: String, vecCol: String, dim: Int): DataFrame =
    df
      .select(col(groupCol).as("grp"), struct(col(idCol), col(vecCol)).as("s"))
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(col("s"))).as("chunks"))
      .select(
        col("grp"),
        posexplode(
          transform(
            sequence(lit(0), lit(dim - 1)),
            i =>
              aggregate(
                col("chunks"),
                lit(0.0).cast("double"),
                (acc, c) => acc + element_at(c.getField(vecCol), i + 1).cast("double")
              ) / size(col("chunks"))
          )
        ).as(Seq("pos", "pooled")))

  /** JL sign projection, production form: dOut codegen [[dot]]s of the
    * vector against the ±1 rows — one scan, no shuffle, the
    * dimensionality-reduction step that runs BEFORE the ANN/dedup
    * ladder when raw embeddings are wider than the index needs
    * (768–4096 dims down to 16–64; pairwise geometry survives within
    * the JL distortion bound, pinned in DedupSpec). Output: the
    * projected array<double> column. The oracle-exact relational twin
    * (decimal-summed, q89) is in QueriesDedup.
    */
  def signProjection(vec: Column, dOut: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = signMatrix(dOut, dim, seed)
    array(planes.map(row => dot(vec, typedlit(row.map(_.toDouble)))).toSeq: _*)
  }

  /** Sign-bucket id of a vector under the hyperplanes: bit p = sign of
    * v·w_p. Returns a bucket string of '0'/'1'.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    concat_ws(
      "",
      planes.map { w =>
        // typedlit: ONE ArrayType literal per plane — array(lit,...)
        // would be a CreateArray of `dim` Literal nodes, and at 16
        // tables × 4 planes × 64 dims the analyzer walks a 4096-node
        // tree on every instantiation (measured as multi-second
        // planning overhead on q31)
        when(dot(vec, typedlit(w)) >= 0, lit("1")).otherwise(lit("0"))
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

  /** IVF index build: assign every corpus vector to its nearest of
    * `nlist` centroids. Returns the corpus columns plus a `cell` id —
    * a persistable index table (write it once at ingest, like the
    * dedup band index; re-assignment only when centroids move).
    * Centroids are a deterministic corpus sample (the `nlist` smallest
    * seeded id-hashes — TakeOrderedAndProject, no global sort), not
    * k-means: iterations sharpen cell BALANCE but change neither the
    * plan shape nor the probe cost model, and determinism is what lets
    * the recall contract be pinned by test. The assignment is one
    * broadcast join (nlist rows) + per-row argmax — the corpus never
    * shuffles to build the index.
    */
  /** Deterministic centroid sample: the `nlist` smallest seeded
    * id-hashes, unit-normalized. Columns (cent_id, centv).
    */
  private[graft] def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long
  ): DataFrame =
    corpus
      .select(col(idCol).as("cent_id"), normalized(col(vecCol)).as("centv"),
        xxhash64(col(idCol), lit(seed)).as("hk"))
      .orderBy(col("hk"))
      .limit(nlist)
      .drop("hk")

  /** Lloyd-refined centroids: start from the deterministic sample and
    * run a FIXED number of k-means iterations (fixed seed, fixed
    * count — no convergence test, so index builds stay reproducible
    * and the recall contract testable). Each iteration is one
    * broadcast-join assignment plus one per-cell mean aggregation —
    * the corpus itself never shuffles; only (cell, pos, x) partial
    * sums do. Empty cells keep their previous centroid. On CLUSTERED
    * corpora (the real-embedding case) refinement pulls centroids
    * onto cluster modes, sharpening cell balance and recall at a
    * given nprobe; on uniform corpora it changes little — which is
    * why it is an option, not the default (q57/q61's oracle operating
    * point nprobe = nlist is exact under any centroids).
    */
  private[graft] def ivfCentroidsRefined(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long,
      iters: Int
  ): DataFrame = {
    val normed = Materialize(
      Dedup
        .computeParallel(corpus)
        .select(col(idCol).as("id"), normalized(col(vecCol)).as("vn")))
    var cent = ivfCentroids(corpus, idCol, vecCol, nlist, seed)
    for (_ <- 0 until iters) {
      val assigned = assignCells(normed, "id", "vn", cent)
      val means = assigned
        .select(col("cell"), posexplode(col("vn")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")
          ).as("mv"))
        .select(col("cell").as("cent_id"), normalized(col("mv")).as("centv"))
      cent = Materialize(
        cent
          .as("p")
          .join(means.as("n"), col("p.cent_id") === col("n.cent_id"), "left")
          .select(
            col("p.cent_id").as("cent_id"),
            coalesce(col("n.centv"), col("p.centv")).as("centv")))
    }
    cent
  }

  /** Sample or refined centroids per `kmeansIters`. */
  private[graft] def centroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long,
      kmeansIters: Int
  ): DataFrame =
    if (kmeansIters <= 0) ivfCentroids(corpus, idCol, vecCol, nlist, seed)
    else ivfCentroidsRefined(corpus, idCol, vecCol, nlist, seed, kmeansIters)

  /** Assign every row of `df` to its nearest centroid from an EXISTING
    * centroid table (cent_id, centv) — the incremental-ingest half of
    * the IVF build: a streaming batch assigns against the persisted
    * centroids (one broadcast join, no shuffle) and appends its rows
    * to the cell index.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("cent_cos").desc, col("cent_id"))
    Dedup
      .computeParallel(df)
      // normalize BEFORE the centroid join: once per row, not once per
      // (row × centroid) — the join multiplies every post-join expression
      .withColumn("__nv", normalized(col(vecCol)))
      .join(broadcast(cent))
      .withColumn("cent_cos", dot(col("__nv"), col("centv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(df.columns.map(col) :+ col("cent_id").as("cell"): _*)
  }

  def ivfCells(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      seed: Long = 42L,
      kmeansIters: Int = 0
  ): DataFrame =
    assignCells(corpus, idCol, vecCol, centroids(corpus, idCol, vecCol, nlist, seed, kmeansIters))

  /** IVF-Flat approximate top-k — the centroid-partitioned ANN scale
    * path: each query scores ONLY the vectors in its `nprobe` nearest
    * cells, so the scanned fraction is ≈ nprobe/nlist of the corpus
    * instead of 1.0 (brute force) — and unlike bucket LSH the scanned
    * volume is directly tunable. Probe = one equi-join of the
    * (broadcast) query-cell pairs against the cell-partitioned index:
    * at 100 TB the index is the persisted [[ivfCells]] table
    * partitioned BY cell, so a probe reads nprobe partitions per query
    * batch and nothing else.
    *
    * Recall rises monotonically with nprobe, reaching exact brute
    * force at nprobe = nlist — that endpoint is what carries q57's
    * brute-force SQL oracle (it exercises the full assignment +
    * cell-join + rank machinery with zero approximation), while the
    * sub-unit operating points' recall is pinned per-sf in DedupSpec.
    * On THESE corpora (near-uniform synthetic vectors) recall at
    * nprobe/nlist = 1/2 is only ~0.9: uniform data is IVF's worst
    * case, since centroid proximity then says little about neighbor
    * location. Real embedding corpora are clustered — the regime where
    * IVF earns its keep at nprobe/nlist ≈ 1-5% — and when they are
    * not, [[lshTopKMultiTable]] (q31) is the engine's
    * provably-near-exact alternative.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 8,
      seed: Long = 42L,
      kmeansIters: Int = 0
  ): DataFrame = {
    val cent = centroids(corpus, idCol, vecCol, nlist, seed, kmeansIters)
    val cells = assignCells(corpus, idCol, vecCol, cent)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    ivfProbe(cells, cent, queries, idCol, vecCol, k, nprobe)
  }

  /** Metadata-filtered IVF top-k — [[ivfTopK]] with the
    * [[bruteForceTopKFiltered]] constraint: neighbors must EQUAL the
    * query on every `matchCols` column. The filter is applied inside
    * the probe join (the cell index carries the metadata columns), so
    * non-matching rows are dropped before scoring — within each probed
    * cell the work shrinks by the filter's selectivity. At
    * nprobe = nlist this is EXACTLY the filtered brute force (the q121
    * oracle endpoint, asserted in DedupSpec); at sub-unit nprobe the
    * usual filtered-ANN caveat applies — a highly selective filter
    * thins the probed cells and can starve k, the standard mitigations
    * being a larger nprobe or, when one metadata column dominates
    * (lang, tenant), a persisted index `partitionBy(meta, cell)` so
    * BOTH the filter and the probe become partition pruning
    * ([[ivfIndexWrite]]'s layout generalizes directly).
    */
  def ivfTopKFiltered(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      matchCols: Seq[String],
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 8,
      seed: Long = 42L,
      kmeansIters: Int = 0
  ): DataFrame = {
    val cent = centroids(corpus, idCol, vecCol, nlist, seed, kmeansIters)
    val cells = assignCells(corpus, idCol, vecCol, cent)
      .select(
        (col(idCol).as("neighbor_id") +: col(vecCol).as("cv") +: col("cell") +:
          matchCols.map(col)): _*)
    val qCells = probeCells(queries, cent, idCol, vecCol, nprobe)
    // probeCells keeps only (query_id, qv, cell) — rejoin the query
    // metadata through the (small, broadcast) query set
    val qMeta = queries.select(
      (col(idCol).as("query_id") +: matchCols.map(c => col(c).as(s"__qm_$c"))): _*)
    val probes = qCells.join(broadcast(qMeta), Seq("query_id"))
    val cond = matchCols
      .map(m => col(m) === col(s"__qm_$m"))
      .foldLeft(col("cell") === col("__pcell") && col("query_id") =!= col("neighbor_id"))(_ && _)
    val scored = cells
      .join(broadcast(probes.withColumnRenamed("cell", "__pcell")), cond)
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** The shared IVF probe: assign each query to its `nprobe` nearest
    * centroids (broadcast join, per-row top-nprobe), equi-join the
    * (cell, query) pairs against the cell index, score exactly, rank.
    */
  /** Assign each query to its `nprobe` nearest centroids (broadcast
    * join, per-row top-nprobe). Output (query_id, qv, cell) — the
    * probe list both [[ivfTopK]]/[[ivfTopKIndexed]] and the streaming
    * ingest dedup join against the cell index.
    */
  private[graft] def probeCells(
      queries: DataFrame,
      cent: DataFrame,
      idCol: String,
      vecCol: String,
      nprobe: Int
  ): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cent_cos").desc, col("cent_id"))
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), normalized(col(vecCol)).as("__nv"))
      .join(broadcast(cent))
      .withColumn("cent_cos", dot(col("__nv"), col("centv")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
  }

  private def ivfProbe(
      cells: DataFrame,
      cent: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val qCells = probeCells(queries, cent, idCol, vecCol, nprobe)
    val scored = cells
      .join(broadcast(qCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** Persist the IVF index: `dir/centroids` (nlist rows) and
    * `dir/cells` — the full corpus with its cell assignment, written
    * `partitionBy("cell")` so a probe of `nprobe` cells is a
    * partition-pruned read of nprobe directories, never a corpus scan.
    * Build is one corpus pass (broadcast-join assignment, no shuffle);
    * rebuild only when centroids move. The streaming-ingest shape is
    * the same as the dedup band index: new batches append their own
    * `cells` rows under their assigned partitions.
    */
  def ivfIndexWrite(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 16,
      seed: Long = 42L,
      kmeansIters: Int = 0,
      metaCols: Seq[String] = Seq.empty
  ): Unit = {
    val cent = Materialize(centroids(corpus, idCol, vecCol, nlist, seed, kmeansIters))
    cent.write.mode("overwrite").parquet(s"$dir/centroids")
    // metaCols first, cell last: a dominant metadata column (lang,
    // tenant) becomes the OUTER partition level, so a filtered probe
    // prunes to its meta dirs before touching cell dirs
    assignCells(corpus, idCol, vecCol, cent)
      .write.mode("overwrite").partitionBy(metaCols :+ "cell": _*).parquet(s"$dir/cells")
  }

  /** Per-row vector-quality predicate — the q170 gate as a reusable
    * Column: non-null, expected dimension, every element finite, and a
    * non-zero norm (any non-zero element ⇔ positive norm for finite
    * vectors — no norm computation needed). The ingest-side guard that
    * keeps one broken encoder batch from poisoning an ANN index; used
    * by [[graft.streaming.VecStreams]]' quarantine path.
    */
  def vectorOk(vec: Column, dim: Int): Column = {
    val finite = (x: Column) =>
      !(isnan(x.cast("double")) || abs(x.cast("double")) === lit(Double.PositiveInfinity))
    vec.isNotNull && size(vec) === dim &&
      forall(vec, finite) &&
      exists(vec, x => x.cast("double") =!= 0.0)
  }

  /** Per-cell occupancy of a persisted IVF index: vector count and load
    * ratio (count / mean) per cell — the probe-latency skew a drifted
    * ingest accumulates (steady appends assign against the SEED's
    * centroids; if the arrival distribution moved, a few cells soak up
    * the mass and every probe touching them pays their whole weight).
    * The readout an operator checks before deciding to
    * [[ivfRebalance]]. One aggregation; output is cells-sized.
    */
  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy()
    spark.read
      .parquet(s"$dir/cells")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"))
      .select(col("cell"), col("n_vectors"),
        (col("n_vectors").cast("double") * count(lit(1)).over(w)
          / sum(col("n_vectors")).over(w)).as("load_ratio"))
      .orderBy(col("cell"))
  }

  /** Rebalance a persisted IVF index IN PLACE: retrain the centroids on
    * the currently indexed vectors (k-means refinement over the
    * deterministic seed pick) and rewrite every cell assignment — the
    * OPTIMIZE verb of the vector index, run when [[ivfIndexStats]]
    * shows drifted-ingest skew. The indexed rows are materialized
    * (lineage cut) before the overwrite so the rewrite never reads the
    * files it is replacing. Answers are invariant: a full probe
    * (nprobe = nlist) equals brute force before AND after — rebalance
    * moves cell BOUNDARIES, never the vectors (pinned in CorpusSpec).
    */
  def ivfRebalance(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      seed: Long = 42L,
      kmeansIters: Int = 2,
      metaCols: Seq[String] = Seq.empty
  ): Unit = {
    val corpus = Materialize(
      spark.read.parquet(s"$dir/cells").drop("cell", "batch_id"))
    ivfIndexWrite(corpus, idCol, vecCol, dir, nlist, seed, kmeansIters, metaCols)
  }

  /** IVF top-k against a PERSISTED index ([[ivfIndexWrite]]) — the
    * repeated-use path: signing the corpus once at ingest and probing
    * the cell-partitioned parquet per query batch. The broadcast
    * query-cell join gives Spark a dynamic-partition-pruning /
    * runtime-filter opportunity on the `cell` partition column; at
    * worst a probe reads every cell file ONCE, at best only the nprobe
    * directories the batch touches. Same contract as [[ivfTopK]]:
    * nprobe = nlist reproduces exact brute force.
    */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      k: Int,
      nprobe: Int = 8
  ): DataFrame = {
    val cent = spark.read.parquet(s"$dir/centroids")
    val cells = spark.read
      .parquet(s"$dir/cells")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    ivfProbe(cells, cent, queries, idCol, vecCol, k, nprobe)
  }

  /** Filtered probe of a PERSISTED index written with
    * `metaCols` partitioning ([[ivfIndexWrite]]): the query batch's
    * needed (meta…, cell) pairs are computed first (|queries|·nprobe
    * rows — bounded by definition of a query batch), then pushed as a
    * STATIC disjunction of partition-column equalities, so the scan
    * plans with PartitionFilters and reads ONLY the matching
    * meta/cell directories — both the metadata filter and the probe
    * are partition pruning, nothing else of the corpus is listed.
    * Above `maxStaticPairs` the disjunction would bloat the plan, so
    * the probe falls back to the dynamic join (same result, prunes at
    * execution via the broadcast join instead of at planning).
    * Result ≡ [[ivfTopKFiltered]] at the same parameters
    * (CorpusSpec), hence ≡ the q121 brute force at nprobe = nlist.
    */
  def ivfTopKIndexedFiltered(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      matchCols: Seq[String],
      dir: String,
      k: Int,
      nprobe: Int = 8,
      maxStaticPairs: Int = 4096
  ): DataFrame = {
    val cent   = spark.read.parquet(s"$dir/centroids")
    val qCells = probeCells(queries, cent, idCol, vecCol, nprobe)
    val qMeta = queries.select(
      (col(idCol).as("query_id") +: matchCols.map(c => col(c).as(s"__qm_$c"))): _*)
    val probes = qCells.join(broadcast(qMeta), Seq("query_id"))
    // the static pushdown set: distinct (meta…, cell) the batch needs
    val needed = probes
      .select((matchCols.map(c => col(s"__qm_$c")) :+ col("cell")): _*)
      .distinct().collect()
    val raw = spark.read.parquet(s"$dir/cells")
    val pruned =
      if (needed.length <= maxStaticPairs && needed.nonEmpty) {
        val dis = needed.map { r =>
          (matchCols.zipWithIndex.map { case (m, i) => col(m) === lit(r.get(i)) } :+
            (col("cell") === lit(r.get(matchCols.length)))).reduce(_ && _)
        }.reduce(_ || _)
        raw.filter(dis)
      } else raw
    val cells = pruned.select(
      (col(idCol).as("neighbor_id") +: col(vecCol).as("cv") +: col("cell") +:
        matchCols.map(col)): _*)
    val cond = matchCols
      .map(m => col(m) === col(s"__qm_$m"))
      .foldLeft(col("cell") === col("__pcell") && col("query_id") =!= col("neighbor_id"))(_ && _)
    val scored = cells
      .join(broadcast(probes.withColumnRenamed("cell", "__pcell")), cond)
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** OR-amplified multi-table LSH top-k: `tables` independent tables of
    * `planesPerTable` hyperplanes; each query probes its own bucket and
    * every 1-bit-flip neighbor in EVERY table; the candidate union is
    * deduplicated, then scored exactly (one cosine per candidate) and
    * ranked. Per-neighbor miss probability is (1 − P_table)^L where
    * P_table = Σ_{i≤1} C(r,i) p^(r−i)(1−p)^i and p = 1 − θ/π — driving
    * it below 1/(k·|queries|) makes the output EQUAL to the exact
    * brute-force top-k with overwhelming (and, at a fixed seed,
    * verified-by-test) probability, which is what gives this operator a
    * brute-force SQL oracle. The corpus is scanned once to bucket and
    * once to score candidates; queries stay broadcast throughout.
    */
  def lshTopKMultiTable(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planesPerTable: Int = 4,
      tables: Int = 16,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val planesFlat = LshExpression.flattenPlanes(
      (0 until tables).map(t => hyperplanes(planesPerTable, dim, seed + t)))
    val c = Dedup
      .computeParallel(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // one native expression per side (graft.plans.LshTableBuckets):
    // all 16 tables' buckets in a single vector pass, vs the old
    // 16×4 DotProduct-node tree whose 4096-literal analysis/codegen
    // dominated the query at small data and was per-row cost at large
    val cBucketed = c.select(
      col("neighbor_id"),
      explode(LshExpression.lshBuckets(col("cv"), planesFlat, tables, planesPerTable, dim))
        .as("bucket")
    )
    val qProbes = q.select(
      col("query_id"),
      explode(LshExpression.lshProbeBuckets(col("qv"), planesFlat, tables, planesPerTable, dim))
        .as("bucket")
    )
    val candidates = cBucketed
      .join(broadcast(qProbes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }
}
