package graft

import graft.operators.{Dedup, Graph, Pq, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication + similarity-search queries over documents and
  * embeddings — the scale-critical training-data operators.
  */
object QueriesDedup {

  /** Exact n-gram Jaccard near-dup pairs (3-gram shingles, τ=0.5).
    * The exact form joins only on co-occurring shingles — already far
    * from O(n²) — and is the oracle for the LSH form.
    */
  def q25_ngram_jaccard_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** MinHash+LSH near-dup pairs (k=64, 32 bands × 2 rows), exact-
    * verified. Banding recall is ≈ 1-1e-4 for a pair sitting exactly
    * at τ=0.5 and ≈ 1 at the planted near-dup level (jaccard ≥ 0.98);
    * precision is exact — so the exact-Jaccard SQL serves as its
    * oracle.
    */
  def q26_minhash_lsh_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, k = 64, bands = 32, threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** Per-document 64-bit SimHash signature (portable sha256-derived
    * bit votes — reproducible in any engine, hence oracle-able).
    */
  def q27_simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .shingleSets(Tables.documents(spark, dir), "doc_id", "text", n = 3)
      .filter(size($"shingle_set") > 0)
      .select($"doc_id", Dedup.simhash64($"shingle_set").as("sig"))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup pairs, hamming ≤ 3, via the exact chunk-bucket
    * pigeonhole join (4 chunks of 16 bits — no recall loss).
    */
  def q28_simhash_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .simhashPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, maxHamming = 3)
      .orderBy($"id_a", $"id_b")
  }

  /** Embedding-cosine near-dup pairs (τ=0.45), exact, via the block-grid
    * equi-join ([[Similarity.cosinePairsBlocked]]) — no
    * BroadcastNestedLoopJoin anywhere in the plan, so the same query
    * distributes on a real cluster. IDs only — cosine VALUES are not
    * emitted because engines differ in float accumulation; membership
    * is stable (observed margins ≫ float error).
    */
  def q29_embedding_cosine_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity
      .cosinePairs(Tables.embeddings(spark, dir), "vec_id", "embedding", threshold = 0.45)
      .orderBy($"id_a", $"id_b")
  }

  /** Near-dup CLUSTERS: connected components over the exact-Jaccard
    * pair graph (min-label propagation, one shuffle join per round).
    * Pairs alone don't dedup a corpus — the transitive closure does.
    * Output (doc_id, cluster_id) for every doc in ≥ 1 pair; cluster_id
    * = min doc_id in the component. Oracle: recursive-CTE transitive
    * closure over the same pair SQL.
    */
  def q38_dedup_clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
    Graph
      .connectedComponents(pairs, "id_a", "id_b")
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** Canonical-document selection: per near-dup cluster keep the doc
    * with the greatest n_chars (ties → smallest doc_id) — the "keep
    * one, drop the rest" step that turns clusters into a dedup'd
    * corpus. Clusters come from the collapse-first composition
    * ([[Graph.nearDupClusters]]) — byte-identical closure to the
    * direct form (q47 ≡ q38, GraphSpec + shared oracle) at a fraction
    * of the candidate volume on dup-heavy corpora (SCALE.md), which is
    * the right default for the step whose POINT is that duplicates
    * abound. Output (cluster_id, kept_doc_id).
    */
  def q39_dedup_keep_one(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs  = Tables.documents(spark, dir)
    val comps = Graph
      .nearDupClusters(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select($"id", $"cluster_id".as("component"))
    Graph
      .keepOnePerComponent(comps, docs, "doc_id", "n_chars")
      .select($"component".as("cluster_id"), $"kept_id".as("kept_doc_id"))
      .orderBy($"cluster_id")
  }

  /** Incremental ingest dedup: docs with doc_id % 10 == 0 play the
    * "newly arrived batch", the rest the existing corpus; output all
    * near-dup pairs touching the batch ([[Dedup.incrementalNearDupPairs]]
    * — only the batch probes the band index). Oracle: the full exact
    * pair SQL filtered to pairs with ≥ 1 batch side.
    */
  def q48_incremental_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs   = Tables.documents(spark, dir)
    val batch  = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    Dedup
      .incrementalNearDupPairs(corpus, batch, "doc_id", "text",
        n = 3, k = 64, bands = 32, threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** The composed dedup pipeline ([[Graph.nearDupClusters]]): exact-dup
    * collapse → near-dup pairs on representatives → components over
    * (near-dup ∪ identity) edges. Provably the same output as
    * [[q38_dedup_clusters]] (GraphSpec asserts it on a dup-heavy
    * corpus), so it shares q38's recursive-CTE oracle — but its
    * candidate volume stays linear when duplicates abound (SCALE.md).
    */
  def q47_dedup_pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Graph
      .nearDupClusters(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
      .select($"id".as("doc_id"), $"cluster_id")
      .orderBy($"doc_id")
  }

  /** Brute-force cosine top-5 for the first 10 vectors as queries —
    * the ANN baseline. Broadcast queries, single corpus scan.
    */
  def q30_ann_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
      .orderBy($"query_id", $"rank")
  }

  /** Metadata-FILTERED vector search ([[Similarity.bruteForceTopKFiltered]]):
    * top-5 by cosine among neighbors sharing the query's `label` — the
    * retrieval-with-constraints shape (same language / tenant / shard).
    * The label-equality predicate rides the broadcast-join condition,
    * pruning candidates before any cosine is computed. The IVF twin
    * ([[Similarity.ivfTopKFiltered]]) is spec-pinned ≡ this exact form
    * at nprobe = nlist (DedupSpec), the same endpoint contract as
    * q57/q30.
    */
  def q121_ann_filtered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .bruteForceTopKFiltered(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
        matchCols = Seq("label"), k = 5)
      .orderBy($"query_id", $"rank")
  }

  /** The filtered-IVF machinery under the oracle gate — the q57 trick
    * applied to [[Similarity.ivfTopKFiltered]]: at nprobe = nlist the
    * probe scans every cell, so the result is EXACTLY the filtered
    * brute force and q121's SQL is its oracle, while the full
    * assignment + metadata-filtered cell join + rank pipeline runs
    * with zero approximation. Sub-unit operating points are pinned in
    * DedupSpec.
    */
  def q123_ann_filtered_ivf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .ivfTopKFiltered(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
        matchCols = Seq("label"), k = 5, nlist = 16, nprobe = 16)
      .orderBy($"query_id", $"rank")
  }

  /** The PERSISTED filtered index under the oracle gate — the q61
    * trick for [[Similarity.ivfTopKIndexedFiltered]]: the
    * partitionBy(label, cell) index builds once (Scratch.once,
    * write-at-ingest), the probe pushes the batch's (label, cell)
    * pairs as static PartitionFilters, and at nprobe = nlist the
    * result ≡ the filtered brute force, so q121's SQL gates the whole
    * persisted path end-to-end.
    */
  def q124_ann_filtered_indexed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val idx = Scratch.dir(spark, "q124_fivf", dir)
    Scratch.once(idx) {
      Similarity.ivfIndexWrite(emb, "vec_id", "embedding", idx, nlist = 16,
        metaCols = Seq("label"))
    }
    Similarity
      .ivfTopKIndexedFiltered(spark, emb.filter($"vec_id" < 10), "vec_id", "embedding",
        Seq("label"), idx, k = 5, nprobe = 16)
      .orderBy($"query_id", $"rank")
  }

  /** Multi-table multi-probe LSH top-5 (16 tables × 4 hyperplanes,
    * 1-bit probes) — the candidate union is scored exactly, and at
    * these parameters the per-neighbor miss probability is ≪ 1e-5, so
    * the output EQUALS the exact brute-force top-k on this corpus
    * (seed-pinned, asserted in DedupSpec at every local sf). That
    * equality is the query's contract and gives it the same brute-force
    * SQL oracle as [[q30_ann_topk]] — the LSH path is the one that must
    * reproduce it.
    */
  def q31_ann_lsh_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .lshTopKMultiTable(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
      .orderBy($"query_id", $"rank")
  }

  /** IVF-Flat ANN top-5 ([[Similarity.ivfTopK]]) at nprobe = nlist:
    * the EXACT endpoint of the IVF recall curve, which exercises the
    * full index machinery (deterministic centroid sample, cell
    * assignment, cell-partitioned probe join, rank) with zero
    * approximation — and therefore shares q30's brute-force SQL
    * oracle. The pruning operating points (nprobe < nlist) are pinned
    * per-sf by DedupSpec's recall-curve test; on clustered real-world
    * embeddings they are where IVF wins, on this near-uniform
    * synthetic corpus q31's multi-table LSH is the near-exact
    * sub-linear path.
    */
  def q57_ann_ivf_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Similarity
      .ivfTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 16)
      .orderBy($"query_id", $"rank")
  }

  /** Star-contraction components ([[Graph.connectedComponentsStar]],
    * Kiveris et al. SoCC'14) over the SAME near-dup edge set as
    * [[q38_dedup_clusters]] — the log-round, diameter-independent
    * algorithm under the same recursive-CTE DuckDB oracle, so BOTH
    * component algorithms are oracle-checked, not just spec-equal.
    */
  def q53_star_clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
    Graph
      .connectedComponentsStar(pairs, "id_a", "id_b")
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** Degree-capped closure under the oracle gate
    * ([[Graph.capDegree]], round 16): the q38 near-dup pipeline with
    * each node bounded to its top-2 edges by SHARED-SHINGLE COUNT
    * before closure — the SemDeDup-style guard that keeps closure
    * edge mass ≤ n·k when a fixed threshold's tail (∝ n² on iid data)
    * or a boilerplate hub (degree ∝ n) would blow it up. Ranking by
    * `n_shared` (an exact integer) with the neighbor-id tie-break
    * makes the cap cross-engine deterministic — no float-rank
    * boundary — so the oracle replays cap + closure verbatim:
    * symmetrize, row_number per node over (n_shared DESC, v), keep
    * r ≤ k on EITHER side, recursive min-label closure. k=2 keeps any
    * clique connected (every node keeps its two smallest-id peers at
    * tied weight, and all reach the minimum), so on the fixture the
    * clusters equal q38's — which is exactly the operator's contract:
    * capping bounds COST, not the clusters a tight family forms.
    */
  def q214_capped_clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
    Graph
      .componentsAuto(Graph.capDegree(pairs, "id_a", "id_b", "n_shared", k = 2), "id_a", "id_b")
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** The APPROXIMATE semantic near-dup path under the oracle gate:
    * [[Similarity.cosinePairsBucketed]] (OR-amplified hyperplane LSH,
    * candidates exact-verified) over a corpus with planted
    * direction-preserving duplicates — every vec_id ≡ 0 (mod 50) gets
    * a half-scale copy at id+1000000. Scaling preserves the SIGN of
    * every hyperplane dot, so a copy lands in IDENTICAL buckets in
    * every table and LSH recall for the planted pairs is PROVABLY 1
    * (not probabilistically ≈1); precision is 1 by the exact
    * verification dot. The output therefore EQUALS the exact all-pairs
    * answer — which is what lets an approximate operator carry an
    * exact DuckDB oracle. (No organic pair reaches cosine 0.7 on this
    * corpus — measured; the planted pairs sit at ~1.0, far from the
    * τ=0.8 boundary.)
    *
    * Runs the SCALED form ([[Similarity.cosinePairsBucketedScaled]]):
    * bucket count grows with the corpus (constant expected occupancy)
    * so random-collision candidates stay ~linear instead of n²/2^b —
    * the full-slate 10× rung measured the fixed plan at 16.8× wall for
    * 10× data, all of it candidate verification. A direction-preserved
    * duplicate lands in its original's bucket in EVERY table at ANY
    * plane count, so the recall-1 argument — and the oracle — are
    * plan-independent.
    */
  def q79_semantic_dedup_approx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val dups = emb
      .filter($"vec_id" % 50 === 0)
      .select(
        ($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(dups)
    Similarity
      .cosinePairsBucketedScaled(corpus, "vec_id", "embedding", threshold = 0.8)
      .orderBy($"id_a", $"id_b")
  }

  /** Product-quantization ANN top-10 ([[graft.operators.Pq]]) — the
    * compression rung of the ANN ladder: the corpus scan reads 8
    * centroid ids per row instead of 64 floats (32×), and queries
    * score via ADC against the codes. Ranking by ADC score IS the
    * exact top-k over the snapped (reconstructed) corpus — and because
    * the codebook here is the deterministic sha256-rank sample
    * (kmeansIters = 0, [[Pq.trainSampled]]), the snapped corpus is
    * reproducible in plain SQL: the DuckDB oracle rebuilds codebook,
    * codes, and snapped vectors from `embeddings` alone and
    * brute-forces the same top-10. Lloyd-refined codebooks
    * (kmeansIters > 0) sharpen quantization error and are pinned by
    * PqSpec, same split as IVF's q57 vs its spec-pinned recall curve.
    */
  /** The q86/q87 codebook, trained once per (session, dataset) — the
    * codebook is index metadata built at ingest (the q54/q61/q73/q80
    * fixture discipline); training is deterministic, so the memo is
    * value-transparent.
    */
  private val cbCache = scala.collection.concurrent.TrieMap.empty[String, Pq.Codebook]
  private def pqCodebook(spark: SparkSession, dir: String): Pq.Codebook =
    cbCache.getOrElseUpdate(
      dir + "_" + spark.sparkContext.applicationId,
      Pq.train(Tables.embeddings(spark, dir), "vec_id", "embedding",
        m = 8, ksub = 16, dsub = 8, seed = 42L))

  def q86_ann_pq_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cb    = pqCodebook(spark, dir)
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    Pq.topK(codes, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, cb)
      .orderBy($"query_id", $"rank")
  }

  /** IVF-PQ composite ANN ([[Pq.ivfPqTopK]]) at nprobe = nlist — the
    * exact endpoint where the probed cells cover the corpus exactly
    * once, so the ranking is identical to q86's flat ADC scan and the
    * same independent DuckDB oracle applies, while the query exercises
    * the full composite machinery: centroid assignment, per-cell code
    * storage, probe join, ADC rank. The pruned operating points
    * (nprobe < nlist: read nprobe/nlist of the corpus at 1/32nd the
    * bytes) are pinned by PqSpec, mirroring q57's IVF recall split.
    */
  def q87_ann_ivfpq_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cb  = pqCodebook(spark, dir)
    Pq.ivfPqTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, cb,
      nlist = 16, nprobe = 16)
      .orderBy($"query_id", $"rank")
  }

  /** IVF-PQ at a genuinely PRUNED operating point (nprobe = 4 of
    * nlist = 16 — each query scans ~1/4 of the cells) under an exact
    * oracle, via q79's planted-copies construction: every query vector
    * gets ten half-scale copies at known ids. Halving is a power-of-two
    * scale, so each copy's NORMALIZED vector is bit-identical to the
    * query's — identical cell assignment (the copies live exactly where
    * the query probes first), identical PQ codes, identical ADC score.
    * The ten copies therefore fill the top-10 at ANY nprobe ≥ 1, ranked
    * among themselves by the deterministic id tie-break — so the exact
    * expected output is enumerable in closed form, which is what lets a
    * pruned approximate index carry a value-exact oracle. (That no
    * organic vector out-scores a self-copy under ADC is an empirical
    * margin on this corpus — self-score ≈ 1 vs organic cosine < 0.7
    * with quantization error far smaller than the gap — asserted per-sf
    * in PqSpec alongside the pruning-fraction probe.)
    */
  def q99_ann_ivfpq_pruned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cb  = pqCodebook(spark, dir)
    val copies = emb
      .filter($"vec_id" < 8)
      .select($"vec_id", $"embedding", explode(sequence(lit(0), lit(9))).as("i"))
      .select(
        ($"vec_id" * 100 + $"i" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)
    Pq.ivfPqTopK(corpus, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, cb,
      nlist = 16, nprobe = 4)
      .orderBy($"query_id", $"rank")
  }

  /** Johnson–Lindenstrauss random projection under a VALUE-exact
    * oracle — and it is the PRODUCTION path itself under the gate:
    * [[Similarity.signProjection]] (one codegen [[Similarity.dot]] per
    * output dim over [[Similarity.signMatrix]]'s deterministic ±1
    * rows; pure map work, no shuffle). The projection VALUES hash-match
    * because a dot against ±1.0 is a fixed left-to-right sequence of
    * IEEE double ops — and DuckDB's `list_inner_product` accumulates
    * exactly that way (verified bit-exact over adversarial
    * mixed-magnitude trials), so both engines emit the identical
    * doubles with no decimal scaffolding. (A first cut summed
    * DECIMAL(18,12)-cast terms instead and lost 16/8000 rows to
    * double→decimal TIE-rounding divergence — Spark rounds the
    * shortest decimal repr, DuckDB the full binary expansion; the
    * fixed-order float path is the one that is portable.) JL
    * pairwise-distance contract pinned in DedupSpec. Long-form output
    * (vec_id, out_dim, proj).
    */
  def q89_random_projection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        posexplode(Similarity.signProjection($"embedding", dOut = 16, dim = 64))
          .as(Seq("out_dim", "proj")))
      .orderBy($"vec_id", $"out_dim")
  }

  /** Chunk→document embedding mean pooling under a VALUE-bit-exact
    * oracle ([[Similarity.meanPoolOrdered]]): every 50th-class of
    * vec_ids plays a document whose chunks pool into one vector.
    * Determinism comes from fixing the ENTIRE op sequence — chunks
    * sorted by id, per-position left-to-right double sum, one final
    * divide — which DuckDB replays exactly (ordered `list(... ORDER
    * BY)` + `list_sum`, verified left-to-right like q89's inner
    * product). The order-free streaming-partial form
    * ([[Similarity.meanPool]]) is the production default; DedupSpec
    * pins the two within float-noise of each other and q90 pins the
    * ordered form cross-engine.
    */
  def q90_mean_pooling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity
      .meanPoolOrdered(
        Tables.embeddings(spark, dir).withColumn("doc", $"vec_id" % 50),
        "doc", "vec_id", "embedding", dim = 64)
      .select($"grp".as("doc"), $"pos", $"pooled")
      .orderBy($"doc", $"pos")
  }

  /** Similarity-threshold CALIBRATION: the histogram of pairwise
    * n-gram Jaccard similarities over co-occurring pairs — the
    * distribution a team inspects to CHOOSE τ before a dedup run
    * (a bimodal histogram separates near-dups from background overlap;
    * τ goes in the valley). Only pairs sharing ≥ 1 shingle enumerate
    * (the q25 co-occurrence join — the zero bin is the uncounted
    * complement, which is what makes the histogram computable at all:
    * all-pairs is n² but co-occurring pairs are collision-bounded).
    * Bin = floor(20·jaccard) (bin 20 = exact duplicates): jaccard is
    * one integer division, so the binning arithmetic is the same IEEE
    * sequence in every engine — value-exact oracle, no boundary
    * hazard. At 100 TB, run it over a hash-sampled doc subset (q59's
    * sampler) — the distribution converges long before the corpus
    * does.
    */
  def q91_similarity_histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.0)
      .select(floor($"jaccard" * 20).cast("int").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"bin")
  }

  /** Incremental dedup against a PERSISTED band index — the exact
    * daily-ingest lifecycle: sign the corpus once, write the index
    * tables ([[Dedup.nearDupSets]] + [[Dedup.nearDupBandRows]]) to
    * parquet, then probe them with only the batch signed fresh
    * ([[Dedup.incrementalNearDupPairsIndexed]]). Same split and same
    * filtered-pair oracle as [[q48_incremental_dedup]]; what this adds
    * is the parquet round-trip of the index schema — the shape
    * [[graft.streaming.DocStreams]] runs per micro-batch.
    */
  def q54_indexed_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs   = Tables.documents(spark, dir)
    val batch  = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val tmp    = Scratch.dir(spark, "q54_index", dir)
    // corpus index built ONCE per session (write-at-ingest half);
    // every call signs only the batch and probes the persisted index
    Scratch.once(tmp) {
      val corpusSets =
        graft.operators.Materialize(Dedup.nearDupSets(corpus, "doc_id", "text", n = 3))
      corpusSets.write.mode("overwrite").parquet(s"$tmp/sets")
      Dedup
        .nearDupBandRows(corpusSets, "doc_id", k = 64, bands = 32)
        .write.mode("overwrite").parquet(s"$tmp/bands")
    }
    val batchSets = graft.operators.Materialize(Dedup.nearDupSets(batch, "doc_id", "text", n = 3))
    Dedup
      .incrementalNearDupPairsIndexed(
        spark.read.parquet(s"$tmp/sets"),
        spark.read.parquet(s"$tmp/bands"),
        batchSets,
        Dedup.nearDupBandRows(batchSets, "doc_id", k = 64, bands = 32),
        "doc_id",
        threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** The persisted near-dup cluster table ((doc_id, cluster_id), the
    * q38/q47 closure), built ONCE per session and read back — the
    * consumers below (q164 mixture shift, q165 size histogram) are
    * post-dedup reporting: in a real pipeline the dedup wave already
    * wrote this table, and the reports only read it. Scratch.once is
    * that write-at-dedup / read-at-report split.
    */
  private[graft] def clustersOnce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Scratch.dir(spark, "neardup_clusters", dir)
    Scratch.once(p) {
      Graph
        .nearDupClusters(Tables.documents(spark, dir), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select($"id".as("doc_id"), $"cluster_id")
        .write.mode("overwrite").parquet(s"$p/clusters")
    }
    spark.read.parquet(s"$p/clusters")
  }

  /** Near-dup cluster-size histogram: how many clusters exist at each
    * size, including the singletons (docs in no pair) as size-1 rows —
    * the distribution that decides dedup POLICY (keep-one suffices for
    * long-tail pairs; a few giant families call for a per-cluster cap
    * or a boilerplate investigation). Two tiny aggregations over the
    * q38 closure plus one anti-join for the singleton count; output is
    * as small as the largest family.
    */
  def q165_cluster_size_histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clusters = clustersOnce(spark, dir)
    val hist = clusters
      .groupBy($"cluster_id").agg(count(lit(1)).as("size"))
      .groupBy($"size").agg(count(lit(1)).as("n_clusters"))
    val singles = Tables
      .documents(spark, dir)
      .join(clusters.select($"doc_id"), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("size"), $"n_clusters")
    hist
      .unionByName(singles)
      .filter($"n_clusters" > 0)
      .select($"size", $"n_clusters", ($"size" * $"n_clusters").as("n_docs"))
      .orderBy($"size")
  }

  /** Directed near-containment pairs (C(a→b) = |Sa∩Sb|/|Sa| ≥ 0.8 on
    * 3-gram shingle sets) — the asymmetric dup signal the symmetric
    * Jaccard family (q25/q26) misses: a doc embedded inside a longer
    * one scores low Jaccard but containment ≈ 1 (syndication with
    * added chrome). Same candidates-∝-shared-shingle-mass join shape
    * as q25; both directions derive from ONE undirected join.
    */
  def q179_containment_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup
      .containmentPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, threshold = 0.8)
      .select($"id_a", $"id_b", $"n_shared", $"size_a", $"containment")
      .orderBy($"id_a", $"id_b")
  }

  /** MinHash ESTIMATOR CALIBRATION: for every shared-shingle candidate
    * pair, the Jaccard a K = 16 MinHash signature estimates (matching
    * components / K) against the exact value, rolled up by exact-
    * Jaccard decile — the telemetry that justifies an LSH banding
    * choice before committing a 100 TB dedup run to it (E[est] =
    * jaccard; observed per-decile bias and absolute error make the
    * variance concrete). The signature here is deliberately PORTABLE —
    * 16 32-bit components carved from two sha-256 digests per shingle,
    * min-by-hex-string per component — so a cross-engine oracle can
    * replay it bit-for-bit (the production xxhash64 signature in
    * [[Dedup.minhashSignature]] is oracle-gated through its LSH
    * output, q26). Candidates come from the same shared-shingle
    * equi-join as q25 — candidates ∝ co-occurrence mass, never docs² —
    * and the signature build is one groupBy over shingle rows with 16
    * min() aggregates; the report is ≤ 11 rows. Co-occurrence mass
    * grows superlinearly on dup-heavy corpora (the 10× smoke measures
    * it), and CALIBRATION only needs a sample: at corpus scale run
    * this over a content-addressed doc sample (`sha2(doc_id) < p` —
    * the q59/q180 trick), which shrinks the candidate join
    * quadratically while keeping the estimator statistics unbiased
    * and the run reproducible.
    */
  def q183_minhash_calibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir)
    // ONE tokenize+shingle pass feeds both the signature build and the
    // candidate join (ngramJaccardPairsFromSets)
    val sets = graft.operators.Materialize(
      Dedup.shingleSets(docs, "doc_id", "text", n = 3))
    val ex = sets
      .select($"doc_id", explode($"shingle_set").as("s"))
      .select($"doc_id", sha2($"s", 256).as("h1"), sha2(concat(lit("x"), $"s"), 256).as("h2"))
    val comps = (0 until 16).map { i =>
      val src = if (i < 8) $"h1" else $"h2"
      min(substring(src, 1 + 8 * (i % 8), 8)).as(s"m$i")
    }
    val sig = ex.groupBy($"doc_id").agg(comps.head, comps.tail: _*)
    val matches = (0 until 16)
      .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = Dedup.ngramJaccardPairsFromSets(sets, "doc_id", threshold = 0.0)
    pairs
      .join(sig.as("a"), $"id_a" === $"a.doc_id")
      .join(sig.as("b"), $"id_b" === $"b.doc_id")
      .select($"jaccard", (matches.cast("double") / 16.0).as("est"))
      .select(floor($"jaccard" * 10).cast("long").as("decile"),
        $"jaccard".cast(DecimalType(18, 12)).as("j"),
        $"est".cast(DecimalType(18, 12)).as("e"),
        abs($"est" - $"jaccard").cast(DecimalType(18, 12)).as("ae"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum($"j").cast("double") / count(lit(1)), 6).as("mean_exact"),
        round(sum($"e").cast("double") / count(lit(1)), 6).as("mean_est"),
        round(sum($"ae").cast("double") / count(lit(1)), 6).as("mean_abs_err"))
      .orderBy($"decile")
  }

  /** SimHash CALIBRATION against exact Jaccard: mean hamming distance
    * (64-bit portable signature, [[Dedup.simhash64]]) per exact-
    * Jaccard decile over the q25 candidate pairs — the q183 companion
    * that turns "hamming ≤ 3 means near-dup" from folklore into a
    * measured curve on this corpus before a 100 TB run commits to the
    * threshold. All integer sums (hamming is exact), candidates ∝
    * shared-shingle mass, report ≤ 11 rows.
    */
  def q195_simhash_calibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir)
    val sets = graft.operators.Materialize(
      Dedup.shingleSets(docs, "doc_id", "text", n = 3))
    val sigs = sets
      .filter(size($"shingle_set") > 0)
      .select($"doc_id", Dedup.simhash64($"shingle_set").as("sig"))
    val pairs = Dedup.ngramJaccardPairsFromSets(sets, "doc_id", threshold = 0.0)
    pairs
      .join(sigs.select($"doc_id".as("id_a"), $"sig".as("sig_a")), Seq("id_a"))
      .join(sigs.select($"doc_id".as("id_b"), $"sig".as("sig_b")), Seq("id_b"))
      .select(
        floor($"jaccard" * 10).cast("long").as("decile"),
        $"jaccard".cast(DecimalType(18, 12)).as("j"),
        Dedup.hammingBits($"sig_a", $"sig_b").cast("long").as("h"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum($"j").cast("double") / count(lit(1)), 6).as("mean_exact"),
        round(sum($"h").cast("double") / count(lit(1)), 6).as("mean_hamming"))
      .orderBy($"decile")
  }

  /** Reciprocal-rank fusion (k = 60) of the exact cosine ranking and
    * the PQ ADC ranking for the audit queries — the hybrid-retrieval
    * combiner (Cormack 2009): rrf(n) = Σ_lists 1/(60 + rank), summed
    * over the lists that returned n. RRF needs only RANKS, so it
    * fuses heterogeneous scorers (dense/sparse/compressed) without
    * score normalization — which is why retrieval stacks use it. The
    * fusion join runs on the two top-k lists (k-sized per query,
    * never corpus-sized); ranks are exact integers so the fused score
    * is a two-term IEEE sum, engine-exact.
    */
  def q199_rrf_fusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10)
      .select($"query_id", $"neighbor_id", $"rank".as("r_exact"))
    val cb    = pqCodebook(spark, dir)
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    val pq = Pq
      .topK(codes, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, cb)
      .select($"query_id", $"neighbor_id", $"rank".as("r_pq"))
    val rrf = coalesce(lit(1.0) / (lit(60) + $"r_exact"), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60) + $"r_pq"), lit(0.0))
    val w = Window.partitionBy($"query_id").orderBy($"rrf".desc, $"neighbor_id")
    exact
      .join(pq, Seq("query_id", "neighbor_id"), "full")
      .select($"query_id", $"neighbor_id", rrf.as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"query_id", $"rank", $"neighbor_id", round($"rrf", 6).as("rrf"))
      .orderBy($"query_id", $"rank")
  }

  /** The LSH banding OPERATING CURVE for q26's parameters (32 bands ×
    * 2 rows): P(candidate | jaccard = j) = 1 − (1 − j²)³², tabulated
    * at 5 %-steps — the design table that justifies the banding
    * choice before a corpus-scale dedup commits to it (the S-curve
    * midpoint sits near (1/32)^(1/2) ≈ 0.18; at the q26 threshold
    * 0.5 the curve reads ≈ 0.9999). The 32nd power is an explicit
    * squaring chain (m→m²→m⁴→m⁸→m¹⁶→m³²) — pure IEEE multiplications
    * both engines evaluate identically, no pow()/exp() (whose libm
    * implementations differ across engines in the last bit). Zero
    * data touched; pairs with the MEASURED curve q183 gives on the
    * actual corpus.
    */
  def q206_lsh_curve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val j = $"pct" / 100.0
    val m = lit(1.0) - j * j
    val m2  = m * m
    val m4  = m2 * m2
    val m8  = m4 * m4
    val m16 = m8 * m8
    val m32 = m16 * m16
    spark
      .range(1, 20)
      .select(($"id" * 5).as("pct"))
      .select($"pct", round(lit(1.0) - m32, 6).as("p_candidate"))
      .orderBy($"pct")
  }

  /** PQ recall@10 against the exact ranking — the compression-quality
    * number that decides whether 32× byte compression (q86's ADC scan)
    * is safe for a retrieval workload, measured instead of assumed.
    * Both rankings already exist as oracle-gated operators (q86 ADC,
    * q30 brute force); this query joins their top-10 sets per query
    * and counts overlap — the extra cost over q86 is one exact ranking
    * of the QUERY BATCH (8 rows here), not of the corpus. At scale the
    * exact side runs on a fixed audit sample; recall on the sample
    * estimates recall on the workload.
    */
  def q192_pq_recall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cb    = pqCodebook(spark, dir)
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    val approx = Pq
      .topK(codes, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, cb)
      .select($"query_id", $"neighbor_id", lit(1L).as("hit"))
    Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10)
      .select($"query_id", $"neighbor_id")
      .join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy($"query_id")
      .agg(count(lit(1)).as("k"), sum(coalesce($"hit", lit(0L))).as("hits"))
      .select($"query_id", $"k", $"hits",
        round($"hits".cast("double") / $"k", 6).as("recall"))
      .orderBy($"query_id")
  }

  /** Near-dup graph centrality ([[Graph.pagerankInt]]): 3 PageRank
    * rounds over the q25/q38 shared-shingle pair graph on the exact
    * 10⁶ integer grid — which member of each duplicate neighborhood is
    * the most-connected (the centrality-based alternative to q39's
    * keep-longest rule, and on real link graphs the classic
    * page-quality prior). Every arithmetic step is floor division on
    * non-negative longs, so DuckDB replays the identical integers —
    * an ITERATIVE graph algorithm under a hash-exact oracle (the
    * k-means integer-grid discipline, q138).
    */
  def q213_dup_graph_centrality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup
      .ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.5)
    Graph
      .pagerankInt(pairs, "id_a", "id_b", iters = 3)
      .select($"id".as("doc_id"), $"score")
      .orderBy($"doc_id")
  }
}
