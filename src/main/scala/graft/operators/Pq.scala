package graft.operators

import graft.plans.PqExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the compression
  * rung of the ANN ladder (brute-force q30, multi-table LSH q31,
  * IVF-Flat q57/q61, PQ q86). A 64-dim float corpus vector (256 B)
  * becomes `m` centroid ids (8 ints, bytes after parquet dictionary +
  * bit-packing) and queries score against the codes via ADC — so a
  * 100 TB embedding corpus ANN-scans as ~3 TB of codes, which is the
  * difference between fitting executor RAM and not.
  *
  * Codebook training is deterministic by construction, mirroring
  * [[Similarity.ivfCentroids]]'s design: per subspace, the `ksub`
  * subvectors of the rows with the smallest seeded sha256 rank —
  * portable across engines (same trick as the q59 sampler), which is
  * what lets q86 carry a fully independent DuckDB oracle that rebuilds
  * the codebook, the codes, AND the snapped corpus in SQL. Optional
  * fixed-iteration Lloyd refinement ([[train]] `kmeansIters`) sharpens
  * quantization error on clustered corpora — spec-pinned (PqSpec), not
  * oracle-gated, exactly like IVF's `kmeansIters`.
  *
  * Scale shape: training touches the corpus `1 + kmeansIters` times
  * (hash-rank sample, then per-iteration one [[graft.plans.PqEncode]]
  * pass + one (j, c, pos)-keyed partial-mean aggregation — the corpus
  * itself never shuffles); the codebook is `m·ksub·dsub` doubles
  * (8 KiB here) and ships as an expression constant like the LSH
  * hyperplanes. Encoding is one codegen pass; an ADC scan reads codes
  * only, with broadcast queries.
  */
object Pq {

  /** Row-major `[m][ksub][dsub]` flattened centroids. */
  final case class Codebook(m: Int, ksub: Int, dsub: Int, flat: Array[Double]) {
    require(flat.length == m * ksub * dsub, s"${flat.length} != $m*$ksub*$dsub")
    def dim: Int = m * dsub
  }

  /** Normalized corpus subvectors with their per-subspace sha256 rank
    * key — the shared first stage of sampling and the oracle SQL.
    */
  private def subvectors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      dsub: Int,
      seed: Long
  ): DataFrame =
    Dedup
      .computeParallel(corpus)
      .select(col(idCol).as("id"), Similarity.normalized(col(vecCol)).as("vn"))
      .select(col("id"), col("vn"), explode(array((0 until m).map(lit): _*)).as("j"))
      .select(
        col("id"),
        col("j"),
        slice(col("vn"), col("j") * dsub + 1, lit(dsub)).as("sv"),
        sha2(concat_ws(":", col("id").cast("string"), col("j").cast("string"),
          lit(seed.toString)), 256).as("hk"))

  /** Deterministic sampled codebook: per subspace `j`, the `ksub`
    * subvectors with the smallest (sha256(id:j:seed), id) rank.
    * The rank is a window per subspace — at true corpus scale,
    * pre-filter by a hash prefix (the reservoir trick) before ranking;
    * at any scale the result is reproducible in plain SQL.
    */
  def trainSampled(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      dsub: Int = 8,
      seed: Long = 42L
  ): Codebook = {
    val w = Window.partitionBy(col("j")).orderBy(col("hk"), col("id"))
    val rows = subvectors(corpus, idCol, vecCol, m, dsub, seed)
      .withColumn("c", row_number().over(w) - 1)
      .filter(col("c") < ksub)
      .select(col("j"), col("c"), col("sv"))
      .collect() // m·ksub rows of dsub doubles — expression-constant sized
    val flat = new Array[Double](m * ksub * dsub)
    rows.foreach { r =>
      val j  = r.getInt(0)
      val c  = r.getInt(1)
      val sv = r.getSeq[Double](2)
      // a corpus vector shorter than m·dsub yields a short slice here;
      // leave the tail 0.0 — the same read-as-zero padding PqEncode/
      // PqAdc apply, so training and encoding share one length contract
      val lim = math.min(dsub, sv.size)
      var i   = 0
      while (i < lim) { flat((j * ksub + c) * dsub + i) = sv(i); i += 1 }
    }
    Codebook(m, ksub, dsub, flat)
  }

  /** Fixed-iteration Lloyd refinement (fixed seed/count, no
    * convergence test — reproducible builds, same contract as
    * [[Similarity.ivfCentroidsRefined]]). Each iteration: one
    * [[graft.plans.PqEncode]] assignment pass over the corpus, one
    * partial-mean aggregation keyed (j, c, pos) — `m·ksub·dsub`
    * groups collected to rebuild the constant. Empty cells keep their
    * previous centroid.
    */
  def refine(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebook,
      iters: Int
  ): Codebook = {
    val normed = Materialize(
      Dedup
        .computeParallel(corpus)
        .select(col(idCol).as("id"), Similarity.normalized(col(vecCol)).as("vn")))
    var cur = cb
    for (_ <- 0 until iters) {
      val means = normed
        .select(col("vn"), posexplode(encode(col("vn"), cur)).as(Seq("j", "c")))
        .select(col("j"), col("c"),
          posexplode(slice(col("vn"), col("j") * cur.dsub + 1, lit(cur.dsub))).as(Seq("pos", "x")))
        .groupBy("j", "c", "pos")
        .agg(avg(col("x")).as("mx"))
        .collect()
      val flat = cur.flat.clone()
      means.foreach { r =>
        val j = r.getInt(0); val c = r.getInt(1); val p = r.getInt(2)
        flat((j * cur.ksub + c) * cur.dsub + p) = r.getDouble(3)
      }
      cur = Codebook(cur.m, cur.ksub, cur.dsub, flat)
    }
    cur
  }

  /** Sampled or Lloyd-refined codebook per `kmeansIters` — the same
    * switch [[Similarity.ivfCells]] exposes.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      dsub: Int = 8,
      seed: Long = 42L,
      kmeansIters: Int = 0
  ): Codebook = {
    val sampled = trainSampled(corpus, idCol, vecCol, m, ksub, dsub, seed)
    if (kmeansIters <= 0) sampled else refine(corpus, idCol, vecCol, sampled, kmeansIters)
  }

  /** Codes of a NORMALIZED vector column (callers pass the raw column
    * through [[encodeCorpus]], which normalizes once per row).
    */
  def encode(normalizedVec: Column, cb: Codebook): Column =
    PqExpressions.pqEncode(normalizedVec, cb.flat, cb.m, cb.ksub, cb.dsub)

  /** Reconstructed (snapped) vector from codes. */
  def decode(codes: Column, cb: Codebook): Column =
    PqExpressions.pqDecode(codes, cb.flat, cb.m, cb.ksub, cb.dsub)

  /** ADC inner-product score of a full-precision normalized query
    * against a coded row.
    */
  def adc(normalizedQuery: Column, codes: Column, cb: Codebook): Column =
    PqExpressions.pqAdc(normalizedQuery, codes, cb.flat, cb.m, cb.ksub, cb.dsub)

  /** The compressed index table: (id, codes) — what gets persisted and
    * scanned instead of the raw vectors.
    */
  def encodeCorpus(corpus: DataFrame, idCol: String, vecCol: String, cb: Codebook): DataFrame =
    Dedup
      .computeParallel(corpus)
      .select(
        col(idCol).as("id"),
        encode(Similarity.normalized(col(vecCol)), cb).as("codes"))

  /** ADC top-k: queries broadcast in full precision (normalized once),
    * ONE scan of the codes table, per-query rank — the brute-force
    * topology of [[Similarity.bruteForceTopK]] at 1/32nd the scan
    * bytes. Output (query_id, rank, neighbor_id); ranking is by the
    * quantized score, i.e. exact top-k over the SNAPPED corpus.
    */
  /** IVF-PQ top-k — the FAISS-shape composite index and the engine's
    * full 100 TB ANN answer: the corpus is partitioned into IVF cells
    * ([[Similarity.assignCells]] — persist it `partitionBy("cell")`
    * like q61's index and a probe becomes a partition-pruned read) and
    * each row is stored as PQ codes — so a query reads `nprobe/nlist`
    * of the corpus (IVF pruning) at 1/32nd the bytes (PQ compression),
    * scoring via ADC. At nprobe = nlist the probed cells cover every
    * row exactly once and the ranking is IDENTICAL to the flat ADC
    * scan ([[topK]]) — q87's operating point, which is what lets the
    * composite machinery share q86's independent DuckDB oracle; the
    * pruned operating points are pinned by PqSpec like IVF's recall
    * curve.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cb: Codebook,
      nlist: Int = 16,
      nprobe: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    val cent = Similarity.centroids(corpus, idCol, vecCol, nlist, seed, kmeansIters = 0)
    val coded = Similarity
      .assignCells(corpus, idCol, vecCol, cent)
      .select(col(idCol).as("id"), col("cell"),
        encode(Similarity.normalized(col(vecCol)), cb).as("codes"))
    val qCells = Similarity
      .probeCells(queries, cent, idCol, vecCol, nprobe)
      .select(col("query_id"), Similarity.normalized(col("qv")).as("qn"), col("cell"))
    val scored = coded
      .join(broadcast(qCells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        adc(col("qn"), col("codes"), cb).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  def topK(
      codes: DataFrame, // (id, codes) from [[encodeCorpus]]
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cb: Codebook
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      Similarity.normalized(col(vecCol)).as("qn"))
    val scored = codes
      .join(broadcast(q), col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        adc(col("qn"), col("codes"), cb).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }
}
