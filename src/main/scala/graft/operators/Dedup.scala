package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family for large-scale training-data
  * pipelines: exact content-hash, exact n-gram Jaccard, MinHash+LSH,
  * and SimHash. All signatures are pure Catalyst expressions (no UDFs),
  * so every stage stays in whole-stage codegen and distributes.
  *
  * Scale design: the exact pairwise forms join on shared shingles —
  * O(co-occurring pairs), fine when near-dup density is low; the LSH
  * forms bound candidate generation by banding, the standard 100 TB
  * path (candidates ≪ n²), then verify candidates exactly so precision
  * is 1.0.
  */
object Dedup {

  /** Distinct word-level n-gram shingles of a token array — the native
    * one-pass [[graft.plans.WordNgrams]] expression (the HOF chain it
    * replaces allocated a slice + concat per position and never
    * codegen'd; pinned element-equal in DedupSpec). The coalesce
    * preserves the HOF contract for a NULL token array (null text →
    * empty shingle set, not NULL): the native UnaryExpression is
    * null-propagating, the old `when(size(t) >= n, ...).otherwise([])`
    * was not.
    */
  def shingles(tokens: Column, n: Int): Column =
    coalesce(graft.plans.WordNgrams.wordNgrams(tokens, n), array().cast("array<string>"))

  /** The HOF form of [[shingles]] — retained ONLY as the parity oracle
    * for the native expression (DedupSpec pins them equal on real
    * documents at several n).
    */
  private[graft] def shinglesHof(tokens: Column, n: Int): Column =
    when(
      size(tokens) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))
        )
      )
    ).otherwise(array().cast("array<string>"))

  /** Spread a compute-bound input across the full core count when the
    * scan produced fewer partitions than that (a small parquet file is
    * ONE partition — one core does all the signature math while 31
    * idle). At real scale the scan already has ≫ defaultParallelism
    * partitions and this is a no-op, so the big-data path never pays
    * the shuffle.
    *
    * The partition count is only probed (`.rdd`) on shuffle-free plans:
    * under AQE, materializing the RDD of a plan with an upstream
    * exchange EXECUTES those stages as a throwaway job just to learn a
    * number. Shuffled inputs are left untouched — with the caveat that
    * AQE's partition coalescing targets BYTES, so a small-but-compute-
    * heavy shuffle output can still land on few cores; a caller that
    * needs guaranteed spread after a shuffle should `localCheckpoint()`
    * first (the plan becomes a leaf, making this probe cheap and the
    * repartition applicable) or repartition explicitly.
    */
  private[operators] def computeParallel(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffled = df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Deduplicate | _: Window | _: Sort => true
      case _: GlobalLimit | _: RepartitionOperation                                    => true
      case _                                                                           => false
    }
    if (shuffled) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** doc_id + distinct shingle set per document. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    computeParallel(df).select(col(idCol), shingles(split(col(textCol), "\\s+"), n).as("shingle_set"))

  /** Materialize an intermediate reused by several downstream branches.
    * Checkpoint rather than cache(): lineage truncates (iterative reuse
    * can't stack plans), nothing pins a cache-manager entry for the
    * session lifetime, and blocks free via the context cleaner once
    * unreachable. Reliability mode is session-selected via
    * [[Materialize]]: local blocks by default; set a checkpoint dir and
    * every materialization survives executor loss.
    */
  private[operators] def materialize(df: DataFrame): DataFrame = Materialize(df)

  /** Exact near-duplicate pairs by n-gram Jaccard ≥ threshold.
    * Plan: explode shingles → self-join on shingle (only co-occurring
    * pairs materialize) → count shared → join set sizes → filter.
    * Output: (id_a, id_b, n_shared, jaccard) with id_a < id_b.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame =
    ngramJaccardPairsFromSets(
      materialize(shingleSets(df, idCol, textCol, n)), idCol, threshold)

  /** [[ngramJaccardPairs]] over ALREADY-BUILT (and ideally
    * materialized) shingle sets — for callers that need the sets for
    * their own work too (the q183/q195 calibrations build signatures
    * from them), so the corpus tokenizes and shingles exactly once.
    */
  def ngramJaccardPairsFromSets(
      sets: DataFrame,
      idCol: String,
      threshold: Double
  ): DataFrame = {
    // The exploded sides stay INLINE over the materialized sets: the
    // r18 experiment that pre-clustered one s-keyed checkpoint for an
    // exchange-free self-join measured SLOWER at bench scale (+0.16 s,
    // GraphProbe stage B), because the planner broadcasts one exploded
    // side off the checkpoint's accurate stats — the join never
    // shuffles the shingle mass here, so the clustering shuffle was
    // pure cost. At sizes past the broadcast threshold the join is a
    // plain s-keyed SMJ whose skew AQE can still split (which a
    // pre-partitioned build side would forfeit).
    val ex = sets.select(col(idCol).as("id"), explode(col("shingle_set")).as("s"))
    val sizes = sets.select(col(idCol).as("id"), size(col("shingle_set")).as("sz"))
    val shared = ex
      .as("a")
      .join(ex.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(
        col("id_a"),
        col("id_b"),
        col("n_shared"),
        (col("n_shared").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("n_shared"))).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Directed near-containment pairs: C(a→b) = |Sa ∩ Sb| / |Sa| over
    * distinct n-gram shingle sets — the ASYMMETRIC dup signal Jaccard
    * misses (a short doc wholly embedded in a long one scores low
    * Jaccard but containment ≈ 1; the syndication-with-added-chrome
    * case). One undirected shared-shingle equi-join (candidates ∝
    * shared-shingle mass, exactly [[ngramJaccardPairs]]'s shape — never
    * docs²) emits BOTH directions, each normalized by its own source
    * set size; rows where C ≥ threshold survive. `id_a` is the
    * contained side.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame = {
    val sets  = materialize(shingleSets(df, idCol, textCol, n))
    // inline exploded sides, same reasoning as [[ngramJaccardPairsFromSets]]
    val ex    = sets.select(col(idCol).as("id"), explode(col("shingle_set")).as("s"))
    val sizes = sets.select(col(idCol).as("id"), size(col("shingle_set")).cast("long").as("sz"))
    val shared = ex
      .as("a")
      .join(ex.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("lo"), col("b.id").as("hi"))
      .agg(count(lit(1)).as("n_shared"))
    val directed = shared
      .select(col("lo").as("id_a"), col("hi").as("id_b"), col("n_shared"))
      .unionByName(shared
        .select(col("hi").as("id_a"), col("lo").as("id_b"), col("n_shared")))
    directed
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("sa.sz").as("size_a"),
        (col("n_shared").cast("double") / col("sa.sz")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Per-shingle 64-bit base hash: ONE string hash per shingle; the k
    * signature functions then hash this 8-byte value, not the string
    * (k× cheaper on long shingles). MUST be materialized in its own
    * projection before [[minhashFromHashes]] (see the CollapseProject
    * note there). The textbook multiply-add construction
    * (Kirsch–Mitzenmacher) is unusable under ANSI mode — long overflow
    * throws — so seeded re-hashing of the base long stands in.
    */
  def minhashBaseHashes(shingleCol: Column): Column =
    transform(shingleCol, x => xxhash64(lit(0), x))

  /** k-element signature from precomputed base hashes — the native
    * [[graft.plans.MinHashSignature]] expression: one codegen loop, no
    * per-row intermediate arrays, and (unlike the HOF form) immune to
    * the CollapseProject trap, because a single expression consumes the
    * base column exactly once however Catalyst collapses projections.
    */
  def minhashFromHashes(baseCol: Column, k: Int): Column =
    graft.plans.MinHashExpression.minhashSig(baseCol, k)

  /** The higher-order-function form of [[minhashFromHashes]], kept as
    * the independent reference implementation the native expression is
    * pinned bit-equal to (DedupSpec). The `when` guard references the
    * base column twice on purpose: CollapseProject only declines to
    * merge adjacent projections when the producer expression is
    * non-cheap AND referenced more than once — without it Catalyst
    * inlines the base-hash computation into all k lambda bodies and
    * recomputes it per hash function (measured 60x on the band
    * expressions).
    */
  def minhashFromHashesHof(baseCol: Column, k: Int): Column =
    when(
      size(baseCol) < 0,
      lit(null)
    ).otherwise(
      transform(
        sequence(lit(0), lit(k - 1)),
        s => array_min(transform(baseCol, e => xxhash64(s, e)))
      )
    )

  /** MinHash signature over a shingle array (single-column form; for
    * performance-critical paths split into [[minhashBaseHashes]] +
    * [[minhashFromHashes]] across two projections).
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    minhashFromHashes(minhashBaseHashes(shingleCol), k)

  /** LSH band keys from a signature: bands of r rows each, hashed.
    * Returns array<struct<band:int, h:long>>.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        struct(
          b.as("band"),
          xxhash64(concat_ws(",", slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))).as("h")
        )
    )

  /** MinHash+LSH near-duplicate pairs, exact-verified.
    *
    * shingle → minhash(k) → band(b × r) → bucket self-join → candidate
    * pairs → exact Jaccard on the shingle sets → ≥ threshold.
    * Verification makes precision exact; banding recall at threshold t
    * is 1-(1-t^r)^b: with k=64, b=32, r=2 that is ≈ 1-1e-4 at the
    * t=0.5 boundary and ≈ 1-1e-45 at the planted near-dup level
    * (jaccard ≥ 0.98) — borderline pairs are the only ones with any
    * realistic miss probability. Output: (id_a, id_b, jaccard) with
    * id_a < id_b — identical to [[ngramJaccardPairs]] modulo that
    * recall gap, so the exact form serves as its oracle.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      bands: Int,
      threshold: Double
  ): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sets = materialize(
      shingleSets(df, idCol, textCol, n).filter(size(col("shingle_set")) > 0))
    // Materialize the signature in its own projection: inlining it into
    // the 32 band lambdas makes Catalyst recompute the k-hash signature
    // per band (measured 60x slowdown, BENCH sf0.1). localCheckpoint-free
    // barrier: project → explode in separate steps keeps it evaluated once.
    // The banded rows ALSO materialize (r18): both candidate-join sides
    // read them, and without the checkpoint each side recomputed the
    // k-hash signature chain from the sets checkpoint — the most
    // expensive per-row compute in this operator, paid twice (guide
    // §1.2 step 2: don't compute things twice). No pre-clustering: the
    // planner broadcasts one side off the checkpoint's accurate stats
    // at bench scales, and past the broadcast threshold AQE's skew
    // split wants the exchange present.
    val banded = materialize(sets
      .select(col(idCol).as("id"), minhashBaseHashes(col("shingle_set")).as("bh0"))
      .select(col("id"), minhashFromHashes(col("bh0"), k).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h")))
    val candidates = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") && col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("shingle_set").as("sa")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("shingle_set").as("sb")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Half 1 of the persistable near-dup index: (idCol, shingle_set)
    * per document, empty sets dropped. Write these rows once at ingest
    * and exact verification never re-reads (or re-shingles) the text.
    */
  def nearDupSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleSets(df, idCol, textCol, n).filter(size(col("shingle_set")) > 0)

  /** Half 2 of the persistable near-dup index: banded MinHash rows
    * (idCol, band, h) from a [[nearDupSets]] frame. Write these once
    * at ingest and candidate generation never recomputes a signature.
    */
  def nearDupBandRows(sets: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    sets
      .select(col(idCol), minhashBaseHashes(col("shingle_set")).as("bh0"))
      .select(col(idCol), minhashFromHashes(col("bh0"), k).as("sig"))
      .select(col(idCol), explode(lshBands(col("sig"), bands, r)).as("bh"))
      .select(col(idCol), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  /** Incremental near-dup detection: all pairs (MinHash+LSH banded,
    * exact-verified) with AT LEAST ONE side in `batch` — the daily-
    * ingest shape. Only the batch side probes the band index, so
    * candidate generation costs O(batch-bucket collisions), never a
    * corpus×corpus self-join: checking 1 M new docs against a 10 B-doc
    * index touches only the buckets the new docs land in. Same
    * banding recall and exact verification as [[minhashLshPairs]];
    * equal to filtering the full pair set on "≥ 1 batch side"
    * (asserted in DedupSpec).
    *
    * This one-shot form signs both sides from raw text. REPEATED
    * ingest must not re-sign the corpus every call — persist
    * [[nearDupSets]] + [[nearDupBandRows]] at ingest time and use
    * [[incrementalNearDupPairsIndexed]] instead (what
    * [[graft.streaming.DocStreams.incrementalDedup]] does).
    * Output: (id_a, id_b, jaccard), id_a < id_b, ids must be disjoint.
    */
  def incrementalNearDupPairs(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      bands: Int,
      threshold: Double
  ): DataFrame = {
    val corpusSets = materialize(nearDupSets(corpus, idCol, textCol, n))
    val batchSets  = materialize(nearDupSets(batch, idCol, textCol, n))
    incrementalNearDupPairsIndexed(
      corpusSets,
      nearDupBandRows(corpusSets, idCol, k, bands),
      batchSets,
      nearDupBandRows(batchSets, idCol, k, bands),
      idCol,
      threshold
    )
  }

  /** [[incrementalNearDupPairs]] against a PRE-BUILT index: the corpus
    * arrives as its persisted [[nearDupSets]] / [[nearDupBandRows]]
    * tables, so a call costs O(batch signing + batch-bucket collisions
    * + candidate verification) — the corpus text is never touched and
    * its signatures are never recomputed. Within-batch pairs are
    * included (the probe side joins index ∪ batch), so unioning the
    * per-batch outputs over an ingest history yields every pair
    * exactly once: a pair inside batch i emits at batch i, a pair
    * across i < j at batch j.
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def incrementalNearDupPairsIndexed(
      indexSets: DataFrame,
      indexBands: DataFrame,
      batchSets: DataFrame,
      batchBands: DataFrame,
      idCol: String,
      threshold: Double
  ): DataFrame = {
    val probe = batchBands.select(col(idCol).as("id"), col("band"), col("h"))
    val index = indexBands.select(col(idCol).as("id"), col("band"), col("h")).unionByName(probe)
    val candidates = probe
      .as("a")
      .join(index.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val allSets = indexSets
      .select(col(idCol), col("shingle_set"))
      .unionByName(batchSets.select(col(idCol), col("shingle_set")))
    candidates
      .join(allSets.select(col(idCol).as("id_a"), col("shingle_set").as("sa")), Seq("id_a"))
      .join(allSets.select(col(idCol).as("id_b"), col("shingle_set").as("sb")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over a shingle array, returned as a 64-char '0'/'1'
    * string (portable across engines — no signed-long ambiguity).
    * Bit j votes +1/-1 per shingle according to bit j of the shingle's
    * sha256-derived 64-bit hash; bit is 1 when the vote is positive.
    * sha256's hex prefix is used (instead of xxhash64) so an external
    * engine can reproduce the value exactly. The vote loop is the
    * native [[graft.plans.SimHashBits]] expression — one pass over the
    * shingles instead of 64 interpreted aggregate() passes; pinned
    * bit-equal to [[simhash64Hof]] in DedupSpec.
    */
  def simhash64(shingleCol: Column): Column =
    graft.plans.SimHashExpression.simhashBits(
      transform(shingleCol, t => substring(sha2(t, 256), 1, 16)))

  /** The higher-order-function reference form of [[simhash64]] (kept
    * for the native-equality spec; 64 aggregate passes, interpreted).
    */
  def simhash64Hof(shingleCol: Column): Column = {
    val hexes = transform(shingleCol, t => substring(sha2(t, 256), 1, 16))
    def bit(h: Column, j: Column): Column = {
      val digit = h.substr(floor(j / 4).cast("int") + lit(1), lit(1))
      val dv    = instr(lit("0123456789abcdef"), digit) - lit(1)
      (floor(dv / pow(lit(2.0), (lit(3) - (j % 4)).cast("double"))).cast("int") % 2)
    }
    concat_ws(
      "",
      transform(
        sequence(lit(0), lit(63)),
        j => {
          val vote = aggregate(hexes, lit(0), (acc, h) => acc + (bit(h, j) * 2 - 1))
          when(vote > 0, lit("1")).otherwise(lit("0"))
        }
      )
    )
  }

  /** Exact Hamming distance between two equal-length bit strings. */
  /** Hamming distance over '0'/'1' bit strings — the native one-pass
    * [[graft.plans.HammingBits]] expression (the HOF aggregate it
    * replaces allocated two substrings per bit per candidate pair and
    * never codegen'd; pinned equal in PropertySpec/DedupSpec).
    */
  def hammingBits(a: Column, b: Column): Column =
    graft.plans.HammingBits.hammingBits(a, b)

  /** The HOF form of [[hammingBits]] — retained ONLY as the parity
    * oracle for the native expression.
    */
  private[graft] def hammingBitsHof(a: Column, b: Column): Column =
    aggregate(
      sequence(lit(0), length(a) - 1),
      lit(0),
      (acc, i) => acc + when(a.substr(i + 1, lit(1)) === b.substr(i + 1, lit(1)), 0).otherwise(1)
    )

  /** SimHash near-duplicate pairs with hamming ≤ maxHamming, found via
    * the chunk-combination pigeonhole (Manku et al., WWW'07 shape):
    * split the 64 bits into `chunks` pieces; a pair within the bound
    * differs in at most maxHamming chunks, so it agrees EXACTLY on some
    * (chunks − maxHamming)-subset — bucket on every such subset and the
    * join is exact (no recall loss), then verify the true distance.
    *
    * `chunks = maxHamming + 1` (the default) is the classic 1-chunk
    * pigeonhole: fewest buckets per doc (m+1), but each bucket key is
    * only 64/(m+1) bits, so bucket occupancy — and the within-bucket
    * quadratic term — grows once the corpus is ≫ 2^(64/(m+1)) docs
    * (~10⁸ at m=3, a real ceiling at 100 TB). Raising `chunks` widens
    * each key to (chunks−m)·64/chunks bits at the cost of
    * C(chunks, m) bucket keys per doc: chunks=6, m=3 → 20 keys of
    * ~30 bits, pushing the quadratic ceiling past 10¹⁴ docs. Use
    * [[simhashBucketOccupancy]] to see when to raise it.
    * Output: (id_a, id_b, hamming).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxHamming: Int,
      chunks: Int = 0
  ): DataFrame = {
    val sigs = materialize(
      shingleSets(df, idCol, textCol, n)
        .filter(size(col("shingle_set")) > 0)
        .select(col(idCol).as("id"), simhash64(col("shingle_set")).as("sig")))
    bitSigPairs(sigs, "id", "sig", maxHamming, chunks)
  }

  /** Near-dup pairs over ANY 64-bit '0'/'1' signature column via the
    * chunk-combination pigeonhole index — the shared machinery behind
    * [[simhashPairs]] (text) and [[graft.operators.Multimodal]]'s
    * perceptual-hash media dedup. `sigs` should be materialized if its
    * signature is expensive. Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def bitSigPairs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int,
      chunks: Int = 0
  ): DataFrame = {
    val c = if (chunks <= 0) maxHamming + 1 else chunks
    require(c > maxHamming, s"need chunks ($c) > maxHamming ($maxHamming) for the pigeonhole to hold")
    require(c <= 64, "at most one chunk per bit")
    val s = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val chunked = s.select(col("id"), col("sig"), explode(subsetKeys(col("sig"), c, maxHamming)).as("ch"))
    val candidates = chunked
      .as("a")
      .join(
        chunked.as("b"),
        col("a.ch.s") === col("b.ch.s") && col("a.ch.piece") === col("b.ch.piece") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
    candidates
      .select(col("id_a"), col("id_b"), hammingBits(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Persistable chunk-combination index rows for a bit-signature set:
    * (idCol, s, piece) — one row per (chunks − maxHamming)-subset
    * bucket key. The bit-sig twin of [[nearDupBandRows]]; the
    * signature itself (idCol, sigCol) is the twin of [[nearDupSets]]
    * (it is what verification reads). `sigs` is (idCol, sigCol).
    */
  def bitSigBandRows(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int,
      chunks: Int = 0
  ): DataFrame = {
    val c = if (chunks <= 0) maxHamming + 1 else chunks
    require(c > maxHamming, s"need chunks ($c) > maxHamming ($maxHamming) for the pigeonhole to hold")
    require(c <= 64, "at most one chunk per bit")
    sigs
      .select(col(idCol), explode(subsetKeys(col(sigCol), c, maxHamming)).as("ch"))
      .select(col(idCol), col("ch.s").as("s"), col("ch.piece").as("piece"))
  }

  /** Incremental [[bitSigPairs]]: all pairs (hamming ≤ maxHamming)
    * with at least one side in the batch, probing a PRE-BUILT
    * persisted index — (idCol, sigCol) signature rows plus
    * [[bitSigBandRows]] bucket rows. Within-batch pairs included, so
    * per-batch outputs union to the full pair set exactly once (same
    * argument as [[incrementalNearDupPairsIndexed]]). Serves text
    * SimHash and media perceptual hashes alike.
    * Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def incrementalBitSigPairs(
      indexSigs: DataFrame,
      indexBands: DataFrame,
      batchSigs: DataFrame,
      batchBands: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int
  ): DataFrame = {
    val probe = batchBands.select(col(idCol).as("id"), col("s"), col("piece"))
    val index = indexBands.select(col(idCol).as("id"), col("s"), col("piece")).unionByName(probe)
    val candidates = probe
      .as("a")
      .join(index.as("b"),
        col("a.s") === col("b.s") && col("a.piece") === col("b.piece") && col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val allSigs = indexSigs
      .select(col(idCol).as("id"), col(sigCol).as("sig"))
      .unionByName(batchSigs.select(col(idCol).as("id"), col(sigCol).as("sig")))
    candidates
      .join(allSigs.select(col("id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
      .join(allSigs.select(col("id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), hammingBits(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** All (subset-id, concatenated-chunk-values) bucket keys for a 64-bit
    * signature string: one key per (chunks − maxHamming)-subset of the
    * `chunks` pieces. Chunk lengths differ by at most one bit when 64
    * isn't divisible by `chunks`.
    */
  private[operators] def subsetKeys(sig: Column, chunks: Int, maxHamming: Int): Column = {
    val base = 64 / chunks
    val rem  = 64 % chunks
    val starts  = (0 until chunks).scanLeft(0)((acc, i) => acc + base + (if (i < rem) 1 else 0))
    def piece(i: Int): Column = sig.substr(lit(starts(i) + 1), lit(starts(i + 1) - starts(i)))
    val subsets = (0 until chunks).combinations(chunks - maxHamming).toSeq
    array(subsets.zipWithIndex.map { case (idxs, si) =>
      struct(lit(si).as("s"), concat(idxs.map(piece): _*).as("piece"))
    }: _*)
  }

  /** Bucket-occupancy histogram of the simhash chunk-combination index:
    * (subset_id, piece, n_docs) for every occupied bucket. The scale
    * dashboard for [[simhashPairs]]: candidate volume is
    * Σ n_docs·(n_docs−1)/2 over these rows, so a hot bucket (skewed
    * corpus, or chunks too coarse for the corpus size) shows up here
    * BEFORE it shows up as a straggler task — raise `chunks` when
    * max(n_docs) grows quadratic-dangerous.
    */
  def simhashBucketOccupancy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxHamming: Int,
      chunks: Int = 0
  ): DataFrame = {
    val c = if (chunks <= 0) maxHamming + 1 else chunks
    require(c > maxHamming, s"need chunks ($c) > maxHamming ($maxHamming)")
    shingleSets(df, idCol, textCol, n)
      .filter(size(col("shingle_set")) > 0)
      .select(col(idCol).as("id"), simhash64(col("shingle_set")).as("sig"))
      .select(col("id"), explode(subsetKeys(col("sig"), c, maxHamming)).as("ch"))
      .groupBy(col("ch.s").as("subset_id"), col("ch.piece").as("piece"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Exact substring-level dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" rung of the dedup
    * ladder, arXiv:2107.06499): document pairs sharing an EXACT run of
    * ≥ k consecutive tokens, with the longest shared run measured —
    * the signal that catches verbatim boilerplate / quoted passages
    * that set-based similarity (Jaccard, MinHash) dilutes away on long
    * documents.
    *
    * Relational formulation — no suffix array, no per-pair alignment:
    *   1. anchor every positioned k-gram: (doc, pos, gram)
    *   2. equi-join anchors on a 64-bit gram hash (the join key is the
    *      HASH, so the shuffle moves 8-byte keys, not k-token strings;
    *      exact gram equality rides as a residual predicate — hash
    *      collisions cannot create false pairs)
    *   3. a shared run of length L ≥ k appears as L-k+1 consecutive
    *      anchor matches on one DIAGONAL (pa - pb constant); the
    *      classic gaps-and-islands trick (pos - row_number per
    *      diagonal) groups each maximal run, so
    *      max_run = max(count per island) + k - 1 exactly
    *
    * Every stage is a shuffle on (doc_a, doc_b[, diag]) — candidates
    * scale with SHARED CONTENT mass, never corpus²; a gram appearing
    * in f documents fans out f², so at 100 TB pass `maxDf` to drop
    * stop-gram anchors (boilerplate k-grams shared by thousands of
    * docs) — the same hot-bucket cap as the LSH family, and dropping a
    * gram only ever shortens runs it anchors, never invents pairs.
    *
    * Output: (doc_a, doc_b, n_anchors, max_run) — doc_a < doc_b,
    * n_anchors = matching positioned k-gram pairs, max_run = longest
    * exact shared token run (≥ k).
    */
  def substringPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDf: Option[Long] = None
  ): DataFrame = {
    require(k >= 2, "substringPairs needs k >= 2")
    val grams = substringAnchors(df, idCol, textCol, k, maxDf)
    val a = grams.select(col("doc_id").as("doc_a"), col("pos").as("pa"),
      col("h"), col("g").as("ga"))
    val b = grams.select(col("doc_id").as("doc_b"), col("pos").as("pb"),
      col("h").as("hb"), col("g").as("gb"))
    val m = a.join(b,
        col("h") === col("hb") && col("doc_a") < col("doc_b") && col("ga") === col("gb"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"))
    anchorRunsAgg(m, k)
  }

  /** Positioned k-gram anchors of every document: (doc_id, pos, h, g)
    * with `h` = xxhash64 of the gram string `g` — the join key the
    * substring family shuffles on, and the schema the PERSISTED anchor
    * index stores ([[substringIndexWrite]]). Tokenization stays
    * oracle-parity simple: lowercase, whitespace runs, empties dropped.
    */
  def substringAnchors(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDf: Option[Long] = None
  ): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')").as("t"))
      .filter(size(col("t")) >= k)
    val grams0 = toks
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, size(t) - ${k - 1}), i -> array_join(slice(t, i, $k), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), xxhash64(col("col")).as("h"),
        col("col").as("g"))
    maxDf match {
      case None => grams0
      case Some(cap) =>
        // hot-gram cap: one narrow agg over the hash finds stop-grams;
        // anti-join drops their anchors before the quadratic join
        val hot = grams0.groupBy(col("h")).agg(count(lit(1)).as("n"))
          .filter(col("n") > cap).select(col("h"))
        grams0.join(broadcast(hot), Seq("h"), "left_anti")
    }
  }

  /** Shared tail of the substring family: matched positioned anchors
    * (doc_a, doc_b, pa, pb) → (doc_a, doc_b, n_anchors, max_run) via
    * the diagonal gaps-and-islands window.
    *
    * Single pass over `m`: every island of length L contributes
    * L − (k−1) anchors, so n_anchors = Σ (run_tokens − (k−1)) over the
    * islands — both outputs aggregate from the island table, which
    * spares the second evaluation of the (potentially expensive) anchor
    * join `m` plus the anchors⋈maxRun join the two-aggregate form paid
    * (guide §2.4: one subtree, one exchange chain). The island groupBy
    * keys extend the window's partition keys, so it reuses the window's
    * exchange; only the final (doc_a, doc_b) aggregate shuffles again.
    */
  private def anchorRunsAgg(m: DataFrame, k: Int): DataFrame = {
    val runs = m
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_a", "doc_b", "diag").orderBy("pa")))
    val runlen = runs.groupBy("doc_a", "doc_b", "diag", "grp")
      .agg((count(lit(1)) + lit(k - 1)).as("run_tokens"))
    runlen.groupBy("doc_a", "doc_b")
      .agg(
        sum(col("run_tokens") - lit(k - 1)).as("n_anchors"),
        max("run_tokens").as("max_run"))
  }

  /** Persist the positioned-anchor index for incremental substring
    * dedup: the corpus is tokenized and anchored ONCE at ingest; every
    * later batch probes the stored anchors ([[incrementalSubstringPairsIndexed]])
    * without re-reading corpus text. Partitioned by pmod(h, 64) so a
    * probe's hash join aligns with the layout.
    */
  def substringIndexWrite(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      path: String
  ): Unit =
    substringAnchors(df, idCol, textCol, k)
      .withColumn("hb", pmod(col("h"), lit(64)))
      .write.mode("overwrite").partitionBy("hb").parquet(path)

  /** Incremental exact-substring dedup against the PERSISTED anchor
    * index: cost O(batch anchoring + matched-anchor mass) — corpus
    * text is never touched, corpus anchors never recomputed. The probe
    * side joins index ∪ batch with the same exactly-once contract as
    * [[incrementalNearDupPairsIndexed]]: a pair inside batch i emits
    * at batch i, a pair across batches i < j at batch j (run the
    * index append after the probe). Output matches
    * [[substringPairs]]: (doc_a, doc_b, n_anchors, max_run),
    * doc_a < doc_b.
    */
  def incrementalSubstringPairsIndexed(
      indexAnchors: DataFrame,
      batchAnchors: DataFrame,
      k: Int
  ): DataFrame = {
    val probe = batchAnchors.select(col("doc_id"), col("pos"), col("h"), col("g"))
    val index = indexAnchors.select(col("doc_id"), col("pos"), col("h"), col("g"))
      .unionByName(probe)
    val p = probe.select(col("doc_id").as("pd"), col("pos").as("pp"),
      col("h"), col("g").as("pg"))
    val i = index.select(col("doc_id").as("idd"), col("pos").as("ip"),
      col("h").as("ih"), col("g").as("ig"))
    // orient every match doc_a < doc_b with positions following their
    // docs; batch-batch matches arrive from both probe directions, so
    // the oriented 4-tuple dedupes them exactly
    val m = p.join(i,
        col("h") === col("ih") && col("pd") =!= col("idd") && col("pg") === col("ig"))
      .select(
        least(col("pd"), col("idd")).as("doc_a"),
        greatest(col("pd"), col("idd")).as("doc_b"),
        when(col("pd") < col("idd"), col("pp")).otherwise(col("ip")).as("pa"),
        when(col("pd") < col("idd"), col("ip")).otherwise(col("pp")).as("pb"))
      .distinct()
    anchorRunsAgg(m, k)
  }
}
