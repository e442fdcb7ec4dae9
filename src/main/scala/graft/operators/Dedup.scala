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

  /** Distinct word-level n-gram shingles of a token array. */
  def shingles(tokens: Column, n: Int): Column =
    when(
      size(tokens) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))
        )
      )
    ).otherwise(array().cast("array<string>"))

  /** doc_id + distinct shingle set per document. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), shingles(split(col(textCol), "\\s+"), n).as("shingle_set"))

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
  ): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n).cache()
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

  /** k-element signature from precomputed base hashes. The `when` guard
    * references the base column twice on purpose: CollapseProject only
    * declines to merge adjacent projections when the producer expression
    * is non-cheap AND referenced more than once — without it Catalyst
    * inlines the base-hash computation into all k lambda bodies and
    * recomputes it per hash function (the same trap measured at 60x on
    * the band expressions).
    */
  def minhashFromHashes(baseCol: Column, k: Int): Column =
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
    * is 1-(1-t^r)^b (k=64, b=32, r=2 → ≥ 1-1e-8 at t=0.5).
    * Output: (id_a, id_b, jaccard) with id_a < id_b — identical to
    * [[ngramJaccardPairs]] modulo the ~1e-8 recall gap, so the exact
    * form serves as its oracle.
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
    val sets = shingleSets(df, idCol, textCol, n)
      .filter(size(col("shingle_set")) > 0)
      .cache()
    // Materialize the signature in its own projection: inlining it into
    // the 32 band lambdas makes Catalyst recompute the k-hash signature
    // per band (measured 60x slowdown, BENCH sf0.1). localCheckpoint-free
    // barrier: project → explode in separate steps keeps it evaluated once.
    val banded = sets
      .select(col(idCol).as("id"), minhashBaseHashes(col("shingle_set")).as("bh0"))
      .select(col("id"), minhashFromHashes(col("bh0"), k).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
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

  /** 64-bit SimHash over a shingle array, returned as a 64-char '0'/'1'
    * string (portable across engines — no signed-long ambiguity).
    * Bit j votes +1/-1 per shingle according to bit j of the shingle's
    * sha256-derived 64-bit hash; bit is 1 when the vote is positive.
    * sha256's hex prefix is used (instead of xxhash64) so an external
    * engine can reproduce the value exactly.
    */
  def simhash64(shingleCol: Column): Column = {
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
  def hammingBits(a: Column, b: Column): Column =
    aggregate(
      sequence(lit(0), length(a) - 1),
      lit(0),
      (acc, i) => acc + when(a.substr(i + 1, lit(1)) === b.substr(i + 1, lit(1)), 0).otherwise(1)
    )

  /** SimHash near-duplicate pairs with hamming ≤ maxHamming, found via
    * the chunk-bucket pigeonhole: split the 64 bits into maxHamming+1
    * chunks — any pair within the bound shares at least one exact
    * chunk, so the bucket join is EXACT (no recall loss), then verify
    * the true distance. Output: (id_a, id_b, hamming).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxHamming: Int
  ): DataFrame = {
    val chunks    = maxHamming + 1
    val chunkLen  = 64 / chunks
    val sigs = shingleSets(df, idCol, textCol, n)
      .filter(size(col("shingle_set")) > 0)
      .select(col(idCol).as("id"), simhash64(col("shingle_set")).as("sig"))
      .cache()
    val chunked = sigs.select(
      col("id"),
      col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c => struct(c.as("c"), col("sig").substr(c * lit(chunkLen) + lit(1), lit(chunkLen)).as("piece"))
        )
      ).as("ch")
    )
    val candidates = chunked
      .as("a")
      .join(
        chunked.as("b"),
        col("a.ch.c") === col("b.ch.c") && col("a.ch.piece") === col("b.ch.piece") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
    candidates
      .select(col("id_a"), col("id_b"), hammingBits(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
