package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph ops for the dedup pipeline: near-dup PAIRS
  * are only half the job — training-data dedup needs pairs grouped into
  * CLUSTERS (connected components) and one canonical document kept per
  * cluster.
  *
  * Algorithm: min-label propagation. Each vertex starts labeled with
  * its own id; every round it takes the min of its label and its
  * neighbors' labels; converged when no label changes. Rounds =
  * component diameter, and near-dup clusters are tight (dup clusters
  * of k docs are usually k-cliques, diameter 1-2), so 2-4 rounds is
  * typical — each round is ONE shuffle join + aggregate, all codegen.
  * For general graphs with long chains the alternating large-star/
  * small-star algorithm (log-diameter rounds) would replace the loop
  * body behind the same signature; for the dedup workload plain
  * propagation is both simpler and faster.
  *
  * The driver loop only checks an aggregate fingerprint (count +
  * hash-sum) per round — labels themselves never collect. Each round's
  * labels are
  * checkpointed via [[Materialize]]: lineage stays one round deep (a
  * cache-only loop stacks N rounds of joins and recompute-on-miss
  * replays them all), nothing is pinned in the cache manager after the
  * call returns, and previous rounds' blocks free via the context
  * cleaner once unreachable. Reliability is session-selected: by
  * default blocks are local (not recomputable on executor loss); a
  * cluster run sets `sparkContext.setCheckpointDir(...)` once and every
  * round persists reliably instead — identical output either way
  * (asserted in GraphSpec).
  */
object Graph {

  /** Order-invariant fingerprint of a two-long-column frame:
    * (row count, Σ xxhash64(c1, c2) as decimal — ANSI-safe, no long
    * overflow). Two DISTINCT frames with equal fingerprints are equal
    * up to a ~2⁻⁶⁴ hash-sum collision; used as the per-round fixpoint
    * test in both component loops — ONE cheap aggregate job over a
    * checkpointed frame instead of the two distinct+anti-join shuffles
    * a pair of `except`s costs (≈4 shuffles/round saved).
    */
  private def fingerprint(df: DataFrame, c1: String, c2: String): (Long, java.math.BigDecimal) = {
    val r = df
      .agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col(c1), col(c2)).cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)))
      .head()
    (r.getLong(0), r.getDecimal(1))
  }

  /** Min-label propagation rounds; returns (labels, converged) without
    * aborting, so callers can choose their own give-up policy (abort in
    * [[connectedComponents]], fall back to star contraction in
    * [[componentsAuto]]).
    */
  private def propagate(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int
  ): (DataFrame, Boolean) = {
    val P = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // Edges are clustered AND sorted by `v` once, at build: every
    // round's message join probes edges on `v`, so a v-clustered
    // checkpoint makes the edge side of that join exchange-free and
    // sort-free in every round (guide §2.4 — operations keyed the same
    // way share one exchange); only the smaller label side moves. The
    // dedup aggregate runs on the v-clustered layout directly
    // (HashPartitioning(v) satisfies the (u,v) clustering), so the
    // explicit repartition replaces — not adds to — the old distinct's
    // exchange. Checkpoints are lazy: the fingerprint aggregate below
    // is the action that persists them (one job per round, not two).
    val edges = Materialize.lazily(
      pairs
        .select(col(aCol).as("u"), col(bCol).as("v"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .repartition(P, col("v"))
        .dropDuplicates("u", "v")
        .sortWithinPartitions("v"))
    // Round 1 folded into label init (guide §2.4): from identity
    // labels, one propagation round computes exactly
    // least(u, min Γ(u)) per vertex — so the init aggregate IS round 1,
    // at the same one-shuffle cost the old identity init already paid,
    // and the loop starts from round 2.
    var labels = Materialize.lazily(
      edges
        .groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("comp"))
        .select(col("u").as("id"), col("comp")))
    // labels keeps one row per vertex every round, so a changed label
    // always changes the hash-sum fingerprint (count is constant)
    var fp = fingerprint(labels, "id", "comp")
    var iter = 1 // init consumed round 1 of the budget
    var converged = fp._1 == 0L // empty graph: trivially converged
    while (!converged && iter < maxIter) {
      // One fused round (guide §2.4): neighbor messages UNION the
      // self-label, then a single min aggregate — the self-message
      // replaces the old neighborMin groupBy + left-join-back, which
      // shuffled `labels` a second time every round and recomputed the
      // no-neighbor coalesce. min(self ∪ neighbors) ≡
      // least(comp, coalesce(min neighbor comp, comp)) exactly, and
      // vertices with no incoming message survive via the self-row.
      val msgs = edges
        .join(labels, edges("v") === labels("id"))
        .select(edges("u").as("id"), col("comp"))
      val updated = Materialize.lazily(
        msgs.union(labels)
          .groupBy(col("id")).agg(min(col("comp")).as("comp")))
      val nfp = fingerprint(updated, "id", "comp")
      labels = updated
      converged = nfp == fp
      fp = nfp
      iter += 1
    }
    (labels.select(col("id"), col("comp").as("component")), converged)
  }

  /** Connected components of an undirected graph given as (aCol, bCol)
    * edge pairs. Returns (id, component) for every vertex that appears
    * in at least one edge; component = min vertex id in the component.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25
  ): DataFrame = {
    val (labels, converged) = propagate(pairs, aCol, bCol, maxIter)
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Components with automatic algorithm selection: min-label
    * propagation first (fewest passes on the tight, small-diameter
    * clusters dedup produces), falling back to
    * [[connectedComponentsStar]] if propagation hasn't converged in
    * `propagationIter` rounds — i.e. the graph turned out chain-like.
    * Output contract identical to both underlying algorithms.
    */
  def componentsAuto(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      propagationIter: Int = 10
  ): DataFrame = {
    val (labels, converged) = propagate(pairs, aCol, bCol, propagationIter)
    if (converged) labels else connectedComponentsStar(pairs, aCol, bCol)
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the LOG-ROUND alternative to
    * [[connectedComponents]]'s label propagation for graphs with long
    * chains: propagation needs diameter rounds (a 30-hop chain aborts
    * the default maxIter=25), star contraction converges in O(log² n)
    * rounds regardless of diameter, because every large-star round
    * rewires all strictly-greater neighbors of each node directly to
    * its neighborhood minimum (halving path lengths), and small-star
    * flattens the remainder into stars.
    *
    * Per round: two groupBy+join passes over the edge set (which only
    * SHRINKS toward one edge per non-root vertex — no intermediate
    * blowup), checkpointed via [[Materialize]] like the propagation
    * loop. Same output contract as [[connectedComponents]]:
    * (id, component = min id in component) for every vertex in ≥ 1
    * edge — asserted equal on chains, cliques and random graphs in
    * GraphSpec. For near-dup clusters (diameter 1-2) plain propagation
    * does fewer passes; pick this variant when component shape is
    * unknown or chain-like (web graphs, citation chains, link graphs).
    */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50
  ): DataFrame = {
    // canonical orientation: u = greater endpoint, v = smaller; self-loops drop
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canon(
        sym.join(mins, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")))
    }
    // small-star(u): m = min of smaller neighbors; rewire them (and u) to m
    def smallStar(e: DataFrame): DataFrame = {
      val mins   = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val joined = e.join(mins, Seq("u"))
      canon(
        joined.filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v"))))
    }
    // Raw pairs materialize ONCE: both the canon edge set and the final
    // vertex set derive from here — the old tail re-derived `verts`
    // from `pairs`, which re-ran the caller's (potentially expensive)
    // pair-generation pipeline a second time per call (q53 paid the
    // whole shared-shingle join twice). Lazy: the first fingerprint
    // below persists rawPairs and edges in one action.
    val rawPairs = Materialize.lazily(
      pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    var edges = Materialize.lazily(canon(rawPairs))
    var fp    = fingerprint(edges, "u", "v")
    var iter = 0
    var converged = fp._1 == 0L // no canon edges: nothing to contract
    while (!converged && iter < maxIter) {
      val next = Materialize.lazily(smallStar(largeStar(edges)))
      // both sides are canon()'d (distinct), so fingerprint equality ⟺
      // set equality modulo hash-sum collision — one aggregate job per
      // round vs the two distinct+anti-join shuffles of a double except
      val nfp = fingerprint(next, "u", "v")
      converged = nfp == fp
      edges = next
      fp = nfp
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIter rounds")
    // at convergence the edge set is a union of stars (non-root → root);
    // roots label themselves. Vertices come from the materialized raw
    // pairs (identical set: canon only drops self-loops, and a
    // self-loop-only vertex still appears in rawPairs).
    val verts = rawPairs
      .select(col("u").as("id")).union(rawPairs.select(col("v").as("id"))).distinct()
    verts
      .join(edges.select(col("u").as("id"), col("v").as("c")), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("c"), col("id"))).as("component"))
  }

  /** The full dedup-clustering pipeline, composed for duplicate-heavy
    * corpora (the 100 TB shape measured in SCALE.md): collapse exact
    * duplicates by content key FIRST (one shuffle; identical copies
    * are the bulk of real dup mass and would otherwise collide in
    * every LSH band), run near-dup pair detection only on the unique
    * representatives, then reconnect collapsed copies through
    * identity edges so the transitive closure is IDENTICAL to running
    * pair detection on the raw corpus (asserted in GraphSpec).
    *
    * Output (id, cluster_id) for every doc in at least one duplicate
    * relation — byte-identical semantics to components over
    * [[Dedup.ngramJaccardPairs]] of the full corpus, at a fraction of
    * the candidate volume when duplicates abound.
    */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // only shingle-capable docs can ever pair (matches ngramJaccardPairs)
    val keyed = Dedup
      .computeParallel(df)
      .filter(size(split(col(textCol), "\\s+")) >= n)
      .select(col(idCol).as("id"), col(textCol).as("txt"), sha2(col(textCol), 256).as("ck"))
    // materialize once: both reps and identityEdges branch from here, and
    // the leaf plan lets shingleSets' computeParallel spread reps even if
    // AQE coalesced the window shuffle down to a few partitions
    val withRep = Dedup.materialize(
      keyed.withColumn("rep_id", min(col("id")).over(Window.partitionBy(col("ck")))))
    val reps = withRep
      .filter(col("id") === col("rep_id"))
      .select(col("id").as(idCol), col("txt").as(textCol))
    val nearDupEdges = Dedup
      .ngramJaccardPairs(reps, idCol, textCol, n, threshold)
      .select(col("id_a"), col("id_b"))
    val identityEdges = withRep
      .filter(col("id") =!= col("rep_id"))
      .select(col("rep_id").as("id_a"), col("id").as("id_b"))
    // componentsAuto: dup clusters are usually tight (propagation wins),
    // but a chain-shaped near-dup corpus (sliding-window crawl shards)
    // would abort propagation's round bound — fall back to star
    // contraction instead of failing the whole pipeline
    componentsAuto(nearDupEdges.union(identityEdges), "id_a", "id_b")
      .select(col("id"), col("component").as("cluster_id"))
  }

  /** Per-node degree cap for SIMILARITY graphs — the SemDeDup-style
    * bound on edge mass before closure: keep an edge iff it ranks in
    * the top-`k` by (similarity desc, neighbor asc) for AT LEAST ONE
    * endpoint (the standard kNN-graph sparsification — an either-side
    * keep preserves the mutual strongest edges a tight dup cluster is
    * made of, so planted clusters survive intact, pinned in GraphSpec).
    *
    * Why it exists: at a fixed cosine threshold, TRUE edge mass on iid
    * data grows ∝ n² (constant per-pair tail probability), and ONE hub
    * node — a boilerplate vector every shard contains — has degree
    * ∝ n. Both blow up the closure's edge set while adding no cluster
    * information beyond the strongest few links per node. Capping
    * degree bounds edges ≤ n·k, making closure cost linear in corpus
    * size no matter what the threshold tail does.
    *
    * Output is the SUBSET of the input pair rows that survive (all
    * input columns preserved, orientation untouched) — drop-in before
    * [[componentsAuto]]. The per-node ranking is one window over the
    * symmetrized edges; a pathological hub pays one O(d log d) sort
    * task ONCE, and is precisely what leaves capped. Cap OFF (the
    * caller not invoking this) keeps exact-closure semantics — q62's
    * default path and oracle are unchanged.
    */
  def capDegree(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      simCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"degree cap must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val sym = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"), col(simCol).as("s"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v"), col(simCol).as("s")))
    val w = Window.partitionBy(col("u")).orderBy(col("s").desc, col("v"))
    val surviving = sym
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(least(col("u"), col("v")).as("__ka"), greatest(col("u"), col("v")).as("__kb"))
      .distinct()
    pairs.join(surviving,
      least(col(aCol), col(bCol)) === col("__ka") &&
        greatest(col(aCol), col(bCol)) === col("__kb"),
      "left_semi")
  }

  /** One row per component: the member maximizing (rankCol, then min
    * idCol) — the "keep this document, drop the rest" step of dedup.
    * `ranked` must contain idCol; rankCol comes from `attrs` (joined on
    * idCol), e.g. document length or a quality score.
    */
  def keepOnePerComponent(
      components: DataFrame, // (id, component)
      attrs: DataFrame,
      idCol: String,
      rankCol: String
  ): DataFrame = {
    val joined = components.join(attrs.select(col(idCol).as("id"), col(rankCol).as("rank")), Seq("id"))
    joined
      .groupBy(col("component"))
      .agg(max_by(col("id"), struct(col("rank"), -col("id"))).as("kept_id"))
  }

  /** PageRank over an undirected (aCol, bCol) pair graph, on an exact
    * INTEGER grid — the iterative vertex program that complements the
    * component algorithms: components say which docs are duplicates of
    * each other, centrality says which member of a neighborhood is the
    * most-connected representative (and, on real link graphs, is the
    * classic page-quality prior pretraining curation draws on).
    *
    * Arithmetic contract (what makes it cross-engine hash-exact, the
    * k-means oracle's integer-grid discipline): scores live on a
    * `scale` integer grid; per round each vertex emits
    * ⌊s·85 / (100·deg)⌋ to every neighbor and collects
    * ⌊scale·15 / (100·N)⌋ + Σ contributions — floor division on
    * non-negative longs, so every engine computes the identical
    * integers and the usual float-accumulation-order caveat does not
    * exist. The ~N·ε floor loss per round is deliberate (mass is not
    * renormalized); the ORDER of scores — what centrality is for — is
    * unaffected.
    *
    * Scale shape: edges materialize once; each round is one join on
    * the vertex key + one vertex-keyed aggregation — the same shuffle
    * profile as a label-propagation round, fixed iteration count (no
    * convergence scan).
    */
  def pagerankInt(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3,
      scale: Long = 1000000L
  ): DataFrame = {
    require(iters >= 1 && scale >= 1)
    val P = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // Edges clustered + sorted by `u` once: BOTH per-iteration joins
    // (scores on u=id, degrees on u) key on `u`, so neither moves the
    // edge set again (guide §2.4) — the only shuffle a PageRank round
    // pays is the contribution aggregate by `v`. The degree aggregate
    // itself runs exchange-free on the same layout, and `deg.count()`
    // is the one action that persists edges + deg together (the
    // checkpoints are lazy).
    val edges = Materialize.lazily(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .repartition(P, col("u"))
        .sortWithinPartitions("u"))
    val deg = Materialize.lazily(edges.groupBy(col("u")).agg(count(lit(1)).as("d")))
    val n   = deg.count()
    require(n > 0, "pagerankInt: empty graph")
    val base = scale * 15L / (100L * n)
    var scores = Materialize.lazily(deg.select(col("u").as("id"), lit(scale / n).as("s")))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(scores, edges("u") === scores("id"))
        .join(deg, Seq("u"))
        .select(col("v"), expr("(s * 85L) div (100L * d)").as("c"))
      scores = Materialize.lazily(
        contribs.groupBy(col("v"))
          .agg((lit(base) + sum(col("c"))).as("s"))
          .select(col("v").as("id"), col("s")))
    }
    scores.select(col("id"), col("s").as("score"))
  }
}
