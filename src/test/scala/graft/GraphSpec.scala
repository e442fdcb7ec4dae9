package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("connectedComponents labels a chain, a triangle, and an isolated edge correctly") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // triangle 10-11-12, lone edge 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Graph.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L
    ))
  }

  test("reliable-checkpoint mode: a session checkpoint dir gives identical components") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val localMode = Graph.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    assert(spark.sparkContext.getCheckpointDir.isEmpty, "suite assumes no ambient checkpoint dir")
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val reliableMode = Graph.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliableMode == localMode, "checkpoint mode must not change results")
      // prove the reliable path actually ran: checkpoint data landed on disk
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .anyMatch(p => java.nio.file.Files.isRegularFile(p))
      assert(wrote, s"expected reliable checkpoint files under $ckptDir")
    } finally {
      spark.sparkContext.setCheckpointDir(null) // back to local mode for other suites
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
    }
  }

  test("star contraction equals label propagation on a 40-hop chain (where default propagation aborts)") {
    import spark.implicits._
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // diameter 39 > default maxIter=25: propagation's round budget aborts…
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(chain, "id_a", "id_b")
    }
    // …while star contraction converges in O(log n) rounds
    val star = Graph.connectedComponentsStar(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == (1L to 40L).map(_ -> 1L).toMap)
    // and equals propagation given enough rounds
    val prop = Graph.connectedComponents(chain, "id_a", "id_b", maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("star contraction equals label propagation on cliques, bridges and random graphs") {
    import spark.implicits._
    def compare(pairs: org.apache.spark.sql.DataFrame): Unit = {
      val star = Graph.connectedComponentsStar(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = Graph.connectedComponents(pairs, "id_a", "id_b", maxIter = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"star/propagation disagree on ${pairs.collect().toSeq}")
    }
    // two cliques joined by a bridge + an isolated edge
    val cliqueA = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val cliqueB = for { i <- 11L to 15L; j <- (i + 1) to 15L } yield (i, j)
    compare((cliqueA ++ cliqueB ++ Seq((5L, 11L), (30L, 31L))).toDF("id_a", "id_b"))
    // seeded random graphs: sparse (many components) and denser (few)
    val rnd = new scala.util.Random(42)
    for (nEdges <- Seq(30, 120)) {
      val edges = Seq.fill(nEdges)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      compare(edges.toDF("id_a", "id_b"))
    }
  }

  test("capDegree bounds edges to n·k, keeps planted clusters intact, and severs the hub") {
    import graft.operators.Graph
    import spark.implicits._
    // two planted 4-cliques with strong internal edges (sim 0.9) + one
    // HUB vertex (100) weakly connected (sim 0.5) to every other vertex
    // — the boilerplate-vector shape that merges everything into one
    // blob when closure runs uncapped
    val cliqueA = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 0.9)
    val cliqueB = for { a <- 11L to 14L; b <- (a + 1) to 14L } yield (a, b, 0.9)
    val hub     = (1L to 4L).map(v => (v, 100L, 0.5)) ++ (11L to 14L).map(v => (v, 100L, 0.5))
    val pairs   = (cliqueA ++ cliqueB ++ hub).toDF("id_a", "id_b", "cos")

    // uncapped: the hub glues both cliques into ONE component
    val uncapped = Graph.componentsAuto(pairs, "id_a", "id_b")
    assert(uncapped.select("component").distinct().count() == 1)

    // capped at k=3 (clique degree): every clique edge survives (each
    // clique node's top-3 are its 0.9 links, so spokes drop from the
    // clique side) and the HUB keeps only its own 3 strongest spokes
    // (either-side keep, here v=1,2,3) — degree is bounded at k, so
    // the hub can no longer glue the two cliques together
    val capped = Graph.capDegree(pairs, "id_a", "id_b", "cos", k = 3)
    assert(capped.count() == (cliqueA ++ cliqueB).size.toLong + 3,
      "the 12 clique edges + the hub's own top-3 spokes must survive a k=3 cap")
    val comps = Graph.componentsAuto(capped, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(comps).toSet.size == 1)
    assert((11L to 14L).map(comps).toSet.size == 1)
    assert(comps(1L) != comps(11L), "capped closure must separate the planted clusters")

    // either-side keep: an edge in ONE endpoint's top-k survives even
    // if the other endpoint is saturated — k=1 on a star keeps every
    // spoke (each leaf's only edge), bounding edges at n·k
    val star = (2L to 6L).map(v => (1L, v, 1.0 / v)).toDF("id_a", "id_b", "cos")
    assert(Graph.capDegree(star, "id_a", "id_b", "cos", k = 1).count() == 5)

    // all input columns and orientation pass through untouched
    val withExtra = pairs.withColumn("tag", concat(lit("e"), $"id_a"))
    val kept = Graph.capDegree(withExtra, "id_a", "id_b", "cos", k = 3)
    assert(kept.columns.toSeq == Seq("id_a", "id_b", "cos", "tag"))
  }

  test("q62 with a degree cap returns the same clusters when no hub exists (sf0.001)") {
    // on the real embeddings fixture a generous cap must be a no-op:
    // the exact path and the capped path agree wherever degree ≤ k
    val exact = QueriesCorpus.q62_semantic_dedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = QueriesCorpus.q62_semantic_dedup(spark, sfDir, degreeCap = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(capped == exact, "a cap above max degree must not change q62")
  }

  test("keepOnePerComponent picks greatest rank, breaking ties on smallest id") {
    import spark.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "component")
    val attrs = Seq((1L, 100L), (2L, 300L), (3L, 300L), (10L, 5L), (11L, 5L)).toDF("doc_id", "len")
    val got = Graph.keepOnePerComponent(comps, attrs, "doc_id", "len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 10L -> 10L)) // 2 beats 3 on id at equal rank; 10 beats 11
  }

  test("composed dedup pipeline (collapse-first) equals direct clustering on a dup-heavy corpus") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight again"),
      (1L, "the quick brown fox jumps over the lazy cat tonight again"), // near-dup of 0
      (2L, "completely different content with other words entirely here now"),
      (3L, "short doc"), // < 3 tokens -> can never pair
      (4L, "a totally unrelated document about databases and storage engines today")
    )
    // duplicate every doc 4x with fresh ids -> identity groups + cross-group near-dups
    val docs = base.flatMap { case (id, t) => (0 until 4).map(c => (id + c * 100L, t)) }
      .toDF("doc_id", "text")
    val direct = Graph
      .connectedComponents(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
          .select("id_a", "id_b"),
        "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Graph
      .nearDupClusters(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct.nonEmpty)
    assert(composed == direct,
      "collapse-first pipeline must produce the identical transitive closure")
    // docs 0 and 1 (and all copies) merge into one cluster; 3 never appears
    assert(composed(301L) == 0L && composed(201L) == 0L)
    assert(!composed.contains(3L) && !composed.contains(103L))
  }

  test("nearDupClusters survives a chain-shaped corpus via the star-contraction fallback") {
    import spark.implicits._
    // sliding-window docs: doc i = tokens [5i, 5i+30). Consecutive docs
    // share 23 of 33 distinct 3-gram shingles (J≈0.70 ≥ 0.6); skip-one
    // pairs share 18 of 38 (J≈0.47 < 0.6) — so the near-dup graph is a
    // pure 50-hop CHAIN, exactly the shape that aborts plain
    // propagation's round budget (componentsAuto must fall back to star
    // contraction instead of failing the pipeline).
    val docs = (0 until 50)
      .map(i => (i.toLong, (5 * i until 5 * i + 30).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val edges = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == (0L until 49L).map(i => (i, i + 1)).toSet, s"expected a pure chain, got $edges")
    val clusters = Graph.nearDupClusters(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == (0L until 50L).map(_ -> 0L).toMap,
      "the whole chain must land in one cluster labeled by its min id")
  }

  test("q38/q39 pipeline clusters the planted near-dups on real documents") {
    val clusters = QueriesDedup.q38_dedup_clusters(spark, sfDir).collect()
    assert(clusters.nonEmpty, "planted near-dups should form clusters")
    val byCluster = clusters.groupBy(_.getLong(1))
    assert(byCluster.values.forall(_.length >= 2), "every cluster has >= 2 members")
    val kept = QueriesDedup.q39_dedup_keep_one(spark, sfDir).collect()
    assert(kept.length == byCluster.size, "exactly one kept doc per cluster")
    val memberSet = clusters.map(_.getLong(0)).toSet
    assert(kept.map(_.getLong(1)).forall(memberSet.contains), "kept docs come from their clusters")
  }

  test("pagerankInt matches a hand-rolled integer reference on a path graph") {
    import spark.implicits._
    import graft.operators.Graph
    // path 1–2–3 plus an isolated pair 4–5
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Graph.pagerankInt(pairs, "id_a", "id_b", iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: same floor arithmetic in plain Scala
    val edges = Seq(1L -> 2L, 2L -> 3L, 4L -> 5L).flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg   = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n     = deg.size.toLong
    val base  = 1000000L * 15L / (100L * n)
    var s     = deg.keys.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 3) {
      val contribs = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => s(u) * 85L / (100L * deg(u)) }.sum
      }
      s = contribs.map { case (v, c) => v -> (base + c) }
    }
    assert(got == s, s"engine $got vs reference $s")
    // the path's middle vertex is the most central; the isolated pair ties
    assert(got(2L) > got(1L) && got(1L) == got(3L) && got(4L) == got(5L))
  }

  test("q213 centrality is conserved-mass and peaks inside clusters at sf0.001") {
    val rows = QueriesDedup.q213_dup_graph_centrality(spark, sfDir).collect()
    assert(rows.nonEmpty, "the planted near-dups must produce a graph")
    val total = rows.map(_.getLong(1)).sum
    // floor losses only: total within 1% of the 10^6 grid
    assert(total <= 1000000L && total > 990000L, s"mass $total")
  }
}
