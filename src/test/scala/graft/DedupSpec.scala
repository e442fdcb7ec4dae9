package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("shingles produces distinct word n-grams") {
    import spark.implicits._
    val got = Seq("a b c d a b c d")
      .toDF("t")
      .select(Dedup.shingles(split($"t", "\\s+"), 3).as("s"))
      .head()
      .getSeq[String](0)
    assert(got.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("ngramJaccardPairs finds planted near-dups and nothing else") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 1
      (3L, "completely different content with other words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("native minhash signature is bit-identical to the HOF reference form on real documents") {
    import spark.implicits._
    val base = Dedup
      .shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
      .filter(size($"shingle_set") > 0)
      .select($"doc_id", Dedup.minhashBaseHashes($"shingle_set").as("bh"))
    val native = base.select($"doc_id", Dedup.minhashFromHashes($"bh", 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = base.select($"doc_id", Dedup.minhashFromHashesHof($"bh", 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.nonEmpty)
    assert(native == hof, "native expression must reproduce the xxhash64 chain exactly")
  }

  test("native minhash matches the HOF form on arrays containing null elements") {
    import spark.implicits._
    val base = Seq(
      (1L, Seq(Some(7L), None, Some(-3L))),
      (2L, Seq(Option.empty[Long])),
      (3L, Seq.empty[Option[Long]])
    ).toDF("id", "bh")
    val native = base.select($"id", Dedup.minhashFromHashes($"bh", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val hof = base.select($"id", Dedup.minhashFromHashesHof($"bh", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(native == hof, "null elements must degenerate to the seed-side hash, like xxhash64 does")
  }

  test("native word n-grams equal the HOF reference form on real documents and edge cases") {
    import spark.implicits._
    for (n <- Seq(2, 3, 8)) {
      val toks = Tables.documents(spark, sfDir)
        .select($"doc_id", split($"text", "\\s+").as("t"))
      val native = toks.select($"doc_id", Dedup.shingles($"t", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = toks.select($"doc_id", Dedup.shinglesHof($"t", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native.nonEmpty)
      assert(native == hof, s"native n-grams diverged from the HOF form at n=$n")
    }
    // null tokens (concat_ws skips them), short arrays, repeats
    val edge = Seq(
      (1L, Seq(Some("a"), None, Some("b"), Some("a"), None, Some("b"))),
      (2L, Seq(Some("x"))),
      (3L, Seq.empty[Option[String]])
    ).toDF("id", "t")
    val native = edge.select($"id", Dedup.shingles($"t", 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = edge.select($"id", Dedup.shinglesHof($"t", 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == hof, "null-token / short-array behavior must match concat_ws semantics")
    // a NULL token array (null text → split yields null) must produce
    // an EMPTY shingle set, like the HOF form — the coalesce in
    // Dedup.shingles preserves this over the null-propagating native
    val nullArr = Seq((1L, Option.empty[String]), (2L, Some("a b c d")))
      .toDF("id", "text")
      .select($"id", Dedup.shingles(split($"text", "\\s+"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(nullArr(1L) == Some(Seq.empty), s"NULL token array must yield [], got ${nullArr(1L)}")
    assert(nullArr(2L).exists(_.nonEmpty))
  }

  test("minhashLshPairs agrees with exact ngram jaccard on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val exact = QueriesDedup
      .q25_ngram_jaccard_pairs(spark, sfDir)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = QueriesDedup
      .q26_minhash_lsh_pairs(spark, sfDir)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash near-dups have small hamming; unrelated docs large") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again and again we go"),
      (2L, "the quick brown fox jumps over the lazy cat tonight again and again we go"),
      (3L, "completely different content with other words entirely here now more words needed yes")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .simhashPairs(docs, "doc_id", "text", n = 3, maxHamming = 16)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(pairs((1L, 2L)) <= 16)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("multi-table ann lsh EQUALS brute force at every local sf (q31's oracle contract)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact  = QueriesDedup.q30_ann_topk(spark, dir).collect().map(_.toSeq).toSeq
      val approx = QueriesDedup.q31_ann_lsh_topk(spark, dir).collect().map(_.toSeq).toSeq
      assert(exact.nonEmpty)
      assert(approx == exact, s"LSH top-k diverged from brute force at $dir")
    }
  }

  test("filtered ANN: label constraint binds, IVF-filtered exact at nprobe=nlist (q121's contract)") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb       = Tables.embeddings(spark, dir)
      val queries   = emb.filter(col("vec_id") < 10)
      val exactRows = QueriesDedup.q121_ann_filtered(spark, dir).collect()
      assert(exactRows.nonEmpty)
      // every neighbor shares its query's label — the filter is the contract
      val labelOf = emb.select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(exactRows.forall(r => labelOf(r.getLong(0)) == labelOf(r.getLong(2))),
        s"a neighbor crossed the label constraint at $dir")
      // and it binds: the filtered ranking differs from the unfiltered one
      val unfiltered = QueriesDedup.q30_ann_topk(spark, dir).collect().map(_.toSeq).toSet
      assert(exactRows.map(_.toSeq).toSet != unfiltered,
        s"label filter was a no-op at $dir — test corpus degenerate?")
      // IVF-filtered at nprobe = nlist is exactly the filtered brute force
      val full = Similarity
        .ivfTopKFiltered(emb, queries, "vec_id", "embedding",
          matchCols = Seq("label"), k = 5, nlist = 16, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(_.toSeq).toSeq
      assert(full == exactRows.map(_.toSeq).toSeq,
        s"IVF-filtered at nprobe=nlist must equal filtered brute force at $dir")
      // pruned probe stays label-correct and never exceeds k per query
      val pruned = Similarity
        .ivfTopKFiltered(emb, queries, "vec_id", "embedding",
          matchCols = Seq("label"), k = 5, nlist = 16, nprobe = 4)
        .collect()
      assert(pruned.forall(r => labelOf(r.getLong(0)) == labelOf(r.getLong(2))))
      assert(pruned.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    }
  }

  test("IVF top-k: exact at nprobe=nlist (q57's oracle contract); monotone recall when pruning") {
    import graft.operators.Similarity
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exactRows = QueriesDedup.q30_ann_topk(spark, dir).collect()
      val exact     = exactRows.map(_.toSeq).toSeq
      // endpoint of the recall curve: probing every cell is exact by
      // construction, through the full index machinery
      val full = QueriesDedup.q57_ann_ivf_topk(spark, dir).collect().map(_.toSeq).toSeq
      assert(exact.nonEmpty)
      assert(full == exact, s"IVF at nprobe=nlist must equal brute force at $dir")
      // pruning operating points: recall@5 rises with nprobe. The floor
      // is deliberately modest — near-uniform synthetic vectors are
      // IVF's worst case (centroid proximity barely predicts neighbor
      // location); clustered real embeddings sit far above it.
      val emb     = Tables.embeddings(spark, dir)
      val exactNb = exactRows.map(r => (r.getLong(0), r.getLong(2))).toSet
      def recall(nprobe: Int): Double = {
        val got = Similarity
          .ivfTopK(emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nlist = 16, nprobe = nprobe)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        got.intersect(exactNb).size.toDouble / exactNb.size
      }
      val r4 = recall(4)
      val r8 = recall(8)
      info(f"IVF recall@5 at $dir: nprobe=4 -> $r4%.2f, nprobe=8 -> $r8%.2f")
      assert(r8 >= r4, s"recall must be monotone in nprobe at $dir ($r4 -> $r8)")
      assert(r4 >= 0.4, s"nprobe=4 recall $r4 collapsed at $dir")
      assert(r8 >= 0.6, s"nprobe=8 recall $r8 collapsed at $dir")
    }
    // the index must genuinely partition: every cell non-empty at nlist=16
    // (so nprobe/nlist is a real scanned-fraction bound, not a degenerate
    // single-cell scan)
    val cells = graft.operators.Similarity
      .ivfCells(Tables.embeddings(spark, sfDir), "vec_id", "embedding", nlist = 16)
      .groupBy("cell").count().collect()
    assert(cells.length == 16, s"expected 16 occupied cells, got ${cells.length}")
  }

  test("k-means-refined IVF centroids lift recall at fixed nprobe on a clustered corpus") {
    import graft.operators.Similarity
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    // 16 LOOSE clusters (sigma 0.25): loose enough that a cluster can
    // straddle two sample-centroid cells — the regime where refinement
    // earns its keep (tight clusters bucket together under any centroids)
    val dim  = 64
    val vecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id   = 0L
    for (_ <- 0 until 16) {
      val center = unit(Array.fill(dim)(rng.nextGaussian()))
      for (_ <- 0 until 25) {
        val m = unit(center.zip(Array.fill(dim)(rng.nextGaussian() * 0.25)).map { case (c, e) => c + e })
        vecs += ((id, m.map(_.toFloat).toSeq)); id += 1
      }
    }
    val df = vecs.toSeq.toDF("vec_id", "embedding").cache()
    val queries = df.filter($"vec_id" % 40 === 0) // one per few clusters
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(iters: Int, nprobe: Int): Double = {
      val got = Similarity
        .ivfTopK(df, queries, "vec_id", "embedding", k = 5,
          nlist = 16, nprobe = nprobe, kmeansIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r0 = recall(0, 2)
    val r5 = recall(5, 2)
    info(f"IVF recall@5 nprobe=2: sample centroids $r0%.2f, k-means(5) $r5%.2f")
    // measured: 0.44 -> 0.62 at this seed — refinement must deliver a
    // real lift, not just parity (clusters this loose are the hard case;
    // sigma*sqrt(dim) = 2 means noise dominates the cluster direction)
    assert(r5 > r0, s"refinement must lift recall on a clustered corpus ($r0 -> $r5)")
    assert(r5 >= 0.55, s"refined recall $r5 collapsed")
    // the exact endpoint survives refinement: nprobe = nlist scans all
    val full = recall(5, 16)
    assert(full == 1.0, s"nprobe=nlist must stay exact under refined centroids, got $full")
    df.unpersist()
  }

  test("blocked exact cosine pairs equal a reference nested-loop computation") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).limit(200).cache()
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val naive = a.join(b, $"id_a" < $"id_b") // reference-only BNLJ, never shipped in a query
      .filter(Similarity.cosine($"va", $"vb") >= 0.3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity
      .cosinePairsBlocked(emb, "vec_id", "embedding", threshold = 0.3, blocks = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(blocked == naive)
  }

  test("bucketed cosine pairs: exact on planted near-dup clusters, with real candidate pruning") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 20 clusters x 3 members (pairwise cosine ~>0.95) + 240 random vectors
    val dim = 64
    val vecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id = 0L
    for (_ <- 0 until 20) {
      val center = unit(Array.fill(dim)(rng.nextGaussian()))
      for (_ <- 0 until 3) {
        val m = unit(center.zip(Array.fill(dim)(rng.nextGaussian() * 0.03)).map { case (c, e) => c + e })
        vecs += ((id, m.map(_.toFloat).toSeq)); id += 1
      }
    }
    for (_ <- 0 until 240) { vecs += ((id, unit(Array.fill(dim)(rng.nextGaussian())).map(_.toFloat).toSeq)); id += 1 }
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val exact = Similarity.cosinePairsBlocked(df, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.cosinePairsBucketed(df, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"planted clusters should yield pairs, got ${exact.size}")
    assert(bucketed == exact, "bucketed LSH pairs must match exact output on near-dup data")
    val n = vecs.size.toLong
    val normed = df.select($"vec_id".as("id"), Similarity.normalized($"embedding").as("vn"))
    val candidates = Similarity.cosineBucketCandidates(normed, 8, 10, 64, 42L).count()
    assert(candidates < n * (n - 1) / 2 / 2,
      s"LSH candidates ($candidates) should prune well below all-pairs (${n * (n - 1) / 2})")
  }

  test("q79 approximate semantic dedup finds exactly the planted scaled-copy pairs at every sf") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val got = QueriesDedup.q79_semantic_dedup_approx(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val planted = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 50 === 0)
        .collect().map(_.getAs[Long]("vec_id")).sorted
        .map(id => (id, id + 1000000L)).toSeq
      assert(got == planted, s"approximate pairs must equal the planted set at $dir")
    }
  }

  test("lshPlan grows bucket bits with corpus size and holds the recall target") {
    // sf0.1-sized corpus reproduces the historical fixed plan's bits
    val (b1, t1) = Similarity.lshPlan(2040L, threshold = 0.8)
    assert(b1 == 8, s"sf0.1-scale plan must keep b=8, got $b1")
    assert(t1 >= 10 && t1 <= 12, s"sf0.1-scale tables ~10, got $t1")
    // 10x corpus: bucket count grows ~10x (constant occupancy)...
    val (b2, t2) = Similarity.lshPlan(20400L, threshold = 0.8)
    assert(b2 >= b1 + 3 && b2 <= b1 + 4, s"10x corpus must add ~log2(10) bits, got $b2")
    // ...and tables grow to compensate the lower per-table collision rate
    assert(t2 > t1, s"tables must grow with bits for the same recall, got $t2")
    // planned recall meets the target at both scales
    def recall(b: Int, t: Int): Double = {
      val p1 = math.pow(1.0 - math.acos(0.8) / math.Pi, b.toDouble)
      1.0 - math.pow(1.0 - p1, t.toDouble)
    }
    assert(recall(b1, t1) >= 0.84 && recall(b2, t2) >= 0.84)
  }

  test("scaled bucketed pairs equal the fixed-plan output (exact verification makes cost the only difference)") {
    import spark.implicits._
    // the q79 corpus shape: organic vectors + direction-preserved copies
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dups = emb.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val df = emb.select($"vec_id", $"embedding").unionByName(dups)
    val fixedPlan = Similarity.cosinePairsBucketed(df, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaled = Similarity.cosinePairsBucketedScaled(df, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixedPlan.nonEmpty, "planted copies must yield pairs")
    assert(scaled == fixedPlan, "plan choice must never change verified output")
  }

  test("native lsh buckets are value-identical to the relational form on real embeddings") {
    import graft.plans.LshExpression
    import spark.implicits._
    val (tables, planesPerTable, dim) = (16, 4, 64)
    val allPlanes  = (0 until tables).map(t => Similarity.hyperplanes(planesPerTable, dim, 42L + t))
    val planesFlat = LshExpression.flattenPlanes(allPlanes)
    val emb        = Tables.embeddings(spark, sfDir).limit(300)
    val native = emb.select($"vec_id",
      LshExpression.lshBuckets($"embedding", planesFlat, tables, planesPerTable, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val relational = emb.select($"vec_id",
      array(allPlanes.zipWithIndex.map { case (p, t) =>
        concat(lit(s"$t:"), Similarity.lshBucket($"embedding", p))
      }: _*).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.nonEmpty)
    assert(native == relational)
    // probe side: per-table [bucket, flip0..flip(r-1)] in the old
    // flatten(transform(probeBuckets(...))) order
    val nativeProbe = emb.select($"vec_id",
      LshExpression.lshProbeBuckets($"embedding", planesFlat, tables, planesPerTable, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val relationalProbe = emb.select($"vec_id",
      flatten(array(allPlanes.zipWithIndex.map { case (p, t) =>
        transform(
          Similarity.probeBuckets(Similarity.lshBucket($"embedding", p), planesPerTable),
          b => concat(lit(s"$t:"), b))
      }: _*)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(nativeProbe == relationalProbe)
  }

  test("native simhash bit-vote is bit-identical to the HOF reference on real documents") {
    import spark.implicits._
    val base = Dedup
      .shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
      .filter(size($"shingle_set") > 0)
    val native = base.select($"doc_id", Dedup.simhash64($"shingle_set").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hof = base.select($"doc_id", Dedup.simhash64Hof($"shingle_set").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native.nonEmpty)
    assert(native == hof)
    // empty shingle array degenerates to all-zero in both forms
    val empty = Seq(Seq.empty[String]).toDF("ss")
    assert(empty.select(Dedup.simhash64($"ss")).head().getString(0) == "0" * 64)
    assert(empty.select(Dedup.simhash64Hof($"ss")).head().getString(0) == "0" * 64)
  }

  test("simhash chunk-combination index (chunks=6) is exact: equals the classic m+1 pigeonhole") {
    val classic = Dedup.simhashPairs(Tables.documents(spark, sfDir), "doc_id", "text", n = 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wide = Dedup.simhashPairs(Tables.documents(spark, sfDir), "doc_id", "text",
      n = 3, maxHamming = 3, chunks = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(classic.nonEmpty)
    assert(wide == classic, "wider chunk-combination index must not change the exact result")
  }

  test("simhash bucket occupancy surfaces a skewed (hot) bucket before it becomes a straggler") {
    import spark.implicits._
    val hot = (0 until 60).map(i => (i.toLong, "identical content repeated for the hot bucket case yes"))
    val cold = (60 until 80).map(i => (i.toLong, s"distinct filler number $i with words ${i * 7} and ${i * 13} mixed"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val occ = Dedup.simhashBucketOccupancy(docs, "doc_id", "text", n = 3, maxHamming = 3)
      .orderBy($"n_docs".desc)
      .collect()
    assert(occ.head.getLong(2) >= 60, s"hot bucket must dominate occupancy, got ${occ.head}")
    // and the exact pair count over the skewed bucket still comes out right
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", n = 3, maxHamming = 0)
    assert(pairs.filter($"id_a" < 60 && $"id_b" < 60).count() == 60L * 59 / 2)
  }

  test("incremental dedup equals full pair detection filtered to batch-touching pairs") {
    import spark.implicits._
    val docs   = Tables.documents(spark, sfDir)
    val batch  = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val incremental = Dedup
      .incrementalNearDupPairs(corpus, batch, "doc_id", "text", n = 3, k = 64, bands = 32,
        threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup
      .minhashLshPairs(docs, "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 10 == 0 || b % 10 == 0 }
      .toSet
    assert(full.nonEmpty, "the planted near-dups should include batch-touching pairs")
    assert(incremental == full)
  }

  test("cosine matches a reference computation") {
    import spark.implicits._
    val got = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine($"a", $"b"))
      .head()
      .getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("mean pooling: ordered deterministic form agrees with the streaming-partial avg form") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).withColumn("doc", $"vec_id" % 50)
    val ordered = Similarity.meanPoolOrdered(emb, "doc", "vec_id", "embedding", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val fast = Similarity.meanPool(emb, "doc", "embedding", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(ordered.nonEmpty && ordered.keySet == fast.keySet)
    val maxDiff = ordered.map { case (k, v) => math.abs(v - fast(k)) }.max
    assert(maxDiff < 1e-12, s"pooling forms diverged beyond float noise: $maxDiff")
    // and the ordered form is bit-stable across independent evaluations
    val again = Similarity.meanPoolOrdered(emb, "doc", "vec_id", "embedding", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again == ordered, "ordered pooling must be bit-deterministic")
  }

  test("JL sign projection: codegen path is bit-exact vs a plain Scala loop; pairwise geometry survives") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    // codegen path vs an independent plain-Scala left-to-right loop —
    // must be BIT-exact (same IEEE op sequence), which is also what
    // q89's oracle relies on cross-engine
    val signs = Similarity.signMatrix(16, 64)
    val got = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding",
        Similarity.signProjection($"embedding", dOut = 16, dim = 64).as("pv"))
      .collect()
    got.foreach { r =>
      val v  = r.getSeq[Float](1)
      val pv = r.getSeq[Double](2)
      for (j <- 0 until 16) {
        var acc = 0.0
        for (i <- 0 until 64) acc += v(i).toDouble * signs(j)(i).toDouble
        assert(pv(j) == acc, s"vec ${r.getLong(0)} dim $j: codegen ${pv(j)} != scala $acc")
      }
    }
    // JL contract (Achlioptas 2003): for pairs, the scaled projected
    // squared distance (×dim/dOut... the sign matrix is unnormalized, so
    // E[|Px|²] = dOut·|x|²; compare |Pa−Pb|²/dOut against |a−b|²) stays
    // within a loose distortion band for the vast majority of pairs at k=16
    val projected = emb
      .select($"vec_id", Similarity.signProjection($"embedding", 16, 64).as("pv"))
    val sample = emb.filter($"vec_id" < 40)
      .select($"vec_id".as("ida"), $"embedding".as("va"))
      .join(projected.filter($"vec_id" < 40).select($"vec_id".as("ida"), $"pv".as("pa")), Seq("ida"))
    val pairs = sample
      .join(sample.select($"ida".as("idb"), $"va".as("vb"), $"pa".as("pb")), $"ida" < $"idb")
      .select(
        (Similarity.dot($"va" , $"va") + Similarity.dot($"vb", $"vb")
          - lit(2.0) * Similarity.dot($"va", $"vb")).as("d2"),
        ((Similarity.dot($"pa", $"pa") + Similarity.dot($"pb", $"pb")
          - lit(2.0) * Similarity.dot($"pa", $"pb")) / lit(16.0)).as("p2"))
      .collect()
    val ratios = pairs.map(r => r.getDouble(1) / r.getDouble(0))
    val within = ratios.count(x => x > 0.3 && x < 1.7).toDouble / ratios.length
    info(f"JL k=16: ${ratios.length} pairs, mean ratio ${ratios.sum / ratios.length}%.2f, within [0.3,1.7]: $within%.2f")
    assert(within > 0.9, s"distance distortion at k=16 exceeded the loose JL band for ${1 - within} of pairs")
  }

  test("substringPairs finds planted exact runs and measures max_run exactly") {
    import spark.implicits._
    import graft.operators.Dedup
    def words(tag: String, n: Int): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    // doc 1 and 2 share a planted 12-token run (in different contexts);
    // doc 3 shares nothing; doc 4 repeats doc 1 verbatim (30 tokens)
    val shared = words("s", 12)
    val docs = Seq(
      (1L, words("a", 9) + " " + shared + " " + words("b", 9)),
      (2L, words("c", 5) + " " + shared + " " + words("d", 4)),
      (3L, words("e", 30)),
      (4L, words("a", 9) + " " + shared + " " + words("b", 9))
    ).toDF("doc_id", "text")
    val out = Dedup.substringPairs(docs, "doc_id", "text", k = 8)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pair (1,2): only the 12-token run matches -> 5 anchors (12-8+1), max_run 12
    // pair (1,4): identical 30-token docs -> 23 anchors, max_run 30
    // pair (2,4): the shared run again
    assert(out.toSeq == Seq(
      (1L, 2L, 5L, 12L), (1L, 4L, 23L, 30L), (2L, 4L, 5L, 12L)))
    // the maxDf cap drops hot grams: with the run shared by 3 docs and
    // cap 2 (each shared gram occurs 3x > 2), only the verbatim-copy
    // pair survives through its unique context grams
    val capped = Dedup.substringPairs(docs, "doc_id", "text", k = 8, maxDf = Some(2L))
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 4L)))
    // below-k docs never anchor
    val tiny = Seq((9L, "one two three")).toDF("doc_id", "text")
    assert(Dedup.substringPairs(docs.unionByName(tiny), "doc_id", "text", k = 8)
      .filter($"doc_a" === 9L || $"doc_b" === 9L).count() == 0)
  }

  test("containment pairs: embedded doc scores 1 toward its host, not back") {
    import spark.implicits._
    val short = "alpha beta gamma delta"
    val docs = Seq(
      (1L, short),
      (2L, s"intro words here $short plus trailing chrome tokens now"),
      (3L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1's 2 shingles both appear in doc 2 → C(1→2) = 1; doc 2 has
    // many more shingles → C(2→1) = 2/|S2| < 0.8 and must NOT appear
    assert(rows.keySet == Set((1L, 2L)))
    val (nShared, sizeA, c) = rows((1L, 2L))
    assert(nShared == 2L && sizeA == 2L && c == 1.0)
  }

  test("weighted sample: content-addressed keys match an independent recompute") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_spec_wsample").toString
    val docs = (1L to 80L).map(i => (i, "txt", "en", s"src${i % 3}", 10L * (i % 7 + 1)))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def key(id: Long, w: Long): Double = {
      val md  = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 13)
      math.log((java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0) / w
    }
    val expected = docs
      .map { case (id, _, _, src, w) => (id, src, w, key(id, w)) }
      .sortBy { case (id, _, _, k) => (-k, id) }
      .take(50)
      .sortBy(_._1)
      .map { case (id, src, w, k) =>
        (id, src, w, BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val got = QueriesCorpus.q178_weighted_sample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.size == 50)
    assert(got == expected)
    // reproducible: a second run returns the identical sample
    val again = QueriesCorpus.q178_weighted_sample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(again == got)
  }

  test("minhash calibration: identical docs estimate exactly, strangers never pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_spec_calib").toString
    Seq(
      (1L, "x y z w", "en", "s", 7L),
      (2L, "x y z w", "en", "s", 7L), // exact copy → jaccard 1, est 1
      (3L, "p q r t", "en", "s", 7L)  // no shared shingle → no candidate
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesDedup.q183_minhash_calibration(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // identical shingle sets: every signature component matches, zero error
    assert(r.getLong(0) == 10L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0)
  }

  test("simhash calibration: identical docs sit at hamming 0 in the top decile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_spec_shcal").toString
    Seq(
      (1L, "x y z w", "en", "s", 7L),
      (2L, "x y z w", "en", "s", 7L),
      (3L, "p q r t", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesDedup.q195_simhash_calibration(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0)
  }

  test("rrf fusion: agreeing rankings fuse to exactly 2/(60+rank)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_spec_rrf").toString
    // lossless PQ corpus (the q192 fixture): ADC ranking ≡ exact
    // ranking, so both lists agree and rrf(rank r) = 2/(60+r)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 12L).map(i => (i, Array.fill(64)(rnd.nextFloat() - 0.5f), 0))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = QueriesDedup.q199_rrf_fusion(spark, dir).collect()
    assert(rows.length == 80) // 8 queries x top-10
    rows.foreach { r =>
      val rank = r.getInt(1)
      val expect = BigDecimal(1.0 / (60 + rank) + 1.0 / (60 + rank))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"rank $rank fused ${r.getDouble(3)} != $expect")
    }
  }

  test("lsh operating curve: closed-form S-curve values at the q26 parameters") {
    import spark.implicits._
    val rows = QueriesDedup.q206_lsh_curve(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 19)
    def p(j: Double) = {
      var m = 1.0 - j * j
      (1 to 5).foreach(_ => m = m * m) // m^32 by squaring
      BigDecimal(1.0 - m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows(50L) == p(0.50)) // the q26 threshold reads ≈ 0.9999
    assert(rows(50L) > 0.999)
    assert(rows(10L) == p(0.10)) // low-jaccard pairs rarely collide
    assert(rows(10L) < 0.3)
    assert(rows(95L) == 1.0)
  }

  test("pq recall: a losslessly-encodable corpus scores recall 1.0 everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_spec_pqrec").toString
    // 12 vectors < ksub=16 → every subvector becomes its own centroid,
    // the ADC ranking equals the exact ranking, recall@10 = 1.0
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 12L).map(i => (i, Array.fill(64)(rnd.nextFloat() - 0.5f), 0))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = QueriesDedup.q192_pq_recall(spark, dir).collect()
    assert(rows.length == 8) // queries vec_id < 8
    rows.foreach { r =>
      assert(r.getLong(1) == 10L && r.getLong(2) == 10L && r.getDouble(3) == 1.0)
    }
  }
}
