package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization: encode/decode invariants, ADC ≡ decoded dot,
  * exact top-k over the snapped corpus, and the Lloyd-refinement
  * quality contract (quantization error drops, recall does not).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8; private val K = 16; private val D = 8

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val cb  = Pq.train(emb, "vec_id", "embedding", m = M, ksub = K, dsub = D, seed = 42L)

  test("codes are m ids in [0, ksub); decode is the centroid concatenation") {
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    val bad = codes
      .filter(size($"codes") =!= M ||
        exists($"codes", c => c < 0 || c >= K))
      .count()
    assert(bad == 0)
    // decode reproduces the codebook entries positionally
    val row = codes
      .select($"id", $"codes", Pq.decode($"codes", cb).as("sv"))
      .head()
    val cs = row.getSeq[Int](1)
    val sv = row.getSeq[Double](2)
    assert(sv.length == M * D)
    for (j <- 0 until M; i <- 0 until D)
      assert(sv(j * D + i) == cb.flat((j * K + cs(j)) * D + i))
  }

  test("encoding is deterministic across independent runs and plans") {
    val a = Pq.encodeCorpus(emb, "vec_id", "embedding", cb).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val cb2 = Pq.train(emb, "vec_id", "embedding", m = M, ksub = K, dsub = D, seed = 42L)
    val b = Pq.encodeCorpus(emb, "vec_id", "embedding", cb2).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(cb.flat.sameElements(cb2.flat), "sampled codebook must be run-deterministic")
    assert(a == b)
  }

  test("ADC score equals dot(query, decode(codes)) up to summation grouping") {
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    val q = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), Similarity.normalized($"embedding").as("qn"))
    val both = codes
      .join(broadcast(q), $"query_id" =!= $"id")
      .select(
        Pq.adc($"qn", $"codes", cb).as("adc"),
        Similarity.dot($"qn", Pq.decode($"codes", cb)).as("full"))
      .select(max(abs($"adc" - $"full")).as("maxdiff"))
      .head().getDouble(0)
    assert(both < 1e-12, s"ADC must equal the decoded dot up to grouping, diff=$both")
  }

  test("ADC top-k IS the exact brute-force top-k over the snapped corpus") {
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    val queries = emb.filter($"vec_id" < 8)
    val viaAdc = Pq.topK(codes, queries, "vec_id", "embedding", k = 10, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // reference: materialize the snapped corpus and brute-force it
    val snapped = codes.select($"id".as("vec_id"), Pq.decode($"codes", cb).as("embedding"))
    val qn = queries.select($"vec_id".as("query_id"), Similarity.normalized($"embedding").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
    val ref = snapped
      .join(broadcast(qn), $"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        Similarity.dot($"qn", $"embedding").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(viaAdc == ref)
  }

  test("IVF-PQ at nprobe = nlist equals the flat ADC scan; pruning scans a cell subset") {
    val queries = emb.filter($"vec_id" < 8)
    val flat = Pq.topK(Pq.encodeCorpus(emb, "vec_id", "embedding", cb),
      queries, "vec_id", "embedding", k = 10, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 10, cb,
      nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == flat, "nprobe = nlist must reproduce the flat ADC ranking exactly")
    // pruned probe: still k valid rows per query, drawn from probed cells
    val pruned = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 10, cb,
      nlist = 16, nprobe = 4)
      .collect()
    assert(pruned.length == 8 * 10)
    val prunedSets = pruned.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val flatSets   = flat.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val recall = flatSets.map { case (q, f) => (prunedSets.getOrElse(q, Set.empty[Long]) & f).size.toDouble / f.size }
    info(f"IVF-PQ recall@10 at nprobe/nlist=1/4 vs flat ADC: ${recall.sum / recall.size}%.2f")
  }

  test("q99 planted-copies construction: copies fill the pruned top-10 with a real score margin") {
    // the oracle argument, asserted: ten half-scale copies of each
    // query share its normalized vector bit-exactly, so they carry the
    // maximal ADC self-score; no organic vector may reach it, and the
    // probe must be genuinely pruned (nprobe < nlist)
    val queries = emb.filter($"vec_id" < 8)
    val copies = queries
      .select($"vec_id", $"embedding", explode(sequence(lit(0), lit(9))).as("i"))
      .select(
        ($"vec_id" * 100 + $"i" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)
    val got = QueriesDedup.q99_ann_ivfpq_pruned(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val expect = for (q <- 0L until 8L; i <- 0 until 10)
      yield (q, i + 1, 1000000L + q * 100 + i)
    assert(got == expect, "pruned top-10 must be exactly the planted copies, id-ordered")
    // margin: best ORGANIC ADC score strictly below the copy self-score
    val codes = Pq.encodeCorpus(corpus, "vec_id", "embedding", cb)
    val qn = queries.select($"vec_id".as("query_id"), Similarity.normalized($"embedding").as("qn"))
    val scored = codes.join(broadcast(qn), $"query_id" =!= $"id")
      .select($"query_id", $"id", Pq.adc($"qn", $"codes", cb).as("s"))
    // own copies of query q live at [1000000 + 100q, 1000000 + 100q + 9];
    // every OTHER candidate (organic rows AND other queries' copies)
    // must score strictly below them
    val ownLo  = lit(1000000L) + $"query_id" * 100
    val isOwn  = $"id" >= ownLo && $"id" <= ownLo + 9
    val self   = scored.filter(isOwn).groupBy($"query_id").agg(min($"s").as("selfs"))
    val others = scored.filter(!isOwn).groupBy($"query_id").agg(max($"s").as("others"))
    val margins = self.join(others, "query_id")
      .select(($"selfs" - $"others").as("m")).collect().map(_.getDouble(0))
    info(f"min copy-vs-rest ADC margin: ${margins.min}%.3f")
    assert(margins.min > 0.05, s"planted-copy margin too thin: ${margins.min}")
    // and the operating point actually prunes: 4 of 16 cells per query
    val cent = Similarity.centroids(corpus, "vec_id", "embedding", 16, 42L, kmeansIters = 0)
    val probed = Similarity.probeCells(queries, cent, "vec_id", "embedding", nprobe = 4)
      .groupBy($"query_id").agg(countDistinct($"cell").as("nc"))
      .collect().map(_.getLong(1))
    assert(probed.forall(_ == 4), s"each query must probe exactly 4 of 16 cells, got ${probed.toSeq}")
  }

  test("PQ recall@10 vs exact search is reasonable and Lloyd refinement does not regress it") {
    def topkSets(c: Pq.Codebook): Map[Long, Set[Long]] = {
      val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", c)
      Pq.topK(codes, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10, c)
        .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    }
    val exact = Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 10)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) => (approx.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    val r0 = recall(topkSets(cb))
    val cbR = Pq.train(emb, "vec_id", "embedding", m = M, ksub = K, dsub = D, seed = 42L, kmeansIters = 3)
    val r3 = recall(topkSets(cbR))
    info(f"PQ recall@10: sampled=$r0%.2f refined=$r3%.2f")
    // 16 centroids × 8 subspaces on 64-dim gaussian data is a coarse
    // quantizer — recall is bounded away from zero, not from one; the
    // REFINED codebook is the quality path and must not regress.
    assert(r0 > 0.2, s"sampled-codebook recall collapsed: $r0")
    assert(r3 >= r0 - 0.05, s"refinement regressed recall: $r0 -> $r3")
  }

  test("Lloyd refinement reduces quantization error") {
    def qerr(c: Pq.Codebook): Double = {
      val n = Similarity.normalized($"embedding")
      emb.select(
        Similarity.dot($"embedding", $"embedding").as("ignore"),
        n.as("vn"))
        .select($"vn", Pq.decode(Pq.encode($"vn", c), c).as("sv"))
        .select(
          (Similarity.dot($"vn", $"vn") + Similarity.dot($"sv", $"sv")
            - lit(2.0) * Similarity.dot($"vn", $"sv")).as("e2"))
        .agg(avg($"e2")).head().getDouble(0)
    }
    val e0 = qerr(cb)
    val e3 = qerr(Pq.train(emb, "vec_id", "embedding", m = M, ksub = K, dsub = D, seed = 42L, kmeansIters = 3))
    info(f"mean squared quantization error: sampled=$e0%.4f refined=$e3%.4f")
    assert(e3 < e0, s"k-means refinement must reduce quantization error ($e0 -> $e3)")
  }
}
