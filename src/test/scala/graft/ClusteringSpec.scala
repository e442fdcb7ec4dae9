package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** Deterministic k-means and the cluster-scoped curation family
  * (SemDeDup, balanced sampling). The oracle (q138–q140) pins
  * cross-engine exactness; these tests pin the OPERATOR invariants:
  * planted geometry lands where it must, the run is bit-reproducible,
  * Lloyd iterations never increase total distortion on a planted set,
  * and the SemDeDup/draw rules hold row-by-row.
  */
class ClusteringSpec extends SparkSpec {

  private def planted() = {
    import spark.implicits._
    // two tight blobs on opposite axes + one straggler near blob A:
    // seeds (ids 0,1) fall one in each blob, so k=2 must separate them
    val a   = Array.fill(8)(0.0f)
    val b   = Array.fill(8)(0.0f)
    val mkA = (eps: Float) => { val v = a.clone(); v(0) = 1.0f + eps; v }
    val mkB = (eps: Float) => { val v = b.clone(); v(1) = 1.0f + eps; v }
    Seq(
      (0L, mkA(0.00f), 0), (2L, mkA(0.01f), 0), (4L, mkA(-0.01f), 0), (6L, mkA(0.02f), 0),
      (1L, mkB(0.00f), 1), (3L, mkB(0.01f), 1), (5L, mkB(-0.01f), 1), (7L, mkB(0.02f), 1)
    ).toDF("vec_id", "embedding", "expected")
  }

  test("planted blobs separate; assignment is reproducible bit-for-bit") {
    val df  = planted()
    val out = Clustering.kmeans(df, "vec_id", "embedding", k = 2, iters = 2).collect()
    val exp = df.select("vec_id", "expected").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length == 8)
    out.foreach(r => assert(r.getInt(1) == exp(r.getLong(0)),
      s"vec ${r.getLong(0)} landed in ${r.getInt(1)}"))
    val again = Clustering.kmeans(df, "vec_id", "embedding", k = 2, iters = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted ==
      again.map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted)
  }

  test("an extra iteration never increases total distortion (Lloyd monotonicity)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    def distortion(iters: Int): Double = {
      val assigned = Clustering.kmeans(emb, "vec_id", "embedding", k = 8, iters = iters)
        .join(emb, Seq("vec_id"))
      // recompute each cluster's mean on the quantized grid, then sum
      // squared distances — the objective Lloyd minimizes
      val q = assigned.withColumn("vq", Clustering.quantized($"embedding"))
        .select($"cluster", posexplode($"vq").as(Seq("pos", "v")))
      val cents = q.groupBy("cluster", "pos")
        .agg((sum($"v") / count(lit(1))).as("c"))
      q.join(cents, Seq("cluster", "pos"))
        .select((($"v" - $"c") * ($"v" - $"c")).as("d2"))
        .agg(sum($"d2")).collect()(0).getDouble(0)
    }
    val d1 = distortion(1)
    val d2 = distortion(2)
    val d3 = distortion(3)
    assert(d2 <= d1 + 1e-6, s"iter2 distortion $d2 > iter1 $d1")
    assert(d3 <= d2 + 1e-6, s"iter3 distortion $d3 > iter2 $d2")
  }

  test("semdedup survivors: no within-cluster pair ≥ threshold remains; dropped ids had a smaller keeper") {
    import spark.implicits._
    val dir  = sfDir
    val emb  = Tables.embeddings(spark, dir)
    val out  = QueriesCorpus.q139_semdedup(spark, dir)
    val surv = out.select($"vec_id", $"cluster")
    // survivors are pairwise below threshold within a cluster
    val a = surv.join(emb, Seq("vec_id")).select($"cluster", $"vec_id".as("ia"), $"embedding".as("va"))
    val b = surv.join(emb, Seq("vec_id")).select($"cluster", $"vec_id".as("ib"), $"embedding".as("vb"))
    val bad = a.join(b, Seq("cluster"))
      .filter($"ia" < $"ib" && graft.operators.Similarity.cosine($"va", $"vb") >= 0.45)
      .count()
    assert(bad == 0L, s"$bad near-dup pairs survive")
    // every dropped id has a smaller-id near-dup in its cluster (the keep rule)
    val assigned = QueriesCorpus.q138_kmeans_clusters(spark, dir)
    val dropped  = assigned.join(surv, Seq("vec_id"), "left_anti")
    val all      = assigned.join(emb, Seq("vec_id"))
    val dA = dropped.join(emb, Seq("vec_id")).select($"cluster", $"vec_id".as("ib"), $"embedding".as("vb"))
    val wit = all.select($"cluster", $"vec_id".as("ia"), $"embedding".as("va"))
      .join(dA, Seq("cluster"))
      .filter($"ia" < $"ib" && graft.operators.Similarity.cosine($"va", $"vb") >= 0.45)
      .select($"ib").distinct().count()
    assert(wit == dropped.count(), "a dropped id lacks a smaller-id witness")
  }

  test("balanced sample: exactly min(16, cluster size) per cluster, ranks dense from 1") {
    import spark.implicits._
    val dir   = sfDir
    val out   = QueriesCorpus.q140_cluster_balanced_sample(spark, dir)
    val sizes = QueriesCorpus.q138_kmeans_clusters(spark, dir)
      .groupBy($"cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = out.groupBy($"cluster")
      .agg(count(lit(1)).as("n"), min($"draw_rank").as("lo"), max($"draw_rank").as("hi"))
      .collect()
    assert(got.map(_.getInt(0)).toSet == sizes.keySet)
    got.foreach { r =>
      val want = math.min(16L, sizes(r.getInt(0)))
      assert(r.getLong(1) == want && r.getLong(2) == 1L && r.getLong(3) == want)
    }
  }

  test("nearest-centroid classifier: planted separable labels predict 100%; accuracy flag counts") {
    import spark.implicits._
    // blobs as in planted(), but labeled — train on 6, hold out 2
    val df = planted().withColumnRenamed("expected", "label")
    val train = df.filter($"vec_id" % 5 =!= 0) // drops 0 (A) and 5 (B)
    val test_ = df.filter($"vec_id" % 5 === 0)
    val cents = Clustering.centroids(train, "label", "embedding")
    assert(cents.map(_._1) == Seq(0, 1))
    val out = Clustering.assignTo(test_, "embedding", cents, "predicted")
      .select($"vec_id", $"label", $"predicted").collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"vec ${r.getLong(0)}: label ${r.getInt(1)} predicted ${r.getInt(2)}"))
    // the sf0.001 q141 output: correct == (label = predicted) row-wise
    val q = QueriesCorpus.q141_centroid_classifier(spark, sfDir).collect()
    assert(q.nonEmpty)
    q.foreach(r => assert((r.getLong(3) == 1L) == (r.getInt(1) == r.getInt(2))))
  }

  test("probe order: first probed cell IS the assignment; probing every cell gives recall 1.0") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val (cells, cents) =
      Clustering.kmeansModel(emb, "vec_id", "embedding", k = 8, iters = 2)
    // probe[0] == assignTo for every vector (same argmin, same tie-break)
    val both = Clustering.probeTo(
      Clustering.assignTo(emb, "embedding", cents, "assigned"),
      "embedding", cents, nprobe = 3, "probe")
    assert(both.filter(element_at($"probe", 1) =!= $"assigned").count() == 0L)
    // exhaustive probe (nprobe = k): the pruned search must reproduce
    // brute force exactly — recall@5 of 1.0 for every query
    val queries = emb.filter($"vec_id" < 5)
    val probes = Clustering.probeTo(queries, "embedding", cents, nprobe = 8, "probe")
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), explode($"probe").as("cluster"))
    val corpus = cells.join(emb, Seq("vec_id"))
      .select($"vec_id".as("neighbor_id"), $"embedding".as("cv"), $"cluster")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id")
      .orderBy(graft.operators.Similarity.cosine($"qv", $"cv").desc, $"neighbor_id")
    val approx = corpus.join(probes, Seq("cluster"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == exact, "nprobe = nlist must equal brute force")
  }

  test("q138 assignment plan: centroids are literals — no join, no shuffle before the final sort") {
    val emb  = Tables.embeddings(spark, sfDir)
    val plan = Clustering.kmeans(emb, "vec_id", "embedding", k = 8, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "assignment must not join")
    assert(!plan.contains("Exchange hashpartitioning"),
      "assignment must not shuffle the corpus")
  }

  test("large-k distributed path is bit-identical to the literal projection (both paths forced)") {
    // the scale path: past joinAssignThreshold the centroid model stays
    // a DataFrame (broadcast array + native NearestCentroid loop; no
    // k·d driver round-trip per iteration) — same distance ops in the
    // same order, so clusters AND the returned model must agree
    // EXACTLY, including dist-then-id tie-breaks
    val emb   = Tables.embeddings(spark, sfDir)
    val saved = Clustering.joinAssignThreshold
    def run(): (Map[Long, Int], Seq[(Int, Seq[Double])]) = {
      val (df, model) = Clustering.kmeansModel(emb, "vec_id", "embedding", k = 12, iters = 2)
      (df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap,
        model.map { case (c, cent) => c -> cent.toSeq })
    }
    try {
      Clustering.joinAssignThreshold = Int.MaxValue // literal path
      val (literal, literalModel) = run()
      Clustering.joinAssignThreshold = 0 // distributed broadcast-model path
      val (dist, distModel) = run()
      assert(literal.nonEmpty)
      assert(dist == literal, "assignment paths must pick identical clusters")
      assert(distModel == literalModel, "converged models must be bit-identical")
    } finally Clustering.joinAssignThreshold = saved
  }

  test("distributed assignment plan: broadcast model only — no corpus shuffle, no corpus broadcast") {
    // the 100 TB contract: assignment = scan + one 1-row broadcast
    // crossJoin + a native loop projection; the n·k pair stream and the
    // n-row minima broadcast of the retired join-argmin shape must not
    // reappear
    val emb   = Tables.embeddings(spark, sfDir)
    val saved = Clustering.joinAssignThreshold
    try {
      Clustering.joinAssignThreshold = 0
      val df   = Clustering.kmeans(emb, "vec_id", "embedding", k = 12, iters = 1)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("NearestCentroid") || plan.contains("nearest_centroid") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"expected the broadcast-model crossJoin shape, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"), "no planned shuffle join on the corpus")
      assert(!plan.contains("Exchange hashpartitioning"),
        "assignment must not hash-shuffle the corpus")
    } finally Clustering.joinAssignThreshold = saved
  }

  test("NearestCentroid: interpreted eval agrees with the codegen'd plan result") {
    import graft.plans.CentroidExpressions.nearestCentroid
    import org.apache.spark.sql.functions.{array_sort, broadcast, collect_list, struct}
    import graft.plans.VectorExpressions.vecDot
    import spark.implicits._
    val base = planted()
      .select($"vec_id", Clustering.quantized($"embedding").as("vq"))
      .withColumn("dv", transform($"vq", _.cast("double")))
    val cents = base.orderBy("vec_id").limit(3)
      .select((row_number().over(org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
        .as("__kc"), $"dv".as("__kcent"))
    val model = cents.agg(array_sort(collect_list(struct(
      $"__kc".as("c"), $"__kcent".as("cent"), vecDot($"__kcent", $"__kcent").as("c2")))).as("__cents"))
    val planned = base.crossJoin(broadcast(model))
      .select($"vec_id", nearestCentroid($"dv", $"__cents").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // interpreted route: same expression evaluated row-by-row via eval()
    val centRows = cents.orderBy("__kc").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val manual = base.collect().map { r =>
      val dv    = r.getSeq[Double](r.fieldIndex("dv")).toArray
      val vnorm = dv.map(x => x * x).sum
      val best = centRows.map { case (c, cent) =>
        var dot = 0.0; var c2 = 0.0; var i = 0
        while (i < cent.length) { c2 += cent(i) * cent(i); dot += dv(i) * cent(i); i += 1 }
        (vnorm - 2.0 * dot + c2, c)
      }.min
      r.getLong(0) -> best._2
    }.toMap
    assert(planned == manual)
  }

  test("literal codegen cliff guard: warning fires past the cliff, silent at or below it") {
    assert(Clustering.literalCliffWarning(Clustering.literalCodegenCliff).isEmpty)
    assert(Clustering.literalCliffWarning(12).isEmpty)
    assert(Clustering.literalCliffWarning(Clustering.literalCodegenCliff + 1).isDefined)
    assert(Clustering.literalCliffWarning(800).exists(_.contains("interpreted")))
  }
}
