package graft

import org.apache.spark.sql.functions._

/** Corpus-curation operators: repetition metrics, deterministic
  * stratified sampling, TF-IDF, persisted-IVF ANN.
  */
class CorpusSpec extends SparkSpec {

  test("repetition metrics: planted degenerate and clean docs score as expected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec").toString
    Seq(
      (1L, "a a a a a a", "en", "src0", 11L),
      (2L, (1 to 21).map(i => s"w$i").mkString(" "), "en", "src0", 60L),
      (3L, "x y x y x y x y x y x y", "en", "src1", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q58_repetition(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 1: every bigram is "a a" -> total repetition, filtered out
    assert(byId(1L).getString(2) == "a a")
    assert(byId(1L).getDouble(4) == 1.0 && byId(1L).getDouble(5) == 1.0)
    assert(byId(1L).getInt(6) == 0)
    // doc 2: all bigrams distinct -> top frac 1/20, no dup mass, kept
    assert(byId(2L).getLong(3) == 1L)
    assert(byId(2L).getDouble(4) == 0.05 && byId(2L).getDouble(5) == 0.0)
    assert(byId(2L).getInt(6) == 1)
    // doc 3: "x y" dominates (6 of 11 slots) -> over both thresholds
    assert(byId(3L).getString(2) == "x y")
    assert(byId(3L).getInt(6) == 0)
  }

  test("C4/Gopher rules: planted bullet/ellipsis/symbol/short-line docs flag as expected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_c4_spec").toString
    Seq(
      (1L, "- item one\n- item two\n- item three", "en", "s0", 30L),
      (2L, "a good line of text here\nanother decent line follows...", "en", "s0", 50L),
      (3L, "# # # # hello", "en", "s0", 13L),
      (4L, "this is a perfectly normal document line with enough words", "en", "s0", 58L),
      (5L, "ok\nno\nfine words here today friends", "en", "s0", 35L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byId = QueriesCorpus.q128_c4_gopher_rules(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: every line bullet-started -> frac 1.0 > 0.9 -> dropped
    assert(byId(1L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(byId(1L).getAs[Int]("keep") == 0)
    // doc 2: 1 of 2 lines ends with ellipsis -> 0.5 > 0.3 -> dropped;
    // the '...' also counts one symbol over 10 words = exactly 0.1
    assert(byId(2L).getAs[Double]("ellipsis_line_frac") == 0.5)
    assert(byId(2L).getAs[Double]("symbol_ratio") == 0.1)
    assert(byId(2L).getAs[Int]("keep") == 0)
    // doc 3: 4 '#' over 5 words -> 0.8 > 0.1 -> dropped
    assert(byId(3L).getAs[Double]("symbol_ratio") == 0.8)
    assert(byId(3L).getAs[Int]("keep") == 0)
    // doc 4: clean single line -> kept
    assert(byId(4L).getAs[Int]("keep") == 1)
    // doc 5: 2 of 3 lines under 3 words -> short frac > 0.5 -> dropped
    assert(byId(5L).getAs[Double]("short_line_frac") > 0.5)
    assert(byId(5L).getAs[Int]("keep") == 0)
  }

  test("dedup report: planted exact/near/substring dups land in their funnel stage") {
    import spark.implicits._
    val dir  = java.nio.file.Files.createTempDirectory("graft_dreport_spec").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // doc 4: doc 1's first 8 tokens embedded in 24 unique tokens —
    // shares an 8-gram run (substring hit) but trigram Jaccard is
    // 6/32 < 0.5, so it must NOT count as a near-dup
    val d4 = ((1 to 12).map(i => s"u$i") ++ base.split(" ").take(8) ++
      (13 to 24).map(i => s"u$i")).mkString(" ")
    Seq(
      (1L, base, "en", "s1", 56L),
      (2L, base, "en", "s1", 56L),
      (3L, base + " lambda", "en", "s1", 63L),
      (4L, d4, "en", "s1", 120L),
      (5L, "totally different content words entirely unique nothing shared here at all",
        "en", "s2", 75L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesCorpus.q127_dedup_report(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = rows("s1")
    assert(s1.getAs[Long]("n_docs") == 4L)
    assert(s1.getAs[Long]("n_exact_dup") == 1L, "doc 2 is an exact copy of doc 1")
    assert(s1.getAs[Long]("n_near_dup") == 1L, "doc 3 is a trigram near-dup of doc 1")
    assert(s1.getAs[Long]("n_substr_dup") == 1L, "doc 4 shares only the 8-gram run")
    assert(s1.getAs[Long]("n_survivors") == 1L)
    assert(s1.getAs[Long]("dup_chars") == 56L + 63L + 120L)
    val s2 = rows("s2")
    assert(s2.getAs[Long]("n_docs") == 1L && s2.getAs[Long]("n_survivors") == 1L)
  }

  test("tokenizer packing: BPE counts + EOS drive the shard-local cumsum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tokpack_spec").toString
    Seq(
      // 'the' collapses to ONE token under the fixed (t,h)(th,e)
      // merges; 'cat' stays 3 symbols c|a|t
      (1L, "the the the", "en", "s1", 11L),
      (2L, "cat", "en", "s1", 3L),
      (3L, "   ", "en", "s1", 3L) // zero tokens -> EOS only
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesCorpus.q126_tokenizer_packing(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_tok") == 4L, "3x 'the' = 3 tokens + EOS")
    assert(rows(2L).getAs[Long]("n_tok") == 4L, "'cat' = c,a,t + EOS")
    assert(rows(3L).getAs[Long]("n_tok") == 1L, "whitespace-only doc packs its EOS alone")
    // shard-local offsets are the exclusive cumsum in doc_id order
    assert(rows(1L).getAs[Long]("offset") == 0L)
    assert(rows(2L).getAs[Long]("offset") == 4L)
    assert(rows(3L).getAs[Long]("offset") == 8L)
    assert(rows.values.forall(_.getAs[Long]("bin") == 0L), "9 tokens fit one 256 bin")
  }

  test("stratified hash sampling is reproducible, tiered, and a true subset") {
    import spark.implicits._
    val dir  = "/root/testdata/sf0.01"
    val s1   = QueriesCorpus.q59_stratified_sample(spark, dir).collect()
    val s2   = QueriesCorpus.q59_stratified_sample(spark, dir).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq, "hash sample must be deterministic")
    val perSource = s1.groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    val total     = Tables.documents(spark, dir).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tier rates: 50% / 25% / 12.5%, each +-25pp absolute at n=25/source
    def rate(src: String) = perSource.getOrElse(src, 0).toDouble / total(src)
    assert(rate("src0") > 0.2 && rate("src0") < 0.8, s"src0 rate ${rate("src0")}")
    assert(rate("src12") < 0.45, s"src12 rate ${rate("src12")}")
    // every sampled bucket clears its tier threshold
    assert(s1.forall { r =>
      val t = if (Set("src0","src1","src2","src3","src4")(r.getString(1))) "80"
              else if (Set("src5","src6","src7","src8","src9")(r.getString(1))) "40"
              else "20"
      r.getString(2) < t
    })
  }

  test("tf-idf: rarer tokens outrank common ones at equal term frequency") {
    val rows = QueriesCorpus.q60_tfidf(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getDouble(4) > 0.0))
    // ordering is by score desc — verify the invariant on the result itself
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores == scores.sorted.reverse)
    // same tf, smaller df => strictly larger tfidf
    val byTf = rows.groupBy(_.getLong(2))
    byTf.values.foreach { grp =>
      val sorted = grp.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(4)).toSeq == sorted.map(_.getDouble(4)).sortBy(-_).toSeq)
    }
  }

  test("semantic dedup keeps the max-label member of every cosine cluster") {
    import spark.implicits._
    val dir  = "/root/testdata/sf0.01"
    val kept = QueriesCorpus.q62_semantic_dedup(spark, dir).collect()
    assert(kept.nonEmpty)
    val comps = graft.operators.Graph
      .connectedComponents(
        graft.operators.Similarity.cosinePairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.45),
        "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = Tables.embeddings(spark, dir).select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byComp = comps.groupBy(_._2)
    kept.foreach { r =>
      val (cluster, keptId) = (r.getLong(0), r.getLong(1))
      val members = byComp(cluster).map(_._1)
      assert(members.contains(keptId), s"kept $keptId not in cluster $cluster")
      val best = members.maxBy(id => (labels(id), -id))
      assert(keptId == best, s"cluster $cluster kept $keptId, expected $best")
    }
    assert(kept.length == byComp.size)
  }

  test("curation funnel output is a deduped subset of every upstream stage") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val out = QueriesCorpus.q63_curation_pipeline(spark, dir).collect()
    assert(out.nonEmpty && out.length < 500, s"funnel must actually filter (got ${out.length})")
    // subset of the stratified sample (same predicate as q59)
    val sampled = QueriesCorpus.q59_stratified_sample(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => sampled(r.getLong(0))))
    // exact-dedup stage: surviving texts are content-unique
    val ids   = out.map(_.getLong(0)).toSet
    val texts = Tables.documents(spark, dir).filter($"doc_id".isin(ids.toSeq: _*))
      .select($"text").collect().map(_.getString(0))
    assert(texts.distinct.length == texts.length, "funnel output contains exact duplicates")
  }

  test("decontamination finds exactly the planted 8-gram containments") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_decon").toString
    val e8  = (1 to 8).map(i => s"e$i").mkString(" ")
    val a9  = (1 to 9).map(i => s"a$i").mkString(" ")
    Seq(
      (5L, s"$e8 x y z", "en", "src0", 0L),          // eval: one planted 8-gram
      (7L, s"pre $e8 post", "en", "src0", 0L),       // corpus: contains it once
      (10L, a9, "en", "src1", 0L),                   // eval: two 8-grams (a1..a8, a2..a9)
      (11L, s"$a9 tail", "en", "src1", 0L),          // corpus: contains both
      (12L, (1 to 12).map(i => s"c$i").mkString(" "), "en", "src2", 0L) // corpus: clean
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesCorpus.q66_decontamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 5L, 1L), (11L, 10L, 2L)), s"got $got")
  }

  test("contamination fraction scores dirty docs and keeps clean docs at 0.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_frac").toString
    val e8  = (1 to 8).map(i => s"e$i").mkString(" ")
    val a9  = (1 to 9).map(i => s"a$i").mkString(" ")
    Seq(
      (5L, s"$e8 x y z", "en", "src0", 0L),          // eval: one planted 8-gram
      (7L, s"pre $e8 post", "en", "src0", 0L),       // corpus: 3 grams, 1 dirty
      (10L, a9, "en", "src1", 0L),                   // eval: grams a1..a8, a2..a9
      (11L, s"$a9 tail", "en", "src1", 0L),          // corpus: 3 grams, 2 dirty
      (12L, (1 to 12).map(i => s"c$i").mkString(" "), "en", "src2", 0L) // clean: 5 grams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesCorpus.q125_contamination_fraction(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (7L, 3L, 1L, 0.333333),
      (11L, 3L, 2L, 0.666667),
      (12L, 5L, 0L, 0.0)
    ), s"got $got")
  }

  test("chunking covers every token with the declared stride overlap") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("arr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = QueriesCorpus.q67_chunking(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getString(2).split(" ").toSeq))
      }
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val toks = docs(id)
      cs.foreach { case (idx, w) =>
        // chunk i is exactly tokens [i*24, i*24+32)
        assert(w == toks.slice((idx * 24).toInt, (idx * 24).toInt + 32), s"doc $id chunk $idx")
      }
      // full coverage: the last chunk reaches the end of the doc
      val (lastIdx, lastW) = cs.last
      assert(lastIdx * 24 + lastW.length == toks.length, s"doc $id tail uncovered")
    }
  }

  test("packing concatenates each shard exactly: no gaps, offsets under budget") {
    import spark.implicits._
    val rows = QueriesCorpus.q68_packing(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, id, nTok, bin, offset) =>
        assert(bin == cum / 256 && offset == cum % 256, s"$src doc $id misplaced")
        cum += nTok
      }
      // bins are dense: every bin index up to the last appears
      val bins = sorted.map(_._4).distinct.sorted.toVector
      assert(bins == (bins.head to bins.last).toVector, s"$src bins not dense")
    }
  }

  test("keep-best dedup: the LM-cleaner copy wins its cluster even when shorter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_best").toString
    // docs 1/2 are near-dups (shared 3-gram mass, Jaccard ≥ 0.5); doc 2
    // is LONGER but padded with a corpus-rare token ("zq") that the
    // unigram LM prices high, so q39's longest-doc rule would keep 2
    // while q143's LM rule must keep 1. docs 10.. supply corpus mass
    // that makes the shared tokens common (cheap) and zq rare.
    val common = "alpha beta gamma delta epsilon zeta"
    Seq(
      (1L, common, "en", "src0", 40L),
      (2L, common + " zq", "en", "src0", 44L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName((10 to 29).map(i =>
        (i.toLong, common, "en", "src1", 40L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // sanity: under the length rule, doc 2 would win
    val byLen = QueriesDedup.q39_dedup_keep_one(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = QueriesCorpus.q143_dedup_keep_best(spark, dir).collect()
    val cluster1 = best.find(_.getLong(0) == 1L)
    assert(cluster1.isDefined, "docs 1/2 must cluster (plus the common-text copies)")
    assert(cluster1.get.getLong(1) == 1L, s"LM rule must keep doc 1, kept ${cluster1.get.getLong(1)}")
    assert(byLen(1L) != 1L, "the length rule must have preferred a longer copy (the contrast)")
    // n_members covers the whole planted near-dup component
    assert(cluster1.get.getLong(3) == 22L)
  }

  test("hard negatives never share the anchor's label and rank by similarity") {
    import spark.implicits._
    val out  = QueriesCorpus.q144_hard_negatives(spark, sfDir)
    val emb  = Tables.embeddings(spark, sfDir)
    val lbl  = emb.select($"vec_id", $"label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n, nl) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(lbl(n) == nl, "emitted neighbor_label must be the neighbor's label")
      assert(lbl(q) != nl, s"anchor $q drew a same-label negative $n")
    }
    // ranks dense 1..5 per anchor
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5))
    }
  }

  test("source drift: a source distributed like the corpus scores 0 bits; a skewed one doesn't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_drift").toString
    // srcA and srcB have IDENTICAL token distributions -> corpus dist ==
    // each source's dist -> KL = 0 for both; srcC is disjoint -> KL > 0
    Seq(
      (1L, "a a b", "en", "srcA", 5L),
      (2L, "a a b", "en", "srcB", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl0 = QueriesCorpus.q145_source_drift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl0("srcA") == 0.0 && kl0("srcB") == 0.0, s"identical dists must score 0: $kl0")

    Seq(
      (1L, "a a a a", "en", "srcA", 7L),
      (2L, "b b b b", "en", "srcC", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl1 = QueriesCorpus.q145_source_drift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // each source is a point mass on half the corpus: KL = ln(2)/ln(2) = 1 bit
    assert(kl1("srcA") == 1.0 && kl1("srcC") == 1.0, s"disjoint point masses: $kl1")
  }

  test("mixture draw: over-demanded sources keep all; drawn sample is deterministic") {
    import spark.implicits._
    val out = QueriesCorpus.q146_mixture_draw(spark, sfDir)
    val plan = QueriesCorpus.q137_mixture_plan(spark, sfDir)
      .select($"source", $"needs_repeat").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = out.collect().groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      if (plan(src) == 1L)
        assert(rows.forall(_.getLong(2) == 1L), s"repeat source $src must keep everything")
    }
    // at least one under-demanded source actually drops rows
    assert(bySrc.exists { case (src, rows) =>
      plan(src) == 0L && rows.exists(_.getLong(2) == 0L) })
    val again = QueriesCorpus.q146_mixture_draw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("span decontamination: the quoted eval span is cut, the surrounding prose survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_span").toString
    // doc 5 (id % 5 == 0) is the eval doc; doc 1 quotes its 8-gram in
    // the middle of otherwise-clean prose; doc 2 is fully the quote;
    // doc 3 is clean. 8-gram = e1..e8.
    val quote = (1 to 8).map(i => s"e$i").mkString(" ")
    Seq(
      (5L, quote, "en", "eval", 10L),
      (1L, s"alpha beta $quote gamma delta", "en", "src0", 50L),
      (2L, quote, "en", "src0", 20L),
      (3L, "alpha beta gamma delta epsilon", "en", "src0", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesCorpus.q151_span_decontamination(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((12L, 8L, "alpha beta gamma delta")), s"doc1: ${rows(1L)}")
    assert(rows(2L) == ((8L, 8L, "")), s"doc2 fully cut: ${rows(2L)}")
    assert(rows(3L) == ((5L, 0L, "alpha beta gamma delta epsilon")), s"doc3 untouched: ${rows(3L)}")
    assert(!rows.contains(5L), "the eval doc itself is not in the output")
  }

  test("OOV rate: a source speaking only tail tokens scores 1.0; a head-only source 0.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_oov").toString
    // "hot" repeats enough to dominate the head; srcTail's tokens are
    // unique singletons that fall outside any 1000-token head once the
    // head is padded with 1000 distinct repeated tokens
    val headDocs = (1 to 1000).map(i => (i.toLong, s"h$i h$i h$i", "en", "srcHead", 12L))
    val tailDocs = Seq((2001L, (1 to 5).map(i => s"rare$i").mkString(" "), "en", "srcTail", 30L))
    (headDocs ++ tailDocs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesCorpus.q150_oov_rate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("srcHead") == ((3000L, 0L, 0.0)), s"head source: ${got("srcHead")}")
    assert(got("srcTail") == ((5L, 5L, 1.0)), s"tail source: ${got("srcTail")}")
  }

  test("persisted IVF index probe equals the in-memory IVF at every operating point") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val qs  = emb.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_ivf").toString
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", dir, nlist = 16)
    for (nprobe <- Seq(4, 8, 16)) {
      val mem = Similarity
        .ivfTopK(emb, qs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = nprobe)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      val idx = Similarity
        .ivfTopKIndexed(spark, qs, "vec_id", "embedding", dir, k = 5, nprobe = nprobe)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      assert(idx == mem, s"persisted probe diverged at nprobe=$nprobe")
    }
    // and the q61 endpoint reproduces exact brute force
    val exact = QueriesDedup.q30_ann_topk(spark, sfDir).collect().map(_.toSeq).toSeq
    val q61   = QueriesCorpus.q61_ann_ivf_indexed(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(q61 == exact)
  }

  test("filtered persisted index: partition-pruned probe equals in-memory filtered IVF") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val qs  = emb.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_fivf").toString
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", dir, nlist = 16,
      metaCols = Seq("label"))
    for (nprobe <- Seq(4, 16)) {
      val mem = Similarity
        .ivfTopKFiltered(emb, qs, "vec_id", "embedding", Seq("label"), k = 5,
          nlist = 16, nprobe = nprobe)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      val idx = Similarity
        .ivfTopKIndexedFiltered(spark, qs, "vec_id", "embedding", Seq("label"), dir,
          k = 5, nprobe = nprobe)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      assert(idx == mem, s"filtered persisted probe diverged at nprobe=$nprobe")
    }
    // nprobe = nlist through the index ≡ the q121 filtered brute force
    val exact = QueriesDedup.q121_ann_filtered(spark, sfDir).collect().map(_.toSeq).toSeq
    val full = Similarity
      .ivfTopKIndexedFiltered(spark, qs, "vec_id", "embedding", Seq("label"), dir,
        k = 5, nprobe = 16)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(full == exact)
    // the static (meta, cell) disjunction must reach the scan as
    // PartitionFilters — the probe lists only matching directories
    val plan = Similarity
      .ivfTopKIndexedFiltered(spark, qs, "vec_id", "embedding", Seq("label"), dir,
        k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters in:\n$plan")
    assert(plan.split("PartitionFilters").exists(s =>
      s.contains("label") && s.contains("cell")),
      "probe scan is not pruned on (label, cell)")
  }

  test("ivf rebalance: answers invariant, assignments follow the new centroids") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val qs  = emb.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_rebal").toString
    // simulate drifted ingest: seed the index from the low-id half,
    // then append the high-id half assigned against the SEED centroids
    val cut = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head().getLong(0)
    Similarity.ivfIndexWrite(emb.filter($"vec_id" <= cut), "vec_id", "embedding", dir,
      nlist = 16)
    val seedCent = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Similarity.assignCells(emb.filter($"vec_id" > cut), "vec_id", "embedding",
        spark.read.parquet(s"$dir/centroids"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")

    val statsBefore = Similarity.ivfIndexStats(spark, dir).collect()
    assert(statsBefore.map(_.getLong(1)).sum == emb.count())

    Similarity.ivfRebalance(spark, dir, "vec_id", "embedding", nlist = 16, kmeansIters = 2)

    // nothing lost, still 16 cells
    val statsAfter = Similarity.ivfIndexStats(spark, dir).collect()
    assert(statsAfter.map(_.getLong(1)).sum == emb.count())
    assert(statsAfter.length == 16)
    // the refinement actually moved the centroids
    val newCent = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert((seedCent.keySet != newCent.keySet) ||
      seedCent.exists { case (k, v) => newCent.get(k).exists(_ != v) },
      "rebalance left every centroid unchanged")
    // every indexed vector sits in its nearest-new-centroid cell
    val reassigned = Similarity.assignCells(emb, "vec_id", "embedding",
        spark.read.parquet(s"$dir/centroids"))
      .select($"vec_id", $"cell".cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val indexed = spark.read.parquet(s"$dir/cells")
      .select($"vec_id", $"cell".cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(indexed == reassigned, "an indexed row is not in its nearest cell")
    // answers invariant: full probe through the rebalanced index ≡ brute force
    val exact = QueriesDedup.q30_ann_topk(spark, sfDir).collect().map(_.toSeq).toSeq
    val probed = Similarity
      .ivfTopKIndexed(spark, qs, "vec_id", "embedding", dir, k = 5, nprobe = 16)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(probed == exact, "full probe diverged from brute force after rebalance")
  }

  test("attribution: planted click/purchase timelines credit the right touch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_attr").toString
    Seq(
      // user 1: view → click → two purchases; both credit the same click
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      (4L, "2024-01-02 02:00:00", 1L, "purchase"),
      // user 2: click 10 days before the purchase — outside the 7-day
      // lookback, so no credit and no counted touches
      (5L, "2024-01-01 00:00:00", 2L, "click"),
      (6L, "2024-01-11 00:00:00", 2L, "purchase"),
      // user 3: purchase with no preceding events at all
      (7L, "2024-01-05 00:00:00", 3L, "purchase"),
      // user 4: the only click lands AFTER the purchase — no credit
      (8L, "2024-01-03 00:00:00", 4L, "purchase"),
      (9L, "2024-01-03 01:00:00", 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q159_attribution(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length == 5)
    // first purchase: click 2 one hour earlier, 2 touches in window
    assert(byId(3L).getLong(2) == 2L && byId(3L).getLong(3) == 3600L)
    assert(byId(3L).getLong(4) == 2L)
    // second purchase a day later: same click carries forward
    assert(byId(4L).getLong(2) == 2L && byId(4L).getLong(3) == 90000L)
    assert(byId(4L).getLong(4) == 2L)
    // stale click: no attribution, no in-window touches
    assert(byId(6L).isNullAt(2) && byId(6L).isNullAt(3) && byId(6L).getLong(4) == 0L)
    // no events at all / click after the purchase: no attribution
    assert(byId(7L).isNullAt(2) && byId(7L).getLong(4) == 0L)
    assert(byId(8L).isNullAt(2) && byId(8L).getLong(4) == 0L)
  }

  test("daily anomaly: planted spike flags, steady traffic does not, warm-up is NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_anom").toString
    // view counts by day: 10, 12, 14, 12, 100 — the last day is the spike
    val counts = Seq(10, 12, 14, 12, 100)
    val evs = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i =>
        (d * 1000L + i, f"2024-01-${d + 1}%02d 0${i % 10}:00:00", i.toLong, "view"))
    }
    evs.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q160_daily_anomaly(spark, dir).collect()
    val byDay = rows.map(r => r.getString(1) -> r).toMap
    assert(rows.length == 5)
    // days 1-3 have < 3 prior observed days: warm-up, NULL flag
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { d =>
      assert(byDay(d).isNullAt(4) && byDay(d).isNullAt(5), s"day $d should be warm-up")
    }
    // day 4 (n=12, prior 10/12/14): within 2σ — not an anomaly
    assert(byDay("2024-01-04").getInt(5) == 0)
    assert(byDay("2024-01-04").getDouble(4) == 12.0)
    // day 5 (n=100, prior 10/12/14/12): way past 2σ — flagged
    assert(byDay("2024-01-05").getInt(5) == 1)
    assert(byDay("2024-01-05").getDouble(4) == 12.0)
  }

  test("truncation loss: planted long/short docs split tokens kept vs lost") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_trunc").toString
    val long70  = (1 to 70).map(i => s"w$i").mkString(" ")  // 70 tokens: 6 lost
    val short10 = (1 to 10).map(i => s"s$i").mkString(" ")  // 10 tokens: kept whole
    Seq(
      (1L, long70, "en", "srcA", 0L),
      (2L, short10, "en", "srcA", 0L),
      (3L, short10, "en", "srcB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q161_truncation_loss(spark, dir).collect()
    val bySrc = rows.map(r => r.getString(0) -> r).toMap
    val a = bySrc("srcA")
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L)          // docs, truncated
    assert(a.getLong(3) == 80L && a.getLong(4) == 6L)         // total, lost
    assert(a.getDouble(5) == 6.0 / 80.0)
    val b = bySrc("srcB")
    assert(b.getLong(2) == 0L && b.getLong(4) == 0L && b.getDouble(5) == 0.0)
  }

  test("rfm segments: planted purchase histories land in the right terciles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_rfm").toString
    Seq(
      // user 1: two purchases, last 5 days before the anchor
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-05 00:00:00", 1L, "purchase", 20.0),
      // user 2: one big purchase 12h before the anchor (recency 0 days)
      (3L, "2024-01-09 12:00:00", 2L, "purchase", 100.0),
      // user 3: one small purchase 8 days before the anchor
      (4L, "2024-01-02 00:00:00", 3L, "purchase", 5.0),
      // the anchor: a non-purchase event defines "now"
      (5L, "2024-01-10 00:00:00", 1L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q163_rfm_segments(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length == 3)
    assert(byId(1L).getLong(1) == 5L && byId(1L).getLong(2) == 2L
      && byId(1L).getDouble(3) == 30.0 && byId(1L).getString(7) == "212")
    assert(byId(2L).getLong(1) == 0L && byId(2L).getLong(2) == 1L
      && byId(2L).getDouble(3) == 100.0 && byId(2L).getString(7) == "121")
    assert(byId(3L).getLong(1) == 8L && byId(3L).getLong(2) == 1L
      && byId(3L).getDouble(3) == 5.0 && byId(3L).getString(7) == "333")
  }

  test("mixture dedup shift + cluster histogram: a planted near-dup pair moves the inventory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_shift").toString
    val dupText = (1 to 12).map(i => s"x$i").mkString(" ") // 12 tokens
    val solo    = (1 to 10).map(i => s"y$i").mkString(" ") // 10 tokens, disjoint
    Seq(
      (1L, dupText, "en", "src0", 100L), // keeper (max n_chars)
      (2L, dupText, "en", "src1", 50L),  // loser of the pair
      (3L, solo, "en", "src1", 60L)      // singleton
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val shift = QueriesCorpus.q164_mixture_dedup_shift(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = shift("src0")
    assert(a.getLong(1) == 1L && a.getLong(3) == 1L)    // keeper survives
    assert(a.getLong(2) == 12L && a.getLong(4) == 12L)
    assert(a.getDouble(5) == 12.0 / 34.0 && a.getDouble(6) == 12.0 / 22.0)
    val b = shift("src1")
    assert(b.getLong(1) == 2L && b.getLong(3) == 1L)    // loser dropped, solo kept
    assert(b.getLong(2) == 22L && b.getLong(4) == 10L)
    assert(b.getDouble(5) == 22.0 / 34.0 && b.getDouble(6) == 10.0 / 22.0)

    val hist = QueriesDedup.q165_cluster_size_histogram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hist == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L))))
  }

  test("session conversion: planted sessions split by the 30-min gap and flag purchases") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_sconv").toString
    Seq(
      // user 1, session A (converts): view then purchase 10 min later
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:10:00", 1L, "purchase"),
      // user 1, session B (same day, 2h later — new session, no purchase)
      (3L, "2024-01-01 12:30:00", 1L, "view"),
      // user 2, one session next day, no purchase
      (4L, "2024-01-02 09:00:00", 2L, "click"),
      (5L, "2024-01-02 09:20:00", 2L, "view"),
      // session spanning midnight counts on its START day (Jan 2)
      (6L, "2024-01-02 23:50:00", 3L, "view"),
      (7L, "2024-01-03 00:10:00", 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q171_session_conversion(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.size == 2, s"expected 2 days, got $rows") // nothing starts on Jan 3
    assert(rows("2024-01-01") == ((2L, 1L, 0.5)))
    assert(rows("2024-01-02") == ((2L, 1L, 0.5)))
  }

  test("boilerplate scrub: a shared header is cut everywhere, unique text survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_bscrub").toString
    val header = "terms of use apply here" // the planted 5-gram boilerplate
    Seq(
      (1L, s"$header alpha beta gamma", "en", "src0", 0L),
      (2L, s"$header delta epsilon", "en", "src0", 0L),
      (3L, s"zeta $header", "en", "src1", 0L), // mid-doc occurrence
      (4L, "completely unrelated words here now", "en", "src1", 0L),
      (5L, "tiny doc", "en", "src1", 0L) // too short to shingle
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q172_boilerplate_scrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((8L, 5L, "alpha beta gamma")))
    assert(rows(2L) == ((7L, 5L, "delta epsilon")))
    assert(rows(3L) == ((6L, 5L, "zeta")))
    // df < 3 grams never cut; short docs pass through whole
    assert(rows(4L) == ((5L, 0L, "completely unrelated words here now")))
    assert(rows(5L) == ((2L, 0L, "tiny doc")))
  }

  test("embedding quality: planted NaN/Inf/zero/short vectors flag exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_vq").toString
    Seq(
      (1L, Array(3.0f, 4.0f), 0),                    // clean: norm2 = 25
      (2L, Array(0.0f, 0.0f), 0),                    // zero vector
      (3L, Array(Float.NaN, 1.0f), 0),               // non-finite
      (4L, Array(Float.PositiveInfinity, 1.0f), 1),  // non-finite
      (5L, Array(2.0f), 1)                           // dimension drift
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = QueriesCorpus.q170_embedding_quality(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    val a = rows(0)
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L && a.getLong(3) == 2L)
    assert(a.getLong(4) == 1L && a.getLong(5) == 1L) // one NaN vec, one zero vec
    assert(a.getDouble(6) == 0.0 && a.getDouble(7) == 25.0)
    val b = rows(1)
    assert(b.getLong(1) == 2L && b.getLong(2) == 1L && b.getLong(3) == 2L)
    assert(b.getLong(4) == 1L && b.getLong(5) == 0L)
    assert(b.getDouble(6) == 4.0 && b.getDouble(7) == 4.0) // only the finite vec has a norm
  }

  test("epoch shuffle: reproducible, complete, and epoch-salted") {
    import spark.implicits._
    val out = QueriesCorpus.q168_epoch_shuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    // each epoch is a complete permutation of the corpus
    Seq(0L, 1L).foreach { e =>
      val ids = out.filter(_._1 == e).map(_._4)
      assert(ids.length == nDocs && ids.distinct.length == nDocs, s"epoch $e incomplete")
    }
    // positions are dense ranks within (epoch, shard)
    out.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"gap in $k")
    }
    // the two epochs order the corpus differently
    def order(e: Long) = out.filter(_._1 == e).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order(0L) != order(1L), "epoch salt did not change the permutation")
    // reproducible across evaluations
    val again = QueriesCorpus.q168_epoch_shuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("length quantiles: planted lengths pick the exact rank values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_quant").toString
    // srcA lengths 1..10 -> p50 = rank ceil(5.0)=5 -> 5 tokens; p90 = rank 9
    def doc(id: Long, n: Int, src: String) =
      (id, (1 to n).map(i => s"w$i").mkString(" "), "en", src, 0L)
    val docs = (1 to 10).map(i => doc(i.toLong, i, "srcA")) :+ doc(11L, 3, "srcB")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q169_source_length_quantiles(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows("srcA") == ((10L, 5L, 9L, 10L)))
    // single-doc source: every quantile is that doc
    assert(rows("srcB") == ((1L, 3L, 3L, 3L)))
  }

  test("vocab coverage: planted counts give the exact rank-K curve") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_vocab").toString
    // counts: a=8, b=4, c=2, d=1, e=1 (15 total); ties break token-asc
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
      ++ Seq("d", "e")).mkString(" ")
    Seq((1L, text, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q166_vocab_coverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // ranks: a(8) b(4) c(2) then d before e (tie on 1, token asc) —
    // top-4 covers 8+4+2+1 = 15 of 16 tokens
    assert(rows(4L) == ((15L, 16L, 15.0 / 16.0)))
    // ladder rungs beyond the 5-token vocab cover everything
    Seq(8L, 16L, 32L).foreach(k => assert(rows(k) == ((16L, 16L, 1.0)), s"K=$k: ${rows(k)}"))
  }

  test("lang mismatch: planted marker docs split match vs mismatch per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_lang").toString
    Seq(
      (1L, "word the word the word", "en", "src0", 0L), // detected en, declared en
      (2L, "word the word the word", "de", "src0", 0L), // detected en, declared de
      (3L, "word der word der word", "de", "src1", 0L)  // detected de, declared de
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesText.q167_lang_mismatch(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("src0") == ((2L, 1L, 0.5)))
    assert(rows("src1") == ((1L, 0L, 0.0)))
  }

  test("ngram novelty: copies score 0, fresh text 1, a stitched doc in between") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_novel").toString
    val t = (1 to 10).map(i => s"t$i") // 10 distinct tokens → 3 distinct 8-grams
    Seq(
      (1L, t.mkString(" "), "en", "src0", 0L),                       // fresh
      (2L, t.mkString(" "), "en", "src0", 0L),                       // exact copy
      (3L, (t.take(8) ++ Seq("u9", "u10")).mkString(" "), "en", "src0", 0L), // stitched
      (4L, "a b c", "en", "src0", 0L)                                // < 8 tokens
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q162_ngram_novelty(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length == 4)
    assert(byId(1L).getLong(1) == 3L && byId(1L).getLong(2) == 3L)
    assert(byId(1L).getDouble(3) == 1.0)
    // the exact copy owns nothing — every gram's first occurrence is doc 1
    assert(byId(2L).getLong(1) == 3L && byId(2L).getLong(2) == 0L)
    assert(byId(2L).getDouble(3) == 0.0)
    // stitched: gram (t1..t8) is doc 1's; the two u-suffixed grams are new
    assert(byId(3L).getLong(1) == 3L && byId(3L).getLong(2) == 2L)
    assert(byId(3L).getDouble(3) == 2.0 / 3.0)
    // too short to shingle: kept with zero grams and a NULL fraction
    assert(byId(4L).getLong(1) == 0L && byId(4L).getLong(2) == 0L && byId(4L).isNullAt(3))
  }

  test("DSIR weights: target-aligned docs rank first, top quarter selected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_dsir").toString
    Seq(
      (1L, "alpha alpha", "en", "src0", 0L), // pure target vocabulary
      (2L, "alpha beta", "en", "src0", 0L),
      (3L, "beta beta", "fr", "src0", 0L),
      (4L, "gamma gamma", "de", "src0", 0L) // never seen in target
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q173_dsir_weights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // hand model: target alpha=3 beta=1 (N_t=4); raw alpha=3 beta=3
    // gamma=2 (N_r=8); V=3 → λ(alpha)=ln(11/7), λ(beta)=ln(11/14),
    // λ(gamma)=ln(11/21)
    assert(math.abs(rows(1L)._2 - math.log(11.0 / 7)) < 5e-6)
    assert(math.abs(rows(3L)._2 - math.log(11.0 / 14)) < 5e-6)
    assert(math.abs(rows(4L)._2 - math.log(11.0 / 21)) < 5e-6)
    // weights order d1 > d2 > d3 > d4; 4 div 4 = 1 doc selected
    assert(rows(1L)._2 > rows(2L)._2 && rows(2L)._2 > rows(3L)._2 &&
      rows(3L)._2 > rows(4L)._2)
    assert(rows(1L)._3 && !rows(2L)._3 && !rows(3L)._3 && !rows(4L)._3)
    assert(rows(1L)._1 == 2L && rows(2L)._1 == 2L)

    // scale path (forced): since r19 the selection rank is the EXACT
    // distributed bucket rank (Ranks.withGlobalRowNumber) — the old
    // percentile_approx fork, which could differ at the p75 boundary,
    // is retired. The forced path must produce the IDENTICAL rows
    // (selection included) and never a percentile_approx aggregate;
    // the no-unpartitioned-window property is enforced slate-wide by
    // WindowLintSpec with this threshold forced to 0.
    val exactRows = QueriesCorpus.q173_dsir_weights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    val saved = QueriesCorpus.dsirRankThresholdBytes
    try {
      QueriesCorpus.dsirRankThresholdBytes = 0L
      val scale = QueriesCorpus.q173_dsir_weights(spark, dir)
      val plan  = scale.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile_approx"),
        s"the approximate fork is retired; forced path must stay exact:\n$plan")
      val scaleRows = scale.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
      assert(scaleRows == exactRows,
        s"forced scale path must equal the gate-scale branch exactly:\n$scaleRows\nvs\n$exactRows")
    } finally QueriesCorpus.dsirRankThresholdBytes = saved
  }

  test("stickiness: trailing 7-day WAU counts users active on ANY window day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_stick").toString
    val ev = (1 to 8).map(d =>
      (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "view", 0.0)) ++ Seq(
      (20L, "2024-01-01 12:00:00", 3L, "click", 0.0), // user 3 only day 1
      (21L, "2024-01-08 12:00:00", 2L, "view", 0.0)   // user 2 only day 8
    )
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q174_stickiness(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.size == 8)
    assert(rows("2024-01-01") == ((2L, 2L, 1.0))) // users {1,3} both day and window
    assert(rows("2024-01-02") == ((1L, 2L, 0.5))) // user 3 still in the window
    assert(rows("2024-01-07") == ((1L, 2L, 0.5))) // day 1 is the window's edge
    assert(rows("2024-01-08") == ((2L, 2L, 1.0))) // user 3 aged out, user 2 in
  }

  test("source keyness: each source's exclusive token tops its ranking") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_key").toString
    Seq(
      (1L, "alpha alpha common", "en", "srcA", 0L),
      (2L, "beta beta common", "en", "srcB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q175_source_keyness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> ((r.getString(1), r.getDouble(2)))).toMap
    // keyness(srcA, alpha) = ln((3/2)/(1/4)) = ln 6; the shared token
    // has identical odds on both sides → exactly 0
    assert(rows(("srcA", 1L))._1 == "alpha")
    assert(math.abs(rows(("srcA", 1L))._2 - math.log(6.0)) < 5e-6)
    assert(rows(("srcB", 1L))._1 == "beta")
    assert(rows(("srcA", 2L)) == (("common", 0.0)))
    assert(rows(("srcB", 2L)) == (("common", 0.0)))
  }

  test("embedding whitening: unit-variance dims give exact Mahalanobis norms") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_whiten").toString
    Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(-1.0f, 0.0f), 0),
      (3L, Array(1.0f, 2.0f), 1),
      (4L, Array(-1.0f, -2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = QueriesCorpus.q176_embedding_whitening(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // dim0: mean 0, std 1; dim1: mean 0, std √2 → norms 1 and √3
    assert(rows(1L) == 1.0 && rows(2L) == 1.0)
    assert(math.abs(rows(3L) - math.sqrt(3.0)) < 5e-6)
    assert(math.abs(rows(4L) - math.sqrt(3.0)) < 5e-6)
  }

  test("revenue deciles: integer-rank cut, running share reaches exactly 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_decile").toString
    val ev = (1 to 20).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong, "purchase", i.toDouble)) :+
      (99L, "2024-01-01 01:00:00", 1L, "view", 999.0) // non-purchase ignored
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q177_revenue_deciles(spark, dir).collect()
    assert(rows.length == 10)
    val byDecile = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // 20 users → 2 per decile; decile 1 = spenders {20, 19}, total 210
    assert(byDecile(1L)._1 == 2L && byDecile(1L)._2 == 39.0)
    assert(math.abs(byDecile(1L)._3 - 39.0 / 210) < 5e-7)
    assert(byDecile(10L)._1 == 2L && byDecile(10L)._2 == 3.0)
    assert(byDecile(10L)._4 == 1.0) // cumulative share closes exactly
  }

  test("split assignment: content-addressed splits match an independent recompute") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_split").toString
    val docs = (1L to 200L).map(i => (i, "txt", "en", s"src${i % 2}", i))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val b  = md.digest(s"split:$id".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 2)
      if (b < "cc") "train" else if (b < "e6") "val" else "test"
    }
    val expected = docs
      .groupBy { case (id, _, _, src, _) => (src, split(id)) }
      .map { case ((src, sp), rows) =>
        (src, sp, rows.size.toLong, rows.map(_._5).sum) }
      .toSeq.sorted
    val got = QueriesCorpus.q180_split_assignment(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.sorted == expected)
    // every document lands in exactly one split
    assert(got.map(_._3).sum == 200L)
  }

  test("k-anonymity: a five-user combination is safe, a singleton is risky") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_kanon").toString
    val safe = (1 to 5).map(u =>
      (u.toLong, "2024-01-01 10:00:00", u.toLong, "view", 10.0))
    val risky = Seq((10L, "2024-01-01 11:00:00", 9L, "click", 10.0))
    (safe ++ risky).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q181_k_anonymity(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows("view") == ((1L, 0L, 0L, 0.0)))   // 5 distinct users clear k = 5
    assert(rows("click") == ((1L, 1L, 1L, 1.0)))  // one user → the whole type is risky
  }

  test("seasonality: dow normalizes to 0=Sunday with per-weekday shares") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_season").toString
    // 2024-01-07 is a Sunday, 2024-01-08 a Monday
    val ev = Seq(
      (1L, "2024-01-07 23:15:00", 1L, "view", 0.0),
      (2L, "2024-01-08 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-08 10:30:00", 2L, "view", 0.0),
      (4L, "2024-01-08 11:00:00", 3L, "view", 0.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q207_seasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows == Map(
      (0L, 23L) -> ((1L, 1.0)),       // Sunday
      (1L, 10L) -> ((2L, 0.666667)),  // Monday 10h: 2 of 3
      (1L, 11L) -> ((1L, 0.333333))))
  }

  test("psi drift: identical windows score 0, a moved distribution trips the verdict") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_psi").toString
    // type "a": same bucket mix both weeks → PSI 0 / stable
    // type "b": bucket 0 in week 1, bucket 9 in week 3 → shifted
    val stable = (1 to 4).map(i =>
      (i.toLong, if (i <= 2) "2024-01-01 10:00:00" else "2024-01-20 10:00:00",
        1L, "a", if (i % 2 == 1) 10.0 else 110.0))
    val moved = Seq(
      (10L, "2024-01-01 10:00:00", 1L, "b", 10.0),
      (11L, "2024-01-20 10:00:00", 1L, "b", 470.0))
    (stable ++ moved).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q208_psi_drift(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    // Jan 1 → Jan 20 spans 20 days: the 7-day windows fit disjointly
    assert(rows("a") == ((20L, 7L, 0.0, "stable")))
    assert(rows("b")._4 == "shifted" && rows("b")._3 > 0.25)
  }

  test("psi drift: a sub-14-day history clamps the windows disjoint instead of double-counting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_psi_short").toString
    // 8-day span: unclamped 7-day windows would OVERLAP on days 2-7 and
    // every shared event would count in both distributions, biasing PSI
    // toward 0. Clamped to (8+1)/2 = 4 days each, the windows are
    // disjoint: bucket 0 in the head, bucket 9 in the tail → shifted.
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 10.0),
      (2L, "2024-01-02 10:00:00", 1L, "a", 12.0),
      (3L, "2024-01-07 10:00:00", 1L, "a", 470.0),
      (4L, "2024-01-08 10:00:00", 1L, "a", 472.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = QueriesCorpus.q208_psi_drift(spark, dir).collect().head
    assert(r.getLong(1) == 8L && r.getLong(2) == 4L,
      s"span/window: ${r.getLong(1)}/${r.getLong(2)}")
    assert(r.getString(4) == "shifted", s"clamped verdict: $r")
  }

  test("l-diversity: one-type combos are weak, three-type combos clear the bar") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_ldiv").toString
    // day 1, bucket 0: three distinct types → diverse; day 2, bucket 0:
    // three rows of ONE type → weak
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:00:00", 2L, "click", 0.0),
      (3L, "2024-01-01 12:00:00", 3L, "purchase", 0.0),
      (4L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (5L, "2024-01-02 11:00:00", 2L, "view", 0.0),
      (6L, "2024-01-02 12:00:00", 3L, "view", 0.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q203_l_diversity(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows("2024-01-01") == ((1L, 0L, 0L, 0.0)))
    assert(rows("2024-01-02") == ((1L, 1L, 3L, 1.0)))
  }

  test("anonymity histogram: set sizes bucket with 5+ collapsed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_ahist").toString
    // combo A: 1 user (2 rows); combo B: 6 users → bucket 5
    val ev = (1 to 2).map(i =>
      (i.toLong, "2024-01-01 10:00:00", 1L, "view", 10.0)) ++
      (1 to 6).map(i => (10L + i, "2024-01-01 10:00:00", i.toLong, "click", 10.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q204_anonymity_histogram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1L -> ((1L, 2L)), 5L -> ((1L, 6L))))
  }

  test("char entropy: uniform and single-char documents pin the bit values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_chent").toString
    Seq(
      (1L, "aaaa", "en", "s", 4L), // one symbol → 0 bits
      (2L, "ab", "en", "s", 2L),   // two equiprobable → exactly 1 bit
      (3L, "a b", "en", "s", 3L)   // three symbols incl. the space → log2 3
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q182_char_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((4L, 1L, 0.0)))
    assert(rows(2L) == ((2L, 2L, 1.0)))
    assert(rows(3L) == ((3L, 3L, 1.584963))) // round(log2 3, 6)
  }

  test("char entropy counts CODE POINTS, not UTF-16 units (the DuckDB contract)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_cp").toString
    Seq(
      // 😀 is non-BMP (2 UTF-16 units, 1 code point): a naive
      // split(text, "") would count 4 "chars" of 4 distinct symbols;
      // DuckDB's string_split counts 3 — verified: ['a','😀','b']
      (1L, "a😀b", "en", "s", 3L),
      // combining sequence e + U+0301: TWO code points on both engines
      // (consistent, not grapheme clustering — documented in q182)
      (2L, "xe\u0301y", "en", "s", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesCorpus.q182_char_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((3L, 3L)), s"non-BMP char miscounted: ${rows(1L)}")
    assert(rows(2L) == ((4L, 4L)), s"combining sequence miscounted: ${rows(2L)}")
  }

  test("grapheme-cluster entropy: precomposed ≡ decomposed; agrees with q182 off combining marks") {
    import spark.implicits._
    // no SQL oracle for this unit (DuckDB ships no grapheme splitter),
    // so the contract is pinned here: the grapheme variant must count
    // precomposed "café" (é = U+00E9) and decomposed "café"
    // (e + combining acute) IDENTICALLY — the exact case the q182
    // code-point contract documents as its residual caveat
    val docs = Seq(
      (1L, "café"),   // 4 code points, 4 graphemes
      (2L, "café"),  // 5 code points, 4 graphemes
      (3L, "aaaa"),        // combining-free → must agree with q182
      (4L, "a😀b") // non-BMP emoji: 1 code point AND 1 grapheme
    ).toDF("doc_id", "text")
    val g = QueriesCorpus.charEntropyGraphemes(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // both spellings: 4 clusters, 4 distinct, entropy exactly 2 bits
    assert(g(1L) == ((4L, 4L, 2.0)), s"precomposed: ${g(1L)}")
    assert(g(2L) == ((4L, 4L, 2.0)), s"decomposed: ${g(2L)}")
    assert(g(3L) == ((4L, 1L, 0.0)))
    assert(g(4L) == ((3L, 3L, 1.584963)))

    // on the same docs the CODE-POINT query diverges between the two
    // spellings — the documented caveat the grapheme variant closes
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_graph").toString
    docs.select($"doc_id", $"text", lit("en").as("lang"), lit("s").as("source"),
      length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cp = QueriesCorpus.q182_char_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cp(1L) == 4L && cp(2L) == 5L, s"code-point counts: $cp")
    // and EXACT agreement with q182 on text free of combining marks
    val gOn = QueriesCorpus
      .charEntropyGraphemes(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val cpFull = QueriesCorpus.q182_char_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq(3L, 4L).foreach(id => assert(gOn(id) == cpFull(id), s"doc $id diverges off combining marks"))
  }

  test("burstiness: metronomic gaps give cv 0, one long gap raises it exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_burst").toString
    // user 1: six events 10 s apart → 5 gaps of 10 s, cv = 0
    val steady = (0 to 5).map(i =>
      (i.toLong, f"2024-01-01 00:00:${i * 10}%02d", 1L, "view", 0.0))
    // user 2: gaps 1,1,1,1,16 s → mean 4 s, σ² = 36, cv = 6/4
    val bursty = Seq(0, 1, 2, 3, 4, 20).zipWithIndex.map { case (s, i) =>
      (100L + i, f"2024-01-01 00:00:$s%02d", 2L, "view", 0.0) }
    // user 3: too few events → filtered by the n_gaps ≥ 5 floor
    val sparse = (0 to 2).map(i =>
      (200L + i, f"2024-01-01 00:01:${i * 5}%02d", 3L, "view", 0.0))
    (steady ++ bursty ++ sparse)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q184_burstiness(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == ((5L, 10.0, 0.0)))
    assert(rows(2L) == ((5L, 4.0, 1.5)))
  }

  test("tokenizer fertility: merged words count 1 token, unmerged count chars") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_fert").toString
    Seq(
      (1L, "the the", "en", "s", 7L), // t+h → th, th+e → the: 1 token/word
      (2L, "cat", "fr", "s", 3L)      // no merge applies: c a t = 3 tokens
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q185_tokenizer_fertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows("en") == ((1L, 2L, 2L, 1.0)))
    assert(rows("fr") == ((1L, 1L, 3L, 3.0)))
  }

  test("session stats: duration digits bucket the gap-sessionized output") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_sstats").toString
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:00:10", 1L, "view", 0.0), // same session: dur 10 s
      (3L, "2024-01-01 02:00:00", 1L, "view", 0.0)  // new session: dur 0 s
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q186_session_stats(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(1) == ((1L, 1L, 0.0, 1.0)))   // the instant session: "0" has 1 digit
    assert(rows(2) == ((1L, 2L, 10.0, 2.0)))  // the 10-second session
  }

  test("cluster purity: majority labels agree with an independent recompute") {
    import spark.implicits._
    val dir  = "/root/testdata/sf0.001"
    val rows = QueriesCorpus.q187_cluster_purity(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recompute off the same exact-kmeans assignment
    val assign = graft.operators.Clustering
      .kmeans(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = Tables.embeddings(spark, dir).select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byCluster = labels.groupBy { case (id, _) => assign(id) }
    rows.foreach { r =>
      val (cl, size, maj, n, purity) =
        (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4))
      val members = byCluster(cl).values.toSeq
      assert(size == members.size)
      val counts = members.groupBy(identity).view.mapValues(_.size)
      val (expMaj, expN) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(maj == expMaj && n == expN.toLong)
      assert(purity == BigDecimal(expN.toDouble / members.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.map(_.getLong(1)).sum == labels.size)
  }

  test("length outliers: integer median/MAD with a zero-MAD long tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_lenout").toString
    val docs = (1 to 6).map(i => (i.toLong, "t", "en", "s", 10L)) :+
      (7L, "t", "en", "s", 100L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = QueriesCorpus.q188_length_outliers(spark, dir).collect().head
    // lower median of {10x6,100} = 10; ads {0x6,90} → MAD 0; the long
    // doc is the single 3xMAD outlier
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((10L, 0L, 7L, 1L)))
    assert(r.getDouble(5) == 0.142857)
  }

  test("hapax richness: type/token ratio and hapax share pin exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_hapax").toString
    Seq((1L, "a a b", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = QueriesText.q189_hapax_richness(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 1L)))
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 0.5)
  }

  test("pmi collocations: a pure collocation scores ln 4 at the support floor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_pmi").toString
    // "new york" 5 times, nothing else: c_ab=5, N_b=5, U=10 →
    // PMI = ln((5/5) / ((5/10)·(5/10))) = ln 4
    val docs = (1 to 5).map(i => (i.toLong, "new york", "en", "s", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesText.q190_pmi_collocations(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "new york" && r.getLong(1) == 5L)
    assert(r.getDouble(2) == BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("split leakage: shared grams leak every eval doc, unique text stays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_leak").toString
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    val unique = "u1 u2 u3 u4 u5 u6 u7 u8"
    val docs = (1L to 59L).map(i => (i, shared, "en", "s", 0L)) :+ (60L, unique, "en", "s", 0L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val b  = md.digest(s"split:$id".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 2)
      if (b < "cc") "train" else if (b < "e6") "val" else "test"
    }
    val splits = docs.map { case (id, text, _, _, _) => (id, text, split(id)) }
    assert(splits.exists(s => s._3 == "train" && s._2 == shared)) // fixture precondition
    val expected = splits.filter(_._3 != "train").groupBy(_._3).map { case (sp, ds) =>
      val leaked = ds.count(_._2 == shared) // shared-gram eval docs all leak
      sp -> ((ds.size.toLong, leaked.toLong,
        BigDecimal(leaked.toDouble / ds.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = QueriesCorpus.q191_split_leakage(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
  }

  test("event lift: co-occurrence against the independence baseline, closed form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_lift").toString
    // view {1,2,3}, click {1,2,5}, error {4}: only (click, view) co-occurs
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (4L, "2024-01-01 10:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 10:00:00", 3L, "view", 0.0),
      (6L, "2024-01-01 10:00:00", 4L, "error", 0.0),
      (7L, "2024-01-01 10:00:00", 5L, "click", 0.0),
      (8L, "2024-01-01 10:00:00", 5L, "click", 0.0)) // dup row: distinct-collapsed
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q194_event_lift(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == (("click", "view")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((3L, 3L, 2L)))
    // lift = 2·5 / (3·3), confidence = 2/3
    assert(r.getDouble(5) == 1.111111 && r.getDouble(6) == 0.666667)
  }

  test("user paths: three-step journeys count across session boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_paths").toString
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:00:01", 1L, "click", 0.0),
      (3L, "2024-01-01 10:00:02", 1L, "purchase", 0.0),
      (4L, "2024-01-01 10:00:03", 1L, "error", 0.0),
      (5L, "2024-01-02 09:00:00", 2L, "view", 0.0),
      (6L, "2024-01-02 09:00:01", 2L, "click", 0.0),
      (7L, "2024-01-02 09:00:02", 2L, "purchase", 0.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = QueriesCorpus.q196_user_paths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map(
      "view > click > purchase" -> 2L,
      "click > purchase > error" -> 1L))
  }

  test("signal correlation: perfectly aligned and inverted signals pin r = ±1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_corr").toString
    Seq(
      // srcA: len tracks toks exactly → every r = 1
      (1L, "a", "en", "srcA", 1L),
      (2L, "a b", "en", "srcA", 2L),
      (3L, "a b c", "en", "srcA", 3L),
      // srcB: len runs against toks → r_len_toks = r_len_types = -1
      (4L, "a b c", "en", "srcB", 5L),
      (5L, "a b", "en", "srcB", 10L),
      (6L, "a", "en", "srcB", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q197_signal_correlation(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows("srcA") == ((3L, 1.0, 1.0, 1.0)))
    assert(rows("srcB") == ((3L, -1.0, -1.0, 1.0)))
  }

  test("bm25: closed-form scores for planted term frequencies and lengths") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_bm25").toString
    Seq(
      (1L, "table table other", "en", "s", 17L), // tf=2, dl=3
      (2L, "scan x y z", "en", "s", 10L),        // tf=1, dl=4
      (3L, "nothing here", "en", "s", 12L)       // no query term → no row
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesText.q198_bm25(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=3: idf = ln(1 + 2.5/1.5) for both single-df terms
    val idf = math.log(1.0 + 2.5 / 1.5)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == r6(idf * 4.4 / (2 + 1.2 * (0.25 + 0.75 * (3.0 / 3.0)))))
    assert(rows(2L) == r6(idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * (4.0 / 3.0)))))
  }

  test("datacard: volume, languages, dup share and split balance in one row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_card").toString
    val docs = Seq(
      (1L, "a b c", "en", "srcA", 5L),
      (2L, "a b c", "en", "srcA", 5L), // exact copy → 1 dup doc
      (3L, "x y", "fr", "srcA", 3L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s"split:$id".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 2) < "cc"
    }
    val trainDocs = docs.count { case (id, _, _, _, _) => isTrain(id) }
    val r = QueriesCorpus.q200_datacard(spark, dir).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("srcA", 3L, 8L, 2L)))
    assert(r.getDouble(4) == BigDecimal(13.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(5) == 1L && r.getDouble(6) == BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(7) == BigDecimal(trainDocs.toDouble / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("quality blend: percent-rank averaging with a tied axis contributing zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_blend").toString
    // toks and n_chars strictly increase; ttr ties at 1.0 for all →
    // its percent_rank is 0 everywhere, so blend = (pr + 0 + pr)/3
    Seq(
      (1L, "a", "en", "s", 1L),
      (2L, "a b", "en", "s", 2L),
      (3L, "a b c", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = QueriesCorpus.q201_quality_blend(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(3)))).toMap
    assert(rows(1L) == ((0.0, 0)))
    assert(rows(2L) == ((0.333333, 0)))
    assert(rows(3L) == ((0.666667, 1)))
  }

  test("winsorized mean: P10/P90 integer-rank clipping tames a planted tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec_wins").toString
    val docs = (1 to 10).map(i => (i.toLong, "t", "en", "s", i.toLong)) :+
      (11L, "t", "en", "s", 1000L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = QueriesCorpus.q202_winsorized_mean(spark, dir).collect().head
    // n=11: lo = rank 2 value (2), hi = rank 10 value (10); clipped
    // sum = 66 → mean 6; raw mean = 1055/11
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 10L, 11L)))
    assert(r.getDouble(4) == 95.909091 && r.getDouble(5) == 6.0)
  }

  test("cluster topics: c-TF-IDF top terms agree with an independent recompute") {
    import spark.implicits._
    val dir  = "/root/testdata/sf0.001"
    val rows = QueriesCorpus.q193_cluster_topics(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.nonEmpty)
    val assign = graft.operators.Clustering
      .kmeans(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val texts = Tables.documents(spark, dir).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val ctf = texts
      .flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).map(tok => (assign(id), tok)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfc = ctf.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = ctf.toSeq
      .map { case ((cl, tok), c) => (cl, tok, c, c * math.log(9.0 / (dfc(tok) + 1.0))) }
      .groupBy(_._1)
      .flatMap { case (cl, ts) =>
        ts.sortBy { case (_, tok, _, s) => (-s, tok) }.take(3).zipWithIndex.map {
          case ((_, tok, c, s), i) => (cl, i + 1) ->
            ((tok, c, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) }
      }
    assert(rows == expected)
  }
}
