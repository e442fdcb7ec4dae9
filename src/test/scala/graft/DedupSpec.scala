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

  test("ann lsh recall vs brute force is reasonable at test scale") {
    val exact = QueriesDedup.q30_ann_topk(spark, sfDir).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = QueriesDedup.q31_ann_lsh_topk(spark, sfDir).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall collapsed: $recall") // 4 planes + multiprobe on gaussian data
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
}
