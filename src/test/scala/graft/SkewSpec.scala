package graft

import graft.operators.{Salt, Skew}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewReport computes mass profile with deterministic top key") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val r  = Skew.keySkewReport(df, "k", "t.k").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("key_col") == "t.k")
    assert(row.getAs[Long]("n_rows") == 6L)
    assert(row.getAs[Long]("n_keys") == 3L)
    assert(row.getAs[Long]("max_key_rows") == 3L)
    assert(row.getAs[Long]("top_key") == 1L)
    assert(row.getAs[Double]("skew_ratio") == 1.5)
  }

  test("keySkewReport breaks max-count ties to the smallest key") {
    val df = Seq(5L, 5L, 2L, 2L, 9L).toDF("k")
    val row = Skew.keySkewReport(df, "k", "t.k").collect().head
    assert(row.getAs[Long]("max_key_rows") == 2L)
    assert(row.getAs[Long]("top_key") == 2L, "tie must go to the smallest key")
  }

  test("keySkewReport handles string keys, null keys, and Long.MinValue without overflow") {
    // string key: no negation of the key is possible; tie goes to the
    // lexicographically smallest
    val sRow = Skew.keySkewReport(
      Seq("b", "b", "a", "a", "z").toDF("k"), "k", "s.k").collect().head
    assert(sRow.getAs[Long]("max_key_rows") == 2L)
    assert(sRow.getAs[String]("top_key") == "a")

    // null keys count in the profile but never become top_key
    val nRow = Skew.keySkewReport(
      Seq(Some(4L), None, None, None, Some(4L)).toDF("k"), "k", "n.k").collect().head
    assert(nRow.getAs[Long]("n_rows") == 5L)
    assert(nRow.getAs[Long]("n_keys") == 2L)
    assert(nRow.getAs[Long]("max_key_rows") == 3L)
    assert(nRow.getAs[Long]("top_key") == 4L, "null key must not win the label")

    // Long.MinValue key: the old (cnt, −key) struct negated the KEY and
    // overflowed here; the (−cnt, key) form negates only the count
    val mRow = Skew.keySkewReport(
      Seq(Long.MinValue, Long.MinValue, 7L).toDF("k"), "k", "m.k").collect().head
    assert(mRow.getAs[Long]("top_key") == Long.MinValue)
  }

  test("recommend_salt flips on both audit-observed AQE suppression preconditions") {
    // skewed key by AQE's factor: 100 rows of key 1 + 9 singletons →
    // ratio = 100·10/109 ≈ 9.2 ≥ 5
    val df = (Seq.fill(100)(1L) ++ (2L to 10L)).toDF("k")

    // precondition 1 (bytes under AQE's COMPRESSED threshold): a
    // narrow hot payload — 100 rows × 64 B ≪ 256 MiB, AQE sees no
    // skew, salt is the answer
    val narrow = Skew.keySkewReport(df, "k", "t.k").collect().head
    assert(narrow.getAs[Boolean]("recommend_salt"))

    // same row mass but wide AND incompressible on the wire
    // (100 × 8 MiB ≥ 256 MiB): AQE's split fires — no salt needed
    val wide = Skew.keySkewReport(df, "k", "t.k",
      bytesPerRowEst = 8L * 1024 * 1024).collect().head
    assert(!wide.getAs[Boolean]("recommend_salt"))

    // the audit's first suppression: the same wide payload but
    // CONSTANT, lz4-compressing ~50× — map-output bytes drop under the
    // threshold and the recommendation comes back
    val compressed = Skew.keySkewReport(df, "k", "t.k",
      bytesPerRowEst = 8L * 1024 * 1024, compressRatioEst = 0.02).collect().head
    assert(compressed.getAs[Boolean]("recommend_salt"))

    // the audit's second suppression: a downstream groupBy on the join
    // key imposes a required child distribution — AQE declines the
    // split even above threshold
    val pinned = Skew.keySkewReport(df, "k", "t.k",
      bytesPerRowEst = 8L * 1024 * 1024, downstreamPinsPartitioning = true).collect().head
    assert(pinned.getAs[Boolean]("recommend_salt"))

    // an unskewed key never recommends salt, whatever the payload
    val uniform = Skew.keySkewReport((1L to 10L).toDF("k"), "k", "u.k").collect().head
    assert(!uniform.getAs[Boolean]("recommend_salt"))
  }

  test("different-key saltedJoin equals the plain inner join, including null and unmatched keys") {
    // skewed big side (key 1 dominates), an unmatched big key (7), a
    // null big key, an unmatched small key (99), a null small key
    val big = (Seq.fill(40)(1L) ++ Seq(2L, 2L, 3L, 7L)).map(k => (k, s"b$k"))
      .toDF("bk", "bval")
      .unionByName(Seq((Option.empty[Long], "bnull")).toDF("bk", "bval"))
    val small = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"), (99L, "s99")).toDF("sk", "sval")
      .unionByName(Seq((Option.empty[Long], "snull")).toDF("sk", "sval"))

    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val salted = Salt.saltedJoin(big, small, "bk", "sk", col("bval"), factor = 4)
      .select("bk", "bval", "sk", "sval").collect().map(key).sorted.toSeq
    val plain = big.join(small, big("bk") === small("sk"))
      .select("bk", "bval", "sk", "sval").collect().map(key).sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 43, "40 + 2 + 1 matched rows; 7/null/99/null drop")
  }

  test("different-key saltedJoin is deterministic across runs and keeps no salt column") {
    val big   = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("bk", "bval")
    val small = Seq((1L, "a"), (2L, "b")).toDF("sk", "sval")
    val j = Salt.saltedJoin(big, small, "bk", "sk", col("bval"), factor = 8)
    assert(!j.columns.contains("__salt"))
    val a = j.collect().map(_.mkString("|")).sorted.toSeq
    val b = Salt.saltedJoin(big, small, "bk", "sk", col("bval"), factor = 8)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(a == b)
    // the salted shuffle key is live inside the plan even though the
    // output drops it — a regression to an unsalted join would lose it
    assert(j.queryExecution.optimizedPlan.toString.contains("__salt"))
  }
}
