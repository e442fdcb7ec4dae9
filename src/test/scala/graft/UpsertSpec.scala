package graft

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def fixture = {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1), (2L, "b", 5), (3L, "c", 1)).toDF("k", "payload", "v")
    val src = Seq((2L, "b2", 6), (3L, "c2", 1), (4L, "d", 1)).toDF("k", "payload", "v")
    (tgt, src)
  }

  test("merge keeps unmatched target rows, updates on higher version, inserts new keys") {
    val (tgt, src) = fixture
    val out = Upsert.plan(tgt, src, Seq("k"), "v").orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byKey = out.map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(byKey(1L) == (("a", "keep")))     // no src match
    assert(byKey(2L) == (("b2", "update")))  // src.v 6 > tgt.v 5
    assert(byKey(3L) == (("c", "keep")))     // src.v 1 !> tgt.v 1 — conditional update holds
    assert(byKey(4L) == (("d", "insert")))   // new key
  }

  test("mergeWithMetrics counts inserted/updated/kept like Delta operationMetrics") {
    val (tgt, src) = fixture
    val (out, m) = Upsert.mergeWithMetrics(tgt, src, Seq("k"), "v")
    assert(m == Upsert.WriteMetrics(inserted = 1, updated = 1, kept = 2))
    assert(m.outputRows == 4)
    assert(out.columns.toSeq == Seq("k", "payload", "v")) // action col dropped
    assert(out.count() == 4)
  }

  test("row preservation invariant: output keys = union of tgt and src keys") {
    val (tgt, src) = fixture
    val out = Upsert.plan(tgt, src, Seq("k"), "v")
    val expected = tgt.select("k").union(src.select("k")).distinct().count()
    assert(out.count() == expected)
  }
}
