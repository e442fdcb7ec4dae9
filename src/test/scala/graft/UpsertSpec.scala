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
    val mr = Upsert.mergeWithMetrics(tgt, src, Seq("k"), "v")
    assert(mr.metrics == Upsert.WriteMetrics(inserted = 1, updated = 1, kept = 2))
    assert(mr.metrics.outputRows == 4)
    assert(mr.result.columns.toSeq == Seq("k", "payload", "v")) // action col dropped
    assert(mr.result.count() == 4)
    mr.unpersist()
  }

  test("mergeWithMetrics never caches the full-width merge plan") {
    import org.apache.spark.storage.StorageLevel
    val (tgt, src) = fixture
    val mr = Upsert.mergeWithMetrics(tgt, src, Seq("k"), "v")
    // the merged table must NOT be materialized in the cache: at scale
    // the cache would hold the entire post-merge table full-width —
    // consumers re-run the deterministic plan, each pass column-pruned
    assert(mr.merged.storageLevel == StorageLevel.NONE,
      "merge plan must stay uncached (full-width cache is the anti-pattern at scale)")
    mr.unpersist() // kept for caller symmetry; must be a no-op
    assert(mr.merged.storageLevel == StorageLevel.NONE)
    // and the metrics remain usable after unpersist
    assert(mr.metrics.outputRows == 4)
  }

  test("row preservation invariant: output keys = union of tgt and src keys") {
    val (tgt, src) = fixture
    val out = Upsert.plan(tgt, src, Seq("k"), "v")
    val expected = tgt.select("k").union(src.select("k")).distinct().count()
    assert(out.count() == expected)
  }

  test("multiple source rows matching one target row raise like Delta MERGE") {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1)).toDF("k", "payload", "v")
    val src = Seq((1L, "a-v2", 2), (1L, "a-v3", 3)).toDF("k", "payload", "v")
    val e = intercept[Exception] {
      Upsert.plan(tgt, src, Seq("k"), "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("multiple source rows matched")),
      s"expected Delta-style dup-source error, got: $e")
    // the guard survives projection pruning: dropping the action column
    // (or selecting any single column) must still raise
    val e2 = intercept[Exception] {
      Upsert.plan(tgt, src, Seq("k"), "v").select("payload").collect()
    }
    assert(messages(e2).exists(_.contains("multiple source rows matched")),
      s"guard must not be prunable away, got: $e2")
    // the guard is a Filter, so even a COLUMN-LESS consumer — count()
    // prunes every projected expression — still raises like Delta
    val e3 = intercept[Exception] {
      Upsert.plan(tgt, src, Seq("k"), "v").count()
    }
    assert(messages(e3).exists(_.contains("multiple source rows matched")),
      s"guard must survive full column pruning (count()), got: $e3")
  }

  test("duplicate source keys that match NO target row are all inserted (Delta parity)") {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1)).toDF("k", "payload", "v")
    val src = Seq((9L, "x1", 1), (9L, "x2", 1)).toDF("k", "payload", "v")
    val out = Upsert.plan(tgt, src, Seq("k"), "v").orderBy("k", "payload").collect()
    assert(out.length == 3)
    assert(out.count(_.getString(3) == "insert") == 2) // both WHEN NOT MATCHED inserts
    assert(out.count(_.getString(3) == "keep") == 1)
  }

  test("a null-key target row survives the merge untouched") {
    import spark.implicits._
    val tgt = Seq((Some(1L), "a", 1), (None, "null-key-row", 7)).toDF("k", "payload", "v")
    val src = Seq((Some(2L), "b", 1)).toDF("k", "payload", "v")
    val out = Upsert.plan(tgt, src, Seq("k"), "v").collect()
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getString(1) == "null-key-row") // payload NOT wiped to null
    assert(nullRow.getInt(2) == 7)
    assert(nullRow.getString(3) == "keep")
  }

  test("null keys match null-safely: a null-key src row conditionally updates a null-key tgt row") {
    import spark.implicits._
    val tgt = Seq((Some(1L), "a", 1), (None, "old", 1)).toDF("k", "payload", "v")
    val src = Seq((Option.empty[Long], "new", 2)).toDF("k", "payload", "v")
    val out = Upsert.plan(tgt, src, Seq("k"), "v").collect()
    assert(out.length == 2)
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getString(1) == "new" && nullRow.getString(3) == "update")
  }

  test("SCD2 merge: close-and-open on change, pass-through otherwise, history untouched") {
    import spark.implicits._
    val target = Seq(
      (1L, "alpha", "2020-01-01", null.asInstanceOf[String], 1), // will change
      (1L, "old",   "2019-01-01", "2020-01-01", 0),              // history: untouched
      (2L, "beta",  "2020-01-01", null.asInstanceOf[String], 1), // source equal: pass through
      (3L, "gamma", "2020-01-01", null.asInstanceOf[String], 1)  // no source: pass through
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val source = Seq(
      (1L, "ALPHA2", "2021-06-01"), // change
      (2L, "beta", "2021-06-01"),   // identical attrs -> no-op
      (4L, "delta", "2021-06-01")   // brand new key
    ).toDF("k", "attr", "eff")
    val out = Upsert.scd2(target, source, Seq("k"), Seq("attr"), "eff")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getInt(4))).toSet
    val expected = Set(
      (1L, "old", "2019-01-01", Some("2020-01-01"), 0),          // history
      (1L, "alpha", "2020-01-01", Some("2021-06-01"), 0),        // closed
      (1L, "ALPHA2", "2021-06-01", None, 1),                     // opened
      (2L, "beta", "2020-01-01", None, 1),                       // unchanged
      (3L, "gamma", "2020-01-01", None, 1),                      // no source
      (4L, "delta", "2021-06-01", None, 1)                       // new key
    )
    assert(out == expected, s"got $out")
    // exactly one current row per key, always
    val perKey = out.toSeq.filter(_._5 == 1).groupBy(_._1).view.mapValues(_.size).toMap
    assert(perKey.values.forall(_ == 1))
  }

  test("scd2 collapses duplicate source keys to the latest change; rejects empty attrs") {
    import spark.implicits._
    val target = Seq((1L, "alpha", "2020-01-01", Option.empty[String], 1))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    // three versions of the same key in one batch — only the newest applies
    val source = Seq(
      (1L, "mid", "2021-01-01"),
      (1L, "newest", "2021-06-01"),
      (1L, "oldest", "2020-06-01")
    ).toDF("k", "attr", "eff")
    val out = Upsert.scd2(target, source, Seq("k"), Seq("attr"), "eff")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getInt(4))).toSet
    assert(out == Set(
      (1L, "alpha", "2020-01-01", Some("2021-06-01"), 0), // closed at the NEWEST eff
      (1L, "newest", "2021-06-01", None, 1)               // one opened row, not three
    ), s"got $out")
    val current = out.toSeq.filter(_._5 == 1)
    assert(current.size == 1, "one-current-row-per-key invariant must survive a dup-key batch")
    intercept[IllegalArgumentException] {
      Upsert.scd2(target, source, Seq("k"), Seq.empty, "eff")
    }
  }
}
