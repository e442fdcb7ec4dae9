package graft

import org.apache.spark.sql.functions._

/** Numeric error-bound contract for the sketch family (q49/q50): the
  * oracle checks the within_bound FLAG; this spec pins the actual
  * relative error against the exact count at every local sf, so a
  * regression in sketch parameters (rsd, lgConfigK) fails here even
  * though the flag might still pass.
  */
class SketchSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (dir <- sfs) {
    test(s"approx_count_distinct(rsd=0.05) within 3*rsd of exact per event_type at $dir") {
      import spark.implicits._
      val rows = Tables
        .events(spark, dir)
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("exact"),
          approx_count_distinct($"user_id", rsd = 0.05).as("approx")
        )
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val exact  = r.getLong(1).toDouble
        val approx = r.getLong(2).toDouble
        val rel    = math.abs(approx - exact) / exact
        assert(rel <= 0.15, s"${r.getString(0)}: approx $approx vs exact $exact (rel $rel) at $dir")
      }
    }

    test(s"merged DataSketches HLL (two independent halves) within 10% of exact at $dir") {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val a = ev.filter($"event_id" % 2 === 0)
        .groupBy($"event_type").agg(hll_sketch_agg($"user_id").as("sk_a"))
      val b = ev.filter($"event_id" % 2 =!= 0)
        .groupBy($"event_type").agg(hll_sketch_agg($"user_id").as("sk_b"))
      val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact"))
      val rows = a.join(b, Seq("event_type"))
        .select($"event_type", hll_sketch_estimate(hll_union($"sk_a", $"sk_b")).as("est"))
        .join(exact, Seq("event_type"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val est   = r.getLong(1).toDouble
        val exact = r.getLong(2).toDouble
        val rel   = math.abs(est - exact) / exact
        assert(rel <= 0.10, s"${r.getString(0)}: merged est $est vs exact $exact (rel $rel) at $dir")
      }
    }
  }

  test("sketch ledger: 3 appended runs union to within 10% of the from-scratch distinct count") {
    import spark.implicits._
    import graft.operators.Sketches
    val dir = "/root/testdata/sf0.01"
    val wh = new graft.sources.Warehouse(
      spark, java.nio.file.Files.createTempDirectory("graft_sk_wh").toString)
    val ev = Tables.events(spark, dir)
    // three pipeline runs, each scanning ONLY its own disjoint slice
    for (run <- 0 to 2)
      wh.append("gold", "user_sketches",
        Sketches.runSketch(ev.filter($"event_id" % 3 === run),
          Seq("event_type"), "user_id", runId = s"run_$run"))
    assert(wh.history("gold.user_sketches").filter($"operation" === "APPEND").count() == 3L)
    val est = Sketches
      .estimateAcrossRuns(wh.table("gold", "user_sketches"), Seq("event_type"))
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact"))
    val rows  = est.join(exact, Seq("event_type")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rel = math.abs(r.getLong(1).toDouble - r.getLong(2).toDouble) / r.getLong(2).toDouble
      assert(rel <= 0.10, s"${r.getString(0)}: ledger est ${r.getLong(1)} vs exact ${r.getLong(2)}")
    }
    // mergeability is exact: the ledger estimate must equal the single-pass
    // sketch estimate over the same concatenated data, not merely be close
    val onePass = ev
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("one_pass"))
    est.join(onePass, Seq("event_type")).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: union-of-run-sketches must equal sketch-of-union exactly")
    }
  }

  test("count-min merge: slice-built sketches estimate like a single build, bounds hold for every key") {
    import graft.operators.Sketches
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev  = Tables.events(spark, dir)
    val eps = 0.001
    val merged = Sketches.countMinMerged(ev, "event_type", pmod($"event_id", lit(4)), eps,
      confidence = 0.99, seed = 42)
    val single = Sketches.countMinMerged(ev, "event_type", lit(0), eps,
      confidence = 0.99, seed = 42)
    val total = merged.totalCount()
    assert(total == ev.count(), "totalCount must equal the stream length")
    val exact = ev.groupBy($"event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = merged.estimateCount(k)
      // merging 4 slice sketches must give the same estimates as one build
      assert(est == single.estimateCount(k), s"$k: merged != single-build estimate")
      // CMS point-query contract: never under, over by at most eps*N (+1 rounding)
      assert(est >= n, s"$k: CMS must never underestimate ($est < $n)")
      assert(est <= n + (eps * total).toLong + 1, s"$k: est $est exceeds exact $n + eps*N")
    }
    // a key never seen estimates within the additive bound of zero
    assert(merged.estimateCount("no_such_event") <= (eps * total).toLong + 1)
  }

  test("frequency ledger: appended per-run CMS rows merge to the single-build sketch") {
    import graft.operators.Sketches
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val wh = new graft.sources.Warehouse(
      spark, java.nio.file.Files.createTempDirectory("graft_cms_wh").toString)
    val ev  = Tables.events(spark, dir)
    val eps = 0.001
    // three pipeline runs, each sketching ONLY its own disjoint slice
    for (run <- 0 to 2)
      wh.append("gold", "freq_sketches",
        Sketches.runFrequencySketch(ev.filter($"event_id" % 3 === run),
          "event_type", s"run_$run", eps, confidence = 0.99, seed = 42))
    val ledger = Sketches.frequencyAcrossRuns(wh.table("gold", "freq_sketches"))
    val single = Sketches.countMinMerged(ev, "event_type", lit(0), eps,
      confidence = 0.99, seed = 42)
    assert(ledger.totalCount() == ev.count())
    val keys = ev.select($"event_type").distinct().collect().map(_.getString(0))
    keys.foreach { k =>
      assert(ledger.estimateCount(k) == single.estimateCount(k),
        s"$k: ledger-merged estimate must equal the single-build sketch")
    }
  }

  test("hll_union_agg merges MANY partial sketches (8 hash buckets) to the same answer") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev  = Tables.events(spark, dir)
    // partial sketch per (event_type, bucket) — the per-partition / per-day
    // shape — then a single union-aggregate; no re-scan of the raw rows
    val partials = ev
      .groupBy($"event_type", pmod($"user_id", lit(8)).as("bucket"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = partials
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact"))
    merged.join(exact, Seq("event_type")).collect().foreach { r =>
      val rel = math.abs(r.getLong(1).toDouble - r.getLong(2).toDouble) / r.getLong(2).toDouble
      assert(rel <= 0.10, s"${r.getString(0)}: union_agg est ${r.getLong(1)} vs exact ${r.getLong(2)}")
    }
  }

  test("quantile ledger: planted values pin rank selection and bucket containment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_spec_qled").toString
    // values 1..10: r50 = rank 5 → 5.0 (bucket [5,10)), r90 = rank 9 → 9.0
    val ev = (1 to 10).map(i =>
      (i.toLong, "2024-01-01 10:00:00", 1L, "a", i.toDouble))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = QueriesSketch.q205_quantile_sketch(spark, dir).collect().head
    assert((r.getString(0), r.getDouble(1), r.getDouble(2)) == (("a", 5.0, 9.0)))
    assert(r.getInt(3) == 1 && r.getInt(4) == 1)
  }
}
