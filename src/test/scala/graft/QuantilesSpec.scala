package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Sort-based reference: value at ascending rank ⌈n·q⌉ per group. */
  private def reference(rows: Seq[(String, Double)], qs: Seq[Double]): Set[(String, Double, Double)] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      qs.map(q => (g, q, sorted(math.ceil(sorted.size * q).toInt - 1)))
    }.toSet

  /** sortThresholdBytes = 0 forces the bucket-selection path. */
  private def run(rows: Seq[(String, Double)], qs: Seq[Double], buckets: Int,
      sortThresholdBytes: Long = 0L) =
    Quantiles.exactQuantiles(rows.toDF("g", "v"), "g", "v", qs, buckets, sortThresholdBytes)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet

  test("bucket path matches the sort-based rank selection on random multisets with heavy ties") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(3000) { i =>
      (s"g${i % 3}", math.floor(rng.nextDouble() * 50) / 2.0) // ~100 distinct values → many ties
    }
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    assert(run(rows, qs, buckets = 64) == reference(rows, qs))
  }

  test("adaptive window path (groups under threshold) emits the identical rows") {
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(2000)(i => (s"g${i % 4}", math.floor(rng.nextDouble() * 30).toDouble))
    val qs   = Seq(0.25, 0.5, 0.75)
    assert(run(rows, qs, buckets = 64, sortThresholdBytes = Long.MaxValue) == reference(rows, qs))
    assert(run(rows, qs, buckets = 64, sortThresholdBytes = 0L) == reference(rows, qs))
  }

  test("two quantiles landing in the same bucket rank their own copies") {
    // 4 buckets over uniform values → p50 and p55 share a bucket
    val rows = Seq.tabulate(400)(i => ("g", i.toDouble))
    val qs   = Seq(0.50, 0.55)
    assert(run(rows, qs, buckets = 4) == reference(rows, qs))
  }

  test("high-cardinality grouping (≥10⁴ groups): bucket path ≡ sort path, fully in-plan") {
    // the round-15 verdict's driver-bound scenario: many groups would
    // have made the collected histogram O(groups × buckets) on the
    // driver; the in-plan selection must handle it and stay bit-equal
    val rng  = new scala.util.Random(23)
    val rows = Seq.tabulate(60000) { i =>
      (s"g${i % 12000}", math.floor(rng.nextDouble() * 40).toDouble) // 12k groups × 5 rows
    }
    val qs  = Seq(0.5, 1.0)
    val ref = reference(rows, qs)
    assert(run(rows, qs, buckets = 8, sortThresholdBytes = 0L) == ref)
    assert(run(rows, qs, buckets = 8, sortThresholdBytes = Long.MaxValue) == ref)
  }

  test("null and NaN values are ignored identically on both paths") {
    val base: Seq[(String, java.lang.Double)] =
      Seq.tabulate(200)(i => ("g", java.lang.Double.valueOf(i.toDouble)))
    val dirty = base ++ Seq[(String, java.lang.Double)](
      ("g", null), ("g", java.lang.Double.valueOf(Double.NaN)),
      ("allnull", null), ("allnull", java.lang.Double.valueOf(Double.NaN)))
    val qs  = Seq(0.5, 1.0)
    val ref = reference(base.map { case (g, v) => (g, v.doubleValue) }, qs)
    def runNullable(threshold: Long) =
      Quantiles.exactQuantiles(dirty.toDF("g", "v"), "g", "v", qs, buckets = 16, threshold)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // all-null group disappears; null/NaN never shift a rank
    assert(runNullable(0L) == ref)
    assert(runNullable(Long.MaxValue) == ref)
  }

  test("degenerate all-equal group and singleton group") {
    val rows = Seq.fill(100)(("same", 5.0)) ++ Seq(("one", 42.0))
    val qs   = Seq(0.5, 1.0)
    assert(run(rows, qs, buckets = 16) == reference(rows, qs))
  }

  test("q43 through the bucket-selection operator equals the window form at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val w  = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
    val wc = Window.partitionBy($"l_returnflag")
    val windowForm = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .filter($"rn" === ceil($"n" * 0.5) || $"rn" === ceil($"n" * 0.9))
      .groupBy($"l_returnflag")
      .agg(
        max(when($"rn" === ceil($"n" * 0.5), $"l_extendedprice")).cast("double").as("p50"),
        max(when($"rn" === ceil($"n" * 0.9), $"l_extendedprice")).cast("double").as("p90"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val bucketForm = QueriesRel2.q43_quantiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(bucketForm == windowForm)
  }
}
