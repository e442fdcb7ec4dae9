package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB answer to exact
  * `count(DISTINCT ...)` (q18), whose two-phase expand/shuffle carries
  * every distinct key through the exchange. A sketch is a few KB per
  * group however many keys it saw, partial-aggregates map-side, and —
  * critically — MERGES: per-partition / per-day sketches union into the
  * global answer without re-scanning history, which is how incremental
  * 100 TB pipelines keep distinct-count dashboards warm.
  *
  * Cross-engine contract: sketch ESTIMATES are engine-specific (Spark
  * ships HLL++ for approx_count_distinct and Apache DataSketches HLL
  * for hll_sketch_agg; DuckDB's approx_count_distinct is a different
  * HLL), so the oracle checks the CONTRACT, not the estimate: each row
  * emits the exact count plus a within-bound flag the oracle expects to
  * be 1. The error bound itself is pinned per-sf in SketchSpec against
  * the exact value, and the exact oracle stays on q18.
  */
object QueriesSketch {

  /** Relative-error contract for approx_count_distinct at rsd=0.05:
    * HLL++ standard error is rsd, so 3·rsd is a ≥ 99.7% bound; the
    * flag (not the estimate) is what both engines must agree on.
    */
  def q49_approx_distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"user_id", rsd = 0.05).as("approx_users")
      )
      .select(
        $"event_type",
        $"exact_users",
        when(abs($"approx_users" - $"exact_users") <= $"exact_users" * 0.15, 1)
          .otherwise(0)
          .as("within_bound")
      )
      .orderBy($"event_type")
  }

  /** Mergeable-sketch pipeline: DataSketches HLL sketches built
    * INDEPENDENTLY over two halves of the stream (even/odd event_id —
    * standing in for two days / two partitions), then hll_union'd and
    * estimated. This is the property exact distinct lacks: yesterday's
    * sketch + today's sketch = the union's sketch, no re-scan. Default
    * lgConfigK=12 ⇒ ~1.6% standard error; the contract bound is 10%.
    */
  def q50_sketch_merge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val a = ev
      .filter($"event_id" % 2 === 0)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk_a"))
    val b = ev
      .filter($"event_id" % 2 =!= 0)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk_b"))
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact_users"))
    a.join(b, Seq("event_type"))
      .select($"event_type", hll_sketch_estimate(hll_union($"sk_a", $"sk_b")).as("est"))
      .join(exact, Seq("event_type"))
      .select(
        $"event_type",
        $"exact_users",
        when(abs($"est" - $"exact_users") <= $"exact_users" * 0.10, 1)
          .otherwise(0)
          .as("within_bound")
      )
      .orderBy($"event_type")
  }

  /** The sketch LEDGER shape ([[graft.operators.Sketches]]): three
    * "runs" each sketch only their own third of the stream, their rows
    * union into a ledger, and `hll_union_agg` answers distinct-users-
    * across-all-runs without re-scanning any run's raw data. Same
    * error-contract oracle as q49/q50 (exact count + within_bound=1);
    * the 10% bound and the exact-mergeability equality are pinned in
    * SketchSpec, and the warehouse append/history wiring in
    * PipelineSpec.
    */
  def q55_sketch_ledger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Sketches
    val ev = Tables.events(spark, dir)
    val ledger = (0 to 2)
      .map(r =>
        Sketches.runSketch(ev.filter($"event_id" % 3 === r), Seq("event_type"), "user_id", s"run_$r"))
      .reduce(_ unionByName _)
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact_users"))
    Sketches
      .estimateAcrossRuns(ledger, Seq("event_type"))
      .join(exact, Seq("event_type"))
      .select(
        $"event_type",
        $"exact_users",
        when(abs($"est_distinct" - $"exact_users") <= $"exact_users" * 0.10, 1)
          .otherwise(0)
          .as("within_bound")
      )
      .orderBy($"event_type")
  }

  /** Heavy-hitter detection over a MERGED count-min sketch
    * ([[graft.operators.Sketches.countMinMerged]]) — the frequency
    * complement to q49/q50/q55's distinct-count sketches: which keys
    * dominate the stream. Two independently-built slice sketches
    * (even/odd event_id — two days' ingest) merge without re-scanning
    * either slice; candidates are the keys at ≥ 10 % share (at most
    * ⌈1/φ⌉ = 10 of them, the textbook bound — a driver-side loop over
    * them is metadata work, like the PQ codebook), each bound-checked
    * against its exact count: CMS guarantees `exact ≤ est` always and
    * `est ≤ exact + eps·N` at the configured confidence. Selection is
    * by EXACT count, so the key set is oracle-exact like q49's
    * contract; the sketch carries the within_bound evidence.
    */
  def q88_heavy_hitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Sketches
    val ev  = Tables.events(spark, dir)
    val eps = 0.001
    val cms = Sketches.countMinMerged(ev, "event_type", pmod($"event_id", lit(2)), eps,
      confidence = 0.99, seed = 42)
    val total = cms.totalCount()
    val heavy = ev
      .groupBy($"event_type")
      .agg(count(lit(1)).as("exact_n"))
      .filter($"exact_n" >= total * 0.10)
      .collect() // ≤ 1/φ rows by the heavy-hitter bound
      .map { r =>
        val key   = r.getString(0)
        val exact = r.getLong(1)
        val est   = cms.estimateCount(key)
        (key, exact,
          if (est >= exact && est <= exact + (eps * total).toLong + 1) 1 else 0)
      }
    heavy.toSeq.toDF("event_type", "exact_n", "within_bound")
      .orderBy($"event_type")
  }

  /** Mergeable QUANTILE ledger — the family's missing rung next to
    * HLL (distinct) and CMS (frequency): per-group equi-width
    * histogram counts built over two INDEPENDENT half-runs of the
    * stream and merged by pure addition (the ledger property — per-day
    * histograms union into the global answer without re-reading
    * history), then read out as P50/P90 with a bucket-width error
    * bound. Same cross-engine contract as q49/q88: exact rank-selected
    * quantiles (no interpolation — engine-identical) plus within-bound
    * flags the oracle expects to be 1; the estimates themselves are
    * pinned in SketchSpec. Histogram is groups × buckets however many
    * rows it saw.
    */
  def q205_quantile_sketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val width = graft.operators.Sketches.QuantileBucketWidth
    val ev = Tables.events(spark, dir).select($"event_type", $"value", $"event_id")
    val ranked = ev.select($"event_type", $"value",
      row_number().over(
        Window.partitionBy($"event_type").orderBy($"value", $"event_id")).as("rn"),
      count(lit(1)).over(Window.partitionBy($"event_type")).as("n"))
    val exact = ranked
      .select($"event_type", $"value", $"rn",
        expr("(n + 1) div 2").as("r50"), expr("(9 * n + 9) div 10").as("r90"))
      .filter($"rn" === $"r50" || $"rn" === $"r90")
      .groupBy($"event_type")
      .agg(
        max(when($"rn" === $"r50", $"value")).as("p50_exact"),
        max(when($"rn" === $"r90", $"value")).as("p90_exact"))
    // the ledger: two half-runs (even/odd event_id), merged by addition
    val ledger = ev
      .select($"event_type", pmod($"event_id", lit(2)).as("run"),
        floor($"value" / width).cast("long").as("b"))
      .groupBy($"event_type", $"run", $"b")
      .agg(count(lit(1)).as("c"))
    val merged = ledger.groupBy($"event_type", $"b").agg(sum($"c").as("c"))
    // n comes from the grid-sized histogram itself (sum of counts) —
    // the readout never touches the event-sized window a second time
    val est = merged
      .withColumn("cum",
        sum($"c").over(Window.partitionBy($"event_type").orderBy($"b")))
      .join(merged.groupBy($"event_type").agg(sum($"c").as("n")), Seq("event_type"))
      .groupBy($"event_type")
      .agg(
        min(when($"cum" >= expr("(n + 1) div 2"), $"b")).as("b50"),
        min(when($"cum" >= expr("(9 * n + 9) div 10"), $"b")).as("b90"))
    exact
      .join(est, Seq("event_type"))
      .select($"event_type", $"p50_exact", $"p90_exact",
        when($"p50_exact" >= $"b50" * width && $"p50_exact" < ($"b50" + 1) * width, 1)
          .otherwise(0).as("within50"),
        when($"p90_exact" >= $"b90" * width && $"p90_exact" < ($"b90" + 1) * width, 1)
          .otherwise(0).as("within90"))
      .orderBy($"event_type")
  }
}
