package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles WITHOUT sorting the groups.
  *
  * The naive exact form (`row_number` over a per-group sort, pick rank
  * ⌈n·q⌉) is correct but its window sorts EVERY group's rows on ONE
  * reducer per group — with 3 groups of 2 billion rows each, that is 3
  * tasks sorting the whole table, the single worst-scaling plan shape
  * the engine had left. Approximate sketches (q205) trade exactness
  * for one pass; this operator keeps EXACTNESS and drops the sort by
  * classic two-pass rank selection, entirely IN-PLAN:
  *
  *   1. one aggregate pass: per-group (n, min, max) — a DataFrame,
  *      never collected;
  *   2. one aggregate pass: per-group fixed-width value histogram
  *      (`buckets` cells — the shuffle carries groups·buckets counts,
  *      never rows). A cumulative-count window per group (ordered by
  *      bucket id) then selects, for each target rank ⌈n·q⌉, WHICH
  *      bucket holds it and the rank offset inside that bucket — the
  *      rank lives in the first bucket whose running total reaches it;
  *   3. one narrow pass: only the selected buckets' rows (≈ n/buckets
  *      of the data, eliminated map-side when the target list
  *      broadcasts) get a per-(group, bucket, q) window — each such
  *      partition sorts ~1/buckets of a group, and only those
  *      partitions exist.
  *
  * The selected VALUE at a rank is well-defined under ties (equal
  * values share a bucket by construction), so the result is bit-equal
  * to the sort-based form — QuantilesSpec pins them equal on random
  * multisets with heavy ties and on a ≥10⁴-group cardinality sweep,
  * and q43's DuckDB oracle is unchanged.
  *
  * NOTHING is collected to the driver: the stats and target frames are
  * groups- and groups·|qs|-sized aggregates joined back in-plan. Their
  * join strategy is left to AQE (`Engine` enables it): a bounded group
  * set broadcasts at runtime from the finished aggregate stage's real
  * size — so the histogram/selection passes stay map-side — while a
  * pathological group cardinality falls back to a shuffle join on the
  * (then high-cardinality, well-distributed) group key. The operator's
  * scaling bound is therefore the groups·buckets shuffle, not driver
  * memory.
  *
  * Null contract: null and NaN values are IGNORED — the upstream
  * `percentile`/`percentile_approx` semantics — and the filter is
  * applied identically before BOTH paths, so the adaptive choice can
  * never change the answer on nullable input. A group whose values are
  * all null/NaN disappears from the output (it has no ranked rows).
  *
  * Output: long form (group, q, value), one row per (group, quantile).
  *
  * The path is chosen ADAPTIVELY from Catalyst's own size estimate
  * (`optimizedPlan.stats.sizeInBytes` — the statistic Spark's planner
  * itself uses to pick broadcast vs shuffle joins; column pruning is
  * already reflected in it, and it costs NO job): small inputs keep
  * the one-window sort (the bucket path's extra aggregate passes are a
  * net loss there), large ones take the bucket selection. Both paths
  * emit the identical rows, pinned in QuantilesSpec.
  */
object Quantiles {

  /** Test seam: Some(t) overrides every call's `sortThresholdBytes`, so
    * the window-lint spec and forced-path plan audits can exercise the
    * bucket path slate-wide without touching call sites.
    */
  @volatile private[graft] var thresholdOverride: Option[Long] = None

  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      buckets: Int = 1024,
      sortThresholdBytes: Long = 8L << 20
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"quantiles in (0,1]: $qs")
    require(buckets >= 2)
    val reserved = Set("grp", "tg", "tb", "off", "q", "n", "mn", "mx",
      "__b", "__rn", "__c", "__cum", "__rank")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"input columns collide with the operator's internals: ${df.columns.toSet.intersect(reserved)}")

    val g = col(groupCol)
    val v = col(valueCol).cast("double")
    // Null contract (see Scaladoc): drop null/NaN BEFORE the path
    // split so window and bucket ranks agree on nullable input.
    val in = df.filter(col(valueCol).isNotNull && !isnan(v))

    // Adaptive path choice off Catalyst's size estimate — zero jobs
    // (driver-side file-size stats, column pruning already priced in),
    // the same statistic the planner uses for broadcast decisions.
    // Below the threshold, ONE in-task sort of each group is cheaper
    // than the bucket path's extra aggregate passes (measured at
    // sf0.1's ~3.4 MB 2-column estimate: ~1.4 s window vs ~1.4 s
    // buckets — a wash); above it, the window form is one reducer
    // sorting a whole group — the shape that cannot scale — and the
    // bucket form wins decisively (the 10× corpus estimates ~34 MB:
    // 8.1 s window vs ~2 s buckets). The 8 MB default sits at the
    // measured crossover; broadcast-threshold-style, it is a tunable,
    // not a truth.
    val pathThreshold: Long = thresholdOverride.getOrElse(sortThresholdBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= pathThreshold) {
      val w  = Window.partitionBy(g).orderBy(v)
      val wc = Window.partitionBy(g)
      // pre-filter to the ≤ groups·|qs| candidate rows BEFORE the
      // per-q explode — exploding first would double every sorted row
      return in
        .withColumn("__rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .filter(qs.map(q => col("__rn") === ceil(col("n") * q)).reduce(_ || _))
        .select(g.as("group"), v.as("value"), col("__rn"), col("n"))
        .withColumn("q", explode(array(qs.map(lit): _*)))
        .filter(col("__rn") === ceil(col("n") * col("q")))
        .select(col("group"), col("q"), col("value"))
    }

    // per-group (n, min, max) — stays a DataFrame; AQE picks broadcast
    // vs shuffle for the joins below from its REAL post-aggregation size
    val statsDf = in
      .groupBy(g.as("grp"))
      .agg(count(lit(1)).as("n"), min(v).as("mn"), max(v).as("mx"))

    // bucket id as ONE deterministic expression, reused identically in
    // both the histogram and the selection pass
    val span   = col("mx") - col("mn")
    val bucket = least(
      greatest(floor((v - col("mn")) / (span + lit(Double.MinPositiveValue)) * buckets), lit(0)),
      lit(buckets - 1L)).cast("long")

    // groups·buckets counts — the ONLY shuffle whose size grows with
    // group cardinality; rows never leave their scan partition here
    // beyond the partial-aggregate combine. `n` rides the grouping key
    // (functionally dependent on grp) so the rank is computable below
    // without a second stats join.
    val hist = in
      .join(statsDf, g === col("grp"))
      .groupBy(col("grp"), col("n"), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))

    // in-plan target-bucket selection: cumulative count per group over
    // bucket order; rank ⌈n·q⌉ lives in the first present bucket whose
    // running total reaches it (empty buckets have no hist row and can
    // hold no rank). Window partitions are ≤ `buckets` rows each.
    val wcum = Window.partitionBy(col("grp")).orderBy(col("__b"))
    val targets = hist
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("__rank", ceil(col("n") * col("q")).cast("long"))
      .filter(col("__rank") > col("__cum") - col("__c") && col("__rank") <= col("__cum"))
      .select(col("grp").as("tg"), col("q"), col("__b").as("tb"),
        (col("__rank") - (col("__cum") - col("__c"))).as("off"))

    // narrow pass: rows of selected buckets only. Partition the rank
    // window by (grp, tb, q): two quantiles landing in the SAME bucket
    // duplicate its rows through the target join, and each q must rank
    // its own copy — a (grp, tb) window would count both.
    val w = Window.partitionBy(col("tg"), col("tb"), col("q")).orderBy(v)
    in.join(statsDf, g === col("grp"))
      .withColumn("__b", bucket)
      .join(targets, g === col("tg") && col("__b") === col("tb"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("off"))
      .select(g.as("group"), col("q"), v.as("value"))
  }
}
