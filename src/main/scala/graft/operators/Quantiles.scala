package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact per-group quantiles WITHOUT sorting the groups.
  *
  * The naive exact form (`row_number` over a per-group sort, pick rank
  * ⌈n·q⌉) is correct but its window sorts EVERY group's rows on ONE
  * reducer per group — with 3 groups of 2 billion rows each, that is 3
  * tasks sorting the whole table, the single worst-scaling plan shape
  * the engine had left. Approximate sketches (q205) trade exactness
  * for one pass; this operator keeps EXACTNESS and drops the sort by
  * classic two-pass rank selection:
  *
  *   1. one aggregate pass: per-group (n, min, max);
  *   2. one aggregate pass: per-group fixed-width value histogram
  *      (`buckets` cells — the shuffle carries groups·buckets counts,
  *      never rows); the driver walks the cumulative histogram to find,
  *      for each target rank ⌈n·q⌉, WHICH bucket holds it and the rank
  *      offset inside that bucket;
  *   3. one narrow pass: only the selected buckets' rows (≈ n/buckets
  *      of the data, filter pushed to the scan side of one broadcast
  *      join) get a per-(group, bucket) window — each such partition
  *      sorts ~1/buckets of a group, and only those partitions exist.
  *
  * The selected VALUE at a rank is well-defined under ties (equal
  * values share a bucket by construction), so the result is bit-equal
  * to the sort-based form — QuantilesSpec pins them equal on random
  * multisets with heavy ties, and q43's DuckDB oracle is unchanged.
  *
  * Driver-side state is per-group metadata (groups·buckets counts) —
  * bounded like centroids/watermarks, NOT data; quantile reports are
  * by nature over a bounded group set. A degenerate column whose
  * values are ALL equal collapses to one bucket and step 3 degrades to
  * the sort it replaced — correct, just not faster.
  *
  * Output: long form (group, q, value), one row per (group, quantile).
  *
  * The path is chosen ADAPTIVELY from Catalyst's own size estimate
  * (`optimizedPlan.stats.sizeInBytes` — the statistic Spark's planner
  * itself uses to pick broadcast vs shuffle joins; column pruning is
  * already reflected in it, and it costs NO job): small inputs keep
  * the one-window sort (the bucket path's extra driver round-trips
  * are a net loss there), large ones take the bucket selection. Both
  * paths emit the identical rows, pinned in QuantilesSpec.
  */
object Quantiles {

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
    val reserved = Set("grp", "tg", "tb", "off", "q", "n", "mn", "mx", "__b", "__rn")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"input columns collide with the operator's internals: ${df.columns.toSet.intersect(reserved)}")
    val spark = df.sparkSession
    import spark.implicits._

    val g = col(groupCol)
    val v = col(valueCol).cast("double")

    // Adaptive path choice off Catalyst's size estimate — zero jobs
    // (driver-side file-size stats, column pruning already priced in),
    // the same statistic the planner uses for broadcast decisions.
    // Below the threshold, ONE in-task sort of each group is cheaper
    // than the bucket path's two driver round-trips (measured at
    // sf0.1's ~3.4 MB 2-column estimate: ~1.4 s window vs ~1.4 s
    // buckets — a wash); above it, the window form is one reducer
    // sorting a whole group — the shape that cannot scale — and the
    // bucket form wins decisively (the 10× corpus estimates ~34 MB:
    // 8.1 s window vs ~2 s buckets). The 8 MB default sits at the
    // measured crossover; broadcast-threshold-style, it is a tunable,
    // not a truth.
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= sortThresholdBytes) {
      import org.apache.spark.sql.expressions.Window
      val w  = Window.partitionBy(g).orderBy(v)
      val wc = Window.partitionBy(g)
      // pre-filter to the ≤ groups·|qs| candidate rows BEFORE the
      // per-q explode — exploding first would double every sorted row
      return df
        .withColumn("__rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .filter(qs.map(q => col("__rn") === ceil(col("n") * q)).reduce(_ || _))
        .select(g.as("group"), v.as("value"), col("__rn"), col("n"))
        .withColumn("q", explode(array(qs.map(lit): _*)))
        .filter(col("__rn") === ceil(col("n") * col("q")))
        .select(col("group"), col("q"), col("value"))
    }

    val stats = df
      .groupBy(g.as("grp"))
      .agg(count(lit(1)).as("n"), min(v).as("mn"), max(v).as("mx"))
      .collect()
      .map(r => (r.get(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

    // bucket id as ONE deterministic expression, reused identically in
    // both the histogram and the selection pass
    val statsDf = broadcast(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          stats.toSeq.map { case (k, (n, mn, mx)) => Row(k, n, mn, mx) }, 1),
        new org.apache.spark.sql.types.StructType()
          .add("grp", df.schema(groupCol).dataType)
          .add("n", "long").add("mn", "double").add("mx", "double")))
    val span   = col("mx") - col("mn")
    val bucket = least(
      greatest(floor((v - col("mn")) / (span + lit(Double.MinPositiveValue)) * buckets), lit(0)),
      lit(buckets - 1L)).cast("long")

    val hist = df
      .join(statsDf, g === col("grp"))
      .groupBy(col("grp"), bucket.as("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => ((r.get(0), r.getLong(1)), r.getLong(2)))
      .toMap

    // driver: per (group, q) → (bucket holding rank ⌈n·q⌉, offset in it)
    // via one cumulative walk of the group's histogram
    val targets: Seq[(Any, Double, Long, Long)] = stats.toSeq.flatMap { case (k, (n, _, _)) =>
      val counts = Array.tabulate(buckets)(b => hist.getOrElse((k, b.toLong), 0L))
      qs.map { q =>
        val rank = math.ceil(n * q).toLong
        var cum  = 0L
        var b    = 0
        while (cum + counts(b) < rank) { cum += counts(b); b += 1 }
        (k, q, b.toLong, rank - cum)
      }
    }
    val targetDf = broadcast(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          targets.map { case (k, q, b, off) => Row(k, q, b, off) }, 1),
        new org.apache.spark.sql.types.StructType()
          .add("grp", df.schema(groupCol).dataType)
          .add("q", "double").add("tb", "long").add("off", "long")))

    // narrow pass: rows of selected buckets only. Partition the rank
    // window by (grp, tb, q): two quantiles landing in the SAME bucket
    // duplicate its rows through the target join, and each q must rank
    // its own copy — a (grp, tb) window would count both.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"), col("tb"), col("q")).orderBy(v)
    df.join(statsDf, g === col("grp"))
      .withColumn("__b", bucket)
      .join(targetDf.select(col("grp").as("tg"), col("q"), col("tb"), col("off")),
        g === col("tg") && col("__b") === col("tb"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("off"))
      .select(g.as("group"), col("q"), v.as("value"))
  }
}
