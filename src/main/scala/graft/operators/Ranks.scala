package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact GLOBAL row numbers without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` is the one window shape that
  * cannot scale: Spark moves every row to ONE reducer and sorts there.
  * For rank-derived analytics over corpus-sized frames (global spend
  * deciles, RFM terciles, percentile calibration) the engine needs the
  * same EXACT ranks with distributed work. Classic two-pass rank
  * selection — the per-row generalization of [[Quantiles]]'
  * rank-at-a-quantile machinery:
  *
  *   1. one bounded aggregate: (min, max, count) of the numeric bucket
  *      key — this pass also FAILS FAST on a contract breach (null/NaN
  *      key) before any heavy work;
  *   2. one aggregate pass: fixed-width value histogram (≤ `buckets`
  *      rows — the shuffle carries bucket counts, never rows),
  *      collected; exclusive cumulative offsets are driver arithmetic
  *      over that same bounded cardinality and re-enter the plan as a
  *      broadcast ≤ `buckets`-row local relation;
  *   3. per-bucket row_number (each window partition sorts ~n/buckets
  *      rows) plus the bucket's offset = the exact global row number.
  *
  * Exactness under ties: the bucket is a function of the leading VALUE
  * alone, so rows that compare equal on it land in the same bucket and
  * are totally ordered there by the full `sort` spec — bit-identical
  * to the single-window form (RanksSpec pins equality on random
  * multisets with heavy ties). The caller's `sort` must be a TOTAL
  * order (include a unique tie-break column) and `bucketKey` must be a
  * NON-NULL, NON-NaN numeric ascending in the same direction as the
  * leading sort key (negate for descending — exact for integer/decimal
  * keys). The contract is ENFORCED: a null or NaN key raises at the
  * first pass (and, on the small path, inside the window job) instead
  * of silently dropping or misranking rows.
  *
  * Degenerate keys — the second-level tie split: a (near-)constant
  * bucket key collapses the histogram into one hot bucket, degrading
  * toward the single-window bound. When one bucket exceeds `hotShare`
  * of the rows AND the heat is a single tied VALUE (the common case: a
  * constant score), passing `subBucketKey` — a numeric key aligned
  * ascending with `sort(1)`, e.g. the unique tie-break id — re-splits
  * that value's rows into `subBuckets` sub-buckets on the second key,
  * with the hot bucket's remaining rows kept as "below"/"above"
  * segments so composite bucket order still refines the sort order.
  * Offsets compose exactly as before (the refined histogram is still
  * bounded: ≤ buckets + hot·(subBuckets+2) rows). A hot bucket that is
  * NOT one tied value (smooth skew inside 1/`buckets` of the range) is
  * left to the per-bucket sort with a logged warning — as is a hot
  * bucket with no `subBucketKey` to split by, and a hot double value
  * that is actually SEVERAL distinct true keys collapsed by the double
  * cast (keys past 2^53): the split's membership test is double
  * equality, so splitting those by the tie-break would misrank them —
  * the guard declines (exactness is never traded for the split).
  *
  * Adaptive like [[Quantiles]]: below `sortThresholdBytes` (Catalyst's
  * own size estimate) the plain window wins — one in-task sort beats
  * the extra bounded passes. Both paths emit IDENTICAL values, so a
  * misestimate can only change the plan shape, never a result. Note
  * the bucket path is EAGER (it runs 2–5 bounded-output jobs at call
  * time) and evaluates the input two–three times — materialize an
  * expensive upstream via [[materializeForBucketPath]] (conditional on
  * the same size estimate, so the small path keeps real stats and a
  * single lazy evaluation) or plain [[Materialize]] when other
  * consumers share the frame anyway.
  */
object Ranks {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Ranks")

  /** Test seam: Some(t) overrides every call's `sortThresholdBytes`, so
    * the window-lint spec and forced-path plan audits can exercise the
    * bucket path slate-wide without touching call sites.
    */
  @volatile private[graft] var thresholdOverride: Option[Long] = None

  /** Debug trace of the last bucket-path call (test seam): the hottest
    * bucket's row share before and after the tie split, and whether the
    * split engaged. None after a small-path call.
    */
  final case class BucketTrace(maxShareBefore: Double, refined: Boolean, maxShareAfter: Double)
  @volatile private[graft] var lastTrace: Option[BucketTrace] = None

  /** Cast to double with the operator's key contract enforced per row:
    * null/NaN raises instead of silently vanishing through the bucket
    * join (null) or misranking (NaN sorts last but buckets first).
    */
  private def validated(keyCol: Column, what: String): Column = {
    val kd = keyCol.cast("double")
    when(
      kd.isNull || isnan(kd),
      raise_error(concat(
        lit(s"Ranks.withGlobalRowNumber: $what must be a non-null, non-NaN numeric key; got "),
        coalesce(keyCol.cast("string"), lit("NULL")))).cast("double"))
      .otherwise(kd)
  }

  /** Equi-width bucket id in [0, buckets) for a key with driver-known
    * range — the epsilon keeps a zero span from dividing by zero (all
    * rows then land in bucket 0, which stays exact: the per-bucket
    * window still totally orders them).
    */
  private def bucketOf(k: Column, mn: Double, mx: Double, buckets: Int): Column =
    least(
      greatest(floor((k - lit(mn)) / lit(mx - mn + Double.MinPositiveValue) * buckets), lit(0)),
      lit(buckets - 1L)).cast("long")

  /** Caller-side companion for EXPENSIVE inputs: materialize `df` only
    * when the size estimate says the bucket path (eager, multi-pass)
    * will run. Below the threshold the frame stays lazy, so the small
    * path remains one in-task sort over a single evaluation — and the
    * estimate keeps meaning: a materialized (LogicalRDD) frame reports
    * no stats, so materializing FIRST would force the bucket path at
    * every scale. Value-identical either way (the path choice never
    * changes results); pass the same `sortThresholdBytes` as the rank
    * call when overriding the default. Inputs with OTHER consumers
    * besides the rank (q163's three-rank base) should stay on plain
    * [[Materialize]] — they re-evaluate on every consumer regardless
    * of which rank path runs.
    */
  def materializeForBucketPath(df: DataFrame, sortThresholdBytes: Long = 8L << 20): DataFrame = {
    val thr: Long = thresholdOverride.getOrElse(sortThresholdBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr) df
    else Materialize(df)
  }

  def withGlobalRowNumber(
      df: DataFrame,
      sort: Seq[Column],
      bucketKey: Column,
      outCol: String,
      buckets: Int = 1024,
      sortThresholdBytes: Long = 8L << 20,
      subBucketKey: Option[Column] = None,
      hotShare: Double = 0.25,
      subBuckets: Int = 256
  ): DataFrame = {
    require(sort.nonEmpty && buckets >= 2 && subBuckets >= 2)
    require(hotShare > 0.0 && hotShare <= 1.0, s"hotShare in (0,1]: $hotShare")
    val reserved = Set("__rb", "__rc", "__rk", "__rn2", "__roff")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"input columns collide with the operator's internals: ${df.columns.toSet.intersect(reserved)}")

    val k = validated(bucketKey, "bucketKey")
    val thr = thresholdOverride.getOrElse(sortThresholdBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr) {
      lastTrace = None
      // the key contract is enforced on THIS path too (the filter is
      // vacuously true on valid keys): which path runs depends on a
      // size estimate, so a breach must fail at gate scale, not first
      // surface when stats flip the plan at cluster scale
      return df
        .filter(k.isNotNull)
        .withColumn(outCol, row_number().over(Window.orderBy(sort: _*)).cast("long"))
    }

    val spark = df.sparkSession

    // bounded pass 1: (min, max, count) of the validated key — raises
    // here on a contract breach, before any heavy work
    val stats = df.agg(min(k), max(k), count(lit(1))).head()
    val total = stats.getLong(2)
    if (total == 0L) {
      lastTrace = None
      return df.withColumn(outCol, row_number().over(Window.orderBy(sort: _*)).cast("long"))
    }
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val b1 = bucketOf(k, mn, mx, buckets)

    // bounded pass 2: the ≤`buckets`-row histogram, collected — the
    // exclusive offsets are driver arithmetic over the SAME cardinality
    // the former in-plan cumulative window covered
    def collectHist(b: Column): Array[(Long, Long)] =
      df.groupBy(b.as("__rb")).agg(count(lit(1)).as("__rc"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val hist1  = collectHist(b1)
    val share1 = hist1.map(_._2).max.toDouble / total

    val (bucketExpr, hist, refined) =
      if (share1 <= hotShare) (b1, hist1, false)
      else if (subBucketKey.isEmpty) {
        log.warn(f"hot bucket holds ${share1 * 100}%.1f%% of $total rows (> ${hotShare * 100}%.0f%%) " +
          "and no subBucketKey was given — its window partition sorts in one task; pass a numeric " +
          "subBucketKey aligned with sort(1) to split a tied value")
        (b1, hist1, false)
      } else {
        val k2     = validated(subBucketKey.get, "subBucketKey")
        val hotIds = hist1.filter(_._2.toDouble / total > hotShare).map(_._1)
        // the mode key VALUE per hot bucket — WindowGroupLimit top-1,
        // partitioned by bucket, output ≤ hot-bucket count
        val wm = Window.partitionBy(col("__rb")).orderBy(col("__rc").desc, col("__rk"))
        val modes = df.filter(b1.isin(hotIds: _*))
          .groupBy(b1.as("__rb"), k.as("__rk")).agg(count(lit(1)).as("__rc"))
          .withColumn("__rn2", row_number().over(wm))
          .filter(col("__rn2") === 1)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        // only a value that is ITSELF hot can be split by its ties; a
        // hot bucket with a small mode is smooth skew inside one value
        // range — the per-bucket sort absorbs it, with a warning
        val splittable = modes.filter(_._3.toDouble / total > hotShare)
        if (splittable.isEmpty) {
          log.warn(f"hot bucket holds ${share1 * 100}%.1f%% of $total rows but its mode value is " +
            "not itself hot (smooth skew inside one bucket range) — the tie split cannot help; " +
            "its window partition sorts in one task")
          (b1, hist1, false)
        } else {
          // bounded pass 3: the tied group's sub-key range per hot
          // value, plus a PRECISION GUARD — the split's membership test
          // is double equality, so a "tied value" must be verified to
          // be ONE distinct true key. Past 2^53 (long/decimal keys)
          // several distinct keys can collapse onto one double; sub-
          // bucketing those by k2 would order them by the TIE-BREAK
          // instead of the true leading key. Such a value is declined
          // (the per-bucket window still sorts it exactly by the true
          // sort spec — only the split optimization is lost).
          val vals = splittable.map(_._2)
          val ranges = df.filter(k.isin(vals: _*))
            .groupBy(k.as("__rk")).agg(min(k2), max(k2), count_distinct(bucketKey))
            .collect()
            .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
            .toMap
          val exactTies = splittable.filter { case (_, v, _) => ranges(v)._3 == 1L }
          if (exactTies.isEmpty) {
            log.warn(f"hot bucket holds ${share1 * 100}%.1f%% of $total rows but its mode " +
              "double maps to MULTIPLE distinct true keys (precision collapse past 2^53) — " +
              "the tie split would misrank them and is declined; its window partition " +
              "sorts in one task")
            (b1, hist1, false)
          } else {
            // composite id: stride per original bucket; inside a hot one,
            // 0 = below the tied value, 1..subBuckets = its k2 sub-split,
            // subBuckets+1 = above — lexicographic (b1, sub) still
            // refines the sort order, so offsets compose exactly
            val stride = subBuckets + 2L
            val sub = exactTies.foldLeft(lit(0L)) { case (acc, (hb, v, _)) =>
              val (lo2, hi2, _) = ranges(v)
              when(b1 === hb,
                when(k < v, lit(0L))
                  .when(k > v, lit(subBuckets + 1L))
                  .otherwise(lit(1L) + bucketOf(k2, lo2, hi2, subBuckets)))
                .otherwise(acc)
            }
            val fb = b1 * lit(stride) + sub
            (fb, collectHist(fb), true)
          }
        }
      }
    val shareAfter = hist.map(_._2).max.toDouble / total
    lastTrace = Some(BucketTrace(share1, refined, shareAfter))
    if (refined && shareAfter > hotShare)
      log.warn(f"tie split engaged but a bucket still holds ${shareAfter * 100}%.1f%% of $total " +
        "rows (sub-key ties or a second near-hot value) — its window partition sorts in one task")

    var acc = 0L
    val offRows: Seq[Row] = hist.toSeq.map { case (b, c) => val o = acc; acc += c; Row(b, o) }
    import scala.jdk.CollectionConverters._
    val offs = spark.createDataFrame(
      offRows.asJava,
      StructType(Seq(
        StructField("__rb", LongType, nullable = false),
        StructField("__roff", LongType, nullable = false))))

    val win = Window.partitionBy(col("__rb")).orderBy(sort: _*)
    df.withColumn("__rb", bucketExpr)
      .join(broadcast(offs), Seq("__rb"))
      .withColumn(outCol, (col("__roff") + row_number().over(win)).cast("long"))
      .drop("__rb", "__roff")
  }

  /** Spark/DuckDB `ntile(k)` recomputed from an exact global row
    * number and total count — the shared convention: bucket sizes
    * differ by at most one, EARLIER buckets take the remainder.
    * Integer arithmetic only, so it is engine-exact.
    */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    // integral division via floor(double) — exact below 2^53, which a
    // row COUNT always is
    def idiv(a: Column, b: Column): Column = floor(a.cast("double") / b.cast("double")).cast("long")
    val base = idiv(n, lit(k.toLong))
    val rem  = n.cast("long") % lit(k.toLong)
    val cut  = rem * (base + lit(1L)) // rows covered by the wider buckets
    when(base === 0L, rn) // n < k: row i is tile i
      .when(rn <= cut, idiv(rn - 1, base + lit(1L)) + 1)
      .otherwise(rem + idiv(rn - cut - 1, base) + 1)
      .cast("int")
  }
}
