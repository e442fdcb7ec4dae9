package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL row numbers without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` is the one window shape that
  * cannot scale: Spark moves every row to ONE reducer and sorts there.
  * For rank-derived analytics over corpus-sized frames (global spend
  * deciles, RFM terciles, percentile calibration) the engine needs the
  * same EXACT ranks with distributed work. Classic two-pass rank
  * selection, entirely in-plan — the per-row generalization of
  * [[Quantiles]]' rank-at-a-quantile machinery:
  *
  *   1. one 1-row aggregate: (min, max) of the numeric bucket key;
  *   2. one aggregate pass: fixed-width value histogram (`buckets`
  *      cells — the shuffle carries bucket counts, never rows), then
  *      EXCLUSIVE cumulative offsets per bucket over a ≤`buckets`-row
  *      window (bounded, never corpus-sized);
  *   3. per-bucket row_number (each window partition sorts ~n/buckets
  *      rows) plus the bucket's offset = the exact global row number.
  *
  * Exactness under ties: the bucket is a function of the leading VALUE
  * alone, so rows that compare equal on it land in the same bucket and
  * are totally ordered there by the full `sort` spec — bit-identical
  * to the single-window form (RanksSpec pins equality on random
  * multisets with heavy ties). The caller's `sort` must be a TOTAL
  * order (include a unique tie-break column) and `bucketKey` must be a
  * non-null numeric ascending in the same direction as the leading
  * sort key (negate for descending — exact for integer/decimal keys).
  *
  * Adaptive like [[Quantiles]]: below `sortThresholdBytes` (Catalyst's
  * own size estimate) the plain window wins — one in-task sort beats
  * two extra aggregate passes. Both paths emit IDENTICAL values, so a
  * misestimate can only change the plan shape, never a result.
  * Degenerate case: a (near-)constant bucket key collapses to few
  * buckets and degrades toward the single-window bound — the same
  * caveat every range-partitioned sort has.
  */
object Ranks {

  def withGlobalRowNumber(
      df: DataFrame,
      sort: Seq[Column],
      bucketKey: Column,
      outCol: String,
      buckets: Int = 1024,
      sortThresholdBytes: Long = 8L << 20
  ): DataFrame = {
    require(sort.nonEmpty && buckets >= 2)
    val reserved = Set("__rb", "__rc", "__roff", "__rmn", "__rmx")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"input columns collide with the operator's internals: ${df.columns.toSet.intersect(reserved)}")

    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= sortThresholdBytes)
      return df.withColumn(outCol, row_number().over(Window.orderBy(sort: _*)).cast("long"))

    val k       = bucketKey.cast("double")
    val statsDf = df.agg(min(k).as("__rmn"), max(k).as("__rmx")) // 1 row
    val withB   = df.crossJoin(broadcast(statsDf))
    val span    = col("__rmx") - col("__rmn")
    val bucket = least(
      greatest(floor((k - col("__rmn")) / (span + lit(Double.MinPositiveValue)) * buckets),
        lit(0)),
      lit(buckets - 1L)).cast("long")

    // buckets-sized histogram → exclusive offsets (window over ≤
    // `buckets` rows; empty buckets have no row and need no offset)
    val hist = withB.groupBy(bucket.as("__rb")).agg(count(lit(1)).as("__rc"))
    val wcum = Window.orderBy(col("__rb"))
    val offs = hist
      .withColumn("__roff", sum(col("__rc")).over(wcum) - col("__rc"))
      .drop("__rc")

    val win = Window.partitionBy(col("__rb")).orderBy(sort: _*)
    withB
      .withColumn("__rb", bucket)
      .join(broadcast(offs), Seq("__rb"))
      .withColumn(outCol, (col("__roff") + row_number().over(win)).cast("long"))
      .drop("__rb", "__roff", "__rmn", "__rmx")
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
