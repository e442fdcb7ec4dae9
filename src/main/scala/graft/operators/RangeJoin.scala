package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the operator Spark's planner has
  * no good physical strategy for: a bare `ts BETWEEN start AND end`
  * predicate with no equi-key plans as BroadcastNestedLoopJoin, which
  * ships one whole side to every executor and scans points × intervals
  * — unusable at 100 TB on both counts.
  *
  * This implementation turns the range predicate into an EQUI-join on
  * fixed-width time buckets: each point lives in exactly one bucket
  * (`floor(ts/width)`), each interval explodes into the buckets it
  * covers (`ceil(span/width)+1` rows — bounded and small when `width`
  * is chosen ≈ the typical interval span), the join runs on the bucket
  * id (shuffle-partitioned, AQE-skew-splittable like any equi-join),
  * and the exact `BETWEEN` runs as a residual filter. Because a point
  * has exactly ONE bucket, every qualifying (point, interval) pair
  * meets exactly once — no post-join dedup.
  *
  * Cost model: shuffle ∝ |points| + |intervals|·(span/width), work per
  * bucket ∝ points-in-bucket × intervals-covering-bucket — the same
  * locality argument as the dedup band indexes. A hot bucket (all
  * intervals overlapping one rush hour) is ordinary equi-join skew:
  * AQE splits it, or [[Salt.saltedJoin]] applies unchanged.
  */
object RangeJoin {

  /** Floor division that is correct for negative micros too (ANSI long
    * division truncates toward zero; bucket ids must be monotone).
    */
  private def floorDiv(m: Column, w: Long): Column =
    ((m - pmod(m, lit(w))) / lit(w)).cast("long")

  /** Join `points` rows to every `intervals` row whose
    * `[startCol, endCol]` (inclusive) contains `tsCol`. Both inputs
    * keep all their columns (caller renames collisions beforehand).
    * Timestamp columns are compared at microsecond precision.
    *
    * `bucketWidthMicros` tunes the shuffle/explosion trade: width ≈
    * the typical interval span gives ≤ 2 bucket rows per interval.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidthMicros: Long
  ): DataFrame = {
    require(bucketWidthMicros > 0, "bucket width must be positive")
    val p = points.withColumn("__bucket", floorDiv(unix_micros(col(tsCol)), bucketWidthMicros))
    val i = intervals
      .withColumn(
        "__bucket",
        explode(
          sequence(
            floorDiv(unix_micros(col(startCol)), bucketWidthMicros),
            floorDiv(unix_micros(col(endCol)), bucketWidthMicros)
          )
        )
      )
    p.join(i, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
