package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StructType, TimestampNTZType, TimestampType}

/** As-of (point-in-time) join: for each left row, the single right row
  * with the same key and the greatest right-time ≤ left-time.
  *
  * Two interchangeable physical strategies behind the same semantics
  * (both asserted equal on the q33 oracle data in AsOfSpec):
  *
  *   - [[join]] — composition-first (preference order (a)): a range
  *     join + `max_by` aggregation. Correct and fully codegen, but the
  *     key×time-range product materializes before aggregating, so at
  *     extreme per-key fan-out (heavy users × long history) the
  *     intermediate explodes. Kept as the reference implementation.
  *   - [[joinSorted]] — the union-sentinel sort-merge: tag left/right,
  *     union, one shuffle on the key, sort within partitions on
  *     (time, side, tie-break), then a running `last(…, ignoreNulls)`
  *     carries the latest right row forward into each left row. The
  *     intermediate is |left| + |right| rows — NEVER the range
  *     product — which is the shape that survives 100 TB fan-out.
  *     THE RECOMMENDED DEFAULT (and what q33 ships): its worst case is
  *     the other path's best case, so there is no fan-out regime where
  *     [[join]] wins by more than a constant.
  */
object AsOf {

  /** leftTime/rightTime must be comparable columns (e.g. timestamps).
    * Unmatched left rows survive with nulls (left-outer as-of).
    *
    * @param payload right-side columns to carry; the match picks the row
    *        maximizing (rightTime, tieBreak).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val joined = left.join(
      right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime),
      "left"
    )
    val ord = struct(col(rightTime), col(tieBreak))
    val aggs = payload.map(p => max_by(col(p), ord).as(p))
    joined
      .groupBy(leftCols.map(left(_)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Union-sentinel sort-merge as-of join — same semantics as [[join]]
    * (left-outer, greatest (rightTime, tieBreak) ≤ leftTime), linear
    * intermediate size.
    *
    * Right rows with a null key or null time can never match (the range
    * predicate is null-rejecting in [[join]]) and are dropped up front
    * so the carry-forward can't smuggle them into a null-key partition.
    * The payload is carried as ONE struct so `last(…, ignoreNulls)`
    * selects whole rows — a legitimately-null payload FIELD inside the
    * chosen row is preserved, not skipped past.
    *
    * One difference from [[join]] worth knowing: [[join]] aggregates by
    * every left column, so fully-duplicate left rows collapse; this
    * variant preserves left-side multiplicity (usually what you want).
    */
  def joinSorted(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType  = StructType(payload.map(p => right.schema(p)).toArray)
    val tieType  = right.schema(tieBreak).dataType
    val leftType = StructType(left.schema.fields)
    // Mixed time types must widen the same way [[join]]'s binary
    // comparison does (date < timestamp → both promote to timestamp) —
    // truncating the finer side would silently move match boundaries.
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    val timeType = (lt, rt) match {
      case (a, b) if a == b                            => a
      case (TimestampType, DateType)                   => TimestampType
      case (DateType, TimestampType)                   => TimestampType
      case (TimestampType, TimestampNTZType)           => TimestampType
      case (TimestampNTZType, TimestampType)           => TimestampType
      case (TimestampNTZType, DateType)                => TimestampNTZType
      case (DateType, TimestampNTZType)                => TimestampNTZType
      case _ =>
        // numeric epoch times etc. — widen exactly like join's binary
        // comparison would (lossless tightest common type or fail fast)
        org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findTightestCommonType(lt, rt)
          .getOrElse(throw new IllegalArgumentException(
            s"joinSorted: incomparable time types $lt vs $rt — cast explicitly"))
    }
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        col(rightTime).cast(timeType).as("__t"),
        lit(0).as("__side"),
        col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__pay"),
        lit(null).cast(leftType).as("__left")
      )
    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast(timeType).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"),
      struct(leftCols.map(col): _*).as("__left")
    )
    // right rows sort before left rows at equal times (as-of is <=),
    // and among equal-time right rows the greatest tie-break comes last
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__left.$c").as(c)) ++
          payload.map(p => col(s"__match.$p").as(p)): _*
      )
  }
}
