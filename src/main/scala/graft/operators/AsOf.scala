package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the same key and the greatest right-time ≤ left-time.
  *
  * Composition-first implementation (preference order (a)): a range
  * join + `max_by` aggregation. Correct and fully codegen; the
  * aggregation shuffles only matched rows. At extreme right-side
  * fan-out the classic optimization is the union-sentinel sort-merge
  * (tag left/right, repartition by key, sortWithinPartitions on time,
  * per-partition carry-forward) — same API, drop-in replacement.
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
}
