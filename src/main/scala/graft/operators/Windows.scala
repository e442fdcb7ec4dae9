package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators. The reference has no explicit window
  * functions (SURVEY §2.5) — its "latest version per key" problem is
  * solved by MERGE predicates and driver-side latest-file picks; these
  * generalize that to the standard Spark idioms.
  */
object Windows {

  /** Latest record per key: row_number over (keys, ordering desc) = 1.
    * One shuffle on the key columns; at 100 TB prefer this over
    * `groupBy(keys).agg(max_by(...))` only when you need the whole row —
    * otherwise max_by avoids materializing the sort.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderDesc: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderDesc.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Running aggregate over an ordered per-key frame
    * (rows unbounded-preceding..current).
    */
  def runningSum(keys: Seq[String], order: Seq[String], value: Column): Column = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(value).over(w)
  }

  /** Gap-based sessionization (batch form of session windows): a new
    * session starts when the gap to the previous event of the same key
    * exceeds `gapMicros`. One shuffle on the key, two window passes
    * (lag + running sum) over the same partitioning — Spark reuses the
    * sort. Returns one row per (key, session_seq) with count and
    * epoch-microsecond bounds.
    */
  def sessionize(
      df: DataFrame,
      key: String,
      tsCol: String,
      tieBreak: String,
      gapMicros: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieBreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    val newSess = when(
      prev.isNull || (unix_micros(col(tsCol)) - unix_micros(prev)) > gapMicros,
      1
    ).otherwise(0)
    df.withColumn("__new_sess", newSess)
      .withColumn("session_seq", sum(col("__new_sess")).over(run).cast("int"))
      .groupBy(col(key), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us")
      )
  }
}
