package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-style upsert as a plain Spark join — the Delta-replacement for
  * the reference's `MERGE INTO tgt USING src ON tgt.id = src.id WHEN
  * MATCHED AND src.version > tgt.version THEN UPDATE SET * WHEN NOT
  * MATCHED THEN INSERT *` (reference: notebooks/silver_arxiv.py:130-152).
  *
  * Spark-first design: a single full-outer shuffle join on the key,
  * per-column `CASE` selection, everything codegen-able. At scale the
  * src side (a daily batch) is usually much smaller than tgt — Catalyst
  * / AQE picks broadcast or shuffled-hash automatically; if tgt is
  * bucketed by the key the shuffle disappears entirely.
  */
object Upsert {

  /** Row-level outcome column added by [[plan]]. */
  val ActionCol = "merge_action"

  /** Build the merged DataFrame. `tgt` and `src` must share a schema.
    * Matched rows take the src version only when `src.versionCol >
    * tgt.versionCol` (the reference's conditional-update predicate);
    * unmatched src rows are inserts; unmatched tgt rows are kept.
    * Adds [[ActionCol]] ∈ {update, insert, keep}.
    */
  def plan(tgt: DataFrame, src: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    require(tgt.columns.sameElements(src.columns), "tgt/src schemas must match")
    val t = tgt.alias("t")
    val s = src.alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val matched  = keys.map(k => col(s"s.$k").isNotNull).reduce(_ && _) &&
      keys.map(k => col(s"t.$k").isNotNull).reduce(_ && _)
    val srcWins = matched && (col(s"s.$versionCol") > col(s"t.$versionCol"))
    val inserted = keys.map(k => col(s"t.$k").isNull).reduce(_ && _)
    val useSrc: Column = inserted || srcWins
    val merged = tgt.columns.map { c =>
      when(useSrc, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    val action = when(inserted, lit("insert"))
      .when(srcWins, lit("update"))
      .otherwise(lit("keep"))
      .as(ActionCol)
    t.join(s, joinCond, "full_outer").select(merged :+ action: _*)
  }

  /** Counters the reference reads from Delta `DESCRIBE HISTORY`
    * `operationMetrics` (silver_arxiv.py:175-184). Computed in one
    * distributed aggregation over the merge plan — no extra pass.
    */
  final case class WriteMetrics(inserted: Long, updated: Long, kept: Long) {
    def outputRows: Long = inserted + updated + kept
  }

  /** Run the merge and return (result, metrics). One job: the action
    * column is aggregated from the same plan that produces the output.
    */
  def mergeWithMetrics(
      tgt: DataFrame,
      src: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): (DataFrame, WriteMetrics) = {
    val merged = plan(tgt, src, keys, versionCol).cache()
    val counts = merged
      .groupBy(col(ActionCol))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val m = WriteMetrics(
      counts.getOrElse("insert", 0L),
      counts.getOrElse("update", 0L),
      counts.getOrElse("keep", 0L)
    )
    (merged.drop(ActionCol), m)
  }
}
