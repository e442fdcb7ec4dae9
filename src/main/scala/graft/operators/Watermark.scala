package graft.operators

import graft.sources.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch incremental-load high-water mark (SURVEY §2.10; reference
  * silver_arxiv.py:43-50,189-209): a one-row table holding the max
  * processed value. NOT a streaming watermark — the reference has no
  * stream compute; this is the batch pattern it actually uses.
  */
final class Watermark(spark: SparkSession, wh: Warehouse, layer: String, name: String) {

  private val table = s"watermark_$name"

  def exists: Boolean = wh.tableExists(layer, table)

  /** Current high-water mark, if any (reference reads it with
    * `.collect()[0][0]`, silver_arxiv.py:47).
    */
  def get: Option[String] =
    if (!exists) None
    else wh.table(layer, table).select("watermark_value").head(1).headOption.map(_.getString(0))

  /** CTAS a new single-row watermark table (silver_arxiv.py:194-199). */
  def set(value: String): Unit = {
    import spark.implicits._
    wh.createOrReplace(layer, table, Seq(value).toDF("watermark_value"))
    ()
  }

  /** Round-trip validation (silver_arxiv.py:204-209): the stored mark
    * must equal what we just computed; throws on violation.
    */
  def validate(expected: String): Unit = {
    val stored = get.getOrElse(throw new IllegalStateException(s"watermark $name missing"))
    require(stored == expected, s"watermark $name round-trip failed: stored=$stored expected=$expected")
  }

  /** Consistency precondition (silver_arxiv.py:43-49): watermark table
    * and its data table must both exist or both not exist.
    */
  def consistentWith(dataLayer: String, dataTable: String): Boolean =
    exists == wh.tableExists(dataLayer, dataTable)
}
