package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The quasi-identifier grid shared by the whole privacy family —
  * k-anonymity (q181 and its streaming twin), l-diversity (q203), the
  * anonymity-set histogram (q204) and the PSI value bucketing (q208).
  * One definition of the value-bucket width and projection, so a grid
  * change can never leave the batch audit, the streaming gate and the
  * drift monitor disagreeing about what a "combination" is.
  */
object PrivacyGrid {

  /** Width of the event-value quasi-identifier bucket. */
  val ValueBucketWidth = 50.0

  /** The value-bucket projection: floor(value / width) as a long. */
  def valueBucket(value: Column): Column =
    floor(value / ValueBucketWidth).cast("long")
}
