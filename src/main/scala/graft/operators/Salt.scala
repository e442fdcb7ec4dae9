package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (large) side's key into
  * `factor` sub-keys and replicate the small side across all salts, so
  * a hot key spreads over `factor` tasks instead of one straggler.
  *
  * AQE's skew-join handling (on by default in [[graft.Engine]]) covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * aggregations over hot keys and for joins AQE can't split (e.g.
  * build-side skew in shuffled hash).
  */
object Salt {

  /** Deterministic salt in [0, factor) derived from row content. */
  def saltCol(factor: Int, entropy: Column): Column =
    pmod(xxhash64(entropy), lit(factor)).cast("int")

  /** Join `big` (skewed) with `small` on `key`, spreading each key over
    * `factor` salts. `entropy` should be a column that varies within a
    * key group (e.g. a row id) so rows distribute evenly.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      entropy: Column,
      factor: Int
  ): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(factor, entropy))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** [[saltedJoin]] for sides whose key COLUMNS are named differently
    * (the FK-join common case, e.g. orders.o_custkey = customer
    * .c_custkey): same salting scheme, explicit equi-condition, both
    * key columns kept in the output. Result rows are exactly the plain
    * inner join's — each big row meets the one small replica carrying
    * its salt; null keys never match, as in any inner equi-join
    * (SkewSpec pins set equality including null/unmatched keys).
    * Pick the factor from [[Skew.keySkewReport]]'s measured ratio.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      entropy: Column,
      factor: Int
  ): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val b = big.withColumn("__salt", saltCol(factor, entropy))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. For algebraic aggregates only (sum,
    * count, min, max — anything with a merge function).
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      value: Column,
      entropy: Column,
      factor: Int
  ): DataFrame =
    df.withColumn("__salt", saltCol(factor, entropy))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
}
