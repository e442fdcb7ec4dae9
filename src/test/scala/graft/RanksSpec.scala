package graft

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed global ranks: the bucket path must be
  * bit-identical to the single-partition window it replaces —
  * including heavy ties, ascending/descending keys, and the
  * degenerate constant key — and the derived ntile must reproduce the
  * window function's convention on every remainder shape.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // heavy ties: the leading value is drawn from a 37-value set
    (1 to 5000).map(i => (i.toLong, rnd.nextInt(37).toDouble, rnd.nextInt(1000)))
      .toDF("id", "v", "w")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select($"id", $"rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bucket path equals the single-window form on a heavy-tie descending key") {
    val df = randomDf(42)
    val window = ranks(df.withColumn("rn",
      row_number().over(Window.orderBy($"v".desc, $"id")).cast("long")))
    val buckets = ranks(Ranks.withGlobalRowNumber(
      df, Seq($"v".desc, $"id"), -$"v", "rn", buckets = 16, sortThresholdBytes = 0L))
    assert(buckets == window)
  }

  test("ascending integer key and a CONSTANT key both stay exact") {
    val df = randomDf(7)
    val window = ranks(df.withColumn("rn",
      row_number().over(Window.orderBy($"w", $"id")).cast("long")))
    val buckets = ranks(Ranks.withGlobalRowNumber(
      df, Seq($"w", $"id"), $"w", "rn", buckets = 8, sortThresholdBytes = 0L))
    assert(buckets == window)

    val const = df.withColumn("c", lit(5.0))
    val cw = ranks(const.withColumn("rn",
      row_number().over(Window.orderBy($"c", $"id")).cast("long")))
    val cb = ranks(Ranks.withGlobalRowNumber(
      const, Seq($"c", $"id"), $"c", "rn", sortThresholdBytes = 0L))
    assert(cb == cw, "a constant bucket key degrades to one bucket but must stay exact")
  }

  test("adaptive switch: below the threshold the plain window plans; both emit the same rows") {
    val df = randomDf(9)
    val small = Ranks.withGlobalRowNumber(
      df, Seq($"v".desc, $"id"), -$"v", "rn", sortThresholdBytes = Long.MaxValue)
    assert(!small.queryExecution.executedPlan.toString.contains("__rb"),
      "below the threshold the one-window form must plan")
    val big = Ranks.withGlobalRowNumber(
      df, Seq($"v".desc, $"id"), -$"v", "rn", sortThresholdBytes = 0L)
    assert(big.queryExecution.executedPlan.toString.contains("__rb"),
      "above the threshold the bucket machinery must plan")
    assert(ranks(small) == ranks(big))
  }

  test("ntileFromRank equals the ntile window function across remainder shapes") {
    for (n <- Seq(1, 3, 9, 10, 11, 97); k <- Seq(1, 3, 10)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val viaWindow = df
        .select($"id", ntile(k).over(Window.orderBy($"id")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val viaRank = df
        .crossJoin(broadcast(df.agg(count(lit(1)).as("cnt"))))
        .select($"id", Ranks.ntileFromRank($"id", $"cnt", k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(viaRank == viaWindow, s"n=$n k=$k")
    }
  }
}
