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

  test("90%-constant key: the tie split keeps the plan distributed and the ranks exact") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map { i =>
      (i.toLong, if (i % 10 == 0) rnd.nextDouble() * 100 else 42.0)
    }.toDF("id", "v")
    val window = ranks(df.withColumn("rn",
      row_number().over(Window.orderBy($"v", $"id")).cast("long")))
    val split = ranks(Ranks.withGlobalRowNumber(
      df, Seq($"v", $"id"), $"v", "rn", buckets = 16,
      sortThresholdBytes = 0L, subBucketKey = Some($"id"), subBuckets = 64))
    assert(split == window)
    val tr = Ranks.lastTrace.get
    assert(tr.maxShareBefore > 0.85, s"fixture must be hot before the split: $tr")
    assert(tr.refined, s"the tie split must engage: $tr")
    assert(tr.maxShareAfter < 0.1,
      s"after the split no bucket may dominate (distributed shape): $tr")
  }

  test("a hot double value hiding TWO distinct true keys declines the split and stays exact") {
    // 2^53 and 2^53+1 are DISTINCT longs that cast to the SAME double:
    // the split's membership test (double equality) would lump them and
    // order them by the tie-break id, inverting the true key order —
    // the precision guard must decline and fall back to the per-bucket
    // sort (which orders by the true long, exactly)
    val big = 9007199254740992L
    val df = (1 to 4000).map { i =>
      val v = if (i % 10 == 0) i.toLong else if (i % 2 == 0) big else big + 1L
      (i.toLong, v)
    }.toDF("id", "v")
    val window = ranks(df.withColumn("rn",
      row_number().over(Window.orderBy($"v", $"id")).cast("long")))
    val buckets = ranks(Ranks.withGlobalRowNumber(
      df, Seq($"v", $"id"), $"v", "rn", buckets = 16,
      sortThresholdBytes = 0L, subBucketKey = Some($"id"), subBuckets = 64))
    assert(buckets == window,
      "keys collapsed by the double cast must not be sub-bucketed by the tie-break")
    val tr = Ranks.lastTrace.get
    assert(tr.maxShareBefore > 0.85 && !tr.refined,
      s"the precision guard must decline the split: $tr")
  }

  test("a hot bucket WITHOUT a subBucketKey stays exact (warn-only degradation)") {
    val df = (1 to 3000).map(i => (i.toLong, if (i % 10 == 0) i.toDouble else 7.0))
      .toDF("id", "v")
    val window = ranks(df.withColumn("rn",
      row_number().over(Window.orderBy($"v", $"id")).cast("long")))
    val buckets = ranks(Ranks.withGlobalRowNumber(
      df, Seq($"v", $"id"), $"v", "rn", buckets = 16, sortThresholdBytes = 0L))
    assert(buckets == window)
    val tr = Ranks.lastTrace.get
    assert(tr.maxShareBefore > 0.85 && !tr.refined)
  }

  test("null and NaN bucket keys fail fast on BOTH paths") {
    def messages(t: Throwable): String = {
      val sb = new StringBuilder
      var cur: Throwable = t
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("id", "v")
    val withNan  = Seq((1L, 1.0), (2L, Double.NaN), (3L, 3.0)).toDF("id", "v")
    for {
      (df, what) <- Seq((withNull, "null"), (withNan, "NaN"))
      thr        <- Seq(0L, Long.MaxValue) // bucket path AND small path
    } {
      val e = intercept[Throwable] {
        Ranks.withGlobalRowNumber(df, Seq($"v", $"id"), $"v", "rn",
          sortThresholdBytes = thr).collect()
      }
      assert(messages(e).contains("bucketKey"),
        s"a $what key at threshold $thr must raise the contract error, got: ${messages(e).take(300)}")
    }
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
