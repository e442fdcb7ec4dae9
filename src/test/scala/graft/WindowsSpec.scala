package graft

import graft.operators.Windows

class WindowsSpec extends SparkSpec {

  test("latestPerKey picks the highest-ordered row per key") {
    import spark.implicits._
    val df = Seq(
      (1, "2024-01-01", "old"),
      (1, "2024-02-01", "new"),
      (2, "2024-03-01", "only")
    ).toDF("k", "dt", "tag")
    val got = Windows
      .latestPerKey(df, Seq("k"), Seq("dt"))
      .orderBy("k")
      .collect()
      .map(r => (r.getInt(0), r.getString(2)))
    assert(got.toSeq == Seq((1, "new"), (2, "only")))
  }

  test("queries smoke: every SparkEntry query returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
