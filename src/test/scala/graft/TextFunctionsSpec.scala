package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def evalOne(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  test("cleanText lowercases, strips rt prefix, URLs and punctuation") {
    import spark.implicits._
    val got = Seq("rt Check https://x.co/Ab1 Solar, Power!")
      .toDF("t")
      .select(TextFunctions.cleanText($"t"))
      .head()
      .getString(0)
    assert(got == "check  solar power")
  }

  test("daysAgo parses the intended 'N days ago' prefix and nulls otherwise") {
    import spark.implicits._
    val got = Seq("3 days ago — something", "1 day ago x", "no prefix 5 days ago")
      .toDF("t")
      .select(TextFunctions.daysAgo($"t").as("d"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(Some(3), Some(1), None))
  }

  test("occurrences counts non-overlapping literal matches") {
    assert(evalOne(TextFunctions.occurrences(lit("the cat the dog the"), "the")) == 3)
    assert(evalOne(TextFunctions.occurrences(lit("abc"), "zz")) == 0)
  }

  test("removeStopWords preserves duplicates of non-stopwords") {
    import spark.implicits._
    val got = Seq(Seq("the", "spark", "a", "spark", "engine"))
      .toDF("toks")
      .select(TextFunctions.removeStopWords($"toks"))
      .head()
      .getSeq[String](0)
    assert(got == Seq("spark", "spark", "engine"))
  }

  test("cleanTechTerms is the reference's 31-term dictionary") {
    assert(TextFunctions.cleanTechTerms.size == 31)
    assert(TextFunctions.cleanTechTerms("biofuel") == 40)
    assert(TextFunctions.cleanTechTerms("technology") == 30)
  }
}
