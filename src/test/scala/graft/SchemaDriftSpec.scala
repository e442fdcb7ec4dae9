package graft

import graft.pipeline.Stages
import graft.sources.Warehouse
import java.nio.file.Files

/** Silver casts must be total over drifting bronze schemas (SURVEY
  * §7.4.4): a batch missing optional fields or carrying extra fields
  * must load, with absent columns as typed nulls.
  */
class SchemaDriftSpec extends SparkSpec {

  test("scholar silver loads a batch with missing snippet and extra fields") {
    val root = Files.createTempDirectory("graft_drift")
    val landing = Files.createDirectories(root.resolve("scholar"))
    // record 1: no snippet; record 2: extra unexpected field
    Files.writeString(landing.resolve("2022_12_20_1671510000.123_scholar.jsonl"),
      """{"_airbyte_data": {"organic_results": [
        |  {"position": 1, "result_id": "r1", "title": "No Snippet Here", "link": "http://a", "type": "html"},
        |  {"position": 2, "result_id": "r2", "title": "Extra", "link": "http://b", "type": "html",
        |   "unexpected_new_field": {"deep": [1,2,3]}}
        |]}}""".stripMargin)
    val wh = new Warehouse(spark, root.resolve("wh").toString)
    assert(Stages.bronzeScholar(spark, wh, landing.toString, "20221220") == Right(2L))
    assert(Stages.silverScholar(spark, wh) == Right(2L))
    val rows = wh.table("silver", "google_scholar")
      .select("result_id", "snippet", "publish_dt").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows == Map("r1" -> None, "r2" -> None))
    // publish_dt fell back to run_date for null snippets
    val dts = wh.table("silver", "google_scholar").select("publish_dt").collect().map(_.getDate(0).toString)
    assert(dts.forall(_ == "2022-12-20"))
  }

  test("arxiv silver loads entries missing summary/updated") {
    val root = Files.createTempDirectory("graft_drift2")
    val landing = Files.createDirectories(root.resolve("arxiv"))
    Files.writeString(landing.resolve("2022-12-20_1671510000.123_arxiv.json"),
      """{"feed": {"entry": [{"id": "http://arxiv.org/abs/2212.11111v1", "title": "No summary or updated"}]}}""")
    val wh = new Warehouse(spark, root.resolve("wh").toString)
    assert(Stages.bronzeArxiv(spark, wh, landing.toString, "20221220") == Right(1L))
    assert(Stages.silverArxiv(spark, wh).isRight)
    val row = wh.table("silver", "arxiv").select("id", "summary", "updated_dt").head()
    assert(row.getString(0) == "2212.11111")
    assert(row.isNullAt(1) && row.isNullAt(2))
  }
}
