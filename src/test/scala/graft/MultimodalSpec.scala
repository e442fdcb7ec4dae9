package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "fakejpegbytes-1".getBytes, MediaMeta("image/jpeg", 1920, 1080, 0L)),
      MediaRecord(2L, "fakejpegbytes-2".getBytes, MediaMeta("image/jpeg", 640, 480, 0L)),
      MediaRecord(3L, "fakewavbytes-333".getBytes, MediaMeta("audio/wav", 0, 0, 2500L)),
      MediaRecord(4L, "fakejpegbytes-1".getBytes, MediaMeta("image/jpeg", 320, 240, 0L)) // dup payload of 1
    ).toDS()
  }

  test("feature extraction is deterministic per payload and batch-shaped") {
    val feats = Multimodal
      .extractFeatures(media, new Multimodal.StubDecoder(16), parallelism = 2)
      .collect()
      .map(f => f.media_id -> f)
      .toMap
    assert(feats.size == 4)
    assert(feats(1L).features.length == 16)
    assert(feats(1L).features.sameElements(feats(4L).features), "same payload → same features")
    assert(!feats(1L).features.sameElements(feats(2L).features))
    assert(feats(3L).mime == "audio/wav")
    assert(feats(1L).n_bytes == 15L)
  }

  test("mediaStats stays expression-only and dedups by content hash") {
    val stats = Multimodal.mediaStats(media.toDF())
    assert(stats.filter(col("res_bucket") === "hd").count() == 1)
    // payload dup 1 vs 4 share the content key
    assert(stats.select("content_key").distinct().count() == 3)
    // plan must be a single projection over the scan — no shuffle
    val plan = stats.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frame sampling explodes indexes from duration metadata") {
    val frames = Multimodal.sampleFrameIndexes(media.toDF(), everyMs = 1000L)
    val got = frames.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 0L), (3L, 1000L), (3L, 2000L)))
  }
}
