package graft

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries under the DuckDB oracle.
  *
  * The container ships no codecs, so the DECODE step stays a stub
  * ([[Multimodal.StubDecoder]], MultimodalSpec) — but everything
  * metadata-side of the decode (opaque binary payloads, typed meta
  * struct, expression-only stats, frame-sample explosion) is exactly
  * what runs before any decode at 100 TB, and it is fully
  * oracle-checkable. The media table is derived DETERMINISTICALLY from
  * `documents` (payload = UTF-8 bytes of text, meta from n_chars /
  * doc_id arithmetic) so both engines construct the identical corpus.
  */
object QueriesMedia {

  /** Deterministic synthetic media table over documents: binary payload
    * + typed meta struct matching [[Multimodal.mediaSchema]]'s shape.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4")
          .as("mime"),
        (col("n_chars") % 2048).cast("int").as("width"),
        ((col("doc_id") % 1080) + 1).cast("int").as("height"),
        (col("n_chars") * 7).as("duration_ms")
      ).as("meta")
    )

  /** Expression-only media stats (size, content key, resolution
    * bucket) — the filter/partition/dedup pass that runs BEFORE paying
    * any decode cost. All codegen; the sha2 content key doubles as the
    * exact-dedup key for binary payloads.
    */
  def q40_media_stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal
      .mediaStats(syntheticMedia(Tables.documents(spark, dir)))
      .orderBy($"media_id")
  }

  /** Frame-sample index explosion for video rows (every 500 ms): the
    * exact row set a real frame extractor would decode — generated,
    * sharded and oracle-checked without touching a codec.
    */
  def q41_frame_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = syntheticMedia(Tables.documents(spark, dir))
      .filter($"meta.mime" === "video/mp4")
    Multimodal
      .sampleFrameIndexes(media, everyMs = 500L)
      .orderBy($"media_id", $"frame_ms")
  }
}
