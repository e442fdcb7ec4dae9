package graft.pipeline

import graft.sources.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming twin of the medallion ingest: `readStream` over the JSONL
  * landing directory → bronze append → silver anti-join append, one
  * micro-batch per landed file.
  *
  * The batch [[Pipeline]] is faithful to the reference (run-date file
  * discovery, latest-file selection, one notebook run per day); this
  * twin is the engine extension for the same landing contract when
  * files arrive continuously: each new file lands in bronze with the
  * identical lineage stamps, and silver grows through the identical
  * typed-projection + sha2-key + anti-join path — [[Stages.nytTyped]] /
  * [[Stages.nytKeyed]] are SHARED with the batch stage, so the two
  * paths cannot drift. The anti-join makes delivery idempotent: a
  * re-delivered (or duplicated) file appends its rows to bronze but
  * adds zero silver rows, which is the exactly-once-at-silver guarantee
  * a file-redelivering landing bucket needs. StreamingSpec pins
  * stream-ingested silver ≡ the batch pipeline's silver on the same
  * fixture days.
  *
  * Per-batch cost at scale: the batch's own rows (shape + key) plus an
  * anti-join probe against silver keyed on the sha2 — a key-partitioned
  * silver keeps that probe partition-local; nothing re-reads bronze.
  */
object StreamingIngest {

  /** Landing schema for the stream (file streams need a static schema).
    * Inferred case-sensitively from the files already present — the NYT
    * shape carries duplicate keys differing only in case
    * (SURVEY §7.4.3) — and then PRUNED of `multimedia`: the pipeline
    * drops that column anyway (bronze_ny_times.py:112), its `url`/`Url`
    * twins are what a case-INsensitive stream analysis would reject,
    * and pruning it from the source schema means the JSON parser never
    * even materializes the payload (the scan-level column pruning the
    * batch path only gets after the read).
    */
  def inferLandingSchema(spark: SparkSession, landing: String): StructType = {
    val prior = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", "true")
    val full =
      try spark.read.option("pathGlobFilter", "*.jsonl").json(landing).schema
      finally spark.conf.set("spark.sql.caseSensitive", prior)
    StructType(full.map {
      case f if f.name == "_airbyte_data" =>
        f.copy(dataType = StructType(
          f.dataType.asInstanceOf[StructType].filterNot(_.name == "multimedia")))
      case f => f
    })
  }

  /** Landing schema for the arxiv stream (single-line feed JSON). */
  def inferArxivSchema(spark: SparkSession, landing: String): StructType =
    spark.read.option("pathGlobFilter", "*.json").json(landing).schema

  /** Landing schema for the scholar stream (multiline airbyte JSON). */
  def inferScholarSchema(spark: SparkSession, landing: String): StructType =
    spark.read.option("multiLine", value = true)
      .option("pathGlobFilter", "*.jsonl").json(landing).schema

  /** Column-form lineage stamps shared by the three ingest streams:
    * stem = file name up to ".json" ([[Stages.fileStem]]'s rule),
    * run_date = the leading date token with separators stripped
    * (handles both the underscore and dash prefix conventions).
    */
  private def withStreamLineage(df: org.apache.spark.sql.DataFrame) = {
    val fname = element_at(split(col("__path"), "/"), -1)
    df.withColumn("source_file_name", element_at(split(fname, "\\.json"), 1))
      .withColumn("run_date",
        regexp_replace(substring(fname, 1, 10), "[_-]", "").cast("int"))
      .withColumn("load_ts", current_timestamp())
      .drop("__path")
  }

  /** Streaming twin of the arxiv bronze→silver path: one micro-batch
    * per landed feed file; entries explode to bronze rows, silver goes
    * through the SAME projection/key as the batch stage and lands via
    * the versioned MERGE (`src.version > tgt.version` on id) — so
    * redelivery and out-of-order arrival are idempotent by the merge's
    * own contract, no watermark gate needed per batch (the batch
    * stage's `>=` filter is a work-skip, not a correctness gate —
    * silver_arxiv.py:43-50). The watermark table is still maintained
    * after each batch so a batch run can take over from the stream.
    */
  def arxivIngest(
      spark: SparkSession,
      wh: Warehouse,
      landing: String,
      schema: StructType
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.json")
      .json(landing)
      .select(col("*"), col("_metadata.file_path").as("__path"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val shaped = withStreamLineage(
            batch
              .select(explode(col("feed.entry")).as("results"), col("__path"))
              .select(col("results.*"), col("__path")))
          if (!wh.tableExists("bronze", "arxiv"))
            wh.createOrReplace("bronze", "arxiv", shaped)
          else wh.append("bronze", "arxiv", shaped)
          val keyed = Stages.arxivKeyed(Stages.arxivTyped(shaped))
          wh.upsert("silver", "arxiv", keyed, keys = Seq("id"), versionCol = "version")
          val wm = new graft.operators.Watermark(spark, wh, "silver", "arxiv")
          wm.set(wh.table("silver", "arxiv")
            .agg(max(date_format(col("updated_dt"), "yyyy-MM-dd"))).head().getString(0))
          ()
        }
      }
      .start()

  /** Streaming twin of the scholar bronze→silver path: one micro-batch
    * per landed multiline file; organic_results explode to bronze,
    * silver goes through the shared projection/key and the SAME
    * strict-`>` watermark gate as the batch stage, applied per
    * micro-batch — a redelivered file's rows sit at or below the mark
    * and append nothing, which is this source's idempotency story
    * (scholar has no MERGE key; the watermark IS the guard,
    * silver_google_scholar.py:120-141).
    */
  def scholarIngest(
      spark: SparkSession,
      wh: Warehouse,
      landing: String,
      schema: StructType
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("multiLine", value = true)
      .option("pathGlobFilter", "*.jsonl")
      .json(landing)
      .select(col("*"), col("_metadata.file_path").as("__path"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val shaped = withStreamLineage(
            batch
              .select(col("_airbyte_data.*"), col("__path"))
              .select(explode(col("organic_results")).as("results"), col("__path"))
              .select(col("results.*"), col("__path")))
          if (!wh.tableExists("bronze", "google_scholar"))
            wh.createOrReplace("bronze", "google_scholar", shaped)
          else wh.append("bronze", "google_scholar", shaped)
          val withPublish = Stages.scholarKeyed(Stages.scholarTyped(shaped))
          val wm = new graft.operators.Watermark(spark, wh, "silver", "google_scholar")
          if (!wh.tableExists("silver", "google_scholar"))
            wh.createOrReplace("silver", "google_scholar", withPublish)
          else {
            val fresh = wm.get match {
              case Some(w) => withPublish.filter(col("publish_dt") > lit(w)) // strict > (P7)
              case None    => withPublish
            }
            wh.append("silver", "google_scholar", fresh)
          }
          val newWm = wh.table("silver", "google_scholar")
            .agg(max(date_format(col("publish_dt"), "yyyy-MM-dd"))).head().getString(0)
          wm.set(newWm)
          wm.validate(newWm)
          ()
        }
      }
      .start()

  /** Start the NYT landing→bronze→silver stream. Files are processed
    * one per micro-batch in arrival order (the streaming analogue of
    * one notebook run per file); lineage (`source_file_name`,
    * `run_date`, `load_ts`) is derived per row from the file path,
    * matching the batch [[Stages]] stamps.
    */
  def nytIngest(
      spark: SparkSession,
      wh: Warehouse,
      landing: String,
      schema: StructType
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.jsonl")
      .json(landing)
      .select(col("*"), col("_metadata.file_path").as("__path"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          // scoped exactly like the batch bronze stage: the duplicate-
          // case keys must survive the unwrap (SURVEY §7.4.3). Set on
          // the BATCH's session — the stream's cloned session that the
          // micro-batch Dataset actually resolves against — never the
          // shared outer session, where it would be ineffective for
          // this batch while racing with concurrently running sibling
          // streams (the medallion ingest starts all three at once).
          val bs    = batch.sparkSession
          val prior = bs.conf.get("spark.sql.caseSensitive")
          bs.conf.set("spark.sql.caseSensitive", "true")
          try {
            // lineage from the file path: stem = name up to ".json",
            // run_date = the yyyy_MM_dd prefix (Stages.fileStem /
            // underscorePrefix, in Column form)
            val fname = element_at(split(col("__path"), "/"), -1)
            val stem  = element_at(split(fname, "\\.json"), 1)
            val runDt = regexp_replace(substring(fname, 1, 10), "_", "").cast("int")
            val shaped = batch
              .select(col("_airbyte_data.*"), col("__path"))
              .withColumn("source_file_name", stem)
              .withColumn("run_date", runDt)
              .withColumn("load_ts", current_timestamp())
              .drop("__path")
            if (!wh.tableExists("bronze", "nytarchive"))
              wh.createOrReplace("bronze", "nytarchive", shaped)
            else wh.append("bronze", "nytarchive", shaped)
            // silver from THIS batch's rows only (bronze is never
            // re-read); the shared projection + key, then the same
            // anti-join guard as the batch stage
            val keyed = Stages.nytKeyed(Stages.nytTyped(shaped))
            if (!wh.tableExists("silver", "nytarchive"))
              wh.createOrReplace("silver", "nytarchive", keyed)
            else {
              val existing = wh.table("silver", "nytarchive").select("nyt_sk")
              wh.append("silver", "nytarchive",
                keyed.join(existing, Seq("nyt_sk"), "left_anti"))
            }
            ()
          } finally bs.conf.set("spark.sql.caseSensitive", prior)
        }
      }
      .start()
}
