package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.{Upsert, Watermark}
import graft.sources.{Discovery, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The medallion stages of the reference pipeline (bronze → silver →
  * gold for the three article sources), re-expressed as pure
  * DataFrame transforms over a [[Warehouse]].
  *
  * Every stage returns Either[String, Long] — Left is the reference's
  * `dbutils.notebook.exit(msg)` early-exit (SURVEY §2.1 S15), Right is
  * the row count written.
  */
object Stages {

  /** yyyyMMdd → (yyyy-MM-dd, yyyy_MM_dd) filename prefixes
    * (reference bronze_arxiv.py:25 vs bronze_google_scholar.py:24).
    */
  def dashPrefix(runDate: String): String =
    s"${runDate.take(4)}-${runDate.slice(4, 6)}-${runDate.slice(6, 8)}"
  def underscorePrefix(runDate: String): String =
    s"${runDate.take(4)}_${runDate.slice(4, 6)}_${runDate.slice(6, 8)}"

  private def fileStem(path: String): String =
    path.split('/').last.split("\\.json").head

  /** Lineage columns every bronze table carries (SURVEY §1.4). */
  private def withLineage(df: DataFrame, file: String, runDate: String): DataFrame =
    df.withColumn("source_file_name", lit(fileStem(file)))
      .withColumn("run_date", lit(runDate.toInt))
      .withColumn("load_ts", current_timestamp())

  // ---------------------------------------------------------------- bronze

  /** Scholar bronze (bronze_google_scholar.py:60-110): multiline JSON →
    * `_airbyte_data.*` unwrap → explode(organic_results) → results.*.
    */
  def bronzeScholar(spark: SparkSession, wh: Warehouse, landing: String, runDate: String): Either[String, Long] =
    Discovery.latestForRunDate(spark, landing, underscorePrefix(runDate)) match {
      case None => Left(s"no scholar files for $runDate")
      case Some(file) =>
        val raw = spark.read.option("multiLine", value = true).json(file).select("_airbyte_data.*")
        val shaped = raw
          .select(explode(col("organic_results")).as("results"))
          .select(col("results.*"))
        Right(wh.createOrReplace("bronze", "google_scholar", withLineage(shaped, file, runDate)))
    }

  /** Arxiv bronze (bronze_arxiv.py:61-104): JSONL → feed →
    * explode(feed.entry).
    */
  def bronzeArxiv(spark: SparkSession, wh: Warehouse, landing: String, runDate: String): Either[String, Long] =
    Discovery.latestForRunDate(spark, landing, dashPrefix(runDate)) match {
      case None => Left(s"no arxiv files for $runDate")
      case Some(file) =>
        val raw = spark.read.json(file).select("feed")
        val shaped = raw
          .select(explode(col("feed.entry")).as("results"))
          .select(col("results.*"))
        Right(wh.createOrReplace("bronze", "arxiv", withLineage(shaped, file, runDate)))
    }

  /** NYT bronze (bronze_ny_times.py:2,61-112): JSONL parsed
    * case-sensitively (duplicate keys differing only in case), unwrap,
    * drop the `multimedia` column. Case sensitivity is scoped to this
    * stage and restored after (SURVEY §7.4.3).
    */
  def bronzeNyt(spark: SparkSession, wh: Warehouse, landing: String, runDate: String): Either[String, Long] =
    Discovery.latestForRunDate(spark, landing, underscorePrefix(runDate)) match {
      case None => Left(s"no nyt files for $runDate")
      case Some(file) =>
        val prior = spark.conf.get("spark.sql.caseSensitive")
        spark.conf.set("spark.sql.caseSensitive", "true")
        try {
          val shaped = spark.read.json(file).select("_airbyte_data.*").drop("multimedia")
          Right(wh.createOrReplace("bronze", "nytarchive", withLineage(shaped, file, runDate)))
        } finally spark.conf.set("spark.sql.caseSensitive", prior)
    }

  // ---------------------------------------------------------------- silver

  /** run_date int (20221220) → DateType (silver_arxiv.py:90-94's
    * concat(left/substr/right)::date).
    */
  private def runDateAsDate = to_date(col("run_date").cast("string"), "yyyyMMdd").as("run_date")

  /** Schema-drift guard (SURVEY §7.4.4): bronze schemas are inferred
    * from JSON, so a batch missing an optional field would otherwise
    * fail the silver cast. Absent columns become typed nulls — total
    * casts over drifting inputs.
    */
  private def colOrNull(df: DataFrame, name: String, tpe: String) =
    if (df.columns.contains(name)) col(name).cast(tpe) else lit(null).cast(tpe)

  /** Scholar typed projection (silver_google_scholar.py:77-118) —
    * shared with the streaming twin ([[StreamingIngest.scholarIngest]]),
    * like [[nytTyped]].
    */
  private[graft] def scholarTyped(bronze: DataFrame): DataFrame =
    bronze.select(
      colOrNull(bronze, "link", "string").as("link"),
      colOrNull(bronze, "result_id", "string").as("result_id"),
      colOrNull(bronze, "snippet", "string").as("snippet"),
      colOrNull(bronze, "title", "string").as("title"),
      col("source_file_name").cast("string"),
      runDateAsDate,
      col("load_ts").cast("timestamp")
    )

  /** Scholar publish_dt derivation + surrogate key (the other shared
    * half): the days-ago snippet prefix subtracts from run_date, with
    * run_date itself as the fallback.
    */
  private[graft] def scholarKeyed(typed: DataFrame): DataFrame =
    typed
      .withColumn(
        "publish_dt",
        coalesce(date_sub(col("run_date"), coalesce(TextFunctions.daysAgo(col("snippet")), lit(0))), col("run_date"))
      )
      .withColumn("ggl_sk", sha2(concat_ws("||", col("result_id"), col("publish_dt")), 256))
      .select("ggl_sk", "link", "result_id", "snippet", "title", "publish_dt",
        "source_file_name", "run_date", "load_ts")

  /** Scholar silver (silver_google_scholar.py:77-163): typed projection,
    * publish_dt from the days-ago snippet prefix with run_date fallback,
    * sha2 surrogate key; first load CTAS, then strict-`>` watermark
    * append. Returns rows written.
    */
  def silverScholar(spark: SparkSession, wh: Warehouse): Either[String, Long] = {
    if (!wh.tableExists("bronze", "google_scholar")) return Left("bronze.google_scholar missing")
    val wm = new Watermark(spark, wh, "silver", "google_scholar")
    if (!wm.consistentWith("silver", "google_scholar"))
      return Left("watermark/table existence mismatch for google_scholar")

    val bronze   = wh.table("bronze", "google_scholar")
    val typed    = scholarTyped(bronze)
    val preCount = typed.count()
    val withPublish = scholarKeyed(typed)
    require(withPublish.count() == preCount, "row preservation violated in scholar silver")

    val written =
      if (!wh.tableExists("silver", "google_scholar"))
        wh.createOrReplace("silver", "google_scholar", withPublish)
      else {
        val fresh = wm.get match {
          case Some(w) => withPublish.filter(col("publish_dt") > lit(w)) // strict > (P7)
          case None    => withPublish
        }
        wh.append("silver", "google_scholar", fresh)
      }
    val newWm = wh
      .table("silver", "google_scholar")
      .agg(max(date_format(col("publish_dt"), "yyyy-MM-dd")))
      .head()
      .getString(0)
    wm.set(newWm)
    wm.validate(newWm)
    Right(written)
  }

  /** Arxiv typed projection (silver_arxiv.py:82-96) — shared with the
    * streaming twin ([[StreamingIngest.arxivIngest]]), like
    * [[nytTyped]]. id/version parse from the abs URL; version stays a
    * STRING, faithfully to the reference.
    */
  private[graft] def arxivTyped(bronze: DataFrame): DataFrame = {
    val abs = split(col("id"), "/").getItem(4)
    bronze.select(
      split(abs, "v").getItem(0).cast("string").as("id"),
      split(abs, "v").getItem(1).cast("string").as("version"),
      col("id").cast("string").as("link"),
      colOrNull(bronze, "summary", "string").as("summary"),
      colOrNull(bronze, "title", "string").as("title"),
      to_date(substring(colOrNull(bronze, "updated", "string"), 1, 10)).as("updated_dt"),
      col("source_file_name").cast("string"),
      runDateAsDate,
      col("load_ts").cast("timestamp")
    )
  }

  /** Arxiv surrogate key + final silver column order (shared half). */
  private[graft] def arxivKeyed(typed: DataFrame): DataFrame =
    typed
      .withColumn("arx_sk", sha2(concat_ws("||", col("id"), col("version"), col("updated_dt")), 256))
      .select("arx_sk", "id", "version", "link", "summary", "title", "updated_dt",
        "source_file_name", "run_date", "load_ts")

  /** Arxiv silver (silver_arxiv.py:82-152): id/version parsed from the
    * abs URL, `updated_dt >= watermark` filter (note `>=`, unlike
    * scholar's `>` — MERGE makes re-processing idempotent), then the
    * conditional MERGE on id with `src.version > tgt.version`.
    * Version stays a STRING, faithfully to the reference — so "10" <
    * "2" lexically; tests pin this documented quirk.
    */
  def silverArxiv(spark: SparkSession, wh: Warehouse): Either[String, Long] = {
    if (!wh.tableExists("bronze", "arxiv")) return Left("bronze.arxiv missing")
    val wm = new Watermark(spark, wh, "silver", "arxiv")
    if (!wm.consistentWith("silver", "arxiv"))
      return Left("watermark/table existence mismatch for arxiv")

    val bronze   = wh.table("bronze", "arxiv")
    val typed    = arxivTyped(bronze)
    val preCount = typed.count()
    val keyed    = arxivKeyed(typed)
    require(keyed.count() == preCount, "row preservation violated in arxiv silver")

    val src = wm.get match {
      case Some(w) => keyed.filter(col("updated_dt") >= lit(w)) // >= (P7 asymmetry)
      case None    => keyed
    }
    val metrics = wh.upsert("silver", "arxiv", src, keys = Seq("id"), versionCol = "version")
    val newWm = wh
      .table("silver", "arxiv")
      .agg(max(date_format(col("updated_dt"), "yyyy-MM-dd")))
      .head()
      .getString(0)
    wm.set(newWm)
    wm.validate(newWm)
    Right(metrics.outputRows)
  }

  /** NYT typed projection (silver_nyt_archive.py:60-96) — shared by
    * the batch silver stage below and its streaming twin
    * ([[StreamingIngest.nytIngest]]), so the two paths agree by
    * construction, not by parallel maintenance.
    */
  private[graft] def nytTyped(bronze: DataFrame): DataFrame =
    bronze.select(
      col("_id").cast("string").as("id"),
      colOrNull(bronze, "abstract", "string").as("abstract"),
      colOrNull(bronze, "lead_paragraph", "string").as("lead_paragraph"),
      colOrNull(bronze, "snippet", "string").as("snippet"),
      to_date(substring(colOrNull(bronze, "pub_date", "string"), 1, 10)).as("publish_dt"),
      col("source_file_name").cast("string"),
      runDateAsDate,
      col("load_ts").cast("timestamp")
    )

  /** NYT surrogate key + final silver column order (the other shared
    * half of the batch/stream twin).
    */
  private[graft] def nytKeyed(typed: DataFrame): DataFrame =
    typed
      .withColumn("nyt_sk", sha2(concat_ws("||", col("id"), col("publish_dt")), 256))
      .select("nyt_sk", "id", "abstract", "lead_paragraph", "snippet", "publish_dt",
        "source_file_name", "run_date", "load_ts")

  /** NYT silver (silver_nyt_archive.py:60-120): typed projection,
    * sha2 key, NOT-IN append guard planned as a left-anti join
    * (SURVEY §2.3 J2 — sha2 is non-null so plain anti-join ≡ the
    * null-aware NOT IN). Row preservation is asserted around the
    * projection+key step, faithful to the reference's pre/post count
    * check (silver_nyt_archive.py:47,129,134 — the same invariant
    * scholar and arxiv silver already carry here).
    */
  def silverNyt(spark: SparkSession, wh: Warehouse): Either[String, Long] = {
    if (!wh.tableExists("bronze", "nytarchive")) return Left("bronze.nytarchive missing")
    val bronze   = wh.table("bronze", "nytarchive")
    val typed    = nytTyped(bronze)
    val preCount = typed.count()
    val keyed    = nytKeyed(typed)
    require(keyed.count() == preCount, "row preservation violated in nyt silver")

    val written =
      if (!wh.tableExists("silver", "nytarchive"))
        wh.createOrReplace("silver", "nytarchive", keyed)
      else {
        val existing = wh.table("silver", "nytarchive").select("nyt_sk")
        wh.append("silver", "nytarchive", keyed.join(existing, Seq("nyt_sk"), "left_anti"))
      }
    Right(written)
  }

  // ------------------------------------------------------------------ gold

  /** Per-source words projections + the 3-way UNION ALL combined view
    * (gold_integrated_data_preNLP.py:48-166).
    */
  def goldWords(spark: SparkSession, wh: Warehouse): Either[String, Long] = {
    val missing = Seq("nytarchive", "google_scholar", "arxiv").filterNot(wh.tableExists("silver", _))
    if (missing.nonEmpty) return Left(s"silver tables missing: ${missing.mkString(",")}")

    val nyt = wh
      .table("silver", "nytarchive")
      .select(
        lit("nyt").as("source"),
        col("nyt_sk").as("source_sk"),
        lower(concat_ws(" ", col("abstract"), col("lead_paragraph"), col("snippet"))).as("words"),
        col("publish_dt")
      )
    val ggl = wh
      .table("silver", "google_scholar")
      .select(
        lit("ggl").as("source"),
        col("ggl_sk").as("source_sk"),
        lower(concat_ws(" ", col("snippet"), col("title"))).as("words"),
        col("publish_dt")
      )
    val arx = wh
      .table("silver", "arxiv")
      .select(
        lit("arx").as("source"),
        col("arx_sk").as("source_sk"),
        lower(concat_ws(" ", col("summary"), col("title"))).as("words"),
        col("updated_dt").as("publish_dt")
      )
    wh.createOrReplace("gold", "nytarchive_words", nyt)
    wh.createOrReplace("gold", "google_scholar_words", ggl)
    wh.createOrReplace("gold", "arxiv_words", arx)
    val combined = nyt.union(ggl).union(arx)
    combined.createOrReplaceTempView("vw_combined_pre_nlp")
    Right(wh.createOrReplace("gold", "combined_pre_nlp", combined))
  }

  /** Article scoring (gold_article_scoring.py:36-174): clean_text →
    * tokenize → stop-words → lemmatize → distinct → term-weight score →
    * ratio + threshold. Everything is a column expression or a
    * broadcast-joinable map — no UDF boundary (the reference pays three).
    */
  def goldScored(
      spark: SparkSession,
      wh: Warehouse,
      weights: Map[String, Int] = TextFunctions.cleanTechTerms
  ): Either[String, Long] = {
    if (!wh.tableExists("gold", "combined_pre_nlp")) return Left("gold.combined_pre_nlp missing")
    val scored = wh
      .table("gold", "combined_pre_nlp")
      .withColumn("t", TextFunctions.cleanText(col("words")))
      .withColumn("vector", split(col("t"), "\\s+"))
      .withColumn("vector_no_stopw", TextFunctions.removeStopWords(col("vector")))
      .withColumn("vector_lemmed", TextFunctions.lemmatize(col("vector_no_stopw")))
      .withColumn("vector_unique", array_distinct(col("vector_lemmed")))
      .withColumn("vector_scored", TextFunctions.termScore(col("vector_lemmed"), weights))
      .withColumn("vector_length", size(col("vector_unique")))
      .select(
        col("source"),
        col("source_sk"),
        col("publish_dt"),
        col("vector_scored").as("article_score"),
        col("vector_length"),
        (lit(1.0) * col("vector_scored") / col("vector_length")).as("score_ratio")
      )
      .filter(col("article_score") > 0)
    Right(wh.createOrReplace("gold", "scored_articles", scored))
  }
}
