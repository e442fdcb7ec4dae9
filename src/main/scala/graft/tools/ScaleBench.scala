package graft.tools

import graft.{Engine, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Systematic scale rung: measure every heavy operator family at
  * sf0.1 AND at a derived 10× corpus, and commit the per-query scaling
  * ratios as `BENCH_sf1.json` — the evidence behind the "would this
  * plan survive a 100× scale-up" claims the operator docs make.
  *
  * Two derived corpora, because "10× data" means two different things:
  *
  *   - **iid** (the pass criterion): each copy is content-decorrelated
  *     from the others — documents get a per-copy bijective letter
  *     substitution (dup structure WITHIN a copy is preserved exactly;
  *     shingle overlap ACROSS copies vanishes), embeddings get a
  *     per-copy cyclic component shift (cosine structure within a copy
  *     is permutation-invariant, cross-copy pairs decorrelate), events
  *     get per-copy fresh users with intact timelines. True output
  *     mass grows ~linearly, so WALL TIME at 10× data should be ≤ ~10×
  *     plus amortized fixed overhead — a superlinear ratio here means
  *     the plan is wrong (an unbucketed pair join, a driver loop, a
  *     shuffle that grew quadratically).
  *
  *   - **dup** (the robustness case): verbatim copies under fresh ids,
  *     the adversarial input every real dedup pass faces. Candidate
  *     and output mass grow ~quadratically IN THE DUPLICATED FAMILIES
  *     (50 copies of a payload → C(50,2) pairs where sf0.1 had
  *     C(5,2)), so wall time is judged against the ROWS ratio, not
  *     against 10×: time growing like output is the algorithm working;
  *     time growing like corpus² while output doesn't is the bug.
  *
  * Per query and corpus: noop-sink materialization (count() would let
  * Catalyst prune the very projections being measured), row count via
  * observe on the first run, best-of-2 for runs under the re-run
  * threshold (this VM has multi-second stall waves; a 60 s heavy run
  * is not re-paid just to dodge one).
  *
  * `sbt "runMain graft.tools.ScaleBench [factor]"` → BENCH_sf1.json
  */
object ScaleBench {

  /** The heavy-family slate: every operator family whose 100 TB story
    * is load-bearing (dedup funnels, substring/minhash/simhash/phash
    * pair generation, graph closure, ANN index build+probe, PQ, exact
    * k-means, novelty/leakage token joins, user-keyed sequence stats).
    * All read only documents/embeddings/events — the tables the
    * derived corpora amplify.
    */
  val Slate: Seq[String] = Seq(
    "q25_ngram_jaccard_pairs",
    "q26_minhash_lsh_pairs",
    "q28_simhash_pairs",
    "q38_dedup_clusters",
    "q39_dedup_keep_one",
    "q47_dedup_pipeline",
    "q52_phash_pairs",
    "q56_phash_pairs_collapsed",
    "q209_frame_dedup",
    "q210_frame_dedup_collapsed",
    "q63_curation_pipeline",
    "q127_dedup_report",
    "q143_dedup_keep_best",
    "q115_substring_pairs",
    "q118_incremental_substring",
    "q61_ann_ivf_indexed",
    "q123_ann_filtered_ivf",
    "q124_ann_filtered_indexed",
    "q86_ann_pq_topk",
    "q87_ann_ivfpq_topk",
    "q99_ann_ivfpq_pruned",
    "q138_kmeans_clusters",
    "q139_semdedup",
    "q162_ngram_novelty",
    "q191_split_leakage",
    "q184_burstiness",
    "q198_bm25"
  )

  /** Verbatim copies under fresh ids — the dup-heavy corpus
    * (same derivation as [[ScaleSmoke]]'s smoke corpus).
    */
  def deriveDup(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables.documents(spark, src)
      .select(col("*"), copies)
      .select((col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.embeddings(spark, src)
      .select(col("*"), copies)
      .select((col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    deriveEvents(spark, src, out, factor)
  }

  /** Content-decorrelated copies: bijective per-copy letter
    * substitution for text (rotation k of the 10 most frequent English
    * letters — injective, so within-copy equality/overlap structure is
    * EXACTLY sf0.1's, while cross-copy shingles diverge), and per-copy
    * Rademacher sign flips for embeddings: copy k multiplies component
    * i by (−1)^{xxhash64(i,k) mod 2}. The same sign vector applied to
    * two vectors preserves their dot product and norms EXACTLY, so
    * every copy reproduces sf0.1's neighbor structure bit-for-bit;
    * across copies the product becomes a Rademacher-weighted sum that
    * concentrates near zero — genuinely decorrelated, like fresh iid
    * vectors. (An earlier cyclic-component-shift derivation left
    * cross-copy AUTOcorrelation: true cosine-pair mass grew ~117× at
    * 10× data, breaking the linear-output premise the iid criterion
    * rests on.) Copy 0 is the identity — the derived corpus contains
    * sf0.1 verbatim. Requires factor ≤ 10 (10 distinct rotations).
    */
  def deriveIid(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(factor <= 10, s"iid derivation has 10 distinct letter rotations, got $factor")
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    val base   = "etaoinshrd"
    val rots   = (0 until factor).map(k => base.drop(k) + base.take(k))
    Tables.documents(spark, src)
      .select(col("*"), copies)
      .withColumn("repl", element_at(array(rots.map(lit): _*), col("copy") + 1))
      .select((col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        expr(s"translate(text, '$base', repl)").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.embeddings(spark, src)
      .select(col("*"), copies)
      .select((col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            when(pmod(xxhash64(i, col("copy")), lit(2)) === 0, x).otherwise(-x)))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    deriveEvents(spark, src, out, factor)
  }

  /** Copies are NEW users with intact timelines — the only faithful
    * scaling for user-keyed sequence analytics (iid and dup agree).
    */
  private def deriveEvents(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables.events(spark, src)
      .select(col("*"), copies)
      .select((col("event_id") + col("copy") * lit(100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** One timed materialization; rows via observe on the same job. */
  private def timeOnce(fn: (SparkSession, String) => DataFrame,
      spark: SparkSession, dir: String): (Double, Long) = {
    val t0  = System.nanoTime()
    val obs = org.apache.spark.sql.Observation()
    noop(fn(spark, dir).observe(obs, count(lit(1)).as("n")))
    ((System.nanoTime() - t0) / 1e9, obs.get("n").asInstanceOf[Long])
  }

  /** Best-of-2 for cheap runs; a single run past the threshold (a 60 s
    * heavy query is not re-paid to dodge one stall wave — the sentinel
    * flags contaminated windows instead).
    */
  private def measure(fn: (SparkSession, String) => DataFrame,
      spark: SparkSession, dir: String, rerunUnder: Double): (Double, Long) = {
    val (t1, n) = timeOnce(fn, spark, dir)
    if (t1 < rerunUnder) {
      val (t2, _) = timeOnce(fn, spark, dir)
      (math.min(t1, t2), n)
    } else (t1, n)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src    = "/root/testdata/sf0.1"
    val tmp    = System.getProperty("java.io.tmpdir")
    val dupDir = s"$tmp/graft_sfbench_dup$factor"
    val iidDir = s"$tmp/graft_sfbench_iid$factor"
    val spark  = Engine.session(32)

    deriveDup(spark, src, dupDir, factor)
    deriveIid(spark, src, iidDir, factor)
    def counts(d: String) = (
      spark.read.parquet(s"$d/documents.parquet").count(),
      spark.read.parquet(s"$d/embeddings.parquet").count(),
      spark.read.parquet(s"$d/events.parquet").count())
    val (nd, nv, ne) = counts(dupDir)
    println(s"SCALEBENCH corpus x$factor: $nd docs, $nv vectors, $ne events (dup + iid)")

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      noop(spark.read.parquet(s"$src/region.parquet"))
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // warm the probe's plan

    val sentStart = sentinel()
    case class Row(name: String, t01: Double, n01: Long,
        tIid: Double, nIid: Long, tDup: Double, nDup: Long)
    val rows = Slate.map { name =>
      val fn = SparkEntry.queries(name)
      val (t01, n01)   = measure(fn, spark, src, rerunUnder = 30.0)
      val (tIid, nIid) = measure(fn, spark, iidDir, rerunUnder = 30.0)
      val (tDup, nDup) = measure(fn, spark, dupDir, rerunUnder = 30.0)
      println(f"SCALEBENCH $name%-28s sf0.1 $t01%7.2f s/$n01%9d rows   " +
        f"iid10 $tIid%7.2f s/$nIid%9d (${tIid / t01}%5.1fx)   " +
        f"dup10 $tDup%7.2f s/$nDup%9d (${tDup / t01}%5.1fx)")
      Row(name, t01, n01, tIid, nIid, tDup, nDup)
    }
    val sentEnd = sentinel()

    def r(d: Double) = f"$d%.3f"
    val qjson = rows.map { x =>
      s""""${x.name}":{"t_sf01":${r(x.t01)},"rows_sf01":${x.n01},""" +
        s""""t_iid10":${r(x.tIid)},"rows_iid10":${x.nIid},"ratio_iid":${r(x.tIid / x.t01)},""" +
        s""""t_dup10":${r(x.tDup)},"rows_dup10":${x.nDup},"ratio_dup":${r(x.tDup / x.t01)}}"""
    }.mkString("{", ",", "}")
    val baseSections = Seq(
      "metric"  -> "\"scale_ratio_10x\"",
      "factor"  -> factor.toString,
      "sf_src"  -> s""""$src"""",
      "corpus"  -> s"""{"docs":$nd,"vectors":$nv,"events":$ne}""",
      "criteria" -> s"""{"iid":"wall-time ratio at 10x iid data should be <= ~15x (linear regime + fixed overhead)","dup":"judge wall ratio against rows ratio - output mass in duplicated families grows ~quadratically by design"}""",
      "sentinel" -> s"""{"start":${r(sentStart)},"end":${r(sentEnd)}}""",
      "queries" -> qjson)
    // merge-aware even as the BASE writer: a re-run must not delete
    // the sections ScaleDml/ScalePrune own (dml_queries,
    // dml_touched_partition, partition_prune)
    val basePath = java.nio.file.Paths.get("BENCH_sf1.json")
    val merged =
      if (java.nio.file.Files.exists(basePath))
        BenchMerge.replaceSections(
          new String(java.nio.file.Files.readAllBytes(basePath), "UTF-8"), baseSections)
      else
        baseSections.map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}") + "\n"
    java.nio.file.Files.write(basePath, merged.getBytes("UTF-8"))
    println(s"SCALEBENCH wrote BENCH_sf1.json (${rows.size} queries)")
    spark.stop()
  }
}
