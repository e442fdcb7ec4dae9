package graft.tools

import graft.{Engine, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100× rung: [[ScaleBench]] proved the heavy families at 10×,
  * [[ScaleFull]] swept the whole slate there — this tool takes the
  * TOP-HEAVY families one decade further (sf0.1 × 100 ≈ 6 M documents
  * / 2 M vectors / tens of M events, and a 60 M-row DML corpus), the
  * same way q62's propagation cap was caught: sleepers show up one
  * decade before they'd show up in production. Committed as
  * `BENCH_sf2.json`; SCALE.md explains every ratio beyond
  * ~linear-in-output.
  *
  * Derivations (content-decorrelated, the iid criterion — ratios are
  * judged against OUTPUT mass, wall ∝ output is the algorithm
  * working):
  *
  *   - **documents**: [[ScaleBench.deriveIid]]'s bijective letter
  *     substitution generalized to 100 distinct maps by composing TWO
  *     independent rotations over DISJOINT letter sets
  *     (`etaoinshrd` rotated copy%10, `lucmfwygpb` rotated copy/10):
  *     each copy's within-copy shingle/equality structure is EXACTLY
  *     sf0.1's, cross-copy shingles diverge in at least one alphabet.
  *   - **embeddings**: per-copy Rademacher sign flips
  *     (component i × (−1)^{xxhash64(i,copy) mod 2}) — already
  *     copy-count-agnostic; within-copy dot products are preserved
  *     bit-for-bit, cross-copy products concentrate near zero.
  *   - **events**: fresh users with intact timelines.
  *   - **DML tables**: [[ScaleDml.deriveDml]]'s scheme with the key
  *     shift raised to copy·10⁹ — at factor 100 the old copy·10⁷
  *     shift would collide copy 90's real keys with q114/q116's
  *     +9·10⁸ synthetic insert keys (the ScaleFull lesson: the shift
  *     must clear every query's synthetic-key offset).
  *
  * Measurement discipline (the ScaleFull lessons, kept): noop-sink
  * materialization with an Observation row count; best-of-2 only
  * under a threshold that EXCEEDS the big arm's one-time setup cost
  * (Scratch.once index builds / CTAS+first-merge read as scaling
  * regressions otherwise) — the DML slate separates `first` and
  * `steady` explicitly instead.
  *
  * `sbt "runMain graft.tools.ScaleCentury [factor] [ops|dml|all]"` →
  * BENCH_sf2.json. A partial run (`ops`/`dml`) merges into the
  * existing file, preserving the other section — the same convention
  * as ScaleDml merging into BENCH_sf1.json.
  */
object ScaleCentury {

  /** Heaviest operator families over documents/embeddings/events:
    * the dedup ladder (shingle, MinHash LSH, SimHash, substring),
    * closure + report + keep-best composition, curation funnel,
    * frame dedup, the indexed ANN probes (IVF, filtered, PQ), and
    * cluster-scoped semantic dedup.
    */
  val OpSlate: Seq[String] = Seq(
    "q25_ngram_jaccard_pairs",
    "q26_minhash_lsh_pairs",
    "q28_simhash_pairs",
    "q38_dedup_clusters",
    "q115_substring_pairs",
    "q63_curation_pipeline",
    "q127_dedup_report",
    "q209_frame_dedup",
    "q61_ann_ivf_indexed",
    "q124_ann_filtered_indexed",
    "q87_ann_ivfpq_topk",
    "q139_semdedup",
    "q213_dup_graph_centrality",
    "q214_capped_clusters",
    "q173_dsir_weights",
    "q163_rfm_segments",
    "q149_curriculum_order",
    "q177_revenue_deciles"
  )

  /** Queries measured under the MEDIAN-OF-3 protocol on the 100× arm:
    * the shingle family's wall has moved 17–32× across committed passes
    * on identical output rows (host stall waves land differently on its
    * long shuffle stages), so a single number is noise — the committed
    * row states the median and the min–max spread.
    */
  val MedianSlate: Set[String] = Set("q25_ngram_jaccard_pairs")

  /** Warehouse/DML families: incremental MV (flat + partitioned),
    * full-clause merges (flat + partitioned), GDPR forget (now the
    * DataFrame-keyed bloom probe + semi-join delete).
    */
  val DmlSlate: Seq[String] = Seq(
    "q83_incremental_mv",
    "q101_incremental_mv_partitioned",
    "q114_merge_full_clauses",
    "q119_merge_clauses_partitioned",
    "q107_gdpr_forget"
  )

  /** 100 distinct text bijections + Rademacher embeddings + fresh-user
    * events. Copy 0 is the identity (the corpus contains sf0.1
    * verbatim).
    */
  def deriveIid(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(factor <= 100, s"iid derivation has 100 distinct letter maps, got $factor")
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    val base1  = "etaoinshrd"
    val base2  = "lucmfwygpb"
    val rots1  = (0 until 10).map(k => base1.drop(k) + base1.take(k))
    val rots2  = (0 until 10).map(k => base2.drop(k) + base2.take(k))
    Tables.documents(spark, src)
      .select(col("*"), copies)
      .withColumn("r1", element_at(array(rots1.map(lit): _*), pmod(col("copy"), lit(10)) + 1))
      .withColumn("r2", element_at(array(rots2.map(lit): _*), (col("copy") / 10).cast("int") + 1))
      .select((col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        expr(s"translate(translate(text, '$base1', r1), '$base2', r2)").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.embeddings(spark, src)
      .select(col("*"), copies)
      .select((col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            when(pmod(xxhash64(i, col("copy")), lit(2)) === 0, x).otherwise(-x)))
          .as("embedding"),
        col("label"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Tables.events(spark, src)
      .select(col("*"), copies)
      .select((col("event_id") + col("copy") * lit(100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** [[ScaleDml.deriveDml]] with the copy shift raised to 10⁹ (clears
    * q114/q116's +9·10⁸ synthetic insert keys at any factor ≤ ~9·10⁹).
    */
  def deriveDml(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val shift  = 1000000000L
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables.orders(spark, src)
      .select(col("*"), copies)
      .select(
        (col("o_orderkey") + col("copy") * lit(shift)).as("o_orderkey"),
        (col("o_custkey") + col("copy") * lit(shift)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        when(col("copy") === 0, col("o_orderpriority"))
          .otherwise(concat(col("o_orderpriority"), lit("#"), col("copy")))
          .as("o_orderpriority"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    Tables.customer(spark, src)
      .select(col("*"), copies)
      .select(
        (col("c_custkey") + col("copy") * lit(shift)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Events-only iid derivation (fresh users, intact timelines) — the
    * state-store rung derives its own 10× arm without paying for the
    * doc/vector tables. */
  def deriveEvents(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables.events(spark, src)
      .select(col("*"), copies)
      .select((col("event_id") + col("copy") * lit(100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** One AvailableNow pass of the watermarked streaming-dedup twin
    * (the state-heaviest stateful operator: state ≈ distinct event ids
    * inside the watermark window) over `eventsDir`, under the given
    * state-store provider. Returns (wall s, state rows, state bytes)
    * from the query's own stateOperators progress — the load
    * measurement the provider-invariance pin (StreamingSpec) doesn't
    * give. RocksDB reports its block-cache/working-set usage through
    * the same memoryUsedBytes field (plus custom metrics not recorded
    * here); HDFS reports the on-heap map — the two numbers are each
    * provider's own accounting of the same state.
    */
  private def timeStateful(
      spark: SparkSession,
      eventsDir: String,
      provider: Option[String],
      checkpoint: String): (Double, Long, Long, Map[String, Long]) = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    provider.foreach(spark.conf.set(key, _))
    try {
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreams
        .dedupedEvents(graft.streaming.EventStreams.readEventStream(spark, eventsDir))
        .writeStream.format("noop")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val so   = Option(q.lastProgress).map(_.stateOperators).getOrElse(Array.empty)
      val rows = if (so.nonEmpty) so(0).numRowsTotal else -1L
      val mem  = if (so.nonEmpty) so(0).memoryUsedBytes else -1L
      val custom: Map[String, Long] =
        if (so.isEmpty) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          Option(so(0).customMetrics)
            .map(_.asScala.map { case (k, v) => k -> v.longValue }.toMap)
            .getOrElse(Map.empty)
        }
      (wall, rows, mem, custom)
    } finally provider.foreach(_ => spark.conf.unset(key))
  }

  private def timeOnce(fn: (SparkSession, String) => DataFrame,
      spark: SparkSession, dir: String): (Double, Long) = {
    val t0  = System.nanoTime()
    val obs = org.apache.spark.sql.Observation()
    noop(fn(spark, dir).observe(obs, count(lit(1)).as("n")))
    ((System.nanoTime() - t0) / 1e9, obs.get("n").asInstanceOf[Long])
  }

  private def measure(fn: (SparkSession, String) => DataFrame,
      spark: SparkSession, dir: String, rerunUnder: Double): (Double, Long) = {
    val (t1, n) = timeOnce(fn, spark, dir)
    if (t1 < rerunUnder) {
      val (t2, _) = timeOnce(fn, spark, dir)
      (math.min(t1, t2), n)
    } else (t1, n)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val which  = args.lift(1).getOrElse("all")
    require(Set("ops", "dml", "state", "state1000", "all")(which),
      s"second arg must be ops|dml|state|state1000|all, got $which")
    val runOps   = which == "ops" || which == "all"
    val runDml   = which == "dml" || which == "all"
    val runState = which == "state" || which == "all"
    // the 100M-event decade is its OWN mode (a dedicated long run, not
    // part of "all"): RocksDB only — HDFS's ev100 heap (1.74 GiB)
    // extrapolates to ~17 GiB at ev1000, past the sandbox driver
    val runState1000 = which == "state1000"
    val src    = "/root/testdata/sf0.1"
    val tmp    = System.getProperty("java.io.tmpdir")
    val iidDir = s"$tmp/graft_sfcentury_iid$factor"
    val dmlDir = s"$tmp/graft_sfcentury_dml$factor"
    val spark  = Engine.session(32)

    if (runOps) deriveIid(spark, src, iidDir, factor)
    if (runDml) deriveDml(spark, src, dmlDir, factor)
    // on a partial run the other corpus' files usually still exist from
    // the full run — count them when present, -1 only when truly absent
    def countIf(run: Boolean, path: String) =
      if (run || java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        spark.read.parquet(path).count()
      else -1L
    val nd = countIf(runOps, s"$iidDir/documents.parquet")
    val nv = countIf(runOps, s"$iidDir/embeddings.parquet")
    val ne = countIf(runOps, s"$iidDir/events.parquet")
    val no = countIf(runDml, s"$dmlDir/orders.parquet")
    println(s"SCALECENTURY corpus x$factor ($which): $nd docs, $nv vectors, $ne events, $no orders")

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      noop(spark.read.parquet(s"$src/region.parquet"))
      (System.nanoTime() - t0) / 1e9
    }
    sentinel()
    val sentStart = sentinel()

    // ---- heavy operator families ------------------------------------
    case class OpRow(name: String, t01: Double, n01: Long, t100: Double, n100: Long,
        spread100: Option[(Double, Double)])
    val opRows = (if (runOps) OpSlate else Seq.empty[String]).map { name =>
      val fn = SparkEntry.queries(name)
      val (t01, n01) = measure(fn, spark, src, rerunUnder = 30.0)
      // the 100× arm's threshold exceeds its one-time setup (index
      // builds) so a setup-heavy first run is re-paid, not recorded;
      // the MedianSlate queries instead run THREE full trials and
      // commit the median with the min–max spread (host stall waves
      // have moved the shingle family 17–32× on identical rows)
      val (t100, n100, spread100) =
        if (MedianSlate(name)) {
          val runs = (1 to 3).map { _ =>
            val r = timeOnce(fn, spark, iidDir); System.gc(); r
          }
          val ts = runs.map(_._1).sorted
          (ts(1), runs.head._2, Some((ts.head, ts.last)))
        } else {
          val (t, n) = measure(fn, spark, iidDir, rerunUnder = 150.0)
          (t, n, None)
        }
      println(f"SCALECENTURY $name%-28s sf0.1 $t01%7.2f s/$n01%9d rows   " +
        f"iid100 $t100%8.2f s/$n100%10d (${t100 / t01}%6.1fx wall, ${n100.toDouble / math.max(1L, n01)}%6.1fx rows)" +
        spread100.map { case (lo, hi) => f" [median of 3, spread $lo%.2f-$hi%.2f s]" }.getOrElse(""))
      // 16 heavy queries share one local-mode JVM: localCheckpoint
      // blocks free only after a driver GC lets the ContextCleaner see
      // them unreachable (Spark's own periodicGC defaults to 30 min —
      // longer than this whole run). One GC per query keeps storage
      // from accumulating into a late-slate OOM.
      System.gc()
      OpRow(name, t01, n01, t100, n100, spread100)
    }

    // ---- warehouse/DML families (first = setup+apply, steady = nightly)
    case class DmlRow(name: String, f01: Double, s01: Double, n01: Long,
        f100: Double, s100: Double, n100: Long)
    val dmlRows = (if (runDml) DmlSlate else Seq.empty[String]).map { name =>
      val fn = SparkEntry.queries(name)
      val (f01, n01)  = timeOnce(fn, spark, src)
      val (s01, _)    = timeOnce(fn, spark, src)
      val (f100, n100) = timeOnce(fn, spark, dmlDir)
      val (s100, _)    = timeOnce(fn, spark, dmlDir)
      println(f"SCALECENTURY $name%-28s sf0.1 first $f01%7.2f/steady $s01%7.2f s   " +
        f"dml100 first $f100%8.2f/steady $s100%8.2f s (${s100 / s01}%6.1fx steady)")
      DmlRow(name, f01, s01, n01, f100, s100, n100)
    }

    // ---- state-store load rung (HDFS vs RocksDB on a stateful twin) --
    case class StateRow(name: String, t10: Double, rows10: Long, mem10: Long,
        t100: Double, rows100: Long, mem100: Long)
    val stateRows = if (!runState) Seq.empty[StateRow]
    else {
      val ev10Dir = s"$tmp/graft_sfcentury_ev10"
      deriveEvents(spark, src, ev10Dir, math.min(10, factor))
      if (!runOps && !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$iidDir/events.parquet")))
        deriveEvents(spark, src, iidDir, factor)
      val providers = Seq(
        "dedup_hdfs"    -> None,
        "dedup_rocksdb" -> Some(Engine.RocksDbProvider))
      providers.map { case (name, prov) =>
        def cp() = java.nio.file.Files
          .createTempDirectory(s"graft_sfc_state_$name").toString
        val (t10, r10, m10, _)    = timeStateful(spark, s"$ev10Dir/events.parquet", prov, cp())
        val (t100, r100, m100, _) = timeStateful(spark, s"$iidDir/events.parquet", prov, cp())
        println(f"SCALECENTURY $name%-28s ev10 $t10%7.2f s/$r10%9d state rows/${m10 / 1048576.0}%8.1f MiB   " +
          f"ev100 $t100%8.2f s/$r100%10d/${m100 / 1048576.0}%8.1f MiB (${t100 / t10}%5.1fx wall)")
        StateRow(name, t10, r10, m10, t100, r100, m100)
      }
    }

    // ---- the 100M-event decade (state1000, RocksDB only) -------------
    val state1000Json: Option[String] = if (!runState1000) None
    else {
      val evDir = s"$tmp/graft_sfcentury_ev1000"
      graft.Scratch.once(evDir)(deriveEvents(spark, src, evDir, 1000))
      val nEv = spark.read.parquet(s"$evDir/events.parquet").count()
      val cp = java.nio.file.Files.createTempDirectory("graft_sfc_state1000").toString
      val (t, rows1k, mem1k, custom) =
        timeStateful(spark, s"$evDir/events.parquet", Some(Engine.RocksDbProvider), cp)
      // disk working set: the checkpointed state snapshots (what a
      // cluster pays in HDFS/S3 bytes) — memoryUsedBytes above is the
      // provider's own block-cache/off-heap accounting
      def dirBytes(p: String): Long = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size(_)).sum
          finally s.close()
        }
      }
      val cpBytes = dirBytes(cp)
      val diskish = custom.filter { case (k, _) =>
        val lk = k.toLowerCase
        lk.contains("sst") || lk.contains("memory") || lk.contains("bytes")
      }
      println(f"SCALECENTURY dedup_rocksdb ev1000: $t%8.2f s / $rows1k%d state rows / " +
        f"${mem1k / 1048576.0}%8.1f MiB provider-accounted / ${cpBytes / 1048576.0}%8.1f MiB checkpointed")
      def r3(d: Double) = f"$d%.3f"
      Some(
        s"""{"events":$nEv,"provider":"rocksdb","t_s":${r3(t)},"state_rows":$rows1k,""" +
          s""""state_bytes_provider":$mem1k,"checkpoint_bytes":$cpBytes,""" +
          s""""rocksdb_metrics":{${diskish.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
          s""""note":"one AvailableNow pass, RocksDB ONLY by design: HDFS's ev100 heap (1.74 GiB) extrapolates to ~17 GiB at ev1000 - past the sandbox driver; this is the documented bound where the on-heap provider stops existing"}""")
    }
    val sentEnd = sentinel()

    def r(d: Double) = f"$d%.3f"
    // partial runs keep the other section from the existing file
    // (sections are extracted by their top-level key markers — the
    // file is written by this tool, single-line, so the markers are
    // stable)
    val outPath = java.nio.file.Paths.get("BENCH_sf2.json")
    def priorSection(key: String): String = {
      if (!java.nio.file.Files.exists(outPath)) return "{}"
      val s     = new String(java.nio.file.Files.readAllBytes(outPath), "UTF-8")
      val mark  = s""""$key":"""
      val start = s.indexOf(mark)
      if (start < 0) return "{}"
      var i     = start + mark.length
      var depth = 0
      val from  = i
      while (i < s.length && (depth > 0 || i == from)) {
        if (s.charAt(i) == '{') depth += 1
        else if (s.charAt(i) == '}') depth -= 1
        i += 1
      }
      s.substring(from, i)
    }
    val opJson =
      if (!runOps) priorSection("op_queries")
      else opRows.map { x =>
        val spread = x.spread100.map { case (lo, hi) =>
          s""","t_iid100_spread":[${r(lo)},${r(hi)}],"protocol":"median-of-3"""" }.getOrElse("")
        s""""${x.name}":{"t_sf01":${r(x.t01)},"rows_sf01":${x.n01},""" +
          s""""t_iid100":${r(x.t100)},"rows_iid100":${x.n100},""" +
          s""""ratio_wall":${r(x.t100 / x.t01)},"ratio_rows":${r(x.n100.toDouble / math.max(1L, x.n01))}$spread}"""
      }.mkString("{", ",", "}")
    val dmlJson =
      if (!runDml) priorSection("dml_queries")
      else dmlRows.map { x =>
        s""""${x.name}":{"t_first_sf01":${r(x.f01)},"t_steady_sf01":${r(x.s01)},"rows_sf01":${x.n01},""" +
          s""""t_first_100x":${r(x.f100)},"t_steady_100x":${r(x.s100)},"rows_100x":${x.n100},""" +
          s""""ratio_first":${r(x.f100 / x.f01)},"ratio_steady":${r(x.s100 / x.s01)}}"""
      }.mkString("{", ",", "}")
    val stateJson =
      if (!runState) priorSection("state_queries")
      else stateRows.map { x =>
        s""""${x.name}":{"t_ev10":${r(x.t10)},"state_rows_ev10":${x.rows10},"state_bytes_ev10":${x.mem10},""" +
          s""""t_ev100":${r(x.t100)},"state_rows_ev100":${x.rows100},"state_bytes_ev100":${x.mem100},""" +
          s""""ratio_wall":${r(x.t100 / x.t10)}}"""
      }.mkString("{", ",", "}")
    val s1000Json = state1000Json.getOrElse(priorSection("state1000"))
    val json =
      s"""{"metric":"scale_ratio_100x","factor":$factor,"sf_src":"$src",""" +
        s""""corpus":{"docs":$nd,"vectors":$nv,"events":$ne,"orders":$no},""" +
        s""""criteria":{"ops":"wall judged against OUTPUT rows ratio - iid decorrelation keeps true per-copy structure, cross-copy mass is the data's own tail","dml":"steady is the recurring nightly path; first carries one-time CTAS/index setup","state":"one AvailableNow pass of the watermarked streaming dedup twin; rows/bytes from the query's own stateOperators accounting (HDFS = on-heap map, RocksDB = off-heap working set)"},""" +
        s""""sentinel":{"start":${r(sentStart)},"end":${r(sentEnd)}},""" +
        s""""op_queries":$opJson,"dml_queries":$dmlJson,"state_queries":$stateJson,"state1000":$s1000Json}"""
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    println(s"SCALECENTURY wrote BENCH_sf2.json (${opRows.size} op + ${dmlRows.size} dml + ${stateRows.size} state rows)")
    spark.stop()
  }
}
