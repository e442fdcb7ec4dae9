package graft.tools

import graft.{Engine, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-slate scale rung: run EVERY `SparkEntry.queries` entry once at
  * sf0.1 and once at a derived 10× iid corpus, and commit the
  * per-query wall ratios as `BENCH_sf1_full.json`.
  *
  * [[ScaleBench]] measures the 27 heavy families whose 100 TB story is
  * load-bearing; this tool exists to catch the *sleeper* — a quadratic
  * plan hiding among the ~185 cheap queries that the heavy-family
  * selection skipped (an accidental cartesian product, a driver loop
  * whose iteration count grows with data, a join that silently lost
  * its equi-key). Criterion: no query's iid wall ratio should exceed
  * ~15× at 10× data (linear regime + fixed overhead + host noise).
  *
  * Corpus derivation:
  *   - documents / embeddings / events: [[ScaleBench.deriveIid]] —
  *     content-decorrelated copies (bijective letter substitution,
  *     cyclic component shift, fresh users with intact timelines).
  *   - relational tables (customer / supplier / part / orders /
  *     lineitem): each copy is a disjoint key-space replica — every
  *     synthetic key (`c_custkey`, `o_orderkey`, `o_custkey`,
  *     `s_suppkey`, `p_partkey`, `l_orderkey`, `l_partkey`,
  *     `l_suppkey`) is shifted by copy·10⁷, so every FK join lands in
  *     its own copy and join output grows exactly linearly. Non-key
  *     attributes (dates, prices, flags, nationkeys) are kept
  *     verbatim: filters select 10× the rows, group-bys keep their
  *     key cardinality where the key is an attribute and grow 10×
  *     where it is a synthetic key — both are the faithful 10×-data
  *     behaviors for those plans.
  *   - region / nation: copied verbatim. They are fixed-cardinality
  *     dimensions (5 / 25 rows at EVERY TPC-H scale factor by spec);
  *     amplifying them would be an unfaithful scale-up.
  *
  * Measurement mirrors [[ScaleBench]]: noop-sink materialization with
  * an `observe` row count, best-of-2 only for cheap runs, sentinel
  * probes bracketing the slate to flag host stall waves. Queries run
  * in name order; a query failure is recorded (`"err"`) and does not
  * abort the slate.
  *
  * `sbt "runMain graft.tools.ScaleFull [factor]"` → BENCH_sf1_full.json
  */
object ScaleFull {

  /** Disjoint-key-space replicas of the five scaling relational
    * tables, plus verbatim region/nation. `shift` must clear not just
    * the source's own keys (sf0.1 max is l_orderkey ≈ 6·10⁵) but every
    * SYNTHETIC-KEY OFFSET a query adds on top of them — q96 inserts at
    * key+10⁷, q97 at key+10⁶, q112 at key+5·10⁸ — or copy k's
    * synthetic rows collide with copy k+j's real keys and a MERGE
    * correctly refuses the duplicate source keys. 10⁹ clears them all:
    * max real key + max offset ≈ 5.006·10⁸ < 10⁹.
    */
  def deriveRel(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val shift  = 1000000000L
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    def off(k: String) = (col(k) + col("copy") * lit(shift)).as(k)

    Tables.customer(spark, src).select(col("*"), copies)
      .select(off("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")
    Tables.supplier(spark, src).select(col("*"), copies)
      .select(off("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/supplier.parquet")
    Tables.part(spark, src).select(col("*"), copies)
      .select(off("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/part.parquet")
    Tables.orders(spark, src).select(col("*"), copies)
      .select(off("o_orderkey"), off("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    Tables.lineitem(spark, src).select(col("*"), copies)
      .select(off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    Tables.region(spark, src)
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    Tables.nation(spark, src)
      .write.mode("overwrite").parquet(s"$out/nation.parquet")
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

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
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src    = "/root/testdata/sf0.1"
    val tmp    = System.getProperty("java.io.tmpdir")
    val iidDir = s"$tmp/graft_sffull_iid$factor"
    val spark  = Engine.session(32)

    ScaleBench.deriveIid(spark, src, iidDir, factor)
    deriveRel(spark, src, iidDir, factor)
    println(s"SCALEFULL corpus x$factor at $iidDir: " +
      s"${spark.read.parquet(s"$iidDir/lineitem.parquet").count()} lineitem, " +
      s"${spark.read.parquet(s"$iidDir/documents.parquet").count()} docs")

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      noop(spark.read.parquet(s"$src/region.parquet"))
      (System.nanoTime() - t0) / 1e9
    }
    sentinel()
    val sentStart = sentinel()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        // Higher re-run threshold than ScaleBench (60 s vs 30 s): the
        // full slate includes build-once indexed queries AND first-
        // apply DML shapes (CTAS + first merge) whose one-time setup at
        // 10× can alone exceed 30 s — the steady-state re-run must
        // still be taken at both scales, or the setup masquerades as a
        // scaling regression (q112's first full-slate run recorded
        // 20.7× for exactly this reason: setup-inclusive at 10×,
        // converged re-run at sf0.1).
        val (t01, n01)   = measure(fn, spark, src, rerunUnder = 60.0)
        val (tIid, nIid) = measure(fn, spark, iidDir, rerunUnder = 60.0)
        println(f"SCALEFULL $name%-34s sf0.1 $t01%7.2f s/$n01%9d   " +
          f"iid10 $tIid%7.2f s/$nIid%10d (${tIid / t01}%5.1fx)")
        name -> Right((t01, n01, tIid, nIid))
      } catch {
        case e: Throwable =>
          println(s"SCALEFULL $name ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
          name -> Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }
    }
    val sentEnd = sentinel()

    def r(d: Double) = f"$d%.3f"
    val qjson = results.map {
      case (name, Right((t01, n01, tIid, nIid))) =>
        s""""$name":{"t_sf01":${r(t01)},"rows_sf01":$n01,""" +
          s""""t_iid10":${r(tIid)},"rows_iid10":$nIid,"ratio_iid":${r(tIid / t01)}}"""
      case (name, Left(err)) =>
        val esc = err.replace("\\", "\\\\").replace("\"", "'").replace("\n", " ")
        s""""$name":{"err":"$esc"}"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (n, Left(_)) => n }
    val worst = results.collect { case (n, Right((t01, _, tIid, _))) => (n, tIid / t01) }
      .sortBy(-_._2).take(5)
    val json =
      s"""{"metric":"scale_ratio_10x_full_slate","factor":$factor,"sf_src":"$src",""" +
        s""""criteria":"every query's iid wall ratio at 10x data <= ~15x UNLESS rows_iid10 itself grew superlinearly (threshold-pair and range-join families: a fixed cosine/Jaccard/range gate has a constant per-pair tail probability, so TRUE output mass on iid data grows ~n^2 - judge those walls against the rows ratio, like the dup arm); this slate exists to catch quadratic sleepers outside ScaleBench's heavy families",""" +
        s""""n_queries":${names.size},"n_err":${errs.size},""" +
        s""""worst":[${worst.map { case (n, x) => s"""{"q":"$n","ratio":${r(x)}}""" }.mkString(",")}],""" +
        s""""sentinel":{"start":${r(sentStart)},"end":${r(sentEnd)}},""" +
        s""""queries":$qjson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_sf1_full.json"),
      (json + "\n").getBytes("UTF-8"))
    println(s"SCALEFULL wrote BENCH_sf1_full.json (${names.size} queries, ${errs.size} errors)")
    worst.foreach { case (n, x) => println(f"SCALEFULL worst: $n ${x}%5.1fx") }
    spark.stop()
  }
}
