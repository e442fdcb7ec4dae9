package graft.tools

import scala.collection.mutable.ArrayBuffer

import graft.{Engine, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Collects per-task wall-clock durations so a skew run can report the
  * actual straggler delta (max vs median task), not just total time.
  */
private final class TaskTimeListener extends SparkListener {
  private val buf = ArrayBuffer.empty[Long]
  override def onTaskEnd(end: SparkListenerTaskEnd): Unit =
    synchronized { if (end.taskInfo != null) buf += end.taskInfo.duration }
  def reset(): Unit = synchronized(buf.clear())
  def snapshot(): Vector[Long] = synchronized(buf.toVector)
}

/** Scale-up smoke: derive a 10x corpus from sf0.1 (each document /
  * embedding duplicated with fresh ids — a duplicate-heavy corpus,
  * which is exactly what a real dedup pass faces), write it to /tmp,
  * and run the novel operator families against it end-to-end.
  *
  * The point is not absolute seconds (this VM has stall waves) but
  * SHAPE: candidate counts and cluster sizes must grow like the
  * algorithm predicts (bucketed candidates ~linear in dup mass, never
  * quadratic in corpus size), connected components must still converge
  * in a handful of rounds on 10x the edges, and the blocked exact
  * all-pairs must chew n² work without any single-task blowup.
  * Results are summarized in SCALE.md.
  * `sbt "runMain graft.tools.ScaleSmoke [factor]"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skew")) {
      val spark = Engine.session(32)
      skewBench(spark)
      spark.stop()
      return
    }
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src    = "/root/testdata/sf0.1"
    val out    = s"/tmp/graft_scale$factor"
    val spark  = Engine.session(32)
    import spark.implicits._

    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables
      .documents(spark, src)
      .select(col("*"), copies)
      .select(
        (col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables
      .embeddings(spark, src)
      .select(col("*"), copies)
      .select(
        (col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"SCALE corpus: $nDocs docs, $nVecs vectors (factor $factor)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n  = f
      println(f"SCALE $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("q26 minhash+LSH pairs (banded, exact-verified)") {
      graft.QueriesDedup.q26_minhash_lsh_pairs(spark, out).count()
    }
    time("q28 simhash pairs (chunk-combination index)") {
      graft.operators.Dedup
        .simhashPairs(spark.read.parquet(s"$out/documents.parquet"), "doc_id", "text",
          n = 3, maxHamming = 3, chunks = 6)
        .count()
    }
    time("q29 blocked exact cosine pairs (n^2 dots)") {
      graft.QueriesDedup.q29_embedding_cosine_pairs(spark, out).count()
    }
    time("bucketed cosine pairs (LSH, dup regime t=0.9)") {
      graft.operators.Similarity
        .cosinePairsBucketed(spark.read.parquet(s"$out/embeddings.parquet"),
          "vec_id", "embedding", threshold = 0.9)
        .count()
    }
    time("q31 multi-table LSH topk (10 queries)") {
      graft.QueriesDedup.q31_ann_lsh_topk(spark, out).count()
    }
    time("q38 dedup clusters (connected components)") {
      graft.QueriesDedup.q38_dedup_clusters(spark, out).count()
    }
    time("q39 keep-one per cluster") {
      graft.QueriesDedup.q39_dedup_keep_one(spark, out).count()
    }
    time("q47 composed pipeline (collapse-first clusters)") {
      graft.QueriesDedup.q47_dedup_pipeline(spark, out).count()
    }
    spark.stop()
  }
}
