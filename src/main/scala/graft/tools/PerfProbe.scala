package graft.tools

import graft.{Engine, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the expensive queries — tells you WHICH
  * stage of a pipeline dominates before you optimize the wrong one.
  * Best-of-2 per stage (JIT + host-stall guard, same as Bench).
  * `sbt "runMain graft.tools.PerfProbe [sfDir]"`.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(32)
    def time(name: String)(f: => Long): Unit = {
      def once: Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t = math.min(once, once)
      println(f"PROBE $name%-40s $t%7.2f s")
    }
    val docs = Tables.documents(spark, dir)

    time("shingleSets count") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).filter(size(col("shingle_set")) > 0).count()
    }
    time("minhash signatures only") {
      Dedup
        .shingleSets(docs, "doc_id", "text", 3)
        .filter(size(col("shingle_set")) > 0)
        .select(col("doc_id"), Dedup.minhashBaseHashes(col("shingle_set")).as("bh0"))
        .select(col("doc_id"), Dedup.minhashFromHashes(col("bh0"), 64).as("sig"))
        .select(sum(size(col("sig"))))
        .head()
        .getLong(0)
    }
    time("q26 full minhash+LSH pairs") {
      graft.QueriesDedup.q26_minhash_lsh_pairs(spark, dir).count()
    }
    time("q25 exact jaccard pairs") {
      graft.QueriesDedup.q25_ngram_jaccard_pairs(spark, dir).count()
    }
    time("q31 corpus bucketing only") {
      val emb    = Tables.embeddings(spark, dir)
      val planes = (0 until 16).map(t => graft.operators.Similarity.hyperplanes(4, 64, 42L + t))
      emb
        .select(
          col("vec_id"),
          explode(array(planes.zipWithIndex.map { case (p, t) =>
            concat(lit(s"$t:"), graft.operators.Similarity.lshBucket(col("embedding"), p))
          }: _*)).as("bucket")
        )
        .count()
    }
    time("q31 full multi-table topk") {
      graft.QueriesDedup.q31_ann_lsh_topk(spark, dir).count()
    }
    time("q38 connected components") {
      graft.QueriesDedup.q38_dedup_clusters(spark, dir).count()
    }
    time("q27 simhash signatures") {
      graft.QueriesDedup.q27_simhash(spark, dir).count()
    }
    spark.stop()
  }
}
