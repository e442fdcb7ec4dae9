package graft.tools

import graft.{Engine, Tables}
import graft.operators.{Dedup, Graph, Materialize}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the graph/dedup family (q38/q39/q47/
  * q53/q143/q213/q214) — splits each composition into its pipeline
  * stages and reports per-stage wall time plus the JOB and STAGE count
  * the stage submitted, so overhead-dominated loops (many tiny jobs)
  * separate from compute-dominated stages before anything is rewritten.
  * Best-of-2 per stage (JIT + host-stall guard, same as PerfProbe).
  * `sbt "runMain graft.tools.GraphProbe [sfDir]"`.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(32)
    val jobs   = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    def time(name: String)(f: => Any): Unit = {
      def once: (Double, Int, Int) = {
        val j0 = jobs.get(); val s0 = stages.get()
        val t0 = System.nanoTime(); f
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, stages.get() - s0)
      }
      val a = once; val b = once
      val best = if (a._1 <= b._1) a else b
      println(f"PROBE ${name}%-44s ${best._1}%7.2f s  jobs=${best._2}%3d stages=${best._3}%3d")
    }
    val docs = Tables.documents(spark, dir)

    // --- q38 path: pairs on FULL docs, then propagation components ---
    time("A shingleSets(docs) count") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).filter(size(col("shingle_set")) > 0).count()
    }
    time("B ngramJaccardPairs(docs) count") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    val pairsM = Materialize(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).select(col("id_a"), col("id_b")))
    time("C components(pairs) [propagate]") {
      Graph.connectedComponents(pairsM, "id_a", "id_b").count()
    }
    time("D componentsStar(pairs) [q53 alg]") {
      Graph.connectedComponentsStar(pairsM, "id_a", "id_b").count()
    }
    time("E pagerankInt(pairs) [q213 tail]") {
      Graph.pagerankInt(pairsM, "id_a", "id_b").count()
    }
    time("F capDegree(pairs) [q214 cap]") {
      Graph.capDegree(pairsM, "id_a", "id_b", "id_a", 2).count()
    }

    // --- q47/q39/q143 path: collapse-first nearDupClusters ---
    time("G nearDupClusters(docs) [q47 full]") {
      Graph.nearDupClusters(docs, "doc_id", "text", 3, 0.5).count()
    }
    // withRep sub-stage of nearDupClusters
    time("H exact-collapse window [withRep]") {
      import org.apache.spark.sql.expressions.Window
      val keyed = docs
        .filter(size(split(col("text"), "\\s+")) >= 3)
        .select(col("doc_id").as("id"), col("text").as("txt"), sha2(col("text"), 256).as("ck"))
      Materialize(
        keyed.withColumn("rep_id", min(col("id")).over(Window.partitionBy(col("ck"))))).count()
    }

    // --- q143 LM tail over the cluster members ---
    time("I q143 LM scoring tail") {
      val comps = Graph
        .nearDupClusters(docs, "doc_id", "text", 3, 0.5)
        .select(col("id").as("doc_id"), col("cluster_id"))
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      val tf    = Materialize(tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
      val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("c_tok"))
      val nTot  = vocab.agg(sum(col("c_tok"))).head().getLong(0)
      val mTf   = tf.join(comps.select(col("doc_id")), Seq("doc_id"), "left_semi")
      val nDoc  = mTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tokens"))
      import org.apache.spark.sql.types.DecimalType
      val lm = mTf
        .join(vocab, Seq("token"))
        .select(col("doc_id"),
          (col("tf") * -log(col("c_tok") / lit(nTot.toDouble)))
            .cast(DecimalType(18, 12)).as("term"))
        .groupBy(col("doc_id")).agg(sum(col("term")).as("s"))
        .join(nDoc, Seq("doc_id"))
      comps.join(lm, Seq("doc_id")).groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
