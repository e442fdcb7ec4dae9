package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.{Window => WSpec}
import org.apache.spark.sql.functions._

/** Slate-wide structural lint: no registered query may plan an
  * unpartitioned Window over an UNBOUNDED frame — the one window shape
  * that cannot scale (Spark moves every row to a single reducer).
  * Three consecutive rounds found stragglers of this class by hand
  * (q173 → q75/q163 → q177/q149/q150/q166); this gate makes the class
  * unreintroducible: every `SparkEntry.queries` plan is walked at
  * sf0.001 with all adaptive operators FORCED onto their scale paths
  * (the small-input paths legitimately keep the plain window — that is
  * the adaptive point — so the lint must look at the shape the plan
  * takes when the size estimate says "big").
  *
  * "Bounded" is STRUCTURAL, not statistical: a limit, a global (no-key)
  * aggregate, a driver-local relation, a literal range — or any
  * row-preserving/shrinking composition of those. An aggregate over an
  * unbounded child with grouping keys is NOT bounded (the key space can
  * grow with the data). The allowlist below is EMPTY — every query is
  * structurally clean; a new query wanting an unpartitioned window must
  * either restructure ([[graft.operators.Ranks]], limit top-k,
  * Materialize-once + broadcast scalar attach — the q65 discipline) or
  * argue a domain bound here in review.
  */
class WindowLintSpec extends SparkSpec {

  /** Unpartitioned windows whose frame the plan cannot bound — the
    * offending shape. Subquery plans are walked too.
    */
  private def offendersOf(plan: LogicalPlan): Seq[Window] =
    (plan +: plan.subqueriesAll).flatMap(_.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
    })

  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit                          => true // limit top-k
    // a BARE LocalLimit bounds rows per PARTITION only — limit×parts
    // rows still reach a single-reducer window; only its GlobalLimit
    // pair (matched above) bounds the frame
    case l: LocalLimit                           => bounded(l.child)
    case a: Aggregate if a.groupingExpressions.isEmpty => true // 1 row
    case _: OneRowRelation                       => true
    case _: LocalRelation                        => true // driver-built rows
    // a range is only bounded when its LITERAL size is small — a
    // spark.range(n) with n computed from corpus size at the driver
    // is exactly the unbounded ladder the lint exists to block
    case r: Range                                => r.numElements <= BigInt(1L << 20)
    case a: Aggregate                            => bounded(a.child)
    case j: Join                                 => bounded(j.left) && bounded(j.right)
    case _: Generate                             => false // explode multiplies
    case other if other.children.nonEmpty        => other.children.forall(bounded)
    case _                                       => false // file/stream leaves
  }

  /** Queries whose unpartitioned windows run over frames bounded by the
    * DOMAIN, not the data — each entry must name the bound. EMPTY since
    * the q65/q137/q164 scalar windows were converted to
    * Materialize-once + 1-row broadcast attaches (round 18); a new
    * query wanting an entry must argue its bound here in review.
    */
  private val allow: Map[String, String] = Map.empty

  test("the lint flags the retired shape and passes bounded ones") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.withColumn("rn", row_number().over(WSpec.orderBy(col("doc_id"))))
    assert(offendersOf(bad.queryExecution.optimizedPlan).nonEmpty,
      "a global rank over a bare scan must be flagged")
    val scalarWin = docs.withColumn("n", count(lit(1)).over(WSpec.partitionBy()))
    assert(offendersOf(scalarWin.queryExecution.optimizedPlan).nonEmpty,
      "an empty-partition scalar window over a bare scan must be flagged")
    val topk = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(10)
      .withColumn("rn", row_number().over(WSpec.orderBy(col("n_chars").desc, col("doc_id"))))
    assert(offendersOf(topk.queryExecution.optimizedPlan).isEmpty,
      "a limit-bounded rank must pass")
    val oneRow = docs.agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(WSpec.orderBy(col("n"))))
    assert(offendersOf(oneRow.queryExecution.optimizedPlan).isEmpty,
      "a global-aggregate (1-row) frame must pass")
    val hugeRange = spark.range(100000000L)
      .withColumn("rn", row_number().over(WSpec.orderBy(col("id"))))
    assert(offendersOf(hugeRange.queryExecution.optimizedPlan).nonEmpty,
      "a rank over a corpus-sized generated range must be flagged")
    val smallRange = spark.range(100L)
      .withColumn("rn", row_number().over(WSpec.orderBy(col("id"))))
    assert(offendersOf(smallRange.queryExecution.optimizedPlan).isEmpty,
      "a rank over a small literal range must pass")
  }

  test("no registered query plans an unpartitioned window over an unbounded frame (scale paths forced)") {
    graft.operators.Ranks.thresholdOverride = Some(0L)
    graft.operators.Quantiles.thresholdOverride = Some(0L)
    val savedDsir = QueriesCorpus.dsirRankThresholdBytes
    QueriesCorpus.dsirRankThresholdBytes = 0L
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        if (allow.contains(name)) None
        else {
          val n = offendersOf(fn(spark, sfDir).queryExecution.optimizedPlan).size
          if (n == 0) None else Some(s"$name ($n)")
        }
      }
      assert(offenders.isEmpty,
        s"unpartitioned windows over unbounded frames in: ${offenders.mkString(", ")} — " +
          "use graft.operators.Ranks.withGlobalRowNumber (exact distributed global ranks), " +
          "an orderBy().limit(k) top-k (TakeOrderedAndProject), or a broadcast 1-row " +
          "aggregate attach; a genuinely domain-bounded frame needs a justified allowlist " +
          "entry in WindowLintSpec")
      // allowlist hygiene: every entry must still name a live query
      val stale = allow.keySet -- SparkEntry.queries.keySet
      assert(stale.isEmpty, s"allowlist names unregistered queries: $stale")
    } finally {
      graft.operators.Ranks.thresholdOverride = None
      graft.operators.Quantiles.thresholdOverride = None
      QueriesCorpus.dsirRankThresholdBytes = savedDsir
    }
  }
}
