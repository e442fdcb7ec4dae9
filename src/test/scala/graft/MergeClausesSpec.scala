package graft

import graft.operators.{MergeClause, Upsert}
import graft.sources.Warehouse
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The full Delta MERGE clause surface (matched update/delete,
  * conditional inserts, not-matched-by-source update/delete) through
  * [[Upsert.planClauses]] and both warehouse writers
  * ([[Warehouse.mergeClauses]] COW / [[Warehouse.mergeClausesMor]]).
  */
class MergeClausesSpec extends SparkSpec {

  // target keys 1..4 and 7; source carries keys 2 (delete), 3
  // (update), 5 (insert), 6 (insert blocked by condition); keys 4 and
  // 7 are absent from the source (by-source realm: 4 deletes, 7
  // updates), key 1 is matched but no clause fires
  private def fixture = {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1), (4L, "d", 1), (7L, "g", 1))
      .toDF("k", "payload", "v")
    val src = Seq((1L, "a2", 0), (2L, "b2", 9), (3L, "c2", 9), (5L, "e", 9), (6L, "f", 9))
      .toDF("k", "payload", "v")
    (tgt, src)
  }

  private val matched = Seq(
    MergeClause.DeleteMatched(Some(col("s.k") === 2L)),
    MergeClause.UpdateMatched(Some(col("s.v") > col("t.v")), None))
  private val notMatched = Seq(
    MergeClause.InsertNotMatched(Some(col("s.k") =!= 6L), None))
  private val bySource = Seq(
    MergeClause.DeleteBySource(Some(col("t.k") === 4L)),
    MergeClause.UpdateBySource(None, Map("payload" -> lit("stale"))))

  test("planClauses classifies all five realms' outcomes") {
    val (tgt, src) = fixture
    val out = Upsert.planClauses(tgt, src, Seq("k"), matched, notMatched, bySource)
      .orderBy("k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == (("a", 1, "keep")))      // matched, no clause fires (0 !> 1)
    assert(out(2L) == (("b", 1, "delete")))    // matched delete carries the PRE-image
    assert(out(3L) == (("c2", 9, "update")))   // matched conditional update takes src
    assert(out(5L) == (("e", 9, "insert")))
    assert(!out.contains(6L), "source-only row claimed by no insert clause is dropped")
    assert(out(4L) == (("d", 1, "delete")), "by-source delete (declared first) wins key 4")
    assert(out(7L) == (("stale", 1, "update")), "by-source update applies assignments only")
  }

  test("first by-source clause wins: delete-first deletes, update-first updates") {
    import spark.implicits._
    val (tgt, src) = fixture
    // key 4 satisfies BOTH by-source clauses; delete is declared first
    val out = Upsert.planClauses(tgt, src, Seq("k"), matched, notMatched, bySource)
    assert(out.filter($"k" === 4L).select(Upsert.ActionCol).head().getString(0) == "delete")
    val flipped = Seq(bySource(1), bySource(0)) // unconditional update first
    val out2 = Upsert.planClauses(tgt, src, Seq("k"), matched, notMatched, flipped)
    assert(out2.filter($"k" === 4L).select(Upsert.ActionCol).head().getString(0) == "update")
  }

  test("matched DELETE outranks a later unconditional update") {
    import spark.implicits._
    val (tgt, src) = fixture
    val m = Seq(
      MergeClause.DeleteMatched(Some(col("s.k") === 2L)),
      MergeClause.UpdateMatched(None, None)) // unconditional SET *
    val out = Upsert.planClauses(tgt, src, Seq("k"), m, notMatched, Seq.empty)
    assert(out.filter($"k" === 2L).select(Upsert.ActionCol).head().getString(0) == "delete")
    assert(out.filter($"k" === 1L).select(Upsert.ActionCol).head().getString(0) == "update")
  }

  test("duplicate source rows matching one target row raise like Delta") {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1)).toDF("k", "payload", "v")
    val src = Seq((1L, "x", 2), (1L, "y", 3)).toDF("k", "payload", "v")
    val ex = intercept[Exception] {
      Upsert.planClauses(tgt, src, Seq("k"), matched, notMatched, Seq.empty).count()
    }
    assert(ex.getMessage.contains("multiple source rows matched"))
  }

  test("explicit SET assignments cast to the column's type and leave others") {
    import spark.implicits._
    val tgt = Seq((1L, "a", 1)).toDF("k", "payload", "v")
    val src = Seq((1L, "z", 9)).toDF("k", "payload", "v")
    val m = Seq(MergeClause.UpdateMatched(None,
      Some(Map("v" -> (col("t.v") + col("s.v")), "payload" -> lit(77)))))
    val row = Upsert.planClauses(tgt, src, Seq("k"), m, Seq.empty, Seq.empty).head()
    assert(row.getString(1) == "77", "int literal cast to the string column type")
    assert(row.getInt(2) == 10, "assignment may mix t. and s. sides")
  }

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_mergecl").toString)

  private def finalState(wh: Warehouse, layer: String): Seq[(Long, String, Int)] =
    wh.table(layer, "dim").orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"), r.getAs[Int]("v"))).toSeq

  private val expectedFinal = Seq(
    (1L, "a", 1), (3L, "c2", 9), (5L, "e", 9), (7L, "stale", 1))

  test("warehouse mergeClauses (COW): final state, metrics, feed images") {
    val (tgt, src) = fixture
    val wh = freshWh()
    wh.createOrReplace("silver", "dim", tgt)
    val m = wh.mergeClauses("silver", "dim", src, Seq("k"), matched, notMatched, bySource)
    assert(m == Upsert.MergeClauseMetrics(inserted = 1, updated = 2, deleted = 2, kept = 1))
    assert(finalState(wh, "silver") == expectedFinal)
    val feed = wh.changeFeed("silver", "dim").orderBy("k", "_change_type").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"), r.getAs[String]("payload")))
    assert(feed.toSeq == Seq(
      (2L, "delete", "b"),             // pre-image of the matched delete
      (3L, "update_postimage", "c2"),
      (3L, "update_preimage", "c"),
      (4L, "delete", "d"),             // pre-image of the by-source delete
      (5L, "insert", "e"),
      (7L, "update_postimage", "stale"),
      (7L, "update_preimage", "g")))
    // ledger records the delete count (Delta numTargetRowsDeleted)
    val op = wh.lastOperation("silver.dim").get
    assert(op.getAs[String]("operation") == "MERGE")
    assert(op.getAs[Long]("num_deleted") == 2L)
  }

  test("warehouse mergeClausesMor: same final state, zero files rewritten, reorg folds") {
    val (tgt, src) = fixture
    val wh = freshWh()
    wh.createOrReplace("silver", "dim", tgt)
    val before = wh.table("silver", "dim").inputFiles.filterNot(_.contains(".__dv")).toSet
    val m = wh.mergeClausesMor("silver", "dim", src, Seq("k"), matched, notMatched, bySource)
    assert(m == Upsert.MergeClauseMetrics(inserted = 1, updated = 2, deleted = 2, kept = 1))
    assert(finalState(wh, "silver") == expectedFinal)
    val after = wh.table("silver", "dim").inputFiles.filterNot(_.contains(".__dv")).toSet
    assert(before.subsetOf(after), "MOR merge must not rewrite existing files")
    val feedTypes = wh.changeFeed("silver", "dim").groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feedTypes == Map("insert" -> 1L, "update_preimage" -> 2L,
      "update_postimage" -> 2L, "delete" -> 2L))
    assert(wh.lastOperation("silver.dim").get.getAs[Long]("num_deleted") == 2L)
    wh.reorg("silver", "dim")
    assert(finalState(wh, "silver") == expectedFinal, "REORG preserves the merged state")
  }

  test("mergeClauses without by-source clauses is file-granular and idempotent") {
    import spark.implicits._
    val wh = freshWh()
    // two files: keys 1-2 and 1001-1002; the source only touches the first
    wh.createOrReplace("silver", "dim",
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v").repartition(1))
    wh.append("silver", "dim",
      Seq((1001L, "x", 1), (1002L, "y", 1)).toDF("k", "payload", "v").repartition(1))
    val untouchedBefore = wh.table("silver", "dim").inputFiles
      .filter(f => spark.read.parquet(f).filter($"k" >= 1000L).count() == 2).toSet
    val src = Seq((2L, "b2", 9), (7L, "g", 9)).toDF("k", "payload", "v")
    val m1 = wh.mergeClauses("silver", "dim", src, Seq("k"),
      Seq(MergeClause.UpdateMatched(Some(col("s.v") > col("t.v")), None),
        MergeClause.DeleteMatched(None)),
      Seq(MergeClause.InsertNotMatched(None, None)))
    assert(m1.inserted == 1 && m1.updated == 1 && m1.deleted == 0)
    val afterFiles = wh.table("silver", "dim").inputFiles.map(_.split('/').last).toSet
    assert(untouchedBefore.map(_.split('/').last).subsetOf(afterFiles),
      "file untouched by the merge must byte-copy, not rewrite")
    // re-run: updates lose the version rule, inserts now match → no-op commit
    val m2 = wh.mergeClauses("silver", "dim", src, Seq("k"),
      Seq(MergeClause.UpdateMatched(Some(col("s.v") > col("t.v")), None)),
      Seq(MergeClause.InsertNotMatched(None, None)))
    assert(m2.inserted == 0 && m2.updated == 0 && m2.deleted == 0)
    assert(wh.lastOperation("silver.dim").get.getAs[Long]("num_output_rows") == 0L)
  }

  test("upsertShape clauses reproduce upsert semantics exactly") {
    import spark.implicits._
    val (tgt, src) = fixture
    val (m, nm, bs) = MergeClause.upsertShape("v")
    val viaClauses = Upsert.planClauses(tgt, src, Seq("k"), m, nm, bs)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    val viaPlan = Upsert.plan(tgt, src, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(viaClauses.toSeq == viaPlan.toSeq)
  }

  test("MOR delete-only merge writes tombstones, no data files") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "dim",
      Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("k", "payload", "v"))
    val before = wh.table("silver", "dim").inputFiles.filterNot(_.contains(".__dv")).toSet
    val src = Seq((2L, "ignored", 9)).toDF("k", "payload", "v")
    val m = wh.mergeClausesMor("silver", "dim", src, Seq("k"),
      Seq(MergeClause.DeleteMatched(None)), Seq.empty)
    assert(m == Upsert.MergeClauseMetrics(0, 0, 1, 2))
    assert(wh.table("silver", "dim").inputFiles.filterNot(_.contains(".__dv")).toSet == before,
      "a delete-only MOR merge appends no data files")
    assert(finalState(wh, "silver") == Seq((1L, "a", 1), (3L, "c", 1)))
  }

  test("partitioned mergeClauses: partition-scoped slice, untouched dirs byte-identical") {
    import spark.implicits._
    val wh = freshWh()
    // three partitions; the source only references pt a and b
    wh.createOrReplacePartitioned("silver", "dim",
      Seq((1L, "a", 1, "pa"), (2L, "b", 1, "pa"), (3L, "c", 1, "pb"), (4L, "d", 1, "pc"))
        .toDF("k", "payload", "v", "pt"), Seq("pt"))
    val untouchedBefore = wh.table("silver", "dim").inputFiles
      .filter(_.contains("pt=pc")).map(_.split('/').last).toSet
    val src = Seq((2L, "b2", 9, "pa"), (3L, "ignored", 9, "pb"), (5L, "e", 9, "pb"))
      .toDF("k", "payload", "v", "pt")
    val m = wh.mergeClauses("silver", "dim", src, Seq("k"),
      Seq(MergeClause.DeleteMatched(Some(col("s.k") === 3L)),
        MergeClause.UpdateMatched(Some(col("s.v") > col("t.v")), None)),
      Seq(MergeClause.InsertNotMatched(None, None)))
    assert(m == Upsert.MergeClauseMetrics(inserted = 1, updated = 1, deleted = 1, kept = 1))
    val state = wh.table("silver", "dim").orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"), r.getAs[String]("pt"))).toSeq
    assert(state == Seq((1L, "a", "pa"), (2L, "b2", "pa"), (4L, "d", "pc"), (5L, "e", "pb")))
    // the pc partition was outside the slice: its file survives by name
    val untouchedAfter = wh.table("silver", "dim").inputFiles
      .filter(_.contains("pt=pc")).map(_.split('/').last).toSet
    assert(untouchedAfter == untouchedBefore, "untouched partition must not rewrite")
    // feed carries the delete pre-image
    val feed = wh.changeFeed("silver", "dim")
      .filter(col("_change_type") === "delete").collect()
    assert(feed.map(_.getAs[Long]("k")).toSeq == Seq(3L))
    assert(wh.lastOperation("silver.dim").get.getAs[Long]("num_deleted") == 1L)
    // by-source clause widens the slice to every partition and applies
    val m2 = wh.mergeClauses("silver", "dim", src.limit(0), Seq("k"),
      Seq.empty, Seq.empty,
      Seq(MergeClause.UpdateBySource(Some(col("t.k") === 4L),
        Map("payload" -> lit("stale")))))
    assert(m2.updated == 1)
    assert(wh.table("silver", "dim").filter($"k" === 4L)
      .select("payload").head().getString(0) == "stale")
  }

  test("insert-only merge over a duplicate-keyed source is legal (Delta parity)") {
    import spark.implicits._
    // Delta raises on duplicate matches only when a pair would MODIFY
    // the target row; the common `WHEN NOT MATCHED THEN INSERT *`
    // dedupe pattern must pass, keep the matched target row exactly
    // once, and insert every unmatched source row
    val tgt = Seq((1L, "a", 1)).toDF("k", "payload", "v")
    val src = Seq((1L, "x", 2), (1L, "y", 3), (5L, "e", 9), (5L, "e2", 9))
      .toDF("k", "payload", "v")
    val out = Upsert.planClauses(tgt, src, Seq("k"),
      Seq.empty, Seq(MergeClause.InsertNotMatched(None, None)), Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.count(_ == ((1L, "keep"))) == 1,
      "matched target row emitted once despite two matching source rows")
    assert(out.count(_._1 == 5L) == 2, "unmatched duplicates each insert")
    assert(out.length == 3)
    // ... and a conditional matched clause that fires for ANY duplicate
    // pair still raises (a modify attempt under duplicate matches)
    val m = Seq(MergeClause.UpdateMatched(Some(col("s.v") === 3), None))
    val ex = intercept[Exception] {
      Upsert.planClauses(tgt, src, Seq("k"), m,
        Seq(MergeClause.InsertNotMatched(None, None)), Seq.empty).count()
    }
    assert(ex.getMessage.contains("multiple source rows matched"))
  }

  test("warehouse mergeClauses: insert-only dedupe over a duplicate-keyed source") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "dim", Seq((1L, "a", 1)).toDF("k", "payload", "v"))
    val src = Seq((1L, "x", 2), (1L, "y", 3), (5L, "e", 9)).toDF("k", "payload", "v")
    val m = wh.mergeClauses("silver", "dim", src, Seq("k"),
      Seq.empty, Seq(MergeClause.InsertNotMatched(None, None)))
    assert(m == Upsert.MergeClauseMetrics(inserted = 1, updated = 0, deleted = 0, kept = 1))
    assert(finalState(wh, "silver") == Seq((1L, "a", 1), (5L, "e", 9)))
  }

  test("partitioned mergeClauses: a clause assigning the partition column keeps bystanders") {
    import spark.implicits._
    val wh = freshWh()
    // k=1 lives in pa; k=3 is an innocent bystander in pc — the merge
    // moves k=1 INTO pc via an explicit partition-column assignment,
    // so pc must join the slice (else the swap would replace the live
    // pc directory with only the merged row, dropping k=3)
    wh.createOrReplacePartitioned("silver", "dim",
      Seq((1L, "a", 1, "pa"), (2L, "b", 1, "pb"), (3L, "c", 1, "pc"))
        .toDF("k", "payload", "v", "pt"), Seq("pt"))
    val src = Seq((1L, "a2", 9, "pa")).toDF("k", "payload", "v", "pt")
    val m = wh.mergeClauses("silver", "dim", src, Seq("k"),
      Seq(MergeClause.UpdateMatched(None, Some(Map("pt" -> lit("pc"))))), Seq.empty)
    // kept counts slice rows only: the carried pc bystander (pb never
    // enters the slice, so it is neither rewritten nor counted)
    assert(m == Upsert.MergeClauseMetrics(inserted = 0, updated = 1, deleted = 0, kept = 1))
    val state = wh.table("silver", "dim").orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"), r.getAs[String]("pt"))).toSeq
    assert(state == Seq((1L, "a", "pc"), (2L, "b", "pb"), (3L, "c", "pc")),
      "bystander k=3 survives the partition move; pb untouched")
  }
}
