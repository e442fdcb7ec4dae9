package graft

import graft.operators.{Dedup, Upsert}
import graft.functions.TextFunctions
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §7.5a): surrogate-key stability,
  * upsert row preservation and version monotonicity, dedup symmetry.
  * Uses ScalaCheck generators with explicit seeded sampling (the
  * scalatest-scalacheck bridge artifact is not on the offline
  * classpath).
  */
class PropertySpec extends SparkSpec {

  private val sampleRnd = new scala.util.Random(7)
  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 8).foreach(_ => f(sample(ga), sample(gb)))
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 8).foreach(_ => f(sample(ga)))
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val keyGen = Gen.chooseNum(0L, 30L)
  private val verGen = Gen.chooseNum(1, 5)
  private val rowsGen = Gen.listOfN(12, Gen.zip(keyGen, Gen.alphaStr.map(_.take(6)), verGen))

  test("upsert preserves the key union and never lowers a version") {
    import spark.implicits._
    forAll(rowsGen, rowsGen) { (t, s) =>
      whenever(t.nonEmpty && s.nonEmpty) {
        val tgt = t.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "payload", "v")
        val src = s.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "payload", "v")
        val out = Upsert.plan(tgt, src, Seq("k"), "v").collect()
        val tgtMap = t.groupBy(_._1).map { case (k, vs) => k -> vs.head._3 }
        val keys = out.map(_.getLong(0)).toSet
        assert(keys == (tgtMap.keySet ++ s.map(_._1)))
        // per-key version is >= the target's version (never downgraded)
        out.foreach { r =>
          tgtMap.get(r.getLong(0)).foreach(tv => assert(r.getInt(2) >= tv))
        }
      }
    }
  }

  test("surrogate keys are stable and injective over (id, version) at test sizes") {
    import spark.implicits._
    forAll(Gen.listOfN(20, Gen.zip(Gen.alphaNumStr.map(_.take(8)), verGen))) { pairs =>
      whenever(pairs.nonEmpty) {
        import org.apache.spark.sql.functions._
        val df = pairs.toDF("id", "v")
          .select(sha2(concat_ws("||", col("id"), col("v")), 256).as("sk"), col("id"), col("v"))
        val n = df.select("id", "v").distinct().count()
        assert(df.select("sk").distinct().count() == n)
        // deterministic: recomputation yields identical keys
        val again = pairs.toDF("id", "v")
          .select(sha2(concat_ws("||", col("id"), col("v")), 256).as("sk"))
        assert(df.select("sk").collect().toSet == again.collect().toSet)
      }
    }
  }

  test("lemmatizer never emits tokens of length <= 2 and is idempotent on its own output") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tokGen = Gen.listOfN(8, Gen.oneOf("studies", "glasses", "cats", "cat", "bus",
      "analysis", "ran", "xy", "a", "windows", "pass"))
    forAll(tokGen) { toks =>
      val out = Seq(toks).toDF("t")
        .select(TextFunctions.lemmatize(col("t")).as("l"))
        .head().getSeq[String](0)
      assert(out.forall(_.length > 2))
      val again = Seq(out).toDF("t")
        .select(TextFunctions.lemmatize(col("t")).as("l"))
        .head().getSeq[String](0)
      assert(again == out)
    }
  }

  test("indexed incremental dedup over any batch split unions to the one-shot LSH pair set") {
    import spark.implicits._
    // random dup-prone corpora (small vocab → frequent shared shingles),
    // random 3-way batch split: probing a growing index batch-by-batch
    // must emit each pair exactly once, whatever the split — the
    // invariant DocStreams' exactly-once layout rests on.
    val vocab  = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.listOfN(10, Gen.zip(Gen.chooseNum(0, 2), Gen.listOfN(6, vocab).map(_.mkString(" "))))
    forAll(docGen) { docs =>
      whenever(docs.nonEmpty) {
        val all = docs.zipWithIndex.map { case ((slot, text), i) => (i.toLong, slot, text) }
        val allDf = all.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
        var idxSets  = Seq.empty[(Long, Seq[String])].toDF("doc_id", "shingle_set")
        var idxBands = Seq.empty[(Long, Int, Long)].toDF("doc_id", "band", "h")
        var got      = Set.empty[(Long, Long)]
        for (slot <- 0 to 2) {
          val bDf = all.filter(_._2 == slot).map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
          val bSets  = Dedup.nearDupSets(bDf, "doc_id", "text", n = 2)
          val bBands = Dedup.nearDupBandRows(bSets, "doc_id", k = 16, bands = 8)
          got ++= Dedup
            .incrementalNearDupPairsIndexed(idxSets, idxBands, bSets, bBands, "doc_id", 0.5)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          idxSets = idxSets.unionByName(bSets)
          idxBands = idxBands.unionByName(bBands)
        }
        val oneShot = Dedup
          .minhashLshPairs(allDf, "doc_id", "text", n = 2, k = 16, bands = 8, threshold = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == oneShot, s"batchwise union $got != one-shot $oneShot")
      }
    }
  }

  test("native hammingBits equals the HOF form on random strings, including ragged lengths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // length >= 1: on an EMPTY left side the HOF's sequence(0, -1)
    // descends to [0, -1] and produces a nonsense distance of 2 — an
    // artifact, not semantics; signatures are never empty
    val ragged = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, Gen.oneOf('0', '1')).map(_.mkString))
    forAll(ragged, ragged) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(Dedup.hammingBits(col("a"), col("b"))).head().getInt(0)
      val hof    = df.select(Dedup.hammingBitsHof(col("a"), col("b"))).head().getInt(0)
      assert(native == hof, s"native $native != HOF $hof for ('$a','$b')")
    }
  }

  test("hammingBits is symmetric, zero on identity, bounded by length") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bits = Gen.listOfN(16, Gen.oneOf('0', '1')).map(_.mkString)
    forAll(bits, bits) { (a, b) =>
      val Seq(ab, ba, aa) = Seq((a, b), (b, a), (a, a)).map { case (x, y) =>
        Seq((x, y)).toDF("a", "b").select(Dedup.hammingBits(col("a"), col("b"))).head().getInt(0)
      }
      assert(ab == ba)
      assert(aa == 0)
      assert(ab >= 0 && ab <= 16)
    }
  }

  test("bucketed range join equals the nested-loop reference on random intervals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val microsGen = Gen.chooseNum(-5000000L, 5000000L) // spans the epoch: negative buckets too
    val spanGen   = Gen.chooseNum(0L, 3000000L)
    val ptsGen    = Gen.listOfN(40, microsGen)
    val ivsGen    = Gen.listOfN(10, Gen.zip(microsGen, spanGen))
    val widthGen  = Gen.oneOf(700000L, 1000000L, 2500000L)
    forAll(Gen.zip(ptsGen, ivsGen, widthGen)) { case (ps, ivs, width) =>
      val points = ps.zipWithIndex.map { case (m, i) => (i.toLong, m) }
        .toDF("pid", "m").select($"pid", timestamp_micros($"m").as("ts"))
      val intervals = ivs.zipWithIndex.map { case ((s, span), i) => (i.toLong, s, s + span) }
        .toDF("iid", "s", "e")
        .select($"iid", timestamp_micros($"s").as("lo"), timestamp_micros($"e").as("hi"))
      val got = graft.operators.RangeJoin
        .pointInInterval(points, intervals, "ts", "lo", "hi", width)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width=$width: $got != $naive")
    }
  }

  // ---- full-clause MERGE ≡ a row-by-row reference interpreter ----
  // Conditions are structured ((s|t).k % mod == res) so the Column and
  // Scala forms derive from the same data and cannot drift.
  private case class MCond(onSrc: Boolean, mod: Long, res: Long)
  private def mcCol(c: MCond): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col(s"${if (c.onSrc) "s" else "t"}.k") % c.mod === c.res
  }
  private def mcEval(c: MCond, tk: Long, sk: Long): Boolean =
    (if (c.onSrc) sk else tk) % c.mod == c.res

  private sealed trait MSpec
  private case class MDel(c: Option[MCond]) extends MSpec
  private case class MUpd(c: Option[MCond], star: Boolean) extends MSpec
  private case class ISpec(c: Option[MCond])
  private sealed trait BSpec
  private case class BDel(c: Option[MCond]) extends BSpec
  private case class BUpd(c: Option[MCond]) extends BSpec

  test("planClauses equals the row-by-row clause interpreter on random inputs") {
    import spark.implicits._
    import graft.operators.MergeClause
    import org.apache.spark.sql.functions.lit
    val condGen = Gen.option(for {
      onSrc <- Gen.oneOf(true, false)
      m     <- Gen.chooseNum(2L, 4L)
      r     <- Gen.chooseNum(0L, m - 1)
    } yield MCond(onSrc, m, r))
    def srcCond = condGen.map(_.map(_.copy(onSrc = true)))
    def tgtCond = condGen.map(_.map(_.copy(onSrc = false)))
    val mGen = Gen.listOfN(2, Gen.oneOf(
      condGen.map(MDel(_): MSpec),
      Gen.zip(condGen, Gen.oneOf(true, false)).map { case (c, s) => MUpd(c, s): MSpec }))
    val iGen = Gen.listOfN(1, srcCond.map(ISpec(_)))
    val bGen = Gen.listOfN(2, Gen.oneOf(
      tgtCond.map(BDel(_): BSpec), tgtCond.map(BUpd(_): BSpec)))

    forAll(Gen.zip(rowsGen, rowsGen), Gen.zip(mGen, iGen, bGen)) { case ((t, s), (ms, is, bs)) =>
      whenever(t.nonEmpty && s.nonEmpty) {
        val tRows = t.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
        val sRows = s.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
        val matched = ms.map {
          case MDel(c)       => MergeClause.DeleteMatched(c.map(mcCol))
          case MUpd(c, true) => MergeClause.UpdateMatched(c.map(mcCol), None)
          case MUpd(c, false) =>
            MergeClause.UpdateMatched(c.map(mcCol), Some(Map("payload" -> lit("U"))))
        }
        val notMatched = is.map(i => MergeClause.InsertNotMatched(i.c.map(mcCol), None))
        val bySource = bs.map {
          case BDel(c) => MergeClause.DeleteBySource(c.map(mcCol))
          case BUpd(c) =>
            MergeClause.UpdateBySource(c.map(mcCol), Map("payload" -> lit("S")))
        }
        // reference interpreter over the same rows
        val sByK = sRows.map(r => r._1 -> r).toMap
        val tKeys = tRows.map(_._1).toSet
        val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int, String)]
        tRows.foreach { case (tk, tp, tv) =>
          sByK.get(tk) match {
            case Some((sk, sp, sv)) =>
              ms.find {
                case MDel(c)    => c.forall(mcEval(_, tk, sk))
                case MUpd(c, _) => c.forall(mcEval(_, tk, sk))
              } match {
                case Some(MDel(_))        => expected += ((tk, tp, tv, "delete"))
                case Some(MUpd(_, true))  => expected += ((sk, sp, sv, "update"))
                case Some(MUpd(_, false)) => expected += ((tk, "U", tv, "update"))
                case None                 => expected += ((tk, tp, tv, "keep"))
              }
            case None =>
              bs.find {
                case BDel(c) => c.forall(mcEval(_, tk, tk))
                case BUpd(c) => c.forall(mcEval(_, tk, tk))
              } match {
                case Some(BDel(_)) => expected += ((tk, tp, tv, "delete"))
                case Some(BUpd(_)) => expected += ((tk, "S", tv, "update"))
                case None          => expected += ((tk, tp, tv, "keep"))
              }
          }
        }
        sRows.filterNot(r => tKeys.contains(r._1)).foreach { case (sk, sp, sv) =>
          if (is.exists(_.c.forall(mcEval(_, sk, sk))))
            expected += ((sk, sp, sv, "insert"))
        }
        val out = Upsert.planClauses(
            tRows.toDF("k", "payload", "v"), sRows.toDF("k", "payload", "v"),
            Seq("k"), matched, notMatched, bySource)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
        assert(out.sorted.toSeq == expected.sortBy(identity).toSeq,
          s"clauses ms=$ms is=$is bs=$bs")
      }
    }
  }
}
