package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. 2016) -- the full driver
  * loop around q92's distributed pair-counting step. The reference
  * pipeline's text stage stops at token counting; a training-data
  * engine needs the tokenizer-training primitive itself.
  *
  * Scale shape: the corpus collapses ONCE to the distinct-word
  * dictionary with frequencies -- the classic BPE training state,
  * |vocab| rows (millions at 100 TB), never |corpus| -- and every
  * iteration after that touches only the dictionary: one
  * explode+groupBy pair count (only (pair, count) partials shuffle), a
  * driver-side argmax of a single row, and one higher-order-function
  * pass applying the merge to the symbol arrays. The dictionary is
  * re-materialized each iteration ([[Materialize]]) so the plan stays
  * constant-size instead of growing with the merge count -- the same
  * iterative-loop discipline as [[Graph]]'s component fixpoints.
  */
object Bpe {

  /** One recorded merge: the pair chosen and its corpus count at
    * selection time.
    */
  final case class Merge(left: String, right: String, count: Long)

  // pair fields are joined with a char no whitespace-split word can
  // contain, so (left, right) round-trips through one string key
  private val Sep = "\u0000"

  /** Left-to-right, non-overlapping application of merge (a, b) -> ab
    * to a symbol array -- the greedy pass BPE defines ("aaa" under
    * (a,a) becomes ["aa","a"]). A single codegen-friendly fold: the
    * accumulator carries the emitted prefix and one pending symbol.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    val init  = struct(empty.as("out"), lit(null).cast("string").as("carry"))
    def flush(st: Column): Column =
      when(st.getField("carry").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("carry"))))
    aggregate(
      syms,
      init,
      (st, s) =>
        when(st.getField("carry") === lit(a) && s === lit(b),
          struct(concat(st.getField("out"), array(lit(a + b))).as("out"),
            lit(null).cast("string").as("carry")))
          .otherwise(struct(flush(st).as("out"), s.as("carry"))),
      st => flush(st)
    )
  }

  /** The word-frequency dictionary as symbol arrays: the corpus's ONLY
    * full pass. Whitespace words, split to characters.
    */
  private def dictionary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wc"))
      .select(split(col("w"), "").as("syms"), col("wc"))

  /** Train `numMerges` BPE merges over the corpus. Deterministic: the
    * argmax tie-breaks on (count desc, pair asc) -- the same rank rule
    * as q92's candidate list, whose top-1 is by construction this
    * loop's first merge. Stops early if no pair remains.
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    var words  = Materialize(dictionary(docs, textCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done   = false
    for (_ <- 0 until numMerges if !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("wc"),
          explode(
            zip_with(
              slice(col("syms"), lit(1), size(col("syms")) - 1),
              slice(col("syms"), lit(2), size(col("syms")) - 1),
              (x, y) => concat(x, lit(Sep), y))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val parts = top.head.getString(0).split(Sep, 2)
        val (a, b) = (parts(0), parts(1))
        merges += Merge(a, b, top.head.getLong(1))
        words = Materialize(
          words.select(applyMerge(col("syms"), a, b).as("syms"), col("wc")))
      }
    }
    merges.toSeq
  }

  /** ENCODE with a trained merge list: the distinct words of `docs`
    * tokenized under the merges, in training order — (word, tokens).
    * Same dictionary discipline as [[bpeTrain]]: work is O(|vocab| ×
    * merges), never O(corpus); the corpus rejoins through the word.
    */
  def bpeEncodeWords(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val syms = merges.foldLeft(split(col("w"), ""): Column) {
      case (acc, Merge(a, b, _)) => applyMerge(acc, a, b)
    }
    words.select(col("w"), syms.as("tokens"))
  }

  /** Per-document token counts under a trained tokenizer — the real
    * count the chunking/packing operators budget by (q23's heuristic
    * estimate replaced with the tokenizer's own arithmetic). One
    * dictionary encode (O(|vocab|)), one broadcast-able join back onto
    * the exploded corpus, one per-doc sum.
    */
  def bpeTokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]
  ): DataFrame = {
    val perWord = bpeEncodeWords(docs, textCol, merges)
      .select(col("w"), size(col("tokens")).as("wn"))
    docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .join(perWord, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("wn")).as("n_tokens"))
  }
}
