package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operator queries over the documents table: language
  * ID, quality scoring, token counting, fingerprinting (the
  * training-data-pipeline surface beyond the reference's own NLP).
  * All pure expressions; every query has a DuckDB oracle.
  */
object QueriesText {

  /** Marker-substring language-ID heuristic: count per-language marker
    * occurrences, argmax with a fixed tie order. (A real corpus would
    * use char n-gram profiles — same plan shape: per-row expression
    * scoring, no shuffle.)
    */
  def q21_lang_id(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t   = $"text"
    val sEn = TextFunctions.occurrences(t, " the ")
    val sEs = TextFunctions.occurrences(t, " el ")
    val sDe = TextFunctions.occurrences(t, " der ")
    val sFr = TextFunctions.occurrences(t, " le ")
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        sEn.as("s_en"),
        sEs.as("s_es"),
        sDe.as("s_de"),
        sFr.as("s_fr"),
        when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
          .when(sEs >= sDe && sEs >= sFr, "es")
          .when(sDe >= sFr, "de")
          .otherwise("fr")
          .as("predicted_lang")
      )
      .orderBy($"doc_id")
  }

  /** Quality scoring: token count, stop-word ratio, mean token length,
    * and a quality bucket. Relational (explode → groupBy) so the same
    * plan works at any document size without per-row array blowup.
    */
  def q22_quality_score(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select($"doc_id", explode(split($"text", "\\s+")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when($"token".isin(TextFunctions.englishStopWords: _*), 1).otherwise(0)).as("n_stop"),
        sum(length($"token")).as("sum_len")
      )
      .select(
        $"doc_id",
        $"n_tokens",
        $"n_stop",
        ($"n_stop".cast("double") / $"n_tokens").as("stop_ratio"),
        ($"sum_len".cast("double") / $"n_tokens").as("avg_token_len"),
        when($"n_tokens" >= 40 && ($"n_stop".cast("double") / $"n_tokens").between(0.05, 0.6), "good")
          .when($"n_tokens" >= 15, "ok")
          .otherwise("low")
          .as("quality")
      )
      .orderBy($"doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(len/4) pieces per word — the standard chars-per-token
    * heuristic).
    */
  def q23_token_count(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select($"doc_id", explode(split($"text", "\\s+")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(ceil(length($"token") / 4.0)).as("n_bpe_est")
      )
      .orderBy($"doc_id")
  }

  /** Document fingerprint: sha256 over the sorted distinct token set —
    * an order-invariant content signature (bag-of-words identity),
    * the cheap exact-dedup key for shuffled/re-ordered copies.
    */
  def q24_fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        sha2(concat_ws(" ", array_sort(array_distinct(split($"text", "\\s+")))), 256).as("fingerprint")
      )
      .orderBy($"doc_id")
  }

  /** PII redaction ([[graft.functions.TextFunctions.scrubPii]]) under
    * the oracle gate. The corpus is synthetic, so each document gets
    * deterministic planted PII (an email, a phone, an IP and an SSN
    * derived from doc_id) appended before scrubbing — the oracle
    * plants and scrubs with the SAME regex chain in DuckDB (patterns
    * are chosen inside the Java-regex ∩ RE2 subset), so the hash
    * compare proves redaction is cross-engine exact. Pure per-row
    * work: scrubbing never shuffles.
    */
  def q81_pii_scrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dirty = concat(
      $"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com call 555-123-4567 from 10.0."),
      ($"doc_id" % 256).cast("string"), lit(".17 ssn 123-45-6789"))
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        graft.functions.TextFunctions.scrubPii(dirty).as("clean_text"))
      .withColumn("redactions",
        regexp_count($"clean_text", lit("<(EMAIL|PHONE|IP|SSN)>")).cast("long"))
      .orderBy($"doc_id")
  }

  /** The distributed step of BPE tokenizer training: corpus-wide
    * adjacent-symbol-pair counting (Sennrich et al. 2016 — each merge
    * iteration promotes the most frequent pair). The full training
    * loop is driver-iterative over a SMALL vocab, but THIS step — one
    * pair-count pass over the whole corpus — is the part that must
    * distribute at 100 TB, and it is pure explode + groupBy: the
    * corpus shuffles only (pair, count) partials, never text. Output:
    * the top-20 first-iteration merge candidates (char pairs within
    * whitespace words, weighted by word frequency), rank-ordered with
    * a full tie-break — exact integer counts, hence a value-exact
    * oracle.
    */
  /** Fuzzy entity matching (entity resolution): which distinct part
    * names are near-identical under edit distance ≤ 2. The composed
    * shape is the one that survives scale: (1) EXACT collapse first —
    * match on the distinct-name dictionary, never the row stream
    * (64 names here stand in for the deduped entity dictionary);
    * (2) shared-token BLOCKING — candidates are pairs sharing a word,
    * an equi-join, never n²; (3) `levenshtein` verification on
    * candidates only. Both engines implement classic DP edit distance
    * (insert/delete/substitute), so the integer distances — and hence
    * the match set — are value-exact cross-engine.
    */
  def q93_fuzzy_match(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir).select($"p_name").distinct()
    val words = names.select($"p_name", explode(split($"p_name", " ")).as("word"))
    words.as("a")
      .join(words.as("b"), $"a.word" === $"b.word" && $"a.p_name" < $"b.p_name")
      .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 2)
      .orderBy($"name_a", $"name_b")
  }

  def q92_bpe_pair_counts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables
      .documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w")
      .agg(count(lit(1)).as("wc"))
    val pairs = words
      // length filter BEFORE the sequence: Spark's sequence(1, 0) is
      // the DESCENDING [1, 0], not empty — a 1-char word would emit
      // garbage pairs instead of none
      .filter(length($"w") >= 2)
      .select($"wc",
        explode(
          transform(
            sequence(lit(1), length($"w") - 1),
            i => $"w".substr(i, lit(2))
          )
        ).as("pair"))
    pairs
      .groupBy($"pair")
      .agg(sum($"wc").as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(20)
  }

  /** Declared-vs-detected language consistency: per source, how many
    * documents the marker-based detector (q21's rule) disagrees with
    * the declared `lang` column on — the metadata-quality telemetry
    * that catches a crawl feed whose language tags went stale (a
    * mixture plan that trusts bad tags mis-weights whole sources).
    * Pure per-row prediction + one sources-sized aggregate; the rate
    * is the single allowed division. Mismatch counts are honest about
    * detector reach: a language with no marker rule (zh here) always
    * mismatches, which is exactly what a coverage owner needs to see.
    */
  def q167_lang_mismatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pred = q21_lang_id(spark, dir).select($"doc_id", $"predicted_lang")
    Tables
      .documents(spark, dir)
      .select($"doc_id", $"source", $"lang")
      .join(pred, Seq("doc_id"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"predicted_lang" =!= $"lang", 1L).otherwise(0L)).as("n_mismatch"))
      .withColumn("mismatch_rate", $"n_mismatch".cast("double") / $"n_docs")
      .orderBy($"source")
  }

  /** Lexical richness per source: type/token ratio and the hapax-
    * legomenon share (types seen exactly once) — the corpus-
    * linguistics readout that separates template-stamped sources (low
    * TTR, few hapaxes) from natural or noisy ones (OCR junk shows up
    * as a hapax EXPLOSION, each error a unique type). Complements
    * q166's coverage curve: that prices a vocabulary, this profiles
    * the sources feeding it. One token-keyed shuffle to the per-
    * source term table, then a sources-sized rollup.
    */
  def q189_hapax_richness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables
      .documents(spark, dir)
      .select($"source", explode(split($"text", "\\s+")).as("token"))
      .filter($"token" =!= "")
    tok
      .groupBy($"source", $"token")
      .agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(
        sum($"c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("hapax"))
      .select($"source", $"n_tokens", $"n_types", $"hapax",
        round($"n_types".cast("double") / $"n_tokens", 6).as("ttr"),
        round($"hapax".cast("double") / $"n_types", 6).as("hapax_share"))
      .orderBy($"source")
  }

  /** BM25 lexical retrieval (Robertson–Spärck Jones, the Lucene
    * idf form) for a fixed keyword query — the sparse complement to
    * the dense ANN family (q30/q86): top-20 documents by
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    * k1 = 1.2, b = 0.75. Only documents CONTAINING a query term ever
    * materialize a row (the tf filter is the inverted-index shape —
    * posting lists, not a corpus scan per query); corpus stats enter
    * as a 1-row broadcast; per-term scores cast to DECIMAL before the
    * per-doc sum so the ranking is order-independent, and top-k is a
    * TakeOrderedAndProject.
    */
  def q198_bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val terms = Seq("table", "scan", "fast")
    val tok = Tables
      .documents(spark, dir)
      .select($"doc_id", explode(split($"text", "\\s+")).as("token"))
      .filter($"token" =!= "")
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = broadcast(
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl")))
    val tf = tok.filter($"token".isin(terms: _*))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val avgdl = $"total_dl".cast("double") / $"n_docs"
    val idf   = log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    val denom = $"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl" / avgdl))
    tf
      .join(df, Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select($"doc_id",
        (idf * ($"tf" * lit(2.2)) / denom).cast(DecimalType(18, 12)).as("term"))
      .groupBy($"doc_id")
      .agg(sum($"term").as("s"))
      .orderBy($"s".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", round($"s".cast("double"), 6).as("score"))
      .orderBy($"doc_id")
  }

  /** Top-k bigram collocations by pointwise mutual information —
    * PMI = ln p(ab) / (p(a)·p(b)) over adjacent-token bigrams with a
    * c(ab) ≥ 5 support floor (PMI without a floor surfaces noise:
    * singleton pairs of rare words max the score). The collocation
    * table is what multi-word-expression tokenizers and phrase-aware
    * dedup key on. Counts are exact integers; the two corpus totals
    * enter as 1-row broadcasts; the only data-sized shuffles are the
    * unigram and bigram count aggregates, and top-k is a
    * TakeOrderedAndProject on the unrounded score.
    */
  def q190_pmi_collocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables
      .documents(spark, dir)
      .select(expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("arr"))
    val uni = toks
      .select(explode($"arr").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
    val bi = toks
      .filter(size($"arr") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "i -> struct(element_at(arr, i) AS a, element_at(arr, i + 1) AS b))")).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
    val nb = bi.agg(sum($"c_ab").as("n_b"))
    val ut = uni.agg(sum($"c").as("u"))
    bi
      .filter($"c_ab" >= 5)
      .join(uni.select($"t".as("a"), $"c".as("c_a")), Seq("a"))
      .join(uni.select($"t".as("b"), $"c".as("c_b")), Seq("b"))
      .crossJoin(broadcast(nb))
      .crossJoin(broadcast(ut))
      .select(
        concat_ws(" ", $"a", $"b").as("bigram"),
        $"c_ab",
        log(($"c_ab" / $"n_b".cast("double")) /
          (($"c_a" / $"u".cast("double")) * ($"c_b" / $"u".cast("double")))).as("pmi"))
      .orderBy($"pmi".desc, $"bigram")
      .limit(50)
      .select($"bigram", $"c_ab", round($"pmi", 6).as("pmi"))
      .orderBy($"bigram")
  }
}
