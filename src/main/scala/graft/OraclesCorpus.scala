package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesCorpus (LLM-corpus curation, analytics, clustering)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesCorpus {
  /** q191: the q66 8-gram shingle CTE with q180's content-addressed
    * split riding along — an eval-split doc leaks if any of its grams
    * EXISTS in the train-split gram set.
    */
  private def q191Sql: String = {
    val gram = (1 to 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH sp AS (
       |  SELECT doc_id, text,
       |         CASE WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |              WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |t AS (SELECT doc_id, split, string_split_regex(text, '\\s+') AS toks FROM sp),
       |sh AS (SELECT doc_id, split, unnest(list_distinct(list_transform(range(len(toks) - 7),
       |         i -> $gram))) AS s
       |       FROM t WHERE len(toks) >= 8),
       |train AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
       |leaked AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE split <> 'train' AND s IN (SELECT s FROM train))
       |SELECT sp.split,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN leaked.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS leaked_docs,
       |       round(CAST(sum(CASE WHEN leaked.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS BIGINT), 6) AS leak_rate
       |FROM sp LEFT JOIN leaked USING (doc_id)
       |WHERE sp.split <> 'train'
       |GROUP BY sp.split ORDER BY sp.split""".stripMargin
  }

  /** q197: the Pearson matrix — per-signal moment sums as DECIMAL(19,0)
    * of integers (exact), combined in DOUBLE with the engine's exact
    * op sequence; the three pairs share one generated template.
    */
  private def q197Sql: String = {
    def p(x: String, y: String, alias: String): String = {
      def s(c: String)            = s"CAST(sum(CAST($c AS DECIMAL(19,0))) AS DOUBLE)"
      def s2(a: String, b: String) =
        s"CAST(sum(CAST($a AS DECIMAL(19,0)) * CAST($b AS DECIMAL(19,0))) AS DOUBLE)"
      val n = "CAST(count(*) AS DOUBLE)"
      s"""round(($n * ${s2(x, y)} - ${s(x)} * ${s(y)}) /
         |  sqrt(($n * ${s2(x, x)} - ${s(x)} * ${s(x)}) *
         |       ($n * ${s2(y, y)} - ${s(y)} * ${s(y)})), 6) AS $alias""".stripMargin
    }
    s"""WITH sig AS (
       |  SELECT source, n_chars AS len,
       |         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS toks,
       |         len(list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS types
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       ${p("len", "toks", "r_len_toks")},
       |       ${p("len", "types", "r_len_types")},
       |       ${p("toks", "types", "r_toks_types")}
       |FROM sig GROUP BY source ORDER BY source""".stripMargin
  }

  private val primary: Map[String, String] = Map(
    // q125: q66's shingle convention (raw whitespace split, distinct
    // 8-grams, docs with >= 8 tokens), eval side collapsed to a
    // distinct-gram universe, corpus side LEFT-joined so clean docs
    // keep a 0.0 row
    "q125_contamination_fraction" -> {
      val gram = (1 to 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 7),
        |         i -> $gram))) AS s
        |       FROM t WHERE len(toks) >= 8),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 = 0)
        |SELECT c.doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |       round(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 6) AS contamination
        |FROM sh c LEFT JOIN ev ON c.s = ev.s
        |WHERE c.doc_id % 5 != 0
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q58_repetition" ->
      """WITH arrs AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS arr
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens,
        |         unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i + 1])) AS bigram
        |  FROM arrs WHERE len(arr) >= 2),
        |cnt AS (SELECT doc_id, n_tokens, bigram, count(*) AS c FROM big GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT doc_id, n_tokens, bigram, c,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn,
        |         sum(CASE WHEN c > 1 THEN c ELSE 0 END) OVER (PARTITION BY doc_id) AS dup_slots
        |  FROM cnt)
        |SELECT doc_id, n_tokens, bigram AS top_bigram, c AS top_count,
        |       round(c / (n_tokens - 1.0), 6) AS top_bigram_frac,
        |       round(dup_slots / (n_tokens - 1.0), 6) AS dup_bigram_frac,
        |       CASE WHEN c / (n_tokens - 1.0) <= 0.2 AND dup_slots / (n_tokens - 1.0) <= 0.6
        |            THEN 1 ELSE 0 END AS keep
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q59_stratified_sample" ->
      """SELECT doc_id, source, substr(sha256(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |FROM documents
        |WHERE substr(sha256(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |      CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN '80'
        |           WHEN source IN ('src5','src6','src7','src8','src9') THEN '40'
        |           ELSE '20' END
        |ORDER BY doc_id""".stripMargin,
    "q60_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |  WHERE length(token) > 2),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, df, round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |ORDER BY tfidf DESC, doc_id, token LIMIT 50""".stripMargin,
    "q61_ann_ivf_indexed" -> OraclesDedup.sql("q30_ann_topk"),
    "q62_semantic_dedup" ->
      """WITH RECURSIVE
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
        |comp AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src)
        |SELECT cluster_id, vec_id AS kept_vec_id FROM (
        |  SELECT c.cluster_id, c.vec_id,
        |         row_number() OVER (PARTITION BY c.cluster_id ORDER BY e.label DESC, c.vec_id) AS rn
        |  FROM comp c JOIN embeddings e ON e.vec_id = c.vec_id)
        |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q63_curation_pipeline" -> {
      def occ(m: String) =
        s"CAST((length(text) - length(replace(text, '$m', ''))) / ${m.length} AS INT)"
      val (en, es, de, fr) = (occ(" the "), occ(" el "), occ(" der "), occ(" le "))
      s"""WITH base AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE $en >= $es AND $en >= $de AND $en >= $fr
        |    AND substr(sha256(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |        CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN '80'
        |             WHEN source IN ('src5','src6','src7','src8','src9') THEN '40'
        |             ELSE '20' END),
        |tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM base),
        |qual AS (SELECT doc_id FROM (
        |    SELECT doc_id, count(*) AS n_tokens,
        |           sum(CASE WHEN token IN ($stopwordsSqlList) THEN 1 ELSE 0 END) AS n_stop
        |    FROM tok WHERE token <> '' GROUP BY doc_id)
        |  WHERE n_tokens >= 15 AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.6),
        |arrs AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS arr
        |         FROM base),
        |big AS (SELECT doc_id, len(arr) - 1 AS n_slots,
        |               unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i + 1])) AS bigram
        |        FROM arrs WHERE len(arr) >= 2),
        |cnt AS (SELECT doc_id, n_slots, bigram, count(*) AS c FROM big GROUP BY 1, 2, 3),
        |rep AS (SELECT doc_id FROM (
        |    SELECT doc_id, n_slots, max(c) AS top_c,
        |           sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_slots
        |    FROM cnt GROUP BY 1, 2)
        |  WHERE top_c / CAST(n_slots AS DOUBLE) <= 0.2
        |    AND dup_slots / CAST(n_slots AS DOUBLE) <= 0.6)
        |SELECT doc_id, source FROM (
        |  SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
        |  FROM base JOIN qual USING (doc_id) JOIN rep USING (doc_id)
        |  GROUP BY sha256(text))
        |ORDER BY doc_id""".stripMargin
    },
    "q65_mixture_weights" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |       round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
        |       round(CAST(min(n_tokens) OVER () AS DOUBLE) / n_tokens, 6) AS sample_weight
        |FROM t ORDER BY source""".stripMargin,
    "q66_decontamination" -> {
      // mirror Dedup.shingles: raw whitespace split, no empty-token
      // filter, distinct 8-grams, docs with >= 8 tokens only
      val gram = (1 to 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 7),
        |         i -> $gram))) AS s
        |       FROM t WHERE len(toks) >= 8)
        |SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
        |FROM sh c JOIN sh e ON c.s = e.s
        |WHERE e.doc_id % 5 = 0 AND c.doc_id % 5 != 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // q122: q66's containment recompute, restricted to the arriving
    // batch slice — the persisted eval index changes the plan, never
    // the values
    "q122_incremental_decontamination" -> {
      val gram = (1 to 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 7),
        |         i -> $gram))) AS s
        |       FROM t WHERE len(toks) >= 8)
        |SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
        |FROM sh c JOIN sh e ON c.s = e.s
        |WHERE e.doc_id % 5 = 0 AND c.doc_id % 5 != 0 AND c.doc_id % 3 != 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q67_chunking" ->
      """WITH arrs AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS arr
        |  FROM documents),
        |d AS (SELECT doc_id, arr,
        |        CASE WHEN len(arr) <= 32 THEN 1
        |             ELSE CAST(ceil((len(arr) - 32) / 24.0) AS BIGINT) + 1 END AS n_chunks
        |      FROM arrs WHERE len(arr) >= 1),
        |c AS (SELECT doc_id, arr, unnest(range(n_chunks)) AS chunk_idx FROM d)
        |SELECT doc_id, chunk_idx,
        |       array_to_string(list_slice(arr, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ') AS chunk_text,
        |       CAST(len(list_slice(arr, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q68_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT doc_id, source, n_tok,
        |        sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS start_tok
        |      FROM t)
        |SELECT doc_id, source, n_tok,
        |       CAST(floor(start_tok / 256.0) AS BIGINT) AS bin,
        |       CAST(start_tok % 256 AS BIGINT) AS offset
        |FROM s ORDER BY source, doc_id""".stripMargin,
    "q74_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |  WHERE token <> ''),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |n AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       round(CAST(sum(CAST(-(c / CAST(n_tokens AS DOUBLE)) * ln(c / CAST(n_tokens AS DOUBLE))
        |                          AS DECIMAL(18,12))) AS DOUBLE), 6) AS entropy
        |FROM tf JOIN n USING (doc_id)
        |GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
// q126: the q120 tokenizer counts (+1 EOS per doc, zero-token
// docs kept via LEFT JOIN) fed through the q68 shard-local
// packing cumsum
"q126_tokenizer_packing" ->
        """WITH RECURSIVE words AS (
          |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
          |  FROM documents),
          |spaced AS (
          |  SELECT doc_id, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
          |  FROM words),
          |m1 AS (
          |  SELECT doc_id, s FROM spaced
          |  UNION ALL
          |  SELECT doc_id, regexp_replace(s, ' t h ', ' th ') FROM m1 WHERE contains(s, ' t h ')),
          |m1f AS (SELECT doc_id, s FROM m1 WHERE NOT contains(s, ' t h ')),
          |m2 AS (
          |  SELECT doc_id, s FROM m1f
          |  UNION ALL
          |  SELECT doc_id, regexp_replace(s, ' th e ', ' the ') FROM m2 WHERE contains(s, ' th e ')),
          |m2f AS (SELECT doc_id, s FROM m2 WHERE NOT contains(s, ' th e ')),
          |counts AS (
          |  SELECT doc_id, CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT) AS n
          |  FROM m2f GROUP BY doc_id),
          |toks AS (
          |  SELECT d.doc_id, d.source, CAST(COALESCE(c.n, 0) + 1 AS BIGINT) AS n_tok
          |  FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id),
          |cum AS (
          |  SELECT doc_id, source, n_tok,
          |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS start_tok
          |  FROM toks)
          |SELECT doc_id, source, n_tok,
          |       CAST(floor(start_tok / 256.0) AS BIGINT) AS bin,
          |       CAST(start_tok % 256 AS BIGINT) AS offset
          |FROM cum ORDER BY source, doc_id""".stripMargin,
// q127: the stage-sequential dedup funnel — exact keeps min
// doc_id per text group; near = exact 3-gram Jaccard >= 0.5
// losers among exact survivors (the q26 contract: LSH+verify ==
// exact); substring = 8-gram anchor pairs among near survivors
"q127_dedup_report" ->
        """WITH keeps AS (
          |  SELECT text AS ktext, min(doc_id) AS keep_id FROM documents GROUP BY text),
          |exact_losers AS (
          |  SELECT d.doc_id FROM documents d JOIN keeps k ON d.text = k.ktext
          |  WHERE d.doc_id <> k.keep_id),
          |surv1 AS (
          |  SELECT d.doc_id, d.source, d.n_chars, d.text
          |  FROM documents d JOIN keeps k ON d.text = k.ktext AND d.doc_id = k.keep_id),
          |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM surv1),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
          |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
          |       FROM tok WHERE len(toks) >= 3),
          |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
          |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |           GROUP BY 1, 2),
          |near_losers AS (
          |  SELECT DISTINCT id_b AS doc_id FROM shared
          |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
          |  WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5),
          |surv2 AS (
          |  SELECT * FROM surv1 WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)),
          |toks2 AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM surv2),
          |grams AS (
          |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
          |  FROM toks2, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) u
          |  WHERE len(t) >= 8),
          |sub_losers AS (
          |  SELECT DISTINCT b.doc_id AS doc_id
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
          |losers AS (
          |  SELECT doc_id, 'exact' AS stage FROM exact_losers
          |  UNION ALL SELECT doc_id, 'near' AS stage FROM near_losers
          |  UNION ALL SELECT doc_id, 'substr' AS stage FROM sub_losers)
          |SELECT d.source,
          |       count(*) AS n_docs,
          |       CAST(sum(CASE WHEN l.stage = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
          |       CAST(sum(CASE WHEN l.stage = 'near' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
          |       CAST(sum(CASE WHEN l.stage = 'substr' THEN 1 ELSE 0 END) AS BIGINT) AS n_substr_dup,
          |       CAST(sum(CASE WHEN l.stage IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
          |       CAST(sum(CASE WHEN l.stage IS NOT NULL THEN d.n_chars ELSE 0 END) AS BIGINT) AS dup_chars
          |FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
          |GROUP BY d.source ORDER BY d.source""".stripMargin,
// q128: remaining C4/Gopher rules — symbol ratio, bullet-start /
// ellipsis-end / short-line fractions, Gopher-threshold keep
"q128_c4_gopher_rules" ->
        """WITH t AS (
          |  SELECT doc_id, text,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
          |         string_split(text, chr(10)) AS lines,
          |         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
          |         CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_ellipsis
          |  FROM documents),
          |m AS (
          |  SELECT doc_id, n_words, CAST(len(lines) AS BIGINT) AS n_lines,
          |         (n_hash + n_ellipsis) / CAST(n_words AS DOUBLE) AS symbol_ratio,
          |         len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
          |           OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•'))) AS n_bullet,
          |         len(list_filter(lines, l -> ends_with(rtrim(l), '...')
          |           OR ends_with(rtrim(l), '…'))) AS n_ell,
          |         len(list_filter(lines, l ->
          |           len(list_filter(string_split_regex(l, '\s+'), x -> x <> '')) < 3)) AS n_short
          |  FROM t WHERE n_words >= 1)
          |SELECT doc_id, n_words, n_lines, symbol_ratio,
          |       n_bullet / CAST(n_lines AS DOUBLE) AS bullet_line_frac,
          |       n_ell / CAST(n_lines AS DOUBLE) AS ellipsis_line_frac,
          |       n_short / CAST(n_lines AS DOUBLE) AS short_line_frac,
          |       CASE WHEN symbol_ratio <= 0.1 AND n_bullet / CAST(n_lines AS DOUBLE) <= 0.9
          |             AND n_ell / CAST(n_lines AS DOUBLE) <= 0.3
          |             AND n_short / CAST(n_lines AS DOUBLE) <= 0.5 THEN 1 ELSE 0 END AS keep
          |FROM m ORDER BY doc_id""".stripMargin,
// q130: deterministic K-per-group sample — both engines rank the
// same sha256(source:doc_id) hex strings
"q130_group_sample" ->
        """WITH h AS (
          |  SELECT doc_id, source,
          |         sha256(source || ':' || CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |r AS (
          |  SELECT doc_id, source,
          |         CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS INT)
          |           AS sample_rank
          |  FROM h)
          |SELECT doc_id, source, sample_rank
          |FROM r WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,
// q131: floor(log2) via binary-string length — exact integers,
// no float-log ulp flip at powers of two
"q131_length_batches" ->
        """WITH t AS (
          |  SELECT doc_id, source,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, source, n_tok,
          |         CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket
          |  FROM t WHERE n_tok >= 1),
          |r AS (
          |  SELECT doc_id, source, n_tok, bucket,
          |         row_number() OVER (PARTITION BY source, bucket ORDER BY doc_id) AS rn
          |  FROM b)
          |SELECT doc_id, source, n_tok, bucket,
          |       CAST(floor((rn - 1) / 8.0) AS BIGINT) AS batch_id,
          |       CAST((rn - 1) % 8 AS BIGINT) AS batch_pos
          |FROM r ORDER BY source, bucket, batch_id, batch_pos""".stripMargin,
// q133: unigram LM trained on the corpus itself, scored as
// bits-per-token — per-term doubles are single IEEE ops, the
// per-doc sum runs in DECIMAL(18,12) (the q74 discipline)
"q133_unigram_lm_bits" ->
        """WITH tok AS (
          |  SELECT doc_id, token FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |vocab AS (SELECT token, count(*) AS c_tok FROM tok GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM tok),
          |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
          |n AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot)
          |SELECT doc_id, n_tokens,
          |       round(CAST(sum(term) AS DOUBLE) / n_tokens / ln(2), 6) AS bits_per_token
          |FROM terms JOIN n USING (doc_id)
          |GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
// q134/q135: boilerplate 5-gram mining and the per-doc fraction
// policy; grams are DISTINCT per doc (list_distinct ≡ the native
// shingle expression), the flag compares in integer arithmetic
"q134_boilerplate_ngrams" ->
        """WITH w AS (
          |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |grams AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    list_transform(range(1, len(toks) - 3),
          |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
          |  FROM w WHERE len(toks) >= 5)
          |SELECT gram, count(*) AS n_docs
          |FROM grams GROUP BY gram HAVING count(*) >= 3
          |ORDER BY n_docs DESC, gram""".stripMargin,
"q135_boilerplate_fraction" ->
        """WITH w AS (
          |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |grams AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    list_transform(range(1, len(toks) - 3),
          |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
          |  FROM w WHERE len(toks) >= 5),
          |common AS (
          |  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 3)
          |SELECT g.doc_id, count(*) AS n_grams,
          |       CAST(count(c.gram) AS BIGINT) AS n_common,
          |       CAST(CASE WHEN count(c.gram) * 20 >= count(*) THEN 1 ELSE 0 END AS BIGINT)
          |         AS flagged
          |FROM grams g LEFT JOIN common c ON g.gram = c.gram
          |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
// q136: the per-doc feature-store row — lang ID, token stats,
// entropy, corpus-LM bits, boilerplate share assembled from ONE
// (doc, token) aggregation; all double terms decimal-summed
"q136_doc_features" -> {
        def occ(m: String) =
          s"CAST((length(text) - length(replace(text, '$m', ''))) / ${m.length} AS INT)"
        val (en, es, de, fr) = (occ(" the "), occ(" el "), occ(" der "), occ(" le "))
        s"""WITH lang AS (
          |  SELECT doc_id,
          |       CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
          |            WHEN $es >= $de AND $es >= $fr THEN 'es'
          |            WHEN $de >= $fr THEN 'de'
          |            ELSE 'fr' END AS predicted_lang
          |  FROM documents),
          |tf AS (
          |  SELECT doc_id, token, count(*) AS tf FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
          |  WHERE token <> '' GROUP BY 1, 2),
          |base AS (
          |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
          |         CAST(sum(CASE WHEN token IN ($stopwordsSqlList) THEN tf ELSE 0 END) AS BIGINT) AS n_stop,
          |         CAST(sum(length(token) * tf) AS BIGINT) AS sum_len
          |  FROM tf GROUP BY 1),
          |ent AS (
          |  SELECT tf.doc_id,
          |         CAST(sum(CAST(-(tf / CAST(n_tokens AS DOUBLE)) * ln(tf / CAST(n_tokens AS DOUBLE))
          |                       AS DECIMAL(18,12))) AS DOUBLE) AS entropy_raw
          |  FROM tf JOIN base USING (doc_id) GROUP BY 1),
          |vocab AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_tok FROM tf GROUP BY 1),
          |tot AS (SELECT CAST(sum(c_tok) AS BIGINT) AS n_total FROM vocab),
          |lm AS (
          |  SELECT tf.doc_id,
          |         CAST(sum(CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)))
          |              AS DOUBLE) AS lm_raw
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot GROUP BY 1),
          |w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
          |grams AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    list_transform(range(1, len(toks) - 3),
          |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
          |  FROM w WHERE len(toks) >= 5),
          |cmn AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 3),
          |boiler AS (
          |  SELECT g.doc_id, count(*) AS n_grams, CAST(count(c.gram) AS BIGINT) AS n_common
          |  FROM grams g LEFT JOIN cmn c ON g.gram = c.gram GROUP BY 1)
          |SELECT l.doc_id, l.predicted_lang, b.n_tokens, b.n_stop,
          |       CAST(b.n_stop AS DOUBLE) / b.n_tokens AS stop_ratio,
          |       CAST(b.sum_len AS DOUBLE) / b.n_tokens AS avg_token_len,
          |       round(e.entropy_raw, 6) AS entropy,
          |       round(m.lm_raw / b.n_tokens / ln(2), 6) AS bits_per_token,
          |       COALESCE(bl.n_grams, 0) AS n_grams,
          |       COALESCE(bl.n_common, 0) AS n_common,
          |       CAST(CASE WHEN COALESCE(bl.n_grams, 0) > 0
          |                  AND COALESCE(bl.n_common, 0) * 20 >= bl.n_grams
          |                 THEN 1 ELSE 0 END AS BIGINT) AS boiler_flagged
          |FROM lang l
          |JOIN base b USING (doc_id)
          |JOIN ent e USING (doc_id)
          |JOIN lm m ON l.doc_id = m.doc_id
          |LEFT JOIN boiler bl ON l.doc_id = bl.doc_id
          |ORDER BY l.doc_id""".stripMargin
      },
// q137: equal-share mixture rebalancing plan — integer targets,
// single-division rates (bit-identical cross-engine, unrounded)
"q137_mixture_plan" ->
        """WITH per AS (
          |  SELECT source, count(*) AS n_docs,
          |         CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
          |           AS n_tokens
          |  FROM documents GROUP BY 1),
          |tgt AS (
          |  SELECT source, n_docs, n_tokens,
          |         CAST(floor(sum(n_tokens) OVER () / CAST(count(*) OVER () AS DOUBLE)) AS BIGINT)
          |           AS target_tokens
          |  FROM per)
          |SELECT source, n_docs, n_tokens, target_tokens,
          |       CAST(target_tokens AS DOUBLE) / n_tokens AS sampling_rate,
          |       CAST(ceil(CAST(target_tokens AS DOUBLE) / n_tokens) AS BIGINT) AS n_epochs,
          |       CAST(CASE WHEN target_tokens > n_tokens THEN 1 ELSE 0 END AS BIGINT) AS needs_repeat
          |FROM tgt ORDER BY source""".stripMargin,
// q138–q140: the k-means family. The CTE replays both Lloyd
// iterations relationally with the SAME exactness scheme the
// engine uses: 1/1024 integer-grid quantization (exact), BIGINT
// component sums (order-independent) finished by one IEEE
// division, |v|²−2·v·c+|c|² distances via list_inner_product
// (accumulation parity with the codegen DotProduct, q29-proven),
// tie-break on cluster id.
"q138_kmeans_clusters" ->
        s"""$kmeansCte
           |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
           |FROM a2 ORDER BY vec_id""".stripMargin,
// q215: the same replay at k = 80 — gates the engine's LARGE-k
// dispatch (distributed broadcast-model assignment via the native
// NearestCentroid loop) with its own cross-engine row
"q215_kmeans_large_k" ->
        s"""${kmeansCteK(80)}
           |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
           |FROM a2 ORDER BY vec_id""".stripMargin,
// q139: SemDeDup — within-cluster cosine ≥ 0.45 pairs drop the
// larger id; survivors keep their cluster
"q139_semdedup" ->
        s"""$kmeansCte,
           |losers AS (
           |  SELECT DISTINCT b.vec_id AS vec_id
           |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           |  JOIN embeddings ea ON ea.vec_id = a.vec_id
           |  JOIN embeddings eb ON eb.vec_id = b.vec_id
           |  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.45)
           |SELECT a2.vec_id, CAST(a2.cluster AS INTEGER) AS cluster
           |FROM a2 WHERE a2.vec_id NOT IN (SELECT vec_id FROM losers)
           |ORDER BY a2.vec_id""".stripMargin,
// q140: 16-per-cluster balanced draw by the deterministic
// sha256(vec_id) rule (the q59 discipline per cluster)
"q140_cluster_balanced_sample" ->
        s"""$kmeansCte
           |SELECT CAST(cluster AS INTEGER) AS cluster,
           |       CAST(rn AS BIGINT) AS draw_rank, vec_id FROM (
           |  SELECT cluster, vec_id,
           |         row_number() OVER (PARTITION BY cluster
           |           ORDER BY sha256(CAST(vec_id AS VARCHAR))) AS rn
           |  FROM a2)
           |WHERE rn <= 16 ORDER BY cluster, draw_rank""".stripMargin,
// q141: nearest-centroid classifier — per-label exact-grid means
// on the 80% train split, argmin prediction on the held-out fifth
"q141_centroid_classifier" ->
        """WITH v AS (
          |  SELECT vec_id, label,
          |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
          |  FROM embeddings),
          |vd AS (SELECT vec_id, label, vq, list_transform(vq, x -> CAST(x AS DOUBLE)) AS dv FROM v),
          |tr AS (SELECT * FROM vd WHERE vec_id % 5 <> 0),
          |te AS (SELECT * FROM vd WHERE vec_id % 5 = 0),
          |comp AS (
          |  SELECT label AS cls, generate_subscripts(vq, 1) AS pos, unnest(vq) AS val FROM tr),
          |cents AS (
          |  SELECT cls, list(c ORDER BY pos) AS cent FROM (
          |    SELECT cls, pos, CAST(sum(val) AS DOUBLE) / count(*) AS c
          |    FROM comp GROUP BY cls, pos) GROUP BY cls),
          |pred AS (
          |  SELECT vec_id, label, cls FROM (
          |    SELECT te.vec_id, te.label, c.cls,
          |           row_number() OVER (PARTITION BY te.vec_id
          |             ORDER BY list_inner_product(te.dv, te.dv)
          |                      - 2 * list_inner_product(te.dv, c.cent)
          |                      + list_inner_product(c.cent, c.cent), c.cls) AS rn
          |    FROM te CROSS JOIN cents c) WHERE rn = 1)
          |SELECT vec_id, label, CAST(cls AS INTEGER) AS predicted,
          |       CAST(CASE WHEN label = cls THEN 1 ELSE 0 END AS BIGINT) AS correct
          |FROM pred ORDER BY vec_id""".stripMargin,
// q142: pruned-IVF recall@5 vs brute force — full relational
// replay of clustering, probe selection, both top-5s and the
// intersection (deterministic end-to-end, so recall is EXACT)
"q142_ann_recall" ->
        s"""$kmeansCte,
           |qs AS (SELECT vec_id AS query_id, dv FROM vd WHERE vec_id < 10),
           |probe AS (
           |  SELECT query_id, cluster FROM (
           |    SELECT q.query_id, c.cluster,
           |           row_number() OVER (PARTITION BY q.query_id
           |             ORDER BY list_inner_product(q.dv, q.dv)
           |                      - 2 * list_inner_product(q.dv, c.cent)
           |                      + list_inner_product(c.cent, c.cent), c.cluster) AS rn
           |    FROM qs q CROSS JOIN c1 c) WHERE rn <= 2),
           |approx AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT p.query_id, a2.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY p.query_id
           |             ORDER BY list_cosine_similarity(eq.embedding, en.embedding) DESC,
           |                      a2.vec_id) AS rn
           |    FROM probe p JOIN a2 ON a2.cluster = p.cluster
           |    JOIN embeddings eq ON eq.vec_id = p.query_id
           |    JOIN embeddings en ON en.vec_id = a2.vec_id
           |    WHERE a2.vec_id <> p.query_id) WHERE rn <= 5),
           |exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY list_cosine_similarity(q.embedding, s.embedding) DESC,
           |                      s.vec_id) AS rn
           |    FROM embeddings q JOIN embeddings s ON s.vec_id <> q.vec_id
           |    WHERE q.vec_id < 10) WHERE rn <= 5),
           |hits AS (
           |  SELECT e.query_id, count(*) AS n_hits
           |  FROM exact e JOIN approx a
           |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY e.query_id)
           |SELECT q.vec_id AS query_id,
           |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           |       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
           |FROM embeddings q LEFT JOIN hits h ON h.query_id = q.vec_id
           |WHERE q.vec_id < 10 ORDER BY query_id""".stripMargin,
// q143: quality-aware dedup representative — q38's closure +
// q133's LM bits, argmin (bits, id) per cluster
"q143_dedup_keep_best" ->
        """WITH RECURSIVE
          |tokd AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
          |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
          |       FROM tokd WHERE len(toks) >= 3),
          |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
          |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |           GROUP BY 1, 2),
          |pairs AS (SELECT id_a, id_b
          |          FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
          |          WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5),
          |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
          |reach(src, dst) AS (
          |  SELECT u, v FROM edges
          |  UNION
          |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
          |clus AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          |         FROM reach GROUP BY src),
          |tok AS (
          |  SELECT doc_id, token FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |vocab AS (SELECT token, count(*) AS c_tok FROM tok GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM tok),
          |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
          |n AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot),
          |lm AS (
          |  SELECT doc_id,
          |         round(CAST(sum(term) AS DOUBLE) / n_tokens / ln(2), 6) AS bits
          |  FROM terms JOIN n USING (doc_id)
          |  GROUP BY doc_id, n_tokens),
          |sel AS (
          |  SELECT cluster_id, doc_id, bits,
          |         row_number() OVER (PARTITION BY cluster_id ORDER BY bits, doc_id) AS rn,
          |         count(*) OVER (PARTITION BY cluster_id) AS n_members
          |  FROM clus JOIN lm USING (doc_id))
          |SELECT cluster_id, doc_id AS kept_doc_id, bits AS kept_bits,
          |       CAST(n_members AS BIGINT) AS n_members
          |FROM sel WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
// q144: hard negatives — top-5 by cosine among DIFFERENT-label
// vectors (label inequality also excludes self)
"q144_hard_negatives" ->
        """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, neighbor_label FROM (
          |  SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
          |         s.label AS neighbor_label,
          |         row_number() OVER (PARTITION BY q.vec_id
          |           ORDER BY list_cosine_similarity(q.embedding, s.embedding) DESC,
          |                    s.vec_id) AS rn
          |  FROM embeddings q JOIN embeddings s ON s.label <> q.label
          |  WHERE q.vec_id < 10)
          |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
// q145: per-source KL(source ‖ corpus) in bits — q133's decimal
// discipline (single-IEEE-op terms, DECIMAL(18,12) sum, round 6)
"q145_source_drift" ->
        """WITH tok AS (
          |  SELECT source, token FROM (
          |    SELECT source, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
          |vocab AS (SELECT token, count(*) AS c_tok FROM tok GROUP BY 1),
          |nsrc AS (SELECT source, count(*) AS n_src FROM tok GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM tok),
          |terms AS (
          |  SELECT tf.source, n_src,
          |         CAST((tf / CAST(n_src AS DOUBLE)) *
          |              ln((tf / CAST(n_src AS DOUBLE)) /
          |                 (c_tok / CAST(n_total AS DOUBLE)))
          |              AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) JOIN nsrc USING (source) CROSS JOIN tot)
          |SELECT source, n_src AS n_tokens,
          |       round(CAST(sum(term) AS DOUBLE) / ln(2), 6) AS kl_bits
          |FROM terms GROUP BY source, n_src ORDER BY source""".stripMargin,
// q146: execute the q137 plan — per-doc sha256 draw at each
// source's planned rate (floor(rate·2³²) hash threshold)
"q146_mixture_draw" ->
        """WITH per AS (
          |  SELECT source,
          |         CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
          |           AS n_tokens
          |  FROM documents GROUP BY 1),
          |tgt AS (
          |  SELECT source, n_tokens,
          |         CAST(floor(sum(n_tokens) OVER () / CAST(count(*) OVER () AS DOUBLE)) AS BIGINT)
          |           AS target_tokens
          |  FROM per)
          |SELECT d.doc_id, d.source,
          |       CAST(CASE
          |         WHEN t.target_tokens >= t.n_tokens THEN 1
          |         WHEN substr(sha256(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8) <
          |              lpad(lower(to_hex(CAST(floor(
          |                (CAST(t.target_tokens AS DOUBLE) / t.n_tokens) * 4294967296.0)
          |                AS BIGINT))), 8, '0')
          |         THEN 1 ELSE 0 END AS BIGINT) AS kept
          |FROM documents d JOIN tgt t ON t.source = d.source
          |ORDER BY d.doc_id""".stripMargin,
// q147: keep each source's best half by LM bits (rank ≤ ⌈n/2⌉,
// integer arithmetic; q133's scoring replayed verbatim)
"q147_quality_percentile" ->
        """WITH tok AS (
          |  SELECT doc_id, token FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |vocab AS (SELECT token, count(*) AS c_tok FROM tok GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM tok),
          |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
          |n AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot),
          |lm AS (
          |  SELECT doc_id,
          |         round(CAST(sum(term) AS DOUBLE) / n_tokens / ln(2), 6) AS bits_per_token
          |  FROM terms JOIN n USING (doc_id)
          |  GROUP BY doc_id, n_tokens),
          |ranked AS (
          |  SELECT d.doc_id, d.source, lm.bits_per_token,
          |         CAST(row_number() OVER (PARTITION BY d.source
          |           ORDER BY lm.bits_per_token, d.doc_id) AS BIGINT) AS rank_in_source,
          |         count(*) OVER (PARTITION BY d.source) AS n_source
          |  FROM documents d JOIN lm ON lm.doc_id = d.doc_id)
          |SELECT doc_id, source, bits_per_token, rank_in_source
          |FROM ranked WHERE rank_in_source * 2 <= n_source + 1
          |ORDER BY doc_id""".stripMargin,
// q148: per-source report card — q133 bits + q145 KL + q17 dedup
// counts recomputed from one token table
"q148_source_report" ->
        """WITH tok AS (
          |  SELECT doc_id, source, token FROM (
          |    SELECT doc_id, source, unnest(string_split_regex(text, '\s+')) AS token
          |    FROM documents)
          |  WHERE token <> ''),
          |tf AS (SELECT doc_id, source, token, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
          |vocab AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_tok FROM tf GROUP BY 1),
          |tot AS (SELECT CAST(sum(c_tok) AS BIGINT) AS n_total FROM vocab),
          |ndoc AS (SELECT doc_id, source, CAST(sum(tf) AS BIGINT) AS n_doc
          |         FROM tf GROUP BY 1, 2),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot),
          |bits AS (
          |  SELECT n.source, t.doc_id,
          |         round(CAST(sum(term) AS DOUBLE) / n.n_doc / ln(2), 6) AS bits
          |  FROM terms t JOIN ndoc n ON n.doc_id = t.doc_id
          |  GROUP BY n.source, t.doc_id, n.n_doc),
          |mb AS (
          |  SELECT source, count(*) AS n_docs,
          |         round(CAST(sum(CAST(bits AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
          |           AS mean_bits
          |  FROM bits GROUP BY source),
          |stf AS (SELECT source, token, CAST(sum(tf) AS BIGINT) AS stf
          |        FROM tf GROUP BY 1, 2),
          |nsrc AS (SELECT source, CAST(sum(stf) AS BIGINT) AS n_tokens FROM stf GROUP BY 1),
          |klt AS (
          |  SELECT s.source,
          |         CAST((stf / CAST(n_tokens AS DOUBLE)) *
          |              ln((stf / CAST(n_tokens AS DOUBLE)) /
          |                 (c_tok / CAST(n_total AS DOUBLE)))
          |              AS DECIMAL(18,12)) AS term
          |  FROM stf s JOIN vocab USING (token) JOIN nsrc n ON n.source = s.source
          |  CROSS JOIN tot),
          |kl AS (
          |  SELECT k.source, n.n_tokens,
          |         round(CAST(sum(term) AS DOUBLE) / ln(2), 6) AS kl_bits
          |  FROM klt k JOIN nsrc n ON n.source = k.source
          |  GROUP BY k.source, n.n_tokens),
          |keyed AS (SELECT doc_id, source, sha256(text) AS ck FROM documents),
          |dups AS (
          |  SELECT k.source, count(*) AS n_exact_dup
          |  FROM keyed k JOIN (SELECT ck, min(doc_id) AS keep_id FROM keyed GROUP BY ck) m
          |    ON m.ck = k.ck
          |  WHERE k.doc_id <> m.keep_id GROUP BY k.source)
          |SELECT mb.source, mb.n_docs, kl.n_tokens,
          |       CAST(COALESCE(d.n_exact_dup, 0) AS BIGINT) AS n_exact_dup,
          |       mb.mean_bits, kl.kl_bits
          |FROM mb JOIN kl ON kl.source = mb.source
          |LEFT JOIN dups d ON d.source = mb.source
          |ORDER BY mb.source""".stripMargin,
// q149: curriculum rank of q68 bins by mean LM bits (decimal
// per-bin mean, global rank tie-broken on source/bin)
"q149_curriculum_order" ->
        """WITH t AS (
          |  SELECT doc_id, source,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
          |  FROM documents),
          |s AS (SELECT doc_id, source,
          |        sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS start_tok
          |      FROM t),
          |b AS (SELECT doc_id, source, CAST(floor(start_tok / 256.0) AS BIGINT) AS bin FROM s),
          |tok AS (
          |  SELECT doc_id, token FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |vocab AS (SELECT token, count(*) AS c_tok FROM tok GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM tok),
          |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
          |n AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_tok / CAST(n_total AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN vocab USING (token) CROSS JOIN tot),
          |lm AS (
          |  SELECT doc_id,
          |         round(CAST(sum(term) AS DOUBLE) / n_tokens / ln(2), 6) AS bits
          |  FROM terms JOIN n USING (doc_id)
          |  GROUP BY doc_id, n_tokens),
          |per AS (
          |  SELECT b.source, b.bin, count(*) AS n_docs,
          |         round(CAST(sum(CAST(lm.bits AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
          |           AS mean_bits
          |  FROM b JOIN lm USING (doc_id) GROUP BY b.source, b.bin)
          |SELECT CAST(row_number() OVER (ORDER BY mean_bits, source, bin) AS BIGINT)
          |         AS curriculum_rank,
          |       source, bin, n_docs, mean_bits
          |FROM per ORDER BY curriculum_rank""".stripMargin,
// q150: per-source OOV rate vs the deterministic top-1000 vocab
// (count desc, token asc), integer counts + one division
"q150_oov_rate" ->
        """WITH tok AS (
          |  SELECT source, token FROM (
          |    SELECT source, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |vocab AS (
          |  SELECT token FROM (
          |    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS r
          |    FROM tok GROUP BY token) WHERE r <= 1000)
          |SELECT t.source,
          |       CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          |         AS oov_rate
          |FROM tok t LEFT JOIN vocab v ON v.token = t.token
          |GROUP BY t.source ORDER BY t.source""".stripMargin,
// q151: span-level decontamination — cut exactly the positions
// covered by eval 8-grams, reassemble in token order
"q151_span_decontamination" ->
        """WITH d AS (
          |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |ev AS (
          |  SELECT DISTINCT unnest(list_transform(range(1, len(toks) - 6),
          |           i -> array_to_string(toks[i:i+7], ' '))) AS g
          |  FROM d WHERE doc_id % 5 = 0 AND len(toks) >= 8),
          |cg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
          |           i -> {'gpos': i, 'g': array_to_string(toks[i:i+7], ' ')})) AS s
          |  FROM d WHERE doc_id % 5 <> 0 AND len(toks) >= 8),
          |hits AS (SELECT cg.doc_id, s.gpos AS gpos FROM cg JOIN ev ON ev.g = s.g),
          |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 8)) AS pos FROM hits),
          |tokpos AS (
          |  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
          |  FROM d WHERE doc_id % 5 <> 0)
          |SELECT t.doc_id,
          |       CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(count(*) FILTER (WHERE c.pos IS NOT NULL) AS BIGINT) AS n_removed,
          |       COALESCE(array_to_string(
          |         list(t.token ORDER BY t.pos) FILTER (WHERE c.pos IS NULL), ' '), '')
          |         AS clean_text
          |FROM tokpos t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
// q152: intra-doc repeated-span removal — non-first occurrences
// of a doc's own 8-grams cut their spans, first kept
"q152_repetition_scrub" ->
        """WITH d AS (
          |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |cg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
          |           i -> {'gpos': i, 'g': array_to_string(toks[i:i+7], ' ')})) AS s
          |  FROM d WHERE len(toks) >= 8),
          |occ AS (
          |  SELECT doc_id, s.gpos AS gpos,
          |         row_number() OVER (PARTITION BY doc_id, s.g ORDER BY s.gpos) AS rn
          |  FROM cg),
          |cov AS (
          |  SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 8)) AS pos
          |  FROM occ WHERE rn >= 2),
          |tokpos AS (
          |  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
          |  FROM d)
          |SELECT t.doc_id,
          |       CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(count(*) FILTER (WHERE c.pos IS NOT NULL) AS BIGINT) AS n_removed,
          |       COALESCE(array_to_string(
          |         list(t.token ORDER BY t.pos) FILTER (WHERE c.pos IS NULL), ' '), '')
          |         AS clean_text
          |FROM tokpos t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
// q153: bigram-LM bits-per-transition — ML conditional
// c(w1w2)/c(w1·), q133's decimal discipline pair-keyed
"q153_bigram_lm_bits" ->
        """WITH d AS (
          |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |pairs AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          |           i -> {'w1': toks[i], 'w2': toks[i+1]})) AS p
          |  FROM d WHERE len(toks) >= 2),
          |tf AS (
          |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS tf
          |  FROM pairs GROUP BY 1, 2, 3),
          |model AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_pair FROM tf GROUP BY 1, 2),
          |prev AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS c_prev FROM tf GROUP BY 1),
          |n AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_transitions FROM tf GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(tf * -ln(c_pair / CAST(c_prev AS DOUBLE)) AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN model USING (w1, w2) JOIN prev USING (w1))
          |SELECT doc_id, n_transitions,
          |       round(CAST(sum(term) AS DOUBLE) / n_transitions / ln(2), 6)
          |         AS bits_per_transition
          |FROM terms JOIN n USING (doc_id)
          |GROUP BY doc_id, n_transitions ORDER BY doc_id""".stripMargin,
// q154: cross-source mirror matrix — shared exact content keys
"q154_source_overlap" ->
        """WITH keyed AS (
          |  SELECT DISTINCT sha256(array_to_string(list_sort(list_distinct(
          |    string_split_regex(text, '\s+'))), ' ')) AS ck, source FROM documents)
          |SELECT a.source AS source_a, b.source AS source_b,
          |       CAST(count(*) AS BIGINT) AS n_shared_keys
          |FROM keyed a JOIN keyed b ON a.ck = b.ck AND a.source < b.source
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
// q155: ordered funnel — first view, first click after it, first
// purchase after that; (ts, event_id) tie-break throughout
"q155_funnel" ->
        """WITH s1 AS (
          |  SELECT user_id, ts AS ts1, event_id AS id1 FROM (
          |    SELECT user_id, ts, event_id,
          |           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          |    FROM events WHERE event_type = 'view') WHERE rn = 1),
          |s2 AS (
          |  SELECT user_id, ts AS ts2, event_id AS id2 FROM (
          |    SELECT e.user_id, e.ts, e.event_id,
          |           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          |    FROM events e JOIN s1 USING (user_id)
          |    WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (s1.ts1, s1.id1))
          |  WHERE rn = 1),
          |s3 AS (
          |  SELECT user_id FROM (
          |    SELECT e.user_id,
          |           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          |    FROM events e JOIN s2 USING (user_id)
          |    WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (s2.ts2, s2.id2))
          |  WHERE rn = 1)
          |SELECT s1.user_id,
          |       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
          |                 WHEN s2.user_id IS NOT NULL THEN 2
          |                 ELSE 1 END AS INT) AS stage_reached
          |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
          |ORDER BY s1.user_id""".stripMargin,
// q156: retention cohorts — first signup day x active-day offset
"q156_retention_cohorts" ->
        """WITH ev AS (
          |  SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
          |cohort AS (
          |  SELECT user_id, min(day) AS cohort_day
          |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
          |active AS (SELECT DISTINCT user_id, day FROM ev)
          |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort,
          |       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
          |       CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active
          |FROM cohort c JOIN active a ON a.user_id = c.user_id
          |WHERE a.day >= c.cohort_day
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
// q158: view→purchase conversion latency (whole seconds) for
// funnel completers — same min-chained stages as q155
"q158_time_to_convert" ->
        """WITH s1 AS (
          |  SELECT user_id, ts AS ts1, event_id AS id1 FROM (
          |    SELECT user_id, ts, event_id,
          |           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          |    FROM events WHERE event_type = 'view') WHERE rn = 1),
          |s2 AS (
          |  SELECT user_id, ts AS ts2, event_id AS id2 FROM (
          |    SELECT e.user_id, e.ts, e.event_id,
          |           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          |    FROM events e JOIN s1 USING (user_id)
          |    WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (s1.ts1, s1.id1))
          |  WHERE rn = 1),
          |s3 AS (
          |  SELECT user_id, ts AS ts3 FROM (
          |    SELECT e.user_id, e.ts,
          |           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          |    FROM events e JOIN s2 USING (user_id)
          |    WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (s2.ts2, s2.id2))
          |  WHERE rn = 1)
          |SELECT s1.user_id,
          |       CAST(floor(epoch(s3.ts3)) AS BIGINT)
          |         - CAST(floor(epoch(s1.ts1)) AS BIGINT) AS seconds_to_convert
          |FROM s1 JOIN s3 USING (user_id)
          |ORDER BY s1.user_id""".stripMargin,
// q157: per-user event-type transition matrix + row-normalized
// probability (one division per cell)
"q157_event_transitions" ->
        """WITH nxt AS (
          |  SELECT event_type AS prev_type,
          |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |           AS next_type
          |  FROM events),
          |m AS (
          |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
          |  FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
          |SELECT prev_type, next_type, n,
          |       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
          |FROM m ORDER BY prev_type, next_type""".stripMargin,
// q159: last-touch attribution — ignore-nulls carry of the last
// click per user + a 7-day RANGE touch count, whole-second epochs
"q159_attribution" ->
        """WITH ev AS (
          |  SELECT user_id, event_id, event_type,
          |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
          |  FROM events),
          |w AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
          |           OVER (PARTITION BY user_id ORDER BY sec, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
          |         last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
          |           OVER (PARTITION BY user_id ORDER BY sec, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_sec,
          |         sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id ORDER BY sec
          |                 RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING) AS n_touches
          |  FROM ev)
          |SELECT event_id AS purchase_id, user_id,
          |       CASE WHEN last_click_sec >= sec - 604800 THEN last_click_id END AS click_id,
          |       CASE WHEN last_click_sec >= sec - 604800 THEN sec - last_click_sec END
          |         AS click_lag_seconds,
          |       CAST(coalesce(n_touches, 0) AS BIGINT) AS n_touches
          |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
// q160: daily-volume anomaly flags — z²≥4 cleared of divisions,
// evaluated in BIGINT over the trailing up-to-7 observed days
"q160_daily_anomaly" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |w AS (
          |  SELECT event_type, day, n,
          |         CAST(count(n) OVER tw AS BIGINT) AS n_prior,
          |         CAST(sum(n) OVER tw AS BIGINT) AS s,
          |         CAST(sum(n * n) OVER tw AS BIGINT) AS q
          |  FROM daily
          |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
          |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
          |SELECT event_type, day, n, n_prior,
          |       CASE WHEN n_prior >= 3 THEN CAST(s AS DOUBLE) / n_prior END AS mean_prior,
          |       CASE WHEN n_prior >= 3
          |            THEN CAST((n_prior * n - s) * (n_prior * n - s)
          |                      >= 4 * (n_prior * q - s * s) AS INT)
          |       END AS is_anomaly
          |FROM w ORDER BY event_type, day""".stripMargin,
// q161: truncation-loss telemetry at max_len = 64 whitespace
// tokens; loss_frac is the single allowed division
"q161_truncation_loss" ->
        """SELECT source,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(CASE WHEN n_tokens > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
          |       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
          |       CAST(sum(greatest(n_tokens - 64, 0)) AS BIGINT) AS tokens_lost,
          |       CAST(sum(greatest(n_tokens - 64, 0)) AS DOUBLE) / sum(n_tokens) AS loss_frac
          |FROM (SELECT source,
          |             CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
          |               AS BIGINT) AS n_tokens
          |      FROM documents)
          |GROUP BY source ORDER BY source""".stripMargin,
// q162: per-doc distinct-8-gram novelty — min-doc_id gram
// ownership, q66's shingle semantics (raw split, list_distinct)
"q162_ngram_novelty" -> {
        val gram = (1 to 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
        s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 7),
          |         i -> $gram))) AS g
          |       FROM t WHERE len(toks) >= 8),
          |own AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
          |per AS (
          |  SELECT sh.doc_id,
          |         CAST(count(*) AS BIGINT) AS n_grams,
          |         CAST(sum(CASE WHEN own.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n_novel
          |  FROM sh JOIN own USING (g) GROUP BY sh.doc_id)
          |SELECT d.doc_id,
          |       coalesce(per.n_grams, 0) AS n_grams,
          |       coalesce(per.n_novel, 0) AS n_novel,
          |       CASE WHEN per.n_grams IS NOT NULL
          |            THEN CAST(per.n_novel AS DOUBLE) / per.n_grams END AS novelty_frac
          |FROM documents d LEFT JOIN per USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin
      },
// q163: RFM terciles — pure integer rank arithmetic, decimal-
// summed monetary, whole-second recency anchored at max event ts
"q163_rfm_segments" ->
        """WITH ev AS (
          |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
          |  FROM events),
          |anchor AS (SELECT max(sec) AS now_sec FROM ev),
          |pu AS (
          |  SELECT user_id,
          |         CAST(count(*) AS BIGINT) AS frequency,
          |         max(sec) AS last_sec,
          |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
          |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
          |base AS (
          |  SELECT user_id, frequency, monetary,
          |         (a.now_sec - last_sec) // 86400 AS recency_days
          |  FROM pu CROSS JOIN anchor a),
          |ranked AS (
          |  SELECT user_id, recency_days, frequency, monetary,
          |         row_number() OVER (ORDER BY recency_days, user_id) AS rn_r,
          |         row_number() OVER (ORDER BY frequency DESC, user_id) AS rn_f,
          |         row_number() OVER (ORDER BY monetary DESC, user_id) AS rn_m,
          |         count(*) OVER () AS cnt
          |  FROM base)
          |SELECT user_id, recency_days, frequency, monetary,
          |       ((rn_r - 1) * 3) // cnt + 1 AS r_seg,
          |       ((rn_f - 1) * 3) // cnt + 1 AS f_seg,
          |       ((rn_m - 1) * 3) // cnt + 1 AS m_seg,
          |       CAST(((rn_r - 1) * 3) // cnt + 1 AS VARCHAR)
          |         || CAST(((rn_f - 1) * 3) // cnt + 1 AS VARCHAR)
          |         || CAST(((rn_m - 1) * 3) // cnt + 1 AS VARCHAR) AS rfm
          |FROM ranked ORDER BY user_id""".stripMargin,
// q164: per-source inventory before/after near-dup collapse —
// the q38 closure + q39's keeper rule, then one source aggregate
"q164_mixture_dedup_shift" -> (nearDupClosureCte +
        """,
          |keep AS (SELECT doc_id FROM (
          |  SELECT c.cluster_id, c.doc_id,
          |         row_number() OVER (PARTITION BY c.cluster_id
          |                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
          |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id) WHERE rn = 1),
          |dt AS (SELECT doc_id, source,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
          |           AS BIGINT) AS t
          |       FROM documents),
          |k AS (SELECT dt.source, dt.t,
          |        CASE WHEN c.doc_id IS NULL OR kp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS kept
          |      FROM dt LEFT JOIN comp c ON c.doc_id = dt.doc_id
          |              LEFT JOIN keep kp ON kp.doc_id = dt.doc_id),
          |s AS (SELECT source,
          |        CAST(count(*) AS BIGINT) AS n_docs,
          |        CAST(sum(t) AS BIGINT) AS n_tokens,
          |        CAST(sum(kept) AS BIGINT) AS n_docs_dedup,
          |        CAST(sum(kept * t) AS BIGINT) AS n_tokens_dedup
          |      FROM k GROUP BY source)
          |SELECT source, n_docs, n_tokens, n_docs_dedup, n_tokens_dedup,
          |       CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share,
          |       CAST(n_tokens_dedup AS DOUBLE) / sum(n_tokens_dedup) OVER ()
          |         AS token_share_dedup
          |FROM s ORDER BY source""".stripMargin),
// q166: top-K vocab coverage under the deterministic BPE-pick
// ordering (count desc, token asc)
"q166_vocab_coverage" ->
        """WITH tf AS (SELECT t AS token, CAST(count(*) AS BIGINT) AS c FROM (
          |       SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
          |       FROM documents) GROUP BY 1),
          |ranked AS (SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rk FROM tf),
          |total AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM tf),
          |ks AS (SELECT unnest([4, 8, 16, 32]) AS vocab_size)
          |SELECT CAST(ks.vocab_size AS BIGINT) AS vocab_size,
          |       CAST(sum(r.c) AS BIGINT) AS covered_tokens,
          |       t.total_tokens,
          |       CAST(sum(r.c) AS DOUBLE) / t.total_tokens AS coverage
          |FROM ks JOIN ranked r ON r.rk <= ks.vocab_size CROSS JOIN total t
          |GROUP BY 1, 3 ORDER BY 1""".stripMargin,
// q168: deterministic epoch shuffle — sha256(epoch:doc_id) key,
// first hex char shards, full key orders within the shard
"q168_epoch_shuffle" ->
        """WITH keyed AS (
          |  SELECT e.epoch, d.doc_id,
          |         sha256(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS k
          |  FROM documents d CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
          |SELECT CAST(epoch AS BIGINT) AS epoch, substr(k, 1, 1) AS shard,
          |       CAST(row_number() OVER (PARTITION BY epoch, substr(k, 1, 1) ORDER BY k)
          |         AS BIGINT) AS pos,
          |       doc_id
          |FROM keyed ORDER BY epoch, shard, pos""".stripMargin,
// q169: exact per-source token-length quantiles by integer rank
// selection — value at rank (q*n + 99) div 100
"q169_source_length_quantiles" ->
        """WITH dt AS (
          |  SELECT doc_id, source,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
          |           AS BIGINT) AS t
          |  FROM documents),
          |rk AS (
          |  SELECT source, t,
          |         CAST(row_number() OVER (PARTITION BY source ORDER BY t, doc_id)
          |           AS BIGINT) AS rn,
          |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
          |  FROM dt)
          |SELECT source, max(n) AS n_docs,
          |       CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN t END) AS BIGINT)
          |         AS p50_tokens,
          |       CAST(max(CASE WHEN rn = (90 * n + 99) // 100 THEN t END) AS BIGINT)
          |         AS p90_tokens,
          |       max(t) AS max_tokens
          |FROM rk GROUP BY source ORDER BY source""".stripMargin,
// q170: embedding-quality gate — decimal-summed squared norms,
// NaN/Inf guarded to NULL exactly like the engine
"q170_embedding_quality" ->
        """WITH n2 AS (
          |  SELECT label,
          |         CAST(len(embedding) AS BIGINT) AS dim,
          |         CAST(len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))
          |           OR NOT isfinite(CAST(x AS DOUBLE)))) AS BIGINT) AS n_bad,
          |         embedding
          |  FROM embeddings),
          |n3 AS (
          |  SELECT label, dim, n_bad,
          |         CASE WHEN n_bad = 0 THEN
          |           CAST(list_sum(list_transform(embedding,
          |             x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
          |             AS DOUBLE)
          |         END AS norm2
          |  FROM n2)
          |SELECT label,
          |       CAST(count(*) AS BIGINT) AS n_vecs,
          |       min(dim) AS min_dim,
          |       max(dim) AS max_dim,
          |       CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
          |       CAST(sum(CASE WHEN norm2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
          |       min(norm2) AS min_norm2,
          |       max(norm2) AS max_norm2
          |FROM n3 GROUP BY label ORDER BY label""".stripMargin,
// q171: gap-session conversion per session-start day (q37's
// session rule + a purchase flag)
"q171_session_conversion" ->
        """WITH o AS (SELECT user_id, event_id, ts, event_type,
          |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |           FROM events),
          |f AS (SELECT *, CASE WHEN prev_ts IS NULL
          |                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
          |                     THEN 1 ELSE 0 END AS new_sess FROM o),
          |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
          |sess AS (
          |  SELECT user_id, sess_seq, min(CAST(ts AS DATE)) AS d,
          |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
          |           AS converted
          |  FROM s GROUP BY 1, 2)
          |SELECT strftime(d, '%Y-%m-%d') AS day,
          |       CAST(count(*) AS BIGINT) AS n_sessions,
          |       CAST(sum(converted) AS BIGINT) AS n_converting,
          |       CAST(sum(converted) AS DOUBLE) / count(*) AS conversion_rate
          |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
// q172: boilerplate span removal — df>=3 5-grams cut everywhere,
// q151/q152's covered-position reassembly
"q172_boilerplate_scrub" ->
        """WITH d AS (
          |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |cg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
          |           i -> {'gpos': i, 'g': array_to_string(toks[i:i+4], ' ')})) AS s
          |  FROM d WHERE len(toks) >= 5),
          |gp AS (SELECT doc_id, s.gpos AS gpos, s.g AS g FROM cg),
          |common AS (SELECT g FROM (
          |  SELECT g, count(DISTINCT doc_id) AS df FROM gp GROUP BY g) WHERE df >= 3),
          |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 5)) AS pos
          |        FROM gp JOIN common USING (g)),
          |tokpos AS (
          |  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
          |  FROM d)
          |SELECT t.doc_id,
          |       CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(sum(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_removed,
          |       COALESCE(array_to_string(
          |         list(t.token ORDER BY t.pos) FILTER (WHERE c.pos IS NULL), ' '), '')
          |         AS clean_text
          |FROM tokpos t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
// q173: DSIR importance weights — Laplace-smoothed unigram
// log-likelihood ratio (target = lang 'en') summed per doc in
// DECIMAL(18,12) (the q133 order-independence convention), top
// quarter by rounded weight selected
"q173_dsir_weights" ->
        """WITH tf AS (
          |  SELECT doc_id, lang, t AS token, CAST(count(*) AS BIGINT) AS tf FROM (
          |    SELECT doc_id, lang,
          |           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
          |    FROM documents) GROUP BY 1, 2, 3),
          |raw AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_raw FROM tf GROUP BY 1),
          |tgt AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_tgt
          |        FROM tf WHERE lang = 'en' GROUP BY 1),
          |model AS (SELECT r.token, r.c_raw, COALESCE(t.c_tgt, CAST(0 AS BIGINT)) AS c_tgt
          |          FROM raw r LEFT JOIN tgt t USING (token)),
          |sc AS (SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw,
          |              CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
          |              CAST(count(*) AS BIGINT) AS v FROM model),
          |per AS (
          |  SELECT f.doc_id,
          |         CAST(sum(f.tf) AS BIGINT) AS n_tokens,
          |         sum(CAST(f.tf * (ln(CAST(m.c_tgt + 1 AS DOUBLE) / (sc.n_tgt + sc.v)) -
          |                          ln(CAST(m.c_raw + 1 AS DOUBLE) / (sc.n_raw + sc.v)))
          |             AS DECIMAL(18,12))) AS s
          |  FROM tf f JOIN model m USING (token) CROSS JOIN sc GROUP BY 1),
          |w AS (SELECT doc_id, n_tokens,
          |             round(CAST(s AS DOUBLE) / n_tokens, 6) AS avg_logratio FROM per),
          |r AS (SELECT doc_id, n_tokens, avg_logratio,
          |             row_number() OVER (ORDER BY avg_logratio DESC, doc_id) AS rn,
          |             count(*) OVER () AS cnt FROM w)
          |SELECT doc_id, n_tokens, avg_logratio, rn <= cnt // 4 AS selected
          |FROM r ORDER BY doc_id""".stripMargin,
// q174: DAU / trailing-7-day WAU stickiness over the distinct
// user-day table
"q174_stickiness" ->
        """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
          |days AS (SELECT DISTINCT day AS d FROM ud),
          |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          |        FROM ud GROUP BY 1),
          |wau AS (SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
          |        FROM days JOIN ud ON ud.day >= d - 6 AND ud.day <= d GROUP BY 1)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
          |       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
          |FROM dau JOIN wau USING (day) ORDER BY 1""".stripMargin,
// q175: per-source keyness — +1-smoothed log-odds vs the rest of
// the corpus (rest counts by subtraction from the global model),
// top-5 per source
"q175_source_keyness" ->
        """WITH tf AS (
          |  SELECT source, t AS token, CAST(count(*) AS BIGINT) AS c_s FROM (
          |    SELECT source,
          |           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
          |    FROM documents) GROUP BY 1, 2),
          |per AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM tf GROUP BY 1),
          |gl AS (SELECT token, CAST(sum(c_s) AS BIGINT) AS c_g FROM tf GROUP BY 1),
          |tot AS (SELECT CAST(sum(c_g) AS BIGINT) AS n_g FROM gl),
          |sc AS (SELECT f.source, f.token,
          |         round(ln((CAST(f.c_s + 1 AS DOUBLE) / (p.n_s - f.c_s + 1)) /
          |                  (CAST(g.c_g - f.c_s + 1 AS DOUBLE) /
          |                   (t.n_g - p.n_s - (g.c_g - f.c_s) + 1))), 6) AS keyness
          |       FROM tf f JOIN gl g USING (token) JOIN per p USING (source)
          |       CROSS JOIN tot t),
          |r AS (SELECT source, token, keyness,
          |             row_number() OVER (PARTITION BY source
          |                                ORDER BY keyness DESC, token) AS rk FROM sc)
          |SELECT source, token, keyness, CAST(rk AS BIGINT) AS rk
          |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
// q176: diagonal-Mahalanobis whitened norms — per-dim moments in
// DECIMAL sums, standardized squared terms re-summed in DECIMAL
"q176_embedding_whitening" ->
        """WITH flat AS (
          |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
          |         CAST(unnest(embedding) AS DOUBLE) AS x
          |  FROM embeddings),
          |m AS (SELECT dim, count(*) AS n,
          |             sum(CAST(x AS DECIMAL(18,12))) AS sx,
          |             sum(CAST(x * x AS DECIMAL(18,12))) AS sxx
          |      FROM flat GROUP BY 1),
          |mm AS (SELECT dim, CAST(sx AS DOUBLE) / n AS mean,
          |              sqrt(CAST(sxx AS DOUBLE) / n -
          |                   (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) AS std
          |       FROM m)
          |SELECT f.vec_id,
          |       round(sqrt(CAST(sum(CAST(((f.x - mm.mean) / mm.std) *
          |                                ((f.x - mm.mean) / mm.std)
          |                       AS DECIMAL(18,12))) AS DOUBLE)), 6) AS whitened_norm
          |FROM flat f JOIN mm USING (dim) GROUP BY 1 ORDER BY 1""".stripMargin,
// q177: Pareto revenue deciles — q163's integer-rank cut over
// DECIMAL-summed spend, running share over the 10-row rollup
"q177_revenue_deciles" ->
        """WITH pu AS (SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS spend
          |            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |r AS (SELECT user_id, spend,
          |             row_number() OVER (ORDER BY spend DESC, user_id) AS rn,
          |             count(*) OVER () AS cnt FROM pu),
          |d AS (SELECT user_id, spend, (rn - 1) * 10 // cnt + 1 AS decile FROM r),
          |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS users,
          |             sum(spend) AS revenue FROM d GROUP BY 1),
          |c AS (SELECT decile, users, revenue,
          |             sum(revenue) OVER (ORDER BY decile
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_revenue,
          |             sum(revenue) OVER () AS total FROM g)
          |SELECT CAST(decile AS BIGINT) AS decile, users,
          |       CAST(revenue AS DOUBLE) AS revenue,
          |       round(CAST(revenue AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
          |       round(CAST(cum_revenue AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
          |FROM c ORDER BY decile""".stripMargin,
// q178: Efraimidis–Spirakis weighted sample — 52-bit sha uniform,
// key = ln(u)/weight, top-50 by the unrounded key
"q178_weighted_sample" ->
        """WITH keyed AS (
          |  SELECT doc_id, source, n_chars,
          |         ln((('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
          |             + 0.5) / 4503599627370496.0) / n_chars AS k
          |  FROM documents WHERE n_chars > 0),
          |top AS (SELECT doc_id, source, n_chars, k FROM keyed
          |        ORDER BY k DESC, doc_id LIMIT 50)
          |SELECT doc_id, source, n_chars, round(k, 6) AS sample_key
          |FROM top ORDER BY doc_id""".stripMargin,
// q180: content-addressed split assignment — same salted sha
// byte, same threshold strings, recomputed from scratch
"q180_split_assignment" ->
        """WITH s AS (
          |  SELECT source, n_chars,
          |         substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
          |  FROM documents)
          |SELECT source,
          |       CASE WHEN b < 'cc' THEN 'train'
          |            WHEN b < 'e6' THEN 'val' ELSE 'test' END AS split,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS n_chars
          |FROM s GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
// q181: k-anonymity rollup — the same quasi-identifier grid
// (type, day, value // 50) and the same k = 5 bar
"q181_k_anonymity" ->
        """WITH combos AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(floor(value / 50.0) AS BIGINT) AS vb,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS users,
          |         CAST(count(*) AS BIGINT) AS n_rows
          |  FROM events GROUP BY 1, 2, 3)
          |SELECT event_type,
          |       CAST(count(*) AS BIGINT) AS n_combos,
          |       CAST(sum(CASE WHEN users < 5 THEN 1 ELSE 0 END) AS BIGINT) AS risky_combos,
          |       CAST(sum(CASE WHEN users < 5 THEN n_rows ELSE 0 END) AS BIGINT) AS risky_rows,
          |       round(CAST(sum(CASE WHEN users < 5 THEN n_rows ELSE 0 END) AS DOUBLE)
          |             / CAST(sum(n_rows) AS BIGINT), 6) AS risk_share
          |FROM combos GROUP BY 1 ORDER BY event_type""".stripMargin,
// q208: PSI first-week vs last-week — Laplace-smoothed exact
// fractions through ln, DECIMAL terms, verdict off the rounded
// sum; window length clamps to half the day span so the two
// windows are always disjoint, and span/window days are reported
"q208_psi_drift" ->
        """WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1,
          |                  CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 AS BIGINT) AS span_days,
          |                  least(CAST(7 AS BIGINT), CAST(floor((date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1) / 2.0) AS BIGINT)) AS window_days
          |           FROM events),
          |bk AS (
          |  SELECT event_type, span_days, window_days,
          |         CAST(floor(value / 50.0) AS BIGINT) AS vb,
          |         CAST(sum(CASE WHEN date_diff('day', d0, CAST(ts AS DATE)) < window_days THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          |         CAST(sum(CASE WHEN date_diff('day', CAST(ts AS DATE), d1) < window_days THEN 1 ELSE 0 END) AS BIGINT) AS cb
          |  FROM events CROSS JOIN b GROUP BY 1, 2, 3, 4),
          |t AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
          |             CAST(sum(cb) AS BIGINT) AS nb, CAST(count(*) AS BIGINT) AS k
          |      FROM bk GROUP BY 1),
          |terms AS (
          |  SELECT bk.event_type, span_days, window_days,
          |         CAST(((ca + 1) / CAST(na + k AS DOUBLE) - (cb + 1) / CAST(nb + k AS DOUBLE))
          |              * ln(((ca + 1) / CAST(na + k AS DOUBLE)) / ((cb + 1) / CAST(nb + k AS DOUBLE)))
          |           AS DECIMAL(18,12)) AS term
          |  FROM bk JOIN t USING (event_type)),
          |agg AS (SELECT event_type, span_days, window_days,
          |               round(CAST(sum(term) AS DOUBLE), 6) AS psi
          |        FROM terms GROUP BY 1, 2, 3)
          |SELECT event_type, span_days, window_days, psi,
          |       CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'watch'
          |            ELSE 'shifted' END AS verdict
          |FROM agg ORDER BY event_type""".stripMargin,
// q207: weekly load grid — dow normalized to 0=Sunday (DuckDB's
// native dayofweek) ≡ Spark's dayofweek()-1
"q207_seasonality" ->
        """WITH cells AS (
          |  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
          |         CAST(hour(ts) AS BIGINT) AS hod,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT dow, hod, n,
          |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT), 6) AS dow_share
          |FROM cells ORDER BY dow, hod""".stripMargin,
// q203: l-diversity — distinct sensitive values per QI combo,
// days-sized rollup (day emitted as a string, house rule)
"q203_l_diversity" ->
        """WITH combos AS (
          |  SELECT CAST(ts AS DATE) AS day,
          |         CAST(floor(value / 50.0) AS BIGINT) AS vb,
          |         CAST(count(DISTINCT event_type) AS BIGINT) AS types,
          |         CAST(count(*) AS BIGINT) AS n_rows
          |  FROM events GROUP BY 1, 2)
          |SELECT strftime(day, '%Y-%m-%d') AS day,
          |       CAST(count(*) AS BIGINT) AS n_combos,
          |       CAST(sum(CASE WHEN types < 3 THEN 1 ELSE 0 END) AS BIGINT) AS weak_combos,
          |       CAST(sum(CASE WHEN types < 3 THEN n_rows ELSE 0 END) AS BIGINT) AS weak_rows,
          |       round(CAST(sum(CASE WHEN types < 3 THEN n_rows ELSE 0 END) AS DOUBLE)
          |             / CAST(sum(n_rows) AS BIGINT), 6) AS weak_share
          |FROM combos GROUP BY day ORDER BY day""".stripMargin,
// q204: anonymity-set size histogram over the q181 grid
"q204_anonymity_histogram" ->
        """WITH combos AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(floor(value / 50.0) AS BIGINT) AS vb,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS users,
          |         CAST(count(*) AS BIGINT) AS n_rows
          |  FROM events GROUP BY 1, 2, 3)
          |SELECT least(users, 5) AS bucket,
          |       CAST(count(*) AS BIGINT) AS n_combos,
          |       CAST(sum(n_rows) AS BIGINT) AS n_rows
          |FROM combos GROUP BY 1 ORDER BY bucket""".stripMargin,
// q182: char-level entropy — per-char explode, −p·ln p / ln 2
// DECIMAL terms (the q74/q133 discipline)
"q182_char_entropy" ->
        """WITH ch AS (
          |  SELECT doc_id, ch FROM (
          |    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
          |  WHERE ch <> ''),
          |cf AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
          |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chars_tok FROM ch GROUP BY 1)
          |SELECT doc_id, n_chars_tok,
          |       CAST(count(*) AS BIGINT) AS n_distinct_chars,
          |       round(CAST(sum(CAST(-(c / CAST(n_chars_tok AS DOUBLE))
          |                            * ln(c / CAST(n_chars_tok AS DOUBLE)) / ln(2)
          |                          AS DECIMAL(18,12))) AS DOUBLE), 6) AS entropy_bits
          |FROM cf JOIN n USING (doc_id)
          |GROUP BY doc_id, n_chars_tok ORDER BY doc_id""".stripMargin,
// q184: exact microsecond gaps off the same per-user window,
// DECIMAL moment sums, doubles only in the final division
"q184_burstiness" ->
        """WITH g AS (
          |  SELECT user_id,
          |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
          |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
          |  FROM events),
          |a AS (
          |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
          |         sum(CAST(gap_us AS DECIMAL(19,0))) AS sx,
          |         sum(CAST(gap_us AS DECIMAL(19,0)) * CAST(gap_us AS DECIMAL(19,0))) AS sxx
          |  FROM g WHERE gap_us IS NOT NULL GROUP BY 1),
          |m AS (
          |  SELECT user_id, n_gaps,
          |         CAST(sx AS DOUBLE) / n_gaps AS mean_us,
          |         CAST(sxx AS DOUBLE) / n_gaps AS m2_us
          |  FROM a WHERE n_gaps >= 5)
          |SELECT user_id, n_gaps,
          |       round(mean_us / 1e6, 6) AS mean_gap_s,
          |       round(sqrt(greatest(0.0, m2_us - mean_us * mean_us)) / mean_us, 6) AS cv
          |FROM m ORDER BY user_id""".stripMargin,
// q185: the q120 fixed-merge recursive tokenizer, rolled up to
// languages with whitespace-word denominators
"q185_tokenizer_fertility" ->
        """WITH RECURSIVE words AS (
          |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
          |  FROM documents),
          |spaced AS (
          |  SELECT doc_id, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
          |  FROM words),
          |m1 AS (
          |  SELECT doc_id, s FROM spaced
          |  UNION ALL
          |  SELECT doc_id, regexp_replace(s, ' t h ', ' th ') FROM m1 WHERE contains(s, ' t h ')),
          |m1f AS (SELECT doc_id, s FROM m1 WHERE NOT contains(s, ' t h ')),
          |m2 AS (
          |  SELECT doc_id, s FROM m1f
          |  UNION ALL
          |  SELECT doc_id, regexp_replace(s, ' th e ', ' the ') FROM m2 WHERE contains(s, ' th e ')),
          |m2f AS (SELECT doc_id, s FROM m2 WHERE NOT contains(s, ' th e ')),
          |perdoc AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
          |         CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT) AS n_tokens
          |  FROM m2f GROUP BY doc_id)
          |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_words) AS BIGINT) AS n_words,
          |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
          |       round(CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS BIGINT), 6) AS fertility
          |FROM perdoc JOIN documents d USING (doc_id)
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
// q186: the q37 sessionizer verbatim, rolled into an integer-
// exact duration-magnitude histogram (digits of whole seconds)
"q186_session_stats" ->
        """WITH o AS (SELECT user_id, event_id, ts,
          |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |           FROM events),
          |f AS (SELECT *, CASE WHEN prev_ts IS NULL
          |                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
          |                     THEN 1 ELSE 0 END AS new_sess FROM o),
          |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
          |agg AS (SELECT user_id, sess_seq, CAST(count(*) AS BIGINT) AS n_events,
          |               min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
          |        FROM s GROUP BY user_id, sess_seq),
          |d AS (SELECT n_events, (end_us - start_us) // 1000000 AS dur_s FROM agg)
          |SELECT CAST(length(CAST(dur_s AS VARCHAR)) AS INT) AS dur_digits,
          |       CAST(count(*) AS BIGINT) AS n_sessions,
          |       CAST(sum(n_events) AS BIGINT) AS n_events,
          |       round(CAST(sum(dur_s) AS DOUBLE) / count(*), 6) AS mean_dur_s,
          |       round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS mean_events
          |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
// q187: majority label per exact-k-means cluster — the shared
// kmeansCte assignment joined to labels, ranked per cluster
"q187_cluster_purity" ->
        s"""$kmeansCte,
           |cl AS (
           |  SELECT a2.cluster, e.label, CAST(count(*) AS BIGINT) AS n
           |  FROM a2 JOIN embeddings e USING (vec_id)
           |  GROUP BY 1, 2),
           |ranked AS (
           |  SELECT cluster, label, n,
           |         row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn,
           |         sum(n) OVER (PARTITION BY cluster) AS size
           |  FROM cl)
           |SELECT CAST(cluster AS INTEGER) AS cluster,
           |       CAST(size AS BIGINT) AS size,
           |       label AS majority_label, n AS majority_n,
           |       round(CAST(n AS DOUBLE) / size, 6) AS purity
           |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,
// q188: lower-median/MAD by integer rank — exact longs, no
// interpolation; 3xMAD outlier flag in integer arithmetic
"q188_length_outliers" ->
        """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
          |r1 AS (SELECT source, n_chars, doc_id,
          |              row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
          |              count(*) OVER (PARTITION BY source) AS n
          |       FROM d),
          |med AS (SELECT source, n_chars AS med FROM r1 WHERE rn = (n + 1) // 2),
          |dev AS (SELECT d.source, d.doc_id, med.med, abs(d.n_chars - med.med) AS ad
          |        FROM d JOIN med USING (source)),
          |r2 AS (SELECT source, ad, doc_id,
          |              row_number() OVER (PARTITION BY source ORDER BY ad, doc_id) AS rn,
          |              count(*) OVER (PARTITION BY source) AS n
          |       FROM dev),
          |mad AS (SELECT source, ad AS mad FROM r2 WHERE rn = (n + 1) // 2)
          |SELECT dev.source,
          |       CAST(max(dev.med) AS BIGINT) AS med,
          |       CAST(max(mad.mad) AS BIGINT) AS mad,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          |       round(CAST(sum(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END) AS DOUBLE)
          |             / CAST(count(*) AS BIGINT), 6) AS outlier_rate
          |FROM dev JOIN mad USING (source)
          |GROUP BY dev.source ORDER BY dev.source""".stripMargin,
"q191_split_leakage" -> q191Sql,
// q201: percent-rank blend — (rank-1)/(n-1) on integer-derived
// orderings, identical double chain
"q201_quality_blend" ->
        """WITH sig AS (
          |  SELECT doc_id, source, n_chars,
          |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS toks,
          |         CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS DOUBLE)
          |           / CAST(greatest(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1) AS DOUBLE) AS ttr
          |  FROM documents),
          |ranked AS (
          |  SELECT doc_id, source,
          |         (percent_rank() OVER (PARTITION BY source ORDER BY toks)
          |          + percent_rank() OVER (PARTITION BY source ORDER BY ttr)
          |          + percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) / 3.0 AS blend
          |  FROM sig)
          |SELECT doc_id, source, round(blend, 6) AS blend,
          |       CAST(CASE WHEN blend >= 0.5 THEN 1 ELSE 0 END AS INT) AS keep
          |FROM ranked ORDER BY doc_id""".stripMargin,
// q202: winsorized mean — integer-rank P10/P90 bounds, DECIMAL
// sums, doubles only in the final division
"q202_winsorized_mean" ->
        """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
          |r AS (SELECT source, n_chars,
          |             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
          |             count(*) OVER (PARTITION BY source) AS n
          |      FROM d),
          |b AS (SELECT source, min(n_chars) AS lo, max(n_chars) AS hi
          |      FROM r WHERE rn = (n - 1) // 10 + 1 OR rn = n - (n - 1) // 10
          |      GROUP BY source)
          |SELECT d.source,
          |       CAST(max(b.lo) AS BIGINT) AS lo, CAST(max(b.hi) AS BIGINT) AS hi,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       round(CAST(sum(CAST(d.n_chars AS DECIMAL(19,0))) AS DOUBLE) / count(*), 6) AS raw_mean,
          |       round(CAST(sum(CAST(greatest(b.lo, least(b.hi, d.n_chars)) AS DECIMAL(19,0))) AS DOUBLE)
          |             / count(*), 6) AS winsorized_mean
          |FROM d JOIN b USING (source)
          |GROUP BY d.source ORDER BY d.source""".stripMargin,
// q200: the per-source datacard — one pass, sources-sized rollup
"q200_datacard" ->
        """WITH d AS (
          |  SELECT source, lang, n_chars,
          |         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS toks,
          |         sha256(text) AS content_key,
          |         CASE WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
          |              WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM documents)
          |SELECT source,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(toks) AS BIGINT) AS n_tokens,
          |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars,
          |       CAST(count(*) - count(DISTINCT content_key) AS BIGINT) AS dup_docs,
          |       round(CAST(count(*) - count(DISTINCT content_key) AS DOUBLE) / count(*), 6) AS dup_rate,
          |       round(CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS train_share
          |FROM d GROUP BY source ORDER BY source""".stripMargin,
// q193: c-TF-IDF topic terms per exact-k-means cluster — q60's
// smoothed idf over CLUSTERS, top-3 on the unrounded score
// q194: market-basket lift over distinct (user, type) — exact
// integer supports, one division chain
"q194_event_lift" ->
        """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
          |sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
          |ab AS (
          |  SELECT a.event_type AS type_a, b.event_type AS type_b,
          |         CAST(count(*) AS BIGINT) AS n_ab
          |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
          |  GROUP BY 1, 2)
          |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_ab,
          |       round((CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE))
          |             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) AS lift,
          |       round(CAST(n_ab AS DOUBLE) / sa.n, 6) AS confidence
          |FROM ab JOIN sup sa ON sa.event_type = type_a
          |        JOIN sup sb ON sb.event_type = type_b
          |CROSS JOIN nu
          |ORDER BY type_a, type_b""".stripMargin,
// q196: 3-step path mining — same (ts, event_id) order, top-20
// on (count desc, path asc), re-sorted by path for the hash
"q196_user_paths" ->
        """WITH o AS (
          |  SELECT user_id, event_type,
          |         lead(event_type, 1) OVER w AS s2,
          |         lead(event_type, 2) OVER w AS s3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |p AS (
          |  SELECT event_type || ' > ' || s2 || ' > ' || s3 AS path
          |  FROM o WHERE s2 IS NOT NULL AND s3 IS NOT NULL),
          |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
          |top AS (SELECT * FROM c ORDER BY n DESC, path LIMIT 20)
          |SELECT path, n FROM top ORDER BY path""".stripMargin,
// q197: Pearson r from exact decimal moment sums, combined in
// double with the identical IEEE op sequence
"q197_signal_correlation" -> q197Sql,
"q193_cluster_topics" ->
        s"""$kmeansCte,
           |tok AS (
           |  SELECT doc_id, token FROM (
           |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
           |  WHERE token <> ''),
           |j AS (SELECT a2.cluster, tok.token FROM tok JOIN a2 ON a2.vec_id = tok.doc_id),
           |ctf AS (SELECT cluster, token, count(*) AS ctf FROM j GROUP BY 1, 2),
           |dfc AS (SELECT token, count(*) AS df_c FROM ctf GROUP BY 1),
           |scored AS (
           |  SELECT cluster, token, ctf, ctf * ln(9.0 / (df_c + 1.0)) AS score
           |  FROM ctf JOIN dfc USING (token))
           |SELECT CAST(cluster AS INTEGER) AS cluster, CAST(rn AS INT) AS rank,
           |       token, ctf, round(score, 6) AS score
           |FROM (SELECT *, row_number() OVER (PARTITION BY cluster
           |        ORDER BY score DESC, token) AS rn FROM scored)
           |WHERE rn <= 3 ORDER BY cluster, rank""".stripMargin
  )

  /** Queries whose CONTRACT is exact equality with an already-
    * oracled query reuse that query's SQL verbatim. */
  val sql: Map[String, String] = primary ++ Map(
// q132: the q63 funnel's survivors packed shard-locally — the
// funnel SQL nests verbatim as a CTE, then one join back to the
// text and the q68 window
"q132_curated_packing" -> {
        val funnel = primary("q63_curation_pipeline")
        s"""WITH curated AS (
          |$funnel
          |),
          |toks AS (
          |  SELECT c.doc_id, c.source,
          |         CAST(len(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
          |  FROM curated c JOIN documents d ON c.doc_id = d.doc_id),
          |cum AS (
          |  SELECT doc_id, source, n_tok,
          |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS start_tok
          |  FROM toks)
          |SELECT doc_id, source, n_tok,
          |       CAST(floor(start_tok / 256.0) AS BIGINT) AS bin,
          |       CAST(start_tok % 256 AS BIGINT) AS offset
          |FROM cum ORDER BY source, doc_id""".stripMargin
      }
  )
}
