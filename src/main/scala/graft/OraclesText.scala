package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesText (language ID, quality, PII, BPE, fuzzy match, BM25, PMI)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesText {
  // q92: BPE first-iteration merge candidates — exact integer pair
  // counts, deterministic (count desc, pair) rank, binary string order
  // in both engines.
  private val q92Sql: String =
    """WITH words AS (
      |  SELECT w, count(*) AS wc FROM (
      |    SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w
      |), pairs AS (
      |  SELECT unnest(list_transform(range(1, length(w)),
      |           i -> substring(w, CAST(i AS INT), 2))) AS pair, wc
      |  FROM words WHERE length(w) >= 2
      |)
      |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
      |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  // q93: fuzzy entity matching — both engines' levenshtein is classic
  // DP edit distance, so the integer distances and the match set are
  // value-exact.
  private val q93Sql: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |w AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS word FROM names),
      |cand AS (SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      |         FROM w a JOIN w b ON a.word = b.word AND a.p_name < b.p_name)
      |SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS dist
      |FROM cand WHERE levenshtein(name_a, name_b) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  private val primary: Map[String, String] = Map(
    "q21_lang_id" -> {
      def occ(m: String) =
        s"CAST((length(text) - length(replace(text, '$m', ''))) / ${m.length} AS INT)"
      val (en, es, de, fr) = (occ(" the "), occ(" el "), occ(" der "), occ(" le "))
      s"""SELECT doc_id, $en AS s_en, $es AS s_es, $de AS s_de, $fr AS s_fr,
        |       CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
        |            WHEN $es >= $de AND $es >= $fr THEN 'es'
        |            WHEN $de >= $fr THEN 'de'
        |            ELSE 'fr' END AS predicted_lang
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q22_quality_score" ->
      s"""WITH t AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         CAST(sum(CASE WHEN token IN ($stopwordsSqlList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |         CAST(sum(length(token)) AS BIGINT) AS sum_len
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
        |  WHERE token <> '' GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_stop,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |       CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
        |       CASE WHEN n_tokens >= 40 AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.05 AND 0.6 THEN 'good'
        |            WHEN n_tokens >= 15 THEN 'ok'
        |            ELSE 'low' END AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "q23_token_count" ->
      """SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(CAST(ceil(length(token) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe_est
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |WHERE token <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q24_fingerprint" ->
      """SELECT doc_id,
        |       sha256(array_to_string(list_sort(list_distinct(string_split_regex(text, '\s+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q81: plant + scrub with the same regex chain (Java-regex ∩ RE2
    // subset; DuckDB needs the explicit 'g' flag where Spark's
    // regexp_replace is global by default)
    "q81_pii_scrub" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id ||
        |         '@example.com call 555-123-4567 from 10.0.' ||
        |         (doc_id % 256) || '.17 ssn 123-45-6789' AS d
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(d,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |           '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |           '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS clean_text
        |  FROM dirty)
        |SELECT doc_id, clean_text,
        |       CAST(length(regexp_extract_all(clean_text, '<(EMAIL|PHONE|IP|SSN)>')) AS BIGINT)
        |         AS redactions
        |FROM clean ORDER BY doc_id""".stripMargin,
"q92_bpe_pair_counts" -> q92Sql,
"q93_fuzzy_match" -> q93Sql,
// q167: declared-vs-detected lang mismatch per source (q21's
// marker rule, one per-row prediction + a sources-sized agg)
"q167_lang_mismatch" -> {
        def occ(m: String) =
          s"CAST((length(text) - length(replace(text, '$m', ''))) / ${m.length} AS INT)"
        val (en, es, de, fr) = (occ(" the "), occ(" el "), occ(" der "), occ(" le "))
        s"""WITH pred AS (
          |  SELECT doc_id, source, lang,
          |         CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
          |              WHEN $es >= $de AND $es >= $fr THEN 'es'
          |              WHEN $de >= $fr THEN 'de'
          |              ELSE 'fr' END AS predicted_lang
          |  FROM documents)
          |SELECT source,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(CASE WHEN predicted_lang <> lang THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_mismatch,
          |       CAST(sum(CASE WHEN predicted_lang <> lang THEN 1 ELSE 0 END) AS DOUBLE)
          |         / count(*) AS mismatch_rate
          |FROM pred GROUP BY source ORDER BY source""".stripMargin
      },
// q189: per-source type/token ratio and hapax share
"q189_hapax_richness" ->
        """WITH tok AS (
          |  SELECT source, token FROM (
          |    SELECT source, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |tf AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2)
          |SELECT source,
          |       CAST(sum(c) AS BIGINT) AS n_tokens,
          |       CAST(count(*) AS BIGINT) AS n_types,
          |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          |       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS ttr,
          |       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hapax_share
          |FROM tf GROUP BY source ORDER BY source""".stripMargin,
// q190: PMI collocations — exact integer counts, scalar totals,
// identical IEEE division chain, top-50 on the unrounded score
"q190_pmi_collocations" ->
        """WITH arrs AS (
          |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS arr
          |  FROM documents),
          |uni AS (
          |  SELECT t, count(*) AS c FROM (SELECT unnest(arr) AS t FROM arrs) GROUP BY 1),
          |bi AS (
          |  SELECT a, b, count(*) AS c_ab FROM (
          |    SELECT arr[i+1] AS a, arr[i+2] AS b
          |    FROM (SELECT arr, unnest(range(len(arr) - 1)) AS i FROM arrs WHERE len(arr) >= 2))
          |  GROUP BY 1, 2),
          |nb AS (SELECT sum(c_ab) AS n_b FROM bi),
          |ut AS (SELECT sum(c) AS u FROM uni),
          |scored AS (
          |  SELECT bi.a || ' ' || bi.b AS bigram, bi.c_ab,
          |         ln((bi.c_ab / CAST(n_b AS DOUBLE)) /
          |            ((ua.c / CAST(u AS DOUBLE)) * (ub.c / CAST(u AS DOUBLE)))) AS pmi
          |  FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b
          |  CROSS JOIN nb CROSS JOIN ut
          |  WHERE bi.c_ab >= 5),
          |top AS (SELECT * FROM scored ORDER BY pmi DESC, bigram LIMIT 50)
          |SELECT bigram, c_ab, round(pmi, 6) AS pmi FROM top ORDER BY bigram""".stripMargin,
// q198: BM25 (k1=1.2, b=0.75, Lucene idf) — DECIMAL per-term
// scores, identical double chain, top-20 on the exact sum
"q198_bm25" ->
        """WITH tok AS (
          |  SELECT doc_id, token FROM (
          |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
          |  WHERE token <> ''),
          |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
          |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |                 CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
          |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
          |       WHERE token IN ('table', 'scan', 'fast') GROUP BY 1, 2),
          |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |terms AS (
          |  SELECT tf.doc_id,
          |         CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
          |              * (tf * 2.2)
          |              / (tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(total_dl AS DOUBLE) / n_docs))))
          |           AS DECIMAL(18,12)) AS term
          |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
          |agg AS (SELECT doc_id, sum(term) AS s FROM terms GROUP BY 1),
          |top AS (SELECT * FROM agg ORDER BY s DESC, doc_id LIMIT 20)
          |SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS score FROM top ORDER BY doc_id""".stripMargin
  )

  val sql: Map[String, String] = primary
}
