package graft

import graft.functions.TextFunctions

/** DuckDB oracle SQL for every entry in [[Queries]] (driver contract:
  * same column names, same row order, ANSI SQL runnable by DuckDB over
  * the same parquet tables registered under their bare names).
  */
object Oracles {

  /** Spark ML's default English stop words, escaped as a SQL IN-list —
    * built from the same constant the Spark side uses so the two can
    * never drift. */
  private val stopwordsSqlList: String =
    TextFunctions.englishStopWords
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString(", ")

  /** DuckDB form of [[TextFunctions.cleanText]]. */
  private val cleanedSql: String =
    "regexp_replace(regexp_replace(regexp_replace(lower(text), '^rt ', ''), " +
      "'(https?://)\\S+', '', 'g'), '[^a-z0-9\\s]', '', 'g')"


  /** DuckDB mirror of [[graft.operators.Dedup.simhash64]] over 3-gram
    * shingles of the documents table. */
  private val simhashSigSql: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS ss
      |       FROM tok WHERE len(toks) >= 3),
      |hx AS (SELECT doc_id, list_transform(ss, t -> substring(sha256(t), 1, 16)) AS hexes FROM sh)
      |SELECT doc_id, array_to_string(list_transform(range(64), j ->
      |  CASE WHEN list_sum(list_transform(hexes, h ->
      |    2 * ((CAST(instr('0123456789abcdef', substring(h, CAST(floor(j/4) AS INT)+1, 1)) AS INT) - 1)
      |         // CAST(pow(2, 3 - (j % 4)) AS INT) % 2) - 1)) > 0
      |  THEN '1' ELSE '0' END), '') AS sig
      |FROM hx""".stripMargin

  private val base: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_typed_projection" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_dt,
        |       substring(o_orderpriority, 1, 1) AS prio_code,
        |       lower(concat_ws('-', o_orderstatus, o_orderpriority)) AS status_tag,
        |       o_totalprice * 2.0 AS double_price
        |FROM orders
        |ORDER BY order_id""".stripMargin,
    "q03_watermark_filter" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       max(strftime(l_shipdate, '%Y-%m-%d')) AS new_watermark
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'""".stripMargin,
    "q04_surrogate_key" ->
      """SELECT c_custkey,
        |       sha256(concat_ws('||', c_custkey, c_name)) AS c_sk
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q05_join_agg" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q06_broadcast_join" ->
      """SELECT p_brand,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_retail
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q09_upsert_merge" ->
      """WITH tgt AS (SELECT o_orderkey AS k, o_totalprice AS p, 1 AS v
        |             FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
        |     src AS (SELECT o_orderkey AS k, o_totalprice + 1000.0 AS p, 2 AS v
        |             FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |SELECT coalesce(t.k, s.k) AS k,
        |       CASE WHEN t.k IS NULL OR (s.k IS NOT NULL AND s.v > t.v) THEN s.p ELSE t.p END AS p,
        |       CASE WHEN t.k IS NULL OR (s.k IS NOT NULL AND s.v > t.v) THEN s.v ELSE t.v END AS v,
        |       CASE WHEN t.k IS NULL THEN 'insert'
        |            WHEN s.k IS NOT NULL AND s.v > t.v THEN 'update'
        |            ELSE 'keep' END AS merge_action
        |FROM tgt t FULL JOIN src s ON t.k = s.k
        |ORDER BY k""".stripMargin,
    "q10_union_all" ->
      """SELECT src, name, acctbal FROM (
        |  SELECT 'customer' AS src, c_name AS name, c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT 'supplier', s_name, s_acctbal FROM supplier
        |) ORDER BY src, name, acctbal""".stripMargin,
    "q11_topk" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_dt
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q12_latest_per_key" ->
      """SELECT o_custkey, latest_orderkey, latest_dt FROM (
        |  SELECT o_custkey, o_orderkey AS latest_orderkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS latest_dt,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q13_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |WHERE length(token) > 2
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q14_clean_text" ->
      s"SELECT doc_id, $cleanedSql AS cleaned FROM documents ORDER BY doc_id",
    "q15_term_score" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split_regex($cleanedSql, '\\s+')) AS token
        |    FROM documents)
        |  WHERE length(token) > 2 AND token NOT IN ($stopwordsSqlList))
        |SELECT doc_id, CAST(sum(w.weight) AS BIGINT) AS score, count(*) AS n_scored_terms
        |FROM tok
        |JOIN (VALUES ('spark',20),('query',15),('join',12),('window',8),
        |             ('stream',7),('data',5),('hash',9),('merge',6),
        |             ('filter',4),('vector',11)) AS w(token, weight) USING (token)
        |GROUP BY doc_id
        |HAVING CAST(sum(w.weight) AS BIGINT) > 0
        |ORDER BY doc_id""".stripMargin,
    "q16_days_ago" ->
      """SELECT doc_id,
        |       CAST(nullif(regexp_extract(text, '^([0-9]+) days? ago', 1), '') AS INT) AS days_ago,
        |       strftime(coalesce(
        |         DATE '2024-06-01' - CAST(nullif(regexp_extract(text, '^([0-9]+) days? ago', 1), '') AS INT),
        |         DATE '2024-06-01'), '%Y-%m-%d') AS publish_dt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q17_dedup_exact" ->
      """SELECT sha256(text) AS content_key, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q18_distinct_count" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_events_day_agg" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q20_running_window" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_dt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |       CAST(row_number() OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
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
    "q25_ngram_jaccard_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q38_dedup_clusters" ->
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
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
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q47_dedup_pipeline" ->
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
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
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q39_dedup_keep_one" ->
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
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
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src)
        |SELECT cluster_id, doc_id AS kept_doc_id FROM (
        |  SELECT c.cluster_id, c.doc_id,
        |         row_number() OVER (PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id) AS rn
        |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
        |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q40_media_stats" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       sha256(text) AS content_key,
        |       CAST(n_chars % 2048 AS INT) * CAST((doc_id % 1080) + 1 AS INT) AS n_pixels,
        |       CASE WHEN n_chars % 2048 >= 1920 THEN 'hd'
        |            WHEN n_chars % 2048 >= 640 THEN 'sd'
        |            ELSE 'thumb' END AS res_bucket
        |FROM documents ORDER BY media_id""".stripMargin,
    "q41_frame_sample" ->
      """SELECT doc_id AS media_id, unnest(range(0, n_chars * 7 + 1, 500)) AS frame_ms
        |FROM documents
        |WHERE doc_id % 3 = 2 AND n_chars * 7 > 0
        |ORDER BY media_id, frame_ms""".stripMargin,
    "q48_incremental_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |  AND (id_a % 10 = 0 OR id_b % 10 = 0)
        |ORDER BY id_a, id_b""".stripMargin,
    "q26_minhash_lsh_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
        |       FROM tok WHERE len(toks) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_simhash" -> (simhashSigSql + " ORDER BY doc_id"),
    "q28_simhash_pairs" ->
      s"""WITH sigs AS ($simhashSigSql)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(list_sum(list_transform(range(64), i ->
        |         CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1) THEN 0 ELSE 1 END)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE CAST(list_sum(list_transform(range(64), i ->
        |         CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1) THEN 0 ELSE 1 END)) AS INT) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q29_embedding_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "q30_ann_topk" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // q31's contract: the multi-table LSH path must reproduce the EXACT
    // brute-force top-k (its per-neighbor miss probability at the pinned
    // seed/params is ≪ 1e-5 and equality is asserted in DedupSpec), so
    // the brute-force SQL is its oracle too.
    "q31_ann_lsh_topk" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // q121: the same brute-force rank, constrained to label-equal
    // neighbors — the metadata-filtered retrieval contract
    "q121_ann_filtered" ->
      """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id < 10 AND b.vec_id != a.vec_id AND b.label = a.label)
        |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    "q42_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |       count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "q43_quantiles" ->
      """SELECT l_returnflag,
        |       CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS p50,
        |       CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q44_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(date_diff('day', prev_dt, o_orderdate) AS BIGINT) AS days_since_prev
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |             lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                                    ORDER BY o_orderdate, o_orderkey) AS prev_dt
        |      FROM orders)
        |WHERE prev_dt IS NOT NULL ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q45_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
        |ORDER BY o_custkey""".stripMargin,
    "q46_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
        |ORDER BY o_custkey""".stripMargin,
    "q32_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "q33_asof_join" ->
      """SELECT event_id, user_id, matched_orderkey, matched_dt FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey AS matched_orderkey,
        |         strftime(o.o_orderdate, '%Y-%m-%d') AS matched_dt,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q34_json_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,
    "q35_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_sql_revenue" ->
      """SELECT o_orderkey,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_dt
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q37_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |           FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM o),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f)
        |SELECT user_id, CAST(sess_seq AS INT) AS session_seq, count(*) AS n_events,
        |       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
        |FROM s GROUP BY user_id, sess_seq ORDER BY user_id, session_seq""".stripMargin,
    // q49/q50: sketch estimates are engine-specific, so the oracle checks
    // the CONTRACT — the exact count plus within_bound = 1 (the bound
    // itself is pinned numerically per-sf in SketchSpec).
    "q49_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, 1 AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_sketch_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, 1 AS within_bound
        |FROM events GROUP BY 1
        |HAVING count(*) FILTER (event_id % 2 = 0) > 0
        |   AND count(*) FILTER (event_id % 2 <> 0) > 0
        |ORDER BY 1""".stripMargin,
    // q51/q52: the whole pHash pipeline recomputed in SQL — stub
    // features are sha256 hex digits (integer-valued doubles, so the
    // mean comparison is float-order-exact), bits are the >= mean rule.
    "q51_phash_media" ->
      """WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
        |f AS (SELECT media_id, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h)
        |SELECT media_id, array_to_string(list_transform(range(64), j ->
        |  CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN '1' ELSE '0' END), '') AS phash
        |FROM f ORDER BY media_id""".stripMargin,
    "q52_phash_pairs" ->
      """WITH m AS (SELECT d.doc_id AS media_id, r.text AS txt
        |           FROM documents d JOIN documents r ON r.doc_id = d.doc_id - d.doc_id % 5),
        |h AS (SELECT media_id, sha256(txt) AS hx FROM m),
        |f AS (SELECT media_id, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h),
        |p AS (SELECT media_id, list_transform(range(64), j ->
        |        CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN 1 ELSE 0 END) AS bits FROM f)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b,
        |         CAST(len(list_filter(range(64), j ->
        |           a.bits[CAST(j+1 AS INT)] <> b.bits[CAST(j+1 AS INT)])) AS INT) AS hamming
        |  FROM p a JOIN p b ON a.media_id < b.media_id)
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    // q209: frame-sampled video dedup — the whole pipeline brute-forced:
    // per-frame stub features from sha256(payload || '|' || frame_ms),
    // the q51 bit rule, ALL aligned frame pairs at hamming <= 3, then
    // the matched-share rollup. frame_share is one IEEE division (no
    // rounding) so the >= 0.8 gate agrees bit-for-bit across engines.
    "q209_frame_dedup" ->
      """WITH m AS (SELECT d.doc_id AS media_id, r.text AS txt, r.n_chars
        |           FROM documents d JOIN documents r ON r.doc_id = d.doc_id - d.doc_id % 5),
        |fr AS (SELECT media_id, txt,
        |              CAST(unnest(range(0, CAST(n_chars AS BIGINT) * 7 + 1, 500)) AS BIGINT) AS frame_ms
        |       FROM m),
        |h AS (SELECT media_id, frame_ms, sha256(txt || '|' || CAST(frame_ms AS VARCHAR)) AS hx FROM fr),
        |f AS (SELECT media_id, frame_ms, list_transform(range(64), j ->
        |        CAST(instr('0123456789abcdef', substring(hx, CAST(j+1 AS INT), 1)) - 1 AS DOUBLE)) AS fv FROM h),
        |p AS (SELECT media_id, frame_ms, list_transform(range(64), j ->
        |        CASE WHEN fv[CAST(j+1 AS INT)] >= list_sum(fv)/64 THEN 1 ELSE 0 END) AS bits FROM f),
        |mp AS (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS matched_frames
        |  FROM p a JOIN p b ON a.frame_ms = b.frame_ms AND a.media_id < b.media_id
        |  WHERE len(list_filter(range(64), j -> a.bits[CAST(j+1 AS INT)] <> b.bits[CAST(j+1 AS INT)])) <= 3
        |  GROUP BY 1, 2),
        |nf AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames FROM fr GROUP BY 1)
        |SELECT id_a, id_b, na.n_frames AS n_frames_a, nb.n_frames AS n_frames_b,
        |       CAST(matched_frames AS BIGINT) AS matched_frames,
        |       CAST(matched_frames AS DOUBLE) / greatest(na.n_frames, nb.n_frames) AS frame_share
        |FROM mp JOIN nf na ON na.media_id = id_a JOIN nf nb ON nb.media_id = id_b
        |WHERE CAST(matched_frames AS DOUBLE) / greatest(na.n_frames, nb.n_frames) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin
  )

  /** Full oracle map. Queries whose CONTRACT is exact equality with an
    * already-oracled query reuse that query's SQL verbatim: q53 (star
    * contraction ≡ propagation's closure), q54 (persisted-index probe ≡
    * one-shot incremental), q56 (collapse-first expansion ≡ raw banded
    * pairs). q55's ledger estimate is engine-specific like q49/q50, so
    * its oracle is the same exact-count + within_bound contract.
    */
  private val preAlias: Map[String, String] = base ++ Map(
    "q53_star_clusters" -> base("q38_dedup_clusters"),
    "q54_indexed_dedup" -> base("q48_incremental_dedup"),
    "q55_sketch_ledger" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, 1 AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q56_phash_pairs_collapsed" -> base("q52_phash_pairs"),
    // q210: collapse-first frame dedup — EXACT-equality contract with
    // q209 (identical payload ⇒ identical per-frame signatures, so the
    // member expansion reproduces the direct form's rows bit-for-bit)
    "q210_frame_dedup_collapsed" -> base("q209_frame_dedup"),
    "q57_ann_ivf_topk" -> base("q30_ann_topk"),
    // filtered ANN: IVF at nprobe=nlist and the persisted
    // partitionBy(label, cell) probe are EXACTLY the filtered brute
    // force (the q57/q61 endpoint contract), so q121's SQL gates both
    "q123_ann_filtered_ivf" -> base("q121_ann_filtered"),
    "q124_ann_filtered_indexed" -> base("q121_ann_filtered"),
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
    "q61_ann_ivf_indexed" -> base("q30_ann_topk"),
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
    "q64_range_join" ->
      """SELECT w.window_id, e.event_id
        |FROM events e
        |JOIN (SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
        |      FROM events WHERE event_id % 100 = 0) w
        |  ON e.ts >= w.w_start AND e.ts <= w.w_end
        |ORDER BY window_id, event_id""".stripMargin,
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
    "q69_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name,
        |         CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_nulls,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |         CAST(min(l_orderkey) AS VARCHAR) AS min_s, CAST(max(l_orderkey) AS VARCHAR) AS max_s
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', CAST(count(*) - count(l_returnflag) AS BIGINT),
        |         CAST(count(DISTINCT l_returnflag) AS BIGINT), min(l_returnflag), max(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', CAST(count(*) - count(l_shipdate) AS BIGINT),
        |         CAST(count(DISTINCT l_shipdate) AS BIGINT),
        |         strftime(min(l_shipdate), '%Y-%m-%d'), strftime(max(l_shipdate), '%Y-%m-%d')
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', CAST(count(*) - count(l_quantity) AS BIGINT),
        |         CAST(count(DISTINCT l_quantity) AS BIGINT),
        |         CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,
    "q70_unpivot" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 1000)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    // the ORC round-trip must not change a single value: q19's oracle
    "q71_orc_roundtrip" -> base("q19_events_day_agg"),
    // two-phase salted aggregation must be indistinguishable from the
    // plain GROUP BY (decimal partials are order-independent)
    "q72_salted_agg" ->
      """SELECT user_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the bucketed layout must not change a single value either
    "q73_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
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
    "q75_spend_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, CAST(spend AS DOUBLE) AS spend,
        |       CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS INT) AS decile,
        |       round(percent_rank() OVER (ORDER BY spend DESC, o_custkey), 6) AS pct_rank,
        |       round(cume_dist() OVER (ORDER BY spend DESC, o_custkey), 6) AS cume
        |FROM spend ORDER BY o_custkey""".stripMargin,
    "q76_scalar_subquery" ->
      """SELECT c_custkey,
        |       CAST((SELECT max(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders
        |             WHERE o_custkey = c_custkey) AS DOUBLE) AS max_order,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer
        |WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 10
        |ORDER BY c_custkey""".stripMargin,
    "q77_scd2" ->
      """WITH cur AS (
        |  SELECT o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |         '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
        |  WHERE rn = 1),
        |src AS (
        |  SELECT o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS s_price,
        |         strftime(o_orderdate, '%Y-%m-%d') AS eff
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
        |               count(*) OVER (PARTITION BY o_custkey) AS cnt FROM orders)
        |  WHERE rn = 1 AND cnt >= 2),
        |j AS (SELECT * FROM cur FULL OUTER JOIN src USING (o_custkey))
        |SELECT o_custkey, price, valid_from, valid_to, is_current FROM j
        |WHERE is_current IS NOT NULL AND (eff IS NULL OR price IS NOT DISTINCT FROM s_price)
        |UNION ALL
        |SELECT o_custkey, price, valid_from, eff AS valid_to, 0 AS is_current FROM j
        |WHERE is_current IS NOT NULL AND eff IS NOT NULL AND price IS DISTINCT FROM s_price
        |UNION ALL
        |SELECT o_custkey, s_price AS price, eff AS valid_from,
        |       CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current FROM j
        |WHERE eff IS NOT NULL AND (is_current IS NULL OR price IS DISTINCT FROM s_price)
        |ORDER BY o_custkey, is_current, valid_from""".stripMargin,
    "q78_expectations" ->
      """WITH checks AS (
        |  SELECT 'orders_custkey_fk' AS check_name,
        |         (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_violations,
        |         (SELECT count(*) FROM orders) AS n_checked
        |  UNION ALL
        |  SELECT 'customer_key_unique',
        |         (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |                                GROUP BY c_custkey HAVING count(*) > 1)),
        |         (SELECT count(*) FROM customer)
        |  UNION ALL
        |  SELECT 'orders_orderdate_not_null',
        |         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
        |         (SELECT count(*) FROM orders)
        |  UNION ALL
        |  SELECT 'orders_totalprice_range',
        |         (SELECT count(*) FROM orders WHERE o_totalprice < 0 OR o_totalprice > 450000),
        |         (SELECT count(*) FROM orders))
        |SELECT check_name, n_violations, n_checked,
        |       CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM checks ORDER BY check_name""".stripMargin,
    // q79: the Spark side is APPROXIMATE (hyperplane LSH) but provably
    // exact on this corpus — planted duplicates are scaled copies, and
    // scaling preserves every bucket sign (see the query's scaladoc) —
    // so the exact all-pairs SQL is a true oracle, not a rows-only check
    "q79_semantic_dedup_approx" ->
      """WITH dups AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> CAST(x * 0.5 AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |corpus AS (SELECT vec_id, embedding FROM embeddings UNION ALL SELECT * FROM dups)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // q80: the oracle recomputes the merge's expected delta — updates
    // that WIN the conditional (version 1 > 0; the % 6 half carries
    // version 0 and loses) plus the brand-new keys — which is exactly
    // what the change feed must contain, no more, no less
    "q80_change_feed" ->
      """WITH posts AS (
        |  SELECT c_custkey, c_name || ' v2' AS c_name,
        |         'update_postimage' AS _change_type
        |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 6 <> 0),
        |pres AS (
        |  SELECT c_custkey, c_name, 'update_preimage' AS _change_type
        |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 6 <> 0),
        |inserts AS (
        |  SELECT c_custkey + 1000000 AS c_custkey, c_name, 'insert' AS _change_type
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT * FROM posts UNION ALL SELECT * FROM pres UNION ALL SELECT * FROM inserts
        |ORDER BY c_custkey, _change_type""".stripMargin,
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
    "q82_delete_rows" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    // q83: full recompute of the final state — the incremental path
    // must land on this exactly (decimal-exact sums)
    "q83_incremental_mv" ->
      """SELECT o_custkey,
        |       CAST(sum(CAST(CASE WHEN o_orderkey % 10 = 0
        |                          THEN o_totalprice + 100
        |                          ELSE o_totalprice END AS DECIMAL(18,2)))
        |            AS DOUBLE) AS spend,
        |       count(*) AS n
        |FROM orders
        |WHERE o_orderkey % 17 <> 0
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q84_update_rows" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CASE WHEN o_orderpriority = '1-URGENT'
        |            THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q85_csv_roundtrip" ->
      """SELECT lang, source, count(*) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // q86/q87: a fully independent PQ oracle — because the codebook is
    // the deterministic sha256-rank sample (same cross-engine trick as
    // q59's sampler), DuckDB can rebuild codebook → codes → snapped
    // corpus from `embeddings` alone and brute-force the top-10 the
    // ADC scan must reproduce. Parameters mirror the Spark query:
    // m=8 subspaces × dsub=8 dims, ksub=16 centroids, seed 42, k=10,
    // queries vec_id < 8. Ranking is by score only (values withheld:
    // engines differ in float accumulation; observed score gaps ≫
    // float error, same argument as q29/q30). q87 (IVF-PQ) runs at
    // nprobe = nlist, where the probed cells cover the whole corpus
    // and each row exactly once — identical ADC ranking, same oracle.
    "q86_ann_pq_topk" ->
      (pqAdcCte + """
        |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin)
  )

  /** Shared PQ CTE chain (train → encode → snap → ADC scores): `scored`
    * is (query_id, neighbor_id, score) for the 8 audit queries. Used by
    * q86/q87 (rank output) and q192 (recall vs the exact ranking).
    */
  private def pqAdcCte: String =
      """WITH dv AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), nv AS (
        |  SELECT vec_id,
        |         list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS vn
        |  FROM dv
        |), sub AS (
        |  SELECT vec_id, CAST(j AS INT) AS j, vn[j*8+1 : j*8+8] AS sv,
        |         sha256(CAST(vec_id AS VARCHAR) || ':' || CAST(j AS VARCHAR) || ':42') AS hk
        |  FROM nv, range(8) r(j)
        |), cent AS (
        |  SELECT j, rn - 1 AS c, sv FROM (
        |    SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY hk, vec_id) AS rn
        |    FROM sub)
        |  WHERE rn <= 16
        |), enc AS (
        |  -- rank by the SQUARED distance, summed left-to-right exactly
        |  -- like PqEncode's `d += diff*diff` loop — list_distance takes
        |  -- a sqrt that can collapse two strictly-ordered squared
        |  -- distances into equal doubles, flipping the tie-break
        |  SELECT vec_id, j, c FROM (
        |    SELECT s.vec_id, s.j, ct.c,
        |           row_number() OVER (PARTITION BY s.vec_id, s.j
        |             ORDER BY ((s.sv[1]-ct.sv[1])*(s.sv[1]-ct.sv[1])
        |                     + (s.sv[2]-ct.sv[2])*(s.sv[2]-ct.sv[2])
        |                     + (s.sv[3]-ct.sv[3])*(s.sv[3]-ct.sv[3])
        |                     + (s.sv[4]-ct.sv[4])*(s.sv[4]-ct.sv[4])
        |                     + (s.sv[5]-ct.sv[5])*(s.sv[5]-ct.sv[5])
        |                     + (s.sv[6]-ct.sv[6])*(s.sv[6]-ct.sv[6])
        |                     + (s.sv[7]-ct.sv[7])*(s.sv[7]-ct.sv[7])
        |                     + (s.sv[8]-ct.sv[8])*(s.sv[8]-ct.sv[8])), ct.c) AS rn
        |    FROM sub s JOIN cent ct ON ct.j = s.j)
        |  WHERE rn = 1
        |), snap AS (
        |  SELECT e.vec_id, flatten(list(ct.sv ORDER BY e.j)) AS sv
        |  FROM enc e JOIN cent ct ON ct.j = e.j AND ct.c = e.c
        |  GROUP BY e.vec_id
        |), q AS (
        |  SELECT vec_id AS query_id, vn AS qn FROM nv WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, s.vec_id AS neighbor_id,
        |         list_inner_product(q.qn, s.sv) AS score
        |  FROM q CROSS JOIN snap s
        |  WHERE s.vec_id <> q.query_id
        |)""".stripMargin

  /** q192: PQ recall@10 — the shared ADC `scored` ranking intersected
    * with the exact cosine ranking of the same 8 audit queries.
    */
  private def q192Sql: String =
    pqAdcCte + """,
      |pq AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |             ORDER BY score DESC, neighbor_id) AS rn
      |    FROM scored)
      |  WHERE rn <= 10),
      |ex AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND b.vec_id != a.vec_id)
      |  WHERE rn <= 10)
      |SELECT ex.query_id,
      |       CAST(count(*) AS BIGINT) AS k,
      |       CAST(count(pq.neighbor_id) AS BIGINT) AS hits,
      |       round(CAST(count(pq.neighbor_id) AS DOUBLE) / count(*), 6) AS recall
      |FROM ex LEFT JOIN pq ON pq.query_id = ex.query_id AND pq.neighbor_id = ex.neighbor_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  // q88: selection is by EXACT count (the CMS contributes the
  // within_bound evidence, whose contract holds deterministically at
  // these sizes) — same shape as q49/q50's sketch contracts.
  private val q88Sql: String =
    """SELECT event_type, count(*) AS exact_n, 1 AS within_bound
      |FROM events GROUP BY 1
      |HAVING count(*) >= 0.10 * (SELECT count(*) FROM events)
      |ORDER BY 1""".stripMargin

  /** Queries that provably reproduce another query's output reuse its
    * SQL (q87 = IVF-PQ at nprobe = nlist ≡ q86's flat ADC ranking).
    */
  // q89: the projection VALUES are bit-exact — ±1.0 signs from the
  // shared sha256 rule, and `list_inner_product` accumulates double
  // left-to-right exactly like the codegen DotProduct (verified
  // bit-exact on adversarial mixed-magnitude inputs), so both engines
  // run the identical IEEE op sequence. No decimal casts: double→
  // decimal TIE rounding diverges between engines (Spark rounds the
  // shortest repr, DuckDB the binary expansion) — fixed-order floats
  // are the portable form.
  private val q89Sql: String =
    """WITH r AS (
      |  SELECT j, list(CASE WHEN substring(sha256(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':42'), 1, 1) < '8'
      |                      THEN 1.0 ELSE -1.0 END ORDER BY i) AS srow
      |  FROM (SELECT CAST(a.j AS INT) AS j, CAST(b.i AS INT) AS i
      |        FROM range(16) a(j), range(64) b(i))
      |  GROUP BY j
      |)
      |SELECT e.vec_id, r.j AS out_dim,
      |       list_inner_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), r.srow) AS proj
      |FROM embeddings e, r
      |ORDER BY vec_id, out_dim""".stripMargin

  // q90: bit-exact mean pooling — chunks ordered by vec_id, summed
  // left-to-right per position (list_sum is sequential, verified like
  // q89's list_inner_product), one final divide by the chunk count.
  private val q90Sql: String =
    """WITH c AS (
      |  SELECT vec_id % 50 AS doc, vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |  FROM embeddings
      |), g AS (
      |  SELECT doc, list(ev ORDER BY vec_id) AS chunks FROM c GROUP BY doc
      |)
      |SELECT doc, CAST(i AS INT) AS pos,
      |       list_sum(list_transform(chunks, e -> e[CAST(i AS INT) + 1])) / len(chunks) AS pooled
      |FROM g, range(64) r(i)
      |ORDER BY doc, pos""".stripMargin

  // q91: τ-calibration histogram — q25's co-occurrence jaccard with
  // floor(20·j) binning; j is one integer division so the binning is
  // the same IEEE sequence in both engines.
  private val q91Sql: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
      |       FROM tok WHERE len(toks) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT CAST(floor(CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) * 20) AS INT) AS bin,
      |       count(*) AS n_pairs
      |FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |GROUP BY 1 ORDER BY 1""".stripMargin

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

  // q94/q95: the partitioned DML twins recompute the same final states
  // as q82/q84 — identical SQL, different engine path under test.
  private val q94Sql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal
      |FROM customer
      |WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
      |ORDER BY c_custkey""".stripMargin

  private val q95Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |       CASE WHEN o_orderpriority = '1-URGENT'
      |            THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // q96: partitioned merge with cross-partition moves (every 100th
  // order re-homes to 0-MOVED) and inserts into a created partition
  // (9-NEW) — the oracle recomputes the merged table from scratch.
  private val q96Sql: String =
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey % 100 = 0 THEN '0-MOVED' ELSE o_orderpriority END
      |         AS o_orderpriority,
      |       CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 5 ELSE o_totalprice END
      |         AS o_totalprice
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey + 10000000, '9-NEW', o_totalprice
      |FROM orders WHERE o_orderkey % 7 = 0
      |ORDER BY o_orderkey""".stripMargin

  // q97: q80's expected-delta oracle with the partition column carried
  // through (inserts land in the created SYNTH partition).
  private val q97Sql: String =
    """WITH posts AS (
      |  SELECT c_custkey, c_name || ' v2' AS c_name, c_mktsegment,
      |         'update_postimage' AS _change_type
      |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 6 <> 0),
      |pres AS (
      |  SELECT c_custkey, c_name, c_mktsegment, 'update_preimage' AS _change_type
      |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 6 <> 0),
      |inserts AS (
      |  SELECT c_custkey + 1000000 AS c_custkey, c_name, 'SYNTH' AS c_mktsegment,
      |         'insert' AS _change_type
      |  FROM customer WHERE c_custkey % 7 = 0)
      |SELECT * FROM posts UNION ALL SELECT * FROM pres UNION ALL SELECT * FROM inserts
      |ORDER BY c_custkey, _change_type""".stripMargin

  // q98: data skipping is a plan property — the oracle is the plain
  // range filter the pruned scan must reproduce exactly.
  private val q98Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_custkey BETWEEN 100 AND 200
      |ORDER BY o_orderkey""".stripMargin

  // q99: the planted-copies construction makes the pruned IVF-PQ top-10
  // enumerable in closed form — ten bit-identical-direction copies per
  // query fill every rank, ordered by the id tie-break (see the query's
  // scaladoc for the argument; the empirical score margin is pinned in
  // PqSpec).
  private val q99Sql: String =
    """SELECT CAST(q AS BIGINT) AS query_id, CAST(i + 1 AS INT) AS rank,
      |       CAST(1000000 + q * 100 + i AS BIGINT) AS neighbor_id
      |FROM range(8) a(q), range(10) b(i)
      |ORDER BY query_id, rank""".stripMargin

  // q100: bloom skipping is a plan property — the oracle is the plain
  // IN-list lookup the pruned scan must reproduce exactly.
  private val q100Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_custkey IN (7, 23, 76, 119, 149)
      |ORDER BY c_custkey""".stripMargin

  val all: Map[String, String] =
    preAlias +
      ("q87_ann_ivfpq_topk" -> preAlias("q86_ann_pq_topk")) +
      ("q88_heavy_hitters" -> q88Sql) +
      ("q89_random_projection" -> q89Sql) +
      ("q90_mean_pooling" -> q90Sql) +
      ("q91_similarity_histogram" -> q91Sql) +
      ("q92_bpe_pair_counts" -> q92Sql) +
      ("q93_fuzzy_match" -> q93Sql) +
      ("q94_delete_partitioned" -> q94Sql) +
      ("q95_update_partitioned" -> q95Sql) +
      ("q96_merge_partitioned" -> q96Sql) +
      ("q97_feed_partitioned" -> q97Sql) +
      ("q98_data_skipping" -> q98Sql) +
      ("q99_ann_ivfpq_pruned" -> q99Sql) +
      ("q100_bloom_skipping" -> q100Sql) +
      // q101: same full-recompute oracle as q83 — the partitioned
      // writer's feed must drive the MV to the identical final state
      ("q101_incremental_mv_partitioned" -> preAlias("q83_incremental_mv")) +
      // q102: same full-recompute oracle again — a STREAMED refresh
      // (mvRefreshSink trigger) must land on the identical final state
      ("q102_streaming_mv_refresh" -> preAlias("q83_incremental_mv")) +
      ("q103_quarantine_append" -> q103Sql) +
      // q104: both generated-column populations (backfill rewrite +
      // computed-on-append) must equal DuckDB's own sha-256 of the rows
      ("q104_generated_column" ->
        """SELECT doc_id, sha256(text) AS text_sha
          |FROM documents
          |ORDER BY doc_id""".stripMargin) +
      // q105/q106: the q82 DELETE and q84 UPDATE scenarios through the
      // merge-on-read mechanics (deletion vectors) — identical final
      // states by design, so they share those oracles verbatim; what
      // changes is the machinery under the gate (tombstone write +
      // DV-subtracting read for q105; MOR update + REORG fold for q106)
      ("q105_delete_mor" -> preAlias("q82_delete_rows")) +
      ("q106_update_mor" -> preAlias("q84_update_rows")) +
      // q107: bloom-pruned locate + MOR forget must land on exactly
      // the NOT-requested survivors
      ("q107_gdpr_forget" ->
        """SELECT c_custkey, c_name, c_acctbal
          |FROM customer
          |WHERE c_custkey % 97 <> 0
          |ORDER BY c_custkey""".stripMargin) +
      // q108: rename + drop through the engine's DDL must equal a
      // plain projection of the raw rows
      ("q108_column_ddl" ->
        """SELECT c_custkey, c_acctbal AS balance
          |FROM customer
          |ORDER BY c_custkey""".stripMargin) +
      // q109: a deep clone's rows hash-equal the raw source rows
      ("q109_clone" ->
        """SELECT c_custkey, c_nationkey, c_acctbal
          |FROM customer
          |ORDER BY c_custkey""".stripMargin) +
      // q110: identity VALUES are engine-chosen; the deterministic
      // invariants (all assigned, all distinct, >= START WITH, batch 2
      // beyond batch 1) are what DuckDB recomputes
      ("q110_identity_column" ->
        """SELECT count(*) AS n_rows, count(*) AS n_ids,
          |       1 AS start_ok, 1 AS batches_ordered
          |FROM customer""".stripMargin) +
      // q111: the three as-of states recomputed from the raw table —
      // v0 full, v1 minus the COW delete, v2 minus both deletes
      ("q111_time_travel" ->
        """SELECT 0 AS as_of_v, c_custkey, c_acctbal FROM customer
          |UNION ALL
          |SELECT 1, c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
          |UNION ALL
          |SELECT 2, c_custkey, c_acctbal FROM customer
          |WHERE c_custkey % 3 <> 0 AND c_custkey % 5 <> 0
          |ORDER BY as_of_v, c_custkey""".stripMargin) +
      // q112: the MOR merge's final state — version-rule reprice plus
      // shifted-key inserts — recomputed as CASE + UNION ALL
      ("q112_merge_mor" ->
        """SELECT o_orderkey, o_custkey,
          |       CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
          |            ELSE o_totalprice END AS o_totalprice
          |FROM orders
          |UNION ALL
          |SELECT o_orderkey + 500000000, o_custkey, o_totalprice
          |FROM orders WHERE o_orderkey % 1000 = 0
          |ORDER BY o_orderkey""".stripMargin) +
      // q113: the reference's CTAS + MERGE text run VERBATIM through
      // the SQL front-end — final state recomputed from the raw docs:
      // even ids carry the initial load (updated where id % 12 = 0:
      // matched ∧ watermark ∧ version rule), odd multiples of 3 insert
      ("q113_sql_dml" ->
        """SELECT * FROM (
          |  SELECT CASE WHEN doc_id % 12 = 0
          |              THEN sha256(concat_ws('||', doc_id, 1, '2024-02-01'))
          |              ELSE sha256(concat_ws('||', doc_id, 0, '2023-12-01')) END AS arx_sk,
          |         doc_id AS id,
          |         CASE WHEN doc_id % 12 = 0 THEN 1 ELSE 0 END AS version,
          |         CASE WHEN doc_id % 12 = 0 THEN concat('title_', doc_id)
          |              ELSE concat('orig_', doc_id) END AS title,
          |         CASE WHEN doc_id % 12 = 0 THEN '2024-02-01' ELSE '2023-12-01' END AS updated_dt
          |  FROM documents WHERE doc_id % 2 = 0
          |  UNION ALL
          |  SELECT sha256(concat_ws('||', doc_id, 0, '2024-02-01')),
          |         doc_id, 0, concat('title_', doc_id), '2024-02-01'
          |  FROM documents WHERE doc_id % 2 = 1 AND doc_id % 3 = 0
          |) ORDER BY id""".stripMargin) +
      // q114: the full-clause MERGE final state on both paths — CASE
      // reprice + stale flag, anti-filters for the two delete actions,
      // UNION for the conditional inserts; identical recompute per path
      ("q114_merge_full_clauses" -> {
        val onePath =
          """SELECT o_orderkey, o_custkey,
            |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 50
            |         ELSE o_totalprice END AS o_totalprice,
            |    CASE WHEN o_orderkey % 5 = 0 THEN 1
            |         WHEN o_orderkey % 13 = 0 THEN -1 ELSE 0 END AS version
            |  FROM orders
            |  WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 20 = 0)
            |    AND NOT (o_orderkey % 5 <> 0 AND o_orderkey % 997 = 0)
            |  UNION ALL
            |  SELECT o_orderkey + 900000000, o_custkey, o_totalprice, 1
            |  FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 20 <> 0""".stripMargin
        s"""SELECT 'cow' AS path, * FROM (
           |  $onePath
           |) UNION ALL
           |SELECT 'mor' AS path, * FROM (
           |  $onePath
           |) ORDER BY path, o_orderkey""".stripMargin
      }) +
      // q115: positioned 8-gram anchors joined on the gram, diagonal
      // gaps-and-islands for the longest exact shared run — the same
      // relational formulation as Dedup.substringPairs
      ("q115_substring_pairs" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
          |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) u
          |  WHERE len(t) >= 8),
          |m AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
          |runs AS (
          |  SELECT doc_a, doc_b, pa - pb AS diag, pa,
          |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
          |  FROM m),
          |runlen AS (
          |  SELECT doc_a, doc_b, count(*) + 7 AS run_tokens
          |  FROM runs GROUP BY doc_a, doc_b, diag, grp),
          |agg AS (
          |  SELECT doc_a, doc_b, count(*) AS n_anchors FROM m GROUP BY doc_a, doc_b),
          |ml AS (
          |  SELECT doc_a, doc_b, max(run_tokens) AS max_run FROM runlen GROUP BY doc_a, doc_b)
          |SELECT agg.doc_a, agg.doc_b, agg.n_anchors, ml.max_run
          |FROM agg JOIN ml USING (doc_a, doc_b)
          |ORDER BY agg.doc_a, agg.doc_b""".stripMargin) +
      // q116: the q114 COW scenario driven by MERGE SQL text — same
      // recompute, single path
      ("q116_sql_merge_clauses" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey,
          |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 50
          |         ELSE o_totalprice END AS o_totalprice,
          |    CASE WHEN o_orderkey % 5 = 0 THEN 1
          |         WHEN o_orderkey % 13 = 0 THEN -1 ELSE 0 END AS version
          |  FROM orders
          |  WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 20 = 0)
          |    AND NOT (o_orderkey % 5 <> 0 AND o_orderkey % 997 = 0)
          |  UNION ALL
          |  SELECT o_orderkey + 900000000, o_custkey, o_totalprice, 1
          |  FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 20 <> 0
          |) ORDER BY o_orderkey""".stripMargin) +
      // q117: incremental-zorder table read back through the pruned
      // scan must equal the plain range filter over base ∪ tail
      ("q117_zorder_incremental" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, o_totalprice + 1000
          |  FROM orders WHERE o_orderkey % 100 = 0
          |) WHERE o_custkey BETWEEN 100 AND 200
          |ORDER BY o_custkey, o_orderkey, o_totalprice""".stripMargin) +
      // q118: the indexed probe must emit exactly the full q115 pair
      // set restricted to pairs involving a batch (doc_id % 3 = 0) doc
      ("q118_incremental_substring" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
          |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) u
          |  WHERE len(t) >= 8),
          |m AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
          |runs AS (
          |  SELECT doc_a, doc_b, pa - pb AS diag, pa,
          |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
          |  FROM m),
          |runlen AS (
          |  SELECT doc_a, doc_b, count(*) + 7 AS run_tokens
          |  FROM runs GROUP BY doc_a, doc_b, diag, grp),
          |agg AS (
          |  SELECT doc_a, doc_b, count(*) AS n_anchors FROM m GROUP BY doc_a, doc_b),
          |ml AS (
          |  SELECT doc_a, doc_b, max(run_tokens) AS max_run FROM runlen GROUP BY doc_a, doc_b)
          |SELECT agg.doc_a, agg.doc_b, agg.n_anchors, ml.max_run
          |FROM agg JOIN ml USING (doc_a, doc_b)
          |WHERE agg.doc_a % 3 = 0 OR agg.doc_b % 3 = 0
          |ORDER BY agg.doc_a, agg.doc_b""".stripMargin) +
      // q119: the q114/q116 recompute with the partition column riding
      // along — the partitioned writer must land identical values
      ("q119_merge_clauses_partitioned" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey,
          |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 50
          |         ELSE o_totalprice END AS o_totalprice,
          |    CASE WHEN o_orderkey % 5 = 0 THEN 1
          |         WHEN o_orderkey % 13 = 0 THEN -1 ELSE 0 END AS version,
          |    o_orderpriority
          |  FROM orders
          |  WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 20 = 0)
          |    AND NOT (o_orderkey % 5 <> 0 AND o_orderkey % 997 = 0)
          |  UNION ALL
          |  SELECT o_orderkey + 900000000, o_custkey, o_totalprice, 1, o_orderpriority
          |  FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 20 <> 0
          |) ORDER BY o_orderkey""".stripMargin) +
      // q120: fixed-merge BPE token counts — each merge applied as a
      // per-word leftmost-replace FIXPOINT (≡ greedy left-to-right
      // non-overlapping tiling; a created token never re-matches its
      // own pattern, so iterating the leftmost replace is exact)
      ("q120_bpe_token_counts" ->
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
          |m2f AS (SELECT doc_id, s FROM m2 WHERE NOT contains(s, ' th e '))
          |SELECT doc_id, CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT) AS n_tokens
          |FROM m2f GROUP BY doc_id ORDER BY doc_id""".stripMargin) +
      // q126: the q120 tokenizer counts (+1 EOS per doc, zero-token
      // docs kept via LEFT JOIN) fed through the q68 shard-local
      // packing cumsum
      ("q126_tokenizer_packing" ->
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
          |FROM cum ORDER BY source, doc_id""".stripMargin) +
      // q127: the stage-sequential dedup funnel — exact keeps min
      // doc_id per text group; near = exact 3-gram Jaccard >= 0.5
      // losers among exact survivors (the q26 contract: LSH+verify ==
      // exact); substring = 8-gram anchor pairs among near survivors
      ("q127_dedup_report" ->
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
          |GROUP BY d.source ORDER BY d.source""".stripMargin) +
      // q128: remaining C4/Gopher rules — symbol ratio, bullet-start /
      // ellipsis-end / short-line fractions, Gopher-threshold keep
      ("q128_c4_gopher_rules" ->
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
          |FROM m ORDER BY doc_id""".stripMargin) +
      // q129: net effect of the bounded [v1, v2] range — the v1 +100
      // post-image of a v2-deleted row cancels against its own
      // pre-image, so only the original image's delete survives for
      // %60 keys, while %30-surviving keys net a delete+insert pair
      ("q129_change_feed_range" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice,
          |         CAST(0 AS BIGINT) AS n_added, CAST(1 AS BIGINT) AS n_removed,
          |         CAST(-1 AS BIGINT) AS net, 'delete' AS _change_type
          |  FROM orders WHERE o_orderkey % 30 = 0
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, o_totalprice + 100,
          |         CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'insert'
          |  FROM orders WHERE o_orderkey % 30 = 0 AND o_orderkey % 60 <> 0
          |) ORDER BY o_orderkey, _change_type""".stripMargin) +
      // q130: deterministic K-per-group sample — both engines rank the
      // same sha256(source:doc_id) hex strings
      ("q130_group_sample" ->
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
          |FROM r WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin) +
      // q131: floor(log2) via binary-string length — exact integers,
      // no float-log ulp flip at powers of two
      ("q131_length_batches" ->
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
          |FROM r ORDER BY source, bucket, batch_id, batch_pos""".stripMargin) +
      // q132: the q63 funnel's survivors packed shard-locally — the
      // funnel SQL nests verbatim as a CTE, then one join back to the
      // text and the q68 window
      ("q132_curated_packing" -> {
        val funnel = preAlias("q63_curation_pipeline")
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
      }) +
      // q133: unigram LM trained on the corpus itself, scored as
      // bits-per-token — per-term doubles are single IEEE ops, the
      // per-doc sum runs in DECIMAL(18,12) (the q74 discipline)
      ("q133_unigram_lm_bits" ->
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
          |GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin) +
      // q134/q135: boilerplate 5-gram mining and the per-doc fraction
      // policy; grams are DISTINCT per doc (list_distinct ≡ the native
      // shingle expression), the flag compares in integer arithmetic
      ("q134_boilerplate_ngrams" ->
        """WITH w AS (
          |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |grams AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    list_transform(range(1, len(toks) - 3),
          |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
          |  FROM w WHERE len(toks) >= 5)
          |SELECT gram, count(*) AS n_docs
          |FROM grams GROUP BY gram HAVING count(*) >= 3
          |ORDER BY n_docs DESC, gram""".stripMargin) +
      ("q135_boilerplate_fraction" ->
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
          |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) +
      // q136: the per-doc feature-store row — lang ID, token stats,
      // entropy, corpus-LM bits, boilerplate share assembled from ONE
      // (doc, token) aggregation; all double terms decimal-summed
      ("q136_doc_features" -> {
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
      }) +
      // q137: equal-share mixture rebalancing plan — integer targets,
      // single-division rates (bit-identical cross-engine, unrounded)
      ("q137_mixture_plan" ->
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
          |FROM tgt ORDER BY source""".stripMargin) +
      // q138–q140: the k-means family. The CTE replays both Lloyd
      // iterations relationally with the SAME exactness scheme the
      // engine uses: 1/1024 integer-grid quantization (exact), BIGINT
      // component sums (order-independent) finished by one IEEE
      // division, |v|²−2·v·c+|c|² distances via list_inner_product
      // (accumulation parity with the codegen DotProduct, q29-proven),
      // tie-break on cluster id.
      ("q138_kmeans_clusters" ->
        s"""$kmeansCte
           |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
           |FROM a2 ORDER BY vec_id""".stripMargin) +
      // q139: SemDeDup — within-cluster cosine ≥ 0.45 pairs drop the
      // larger id; survivors keep their cluster
      ("q139_semdedup" ->
        s"""$kmeansCte,
           |losers AS (
           |  SELECT DISTINCT b.vec_id AS vec_id
           |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           |  JOIN embeddings ea ON ea.vec_id = a.vec_id
           |  JOIN embeddings eb ON eb.vec_id = b.vec_id
           |  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.45)
           |SELECT a2.vec_id, CAST(a2.cluster AS INTEGER) AS cluster
           |FROM a2 WHERE a2.vec_id NOT IN (SELECT vec_id FROM losers)
           |ORDER BY a2.vec_id""".stripMargin) +
      // q140: 16-per-cluster balanced draw by the deterministic
      // sha256(vec_id) rule (the q59 discipline per cluster)
      ("q140_cluster_balanced_sample" ->
        s"""$kmeansCte
           |SELECT CAST(cluster AS INTEGER) AS cluster,
           |       CAST(rn AS BIGINT) AS draw_rank, vec_id FROM (
           |  SELECT cluster, vec_id,
           |         row_number() OVER (PARTITION BY cluster
           |           ORDER BY sha256(CAST(vec_id AS VARCHAR))) AS rn
           |  FROM a2)
           |WHERE rn <= 16 ORDER BY cluster, draw_rank""".stripMargin) +
      // q141: nearest-centroid classifier — per-label exact-grid means
      // on the 80% train split, argmin prediction on the held-out fifth
      ("q141_centroid_classifier" ->
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
          |FROM pred ORDER BY vec_id""".stripMargin) +
      // q142: pruned-IVF recall@5 vs brute force — full relational
      // replay of clustering, probe selection, both top-5s and the
      // intersection (deterministic end-to-end, so recall is EXACT)
      ("q142_ann_recall" ->
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
           |WHERE q.vec_id < 10 ORDER BY query_id""".stripMargin) +
      // q143: quality-aware dedup representative — q38's closure +
      // q133's LM bits, argmin (bits, id) per cluster
      ("q143_dedup_keep_best" ->
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
          |FROM sel WHERE rn = 1 ORDER BY cluster_id""".stripMargin) +
      // q144: hard negatives — top-5 by cosine among DIFFERENT-label
      // vectors (label inequality also excludes self)
      ("q144_hard_negatives" ->
        """SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, neighbor_label FROM (
          |  SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
          |         s.label AS neighbor_label,
          |         row_number() OVER (PARTITION BY q.vec_id
          |           ORDER BY list_cosine_similarity(q.embedding, s.embedding) DESC,
          |                    s.vec_id) AS rn
          |  FROM embeddings q JOIN embeddings s ON s.label <> q.label
          |  WHERE q.vec_id < 10)
          |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin) +
      // q145: per-source KL(source ‖ corpus) in bits — q133's decimal
      // discipline (single-IEEE-op terms, DECIMAL(18,12) sum, round 6)
      ("q145_source_drift" ->
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
          |FROM terms GROUP BY source, n_src ORDER BY source""".stripMargin) +
      // q146: execute the q137 plan — per-doc sha256 draw at each
      // source's planned rate (floor(rate·2³²) hash threshold)
      ("q146_mixture_draw" ->
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
          |ORDER BY d.doc_id""".stripMargin) +
      // q147: keep each source's best half by LM bits (rank ≤ ⌈n/2⌉,
      // integer arithmetic; q133's scoring replayed verbatim)
      ("q147_quality_percentile" ->
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
          |ORDER BY doc_id""".stripMargin) +
      // q148: per-source report card — q133 bits + q145 KL + q17 dedup
      // counts recomputed from one token table
      ("q148_source_report" ->
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
          |ORDER BY mb.source""".stripMargin) +
      // q149: curriculum rank of q68 bins by mean LM bits (decimal
      // per-bin mean, global rank tie-broken on source/bin)
      ("q149_curriculum_order" ->
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
          |FROM per ORDER BY curriculum_rank""".stripMargin) +
      // q150: per-source OOV rate vs the deterministic top-1000 vocab
      // (count desc, token asc), integer counts + one division
      ("q150_oov_rate" ->
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
          |GROUP BY t.source ORDER BY t.source""".stripMargin) +
      // q151: span-level decontamination — cut exactly the positions
      // covered by eval 8-grams, reassemble in token order
      ("q151_span_decontamination" ->
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
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) +
      // q152: intra-doc repeated-span removal — non-first occurrences
      // of a doc's own 8-grams cut their spans, first kept
      ("q152_repetition_scrub" ->
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
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) +
      // q153: bigram-LM bits-per-transition — ML conditional
      // c(w1w2)/c(w1·), q133's decimal discipline pair-keyed
      ("q153_bigram_lm_bits" ->
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
          |GROUP BY doc_id, n_transitions ORDER BY doc_id""".stripMargin) +
      // q154: cross-source mirror matrix — shared exact content keys
      ("q154_source_overlap" ->
        """WITH keyed AS (
          |  SELECT DISTINCT sha256(array_to_string(list_sort(list_distinct(
          |    string_split_regex(text, '\s+'))), ' ')) AS ck, source FROM documents)
          |SELECT a.source AS source_a, b.source AS source_b,
          |       CAST(count(*) AS BIGINT) AS n_shared_keys
          |FROM keyed a JOIN keyed b ON a.ck = b.ck AND a.source < b.source
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) +
      // q155: ordered funnel — first view, first click after it, first
      // purchase after that; (ts, event_id) tie-break throughout
      ("q155_funnel" ->
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
          |ORDER BY s1.user_id""".stripMargin) +
      // q156: retention cohorts — first signup day x active-day offset
      ("q156_retention_cohorts" ->
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
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) +
      // q158: view→purchase conversion latency (whole seconds) for
      // funnel completers — same min-chained stages as q155
      ("q158_time_to_convert" ->
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
          |ORDER BY s1.user_id""".stripMargin) +
      // q157: per-user event-type transition matrix + row-normalized
      // probability (one division per cell)
      ("q157_event_transitions" ->
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
          |FROM m ORDER BY prev_type, next_type""".stripMargin) +
      // q159: last-touch attribution — ignore-nulls carry of the last
      // click per user + a 7-day RANGE touch count, whole-second epochs
      ("q159_attribution" ->
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
          |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin) +
      // q160: daily-volume anomaly flags — z²≥4 cleared of divisions,
      // evaluated in BIGINT over the trailing up-to-7 observed days
      ("q160_daily_anomaly" ->
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
          |FROM w ORDER BY event_type, day""".stripMargin) +
      // q161: truncation-loss telemetry at max_len = 64 whitespace
      // tokens; loss_frac is the single allowed division
      ("q161_truncation_loss" ->
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
          |GROUP BY source ORDER BY source""".stripMargin) +
      // q162: per-doc distinct-8-gram novelty — min-doc_id gram
      // ownership, q66's shingle semantics (raw split, list_distinct)
      ("q162_ngram_novelty" -> {
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
      }) +
      // q163: RFM terciles — pure integer rank arithmetic, decimal-
      // summed monetary, whole-second recency anchored at max event ts
      ("q163_rfm_segments" ->
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
          |FROM ranked ORDER BY user_id""".stripMargin) +
      // q164: per-source inventory before/after near-dup collapse —
      // the q38 closure + q39's keeper rule, then one source aggregate
      ("q164_mixture_dedup_shift" -> (nearDupClosureCte +
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
          |FROM s ORDER BY source""".stripMargin)) +
      // q165: near-dup cluster-size histogram incl. singletons
      ("q165_cluster_size_histogram" -> (nearDupClosureCte +
        """,
          |csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
          |        FROM comp GROUP BY cluster_id),
          |hist AS (
          |  SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM csz GROUP BY size
          |  UNION ALL
          |  SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT)
          |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
          |  WHERE c.doc_id IS NULL)
          |SELECT size, n_clusters, size * n_clusters AS n_docs
          |FROM hist WHERE n_clusters > 0 ORDER BY size""".stripMargin)) +
      // q166: top-K vocab coverage under the deterministic BPE-pick
      // ordering (count desc, token asc)
      ("q166_vocab_coverage" ->
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
          |GROUP BY 1, 3 ORDER BY 1""".stripMargin) +
      // q167: declared-vs-detected lang mismatch per source (q21's
      // marker rule, one per-row prediction + a sources-sized agg)
      ("q167_lang_mismatch" -> {
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
      }) +
      // q168: deterministic epoch shuffle — sha256(epoch:doc_id) key,
      // first hex char shards, full key orders within the shard
      ("q168_epoch_shuffle" ->
        """WITH keyed AS (
          |  SELECT e.epoch, d.doc_id,
          |         sha256(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS k
          |  FROM documents d CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
          |SELECT CAST(epoch AS BIGINT) AS epoch, substr(k, 1, 1) AS shard,
          |       CAST(row_number() OVER (PARTITION BY epoch, substr(k, 1, 1) ORDER BY k)
          |         AS BIGINT) AS pos,
          |       doc_id
          |FROM keyed ORDER BY epoch, shard, pos""".stripMargin) +
      // q169: exact per-source token-length quantiles by integer rank
      // selection — value at rank (q*n + 99) div 100
      ("q169_source_length_quantiles" ->
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
          |FROM rk GROUP BY source ORDER BY source""".stripMargin) +
      // q170: embedding-quality gate — decimal-summed squared norms,
      // NaN/Inf guarded to NULL exactly like the engine
      ("q170_embedding_quality" ->
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
          |FROM n3 GROUP BY label ORDER BY label""".stripMargin) +
      // q171: gap-session conversion per session-start day (q37's
      // session rule + a purchase flag)
      ("q171_session_conversion" ->
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
          |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin) +
      // q172: boilerplate span removal — df>=3 5-grams cut everywhere,
      // q151/q152's covered-position reassembly
      ("q172_boilerplate_scrub" ->
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
          |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) +
      // q173: DSIR importance weights — Laplace-smoothed unigram
      // log-likelihood ratio (target = lang 'en') summed per doc in
      // DECIMAL(18,12) (the q133 order-independence convention), top
      // quarter by rounded weight selected
      ("q173_dsir_weights" ->
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
          |FROM r ORDER BY doc_id""".stripMargin) +
      // q174: DAU / trailing-7-day WAU stickiness over the distinct
      // user-day table
      ("q174_stickiness" ->
        """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
          |days AS (SELECT DISTINCT day AS d FROM ud),
          |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          |        FROM ud GROUP BY 1),
          |wau AS (SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
          |        FROM days JOIN ud ON ud.day >= d - 6 AND ud.day <= d GROUP BY 1)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
          |       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
          |FROM dau JOIN wau USING (day) ORDER BY 1""".stripMargin) +
      // q175: per-source keyness — +1-smoothed log-odds vs the rest of
      // the corpus (rest counts by subtraction from the global model),
      // top-5 per source
      ("q175_source_keyness" ->
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
          |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin) +
      // q176: diagonal-Mahalanobis whitened norms — per-dim moments in
      // DECIMAL sums, standardized squared terms re-summed in DECIMAL
      ("q176_embedding_whitening" ->
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
          |FROM flat f JOIN mm USING (dim) GROUP BY 1 ORDER BY 1""".stripMargin) +
      // q177: Pareto revenue deciles — q163's integer-rank cut over
      // DECIMAL-summed spend, running share over the 10-row rollup
      ("q177_revenue_deciles" ->
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
          |FROM c ORDER BY decile""".stripMargin) +
      // q178: Efraimidis–Spirakis weighted sample — 52-bit sha uniform,
      // key = ln(u)/weight, top-50 by the unrounded key
      ("q178_weighted_sample" ->
        """WITH keyed AS (
          |  SELECT doc_id, source, n_chars,
          |         ln((('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
          |             + 0.5) / 4503599627370496.0) / n_chars AS k
          |  FROM documents WHERE n_chars > 0),
          |top AS (SELECT doc_id, source, n_chars, k FROM keyed
          |        ORDER BY k DESC, doc_id LIMIT 50)
          |SELECT doc_id, source, n_chars, round(k, 6) AS sample_key
          |FROM top ORDER BY doc_id""".stripMargin) +
      // q179: directed near-containment pairs — q25's shared-shingle
      // join, both directions, normalized by the contained side's size
      ("q179_containment_pairs" ->
        """WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
          |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
          |       FROM tok WHERE len(toks) >= 3),
          |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
          |shared AS (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS n_shared
          |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |           GROUP BY 1, 2),
          |directed AS (
          |  SELECT lo AS id_a, hi AS id_b, n_shared FROM shared
          |  UNION ALL
          |  SELECT hi AS id_a, lo AS id_b, n_shared FROM shared)
          |SELECT id_a, id_b, n_shared, sa.sz AS size_a,
          |       CAST(n_shared AS DOUBLE) / sa.sz AS containment
          |FROM directed JOIN sizes sa ON sa.doc_id = id_a
          |WHERE CAST(n_shared AS DOUBLE) / sa.sz >= 0.8
          |ORDER BY id_a, id_b""".stripMargin) +
      // q180: content-addressed split assignment — same salted sha
      // byte, same threshold strings, recomputed from scratch
      ("q180_split_assignment" ->
        """WITH s AS (
          |  SELECT source, n_chars,
          |         substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
          |  FROM documents)
          |SELECT source,
          |       CASE WHEN b < 'cc' THEN 'train'
          |            WHEN b < 'e6' THEN 'val' ELSE 'test' END AS split,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS n_chars
          |FROM s GROUP BY 1, 2 ORDER BY source, split""".stripMargin) +
      // q181: k-anonymity rollup — the same quasi-identifier grid
      // (type, day, value // 50) and the same k = 5 bar
      ("q181_k_anonymity" ->
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
          |FROM combos GROUP BY 1 ORDER BY event_type""".stripMargin) +
      // q205: mergeable quantile ledger — the oracle pins the exact
      // rank-selected quantiles and expects the bound flags to be 1
      // q206: the 32x2 banding S-curve — explicit squaring chain, no
      // pow/exp (libm last-bit divergence), zero data
      ("q206_lsh_curve" ->
        """WITH g AS (SELECT CAST(i * 5 AS BIGINT) AS pct FROM range(1, 20) t(i)),
          |c AS (
          |  SELECT pct,
          |         (1.0 - (pct / 100.0) * (pct / 100.0)) AS m
          |  FROM g),
          |p AS (
          |  SELECT pct,
          |         ((((m*m)*(m*m)) * ((m*m)*(m*m))) * (((m*m)*(m*m)) * ((m*m)*(m*m))))
          |         * (((((m*m)*(m*m)) * ((m*m)*(m*m))) * (((m*m)*(m*m)) * ((m*m)*(m*m))))) AS m32
          |  FROM c)
          |SELECT pct, round(CAST(1.0 AS DOUBLE) - m32, 6) AS p_candidate
          |FROM p ORDER BY pct""".stripMargin) +
      ("q205_quantile_sketch" ->
        """WITH r AS (
          |  SELECT event_type, value,
          |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM events)
          |SELECT event_type,
          |       max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50_exact,
          |       max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90_exact,
          |       CAST(1 AS INT) AS within50, CAST(1 AS INT) AS within90
          |FROM r WHERE rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10
          |GROUP BY event_type ORDER BY event_type""".stripMargin) +
      // q208: PSI first-week vs last-week — Laplace-smoothed exact
      // fractions through ln, DECIMAL terms, verdict off the rounded
      // sum; window length clamps to half the day span so the two
      // windows are always disjoint, and span/window days are reported
      ("q208_psi_drift" ->
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
          |FROM agg ORDER BY event_type""".stripMargin) +
      // q207: weekly load grid — dow normalized to 0=Sunday (DuckDB's
      // native dayofweek) ≡ Spark's dayofweek()-1
      ("q207_seasonality" ->
        """WITH cells AS (
          |  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
          |         CAST(hour(ts) AS BIGINT) AS hod,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT dow, hod, n,
          |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT), 6) AS dow_share
          |FROM cells ORDER BY dow, hod""".stripMargin) +
      // q203: l-diversity — distinct sensitive values per QI combo,
      // days-sized rollup (day emitted as a string, house rule)
      ("q203_l_diversity" ->
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
          |FROM combos GROUP BY day ORDER BY day""".stripMargin) +
      // q204: anonymity-set size histogram over the q181 grid
      ("q204_anonymity_histogram" ->
        """WITH combos AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(floor(value / 50.0) AS BIGINT) AS vb,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS users,
          |         CAST(count(*) AS BIGINT) AS n_rows
          |  FROM events GROUP BY 1, 2, 3)
          |SELECT least(users, 5) AS bucket,
          |       CAST(count(*) AS BIGINT) AS n_combos,
          |       CAST(sum(n_rows) AS BIGINT) AS n_rows
          |FROM combos GROUP BY 1 ORDER BY bucket""".stripMargin) +
      // q182: char-level entropy — per-char explode, −p·ln p / ln 2
      // DECIMAL terms (the q74/q133 discipline)
      ("q182_char_entropy" ->
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
          |GROUP BY doc_id, n_chars_tok ORDER BY doc_id""".stripMargin) +
      ("q183_minhash_calibration" -> q183Sql) +
      // q184: exact microsecond gaps off the same per-user window,
      // DECIMAL moment sums, doubles only in the final division
      ("q184_burstiness" ->
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
          |FROM m ORDER BY user_id""".stripMargin) +
      // q185: the q120 fixed-merge recursive tokenizer, rolled up to
      // languages with whitespace-word denominators
      ("q185_tokenizer_fertility" ->
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
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin) +
      // q186: the q37 sessionizer verbatim, rolled into an integer-
      // exact duration-magnitude histogram (digits of whole seconds)
      ("q186_session_stats" ->
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
          |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) +
      // q187: majority label per exact-k-means cluster — the shared
      // kmeansCte assignment joined to labels, ranked per cluster
      ("q187_cluster_purity" ->
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
           |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin) +
      // q188: lower-median/MAD by integer rank — exact longs, no
      // interpolation; 3xMAD outlier flag in integer arithmetic
      ("q188_length_outliers" ->
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
          |GROUP BY dev.source ORDER BY dev.source""".stripMargin) +
      // q189: per-source type/token ratio and hapax share
      ("q189_hapax_richness" ->
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
          |FROM tf GROUP BY source ORDER BY source""".stripMargin) +
      // q190: PMI collocations — exact integer counts, scalar totals,
      // identical IEEE division chain, top-50 on the unrounded score
      ("q190_pmi_collocations" ->
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
          |SELECT bigram, c_ab, round(pmi, 6) AS pmi FROM top ORDER BY bigram""".stripMargin) +
      ("q191_split_leakage" -> q191Sql) +
      ("q192_pq_recall" -> q192Sql) +
      ("q199_rrf_fusion" -> q199Sql) +
      // q201: percent-rank blend — (rank-1)/(n-1) on integer-derived
      // orderings, identical double chain
      ("q201_quality_blend" ->
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
          |FROM ranked ORDER BY doc_id""".stripMargin) +
      // q202: winsorized mean — integer-rank P10/P90 bounds, DECIMAL
      // sums, doubles only in the final division
      ("q202_winsorized_mean" ->
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
          |GROUP BY d.source ORDER BY d.source""".stripMargin) +
      // q200: the per-source datacard — one pass, sources-sized rollup
      ("q200_datacard" ->
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
          |FROM d GROUP BY source ORDER BY source""".stripMargin) +
      // q193: c-TF-IDF topic terms per exact-k-means cluster — q60's
      // smoothed idf over CLUSTERS, top-3 on the unrounded score
      // q194: market-basket lift over distinct (user, type) — exact
      // integer supports, one division chain
      ("q194_event_lift" ->
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
          |ORDER BY type_a, type_b""".stripMargin) +
      // q198: BM25 (k1=1.2, b=0.75, Lucene idf) — DECIMAL per-term
      // scores, identical double chain, top-20 on the exact sum
      ("q198_bm25" ->
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
          |SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS score FROM top ORDER BY doc_id""".stripMargin) +
      // q196: 3-step path mining — same (ts, event_id) order, top-20
      // on (count desc, path asc), re-sorted by path for the hash
      ("q196_user_paths" ->
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
          |SELECT path, n FROM top ORDER BY path""".stripMargin) +
      // q197: Pearson r from exact decimal moment sums, combined in
      // double with the identical IEEE op sequence
      ("q197_signal_correlation" -> q197Sql) +
      // q195: mean simhash hamming per exact-Jaccard decile — the
      // shared portable signature (q27) against the q25 candidates
      ("q195_simhash_calibration" ->
        s"""WITH sigs AS ($simhashSigSql),
           |tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
           |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
           |       FROM tok WHERE len(toks) >= 3),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |           GROUP BY 1, 2),
           |pairs AS (
           |  SELECT id_a, id_b,
           |         CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
           |  FROM shared JOIN sizes sa ON sa.doc_id = id_a
           |              JOIN sizes sb ON sb.doc_id = id_b),
           |terms AS (
           |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
           |         CAST(jaccard AS DECIMAL(18,12)) AS j,
           |         CAST(list_sum(list_transform(range(64), i ->
           |           CASE WHEN substring(a.sig, i+1, 1) = substring(b.sig, i+1, 1)
           |                THEN 0 ELSE 1 END)) AS BIGINT) AS h
           |  FROM pairs JOIN sigs a ON a.doc_id = id_a JOIN sigs b ON b.doc_id = id_b)
           |SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
           |       round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS mean_exact,
           |       round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS mean_hamming
           |FROM terms GROUP BY decile ORDER BY decile""".stripMargin) +
      ("q193_cluster_topics" ->
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
           |WHERE rn <= 3 ORDER BY cluster, rank""".stripMargin)

  /** Shared near-dup closure CTE (the q38/q39/q47 machinery): distinct
    * 3-gram shingles → Jaccard ≥ 0.5 pairs → recursive reachability →
    * `comp` = (doc_id, cluster_id) for every clustered doc. Reused by
    * the q164 mixture shift and the q165 size histogram.
    */
  private def nearDupClosureCte: String =
    """WITH RECURSIVE
      |tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
      |       FROM tok WHERE len(toks) >= 3),
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
      |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |         FROM reach GROUP BY src)""".stripMargin

  /** Shared k-means CTE (k = 8, two assignment passes, one exact
    * integer-sum centroid update): `a2` is the final (vec_id, cluster)
    * assignment. Mirrors [[graft.operators.Clustering.kmeans]]
    * step-for-step; see the q138 comment for the exactness argument.
    */
  private def kmeansCte: String =
    """WITH v AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
      |  FROM embeddings),
      |vd AS (SELECT vec_id, vq, list_transform(vq, x -> CAST(x AS DOUBLE)) AS dv FROM v),
      |init AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, dv AS cent
      |  FROM vd ORDER BY vec_id LIMIT 8),
      |a1 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vd.vec_id, i.cluster,
      |           row_number() OVER (PARTITION BY vd.vec_id
      |             ORDER BY list_inner_product(vd.dv, vd.dv)
      |                      - 2 * list_inner_product(vd.dv, i.cent)
      |                      + list_inner_product(i.cent, i.cent), i.cluster) AS rn
      |    FROM vd CROSS JOIN init i) WHERE rn = 1),
      |comp1 AS (
      |  SELECT a1.cluster, generate_subscripts(vd.vq, 1) AS pos, unnest(vd.vq) AS val
      |  FROM vd JOIN a1 USING (vec_id)),
      |c1 AS (
      |  SELECT cluster, list(comp ORDER BY pos) AS cent FROM (
      |    SELECT cluster, pos, CAST(sum(val) AS DOUBLE) / count(*) AS comp
      |    FROM comp1 GROUP BY cluster, pos) GROUP BY cluster),
      |a2 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vd.vec_id, c.cluster,
      |           row_number() OVER (PARTITION BY vd.vec_id
      |             ORDER BY list_inner_product(vd.dv, vd.dv)
      |                      - 2 * list_inner_product(vd.dv, c.cent)
      |                      + list_inner_product(c.cent, c.cent), c.cluster) AS rn
      |    FROM vd CROSS JOIN c1 c) WHERE rn = 1)""".stripMargin

  /** q183: replay the PORTABLE 16-component MinHash signature (two
    * sha-256 digests per shingle, 8-hex-char chunks, min per
    * component) and the exact shared-shingle Jaccard, then roll the
    * estimator error up by exact-Jaccard decile — the component list
    * is generated, not hand-written, so engine and oracle can't drift.
    */
  private def q183Sql: String = {
    val comps = (0 until 16).map { i =>
      val src = if (i < 8) "h1" else "h2"
      s"min(substring($src, ${1 + 8 * (i % 8)}, 8)) AS m$i"
    }.mkString(",\n|         ")
    val eq = (0 until 16)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
       |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
       |       FROM tok WHERE len(toks) >= 3),
       |hx AS (SELECT doc_id, sha256(s) AS h1, sha256('x' || s) AS h2 FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $comps
       |  FROM hx GROUP BY doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b,
       |         CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
       |  FROM shared JOIN sizes sa ON sa.doc_id = id_a
       |              JOIN sizes sb ON sb.doc_id = id_b),
       |est AS (
       |  SELECT p.jaccard, ($eq) / 16.0 AS est
       |  FROM pairs p JOIN sig a ON a.doc_id = p.id_a JOIN sig b ON b.doc_id = p.id_b),
       |terms AS (
       |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
       |         CAST(jaccard AS DECIMAL(18,12)) AS j,
       |         CAST(est AS DECIMAL(18,12)) AS e,
       |         CAST(abs(est - jaccard) AS DECIMAL(18,12)) AS ae
       |  FROM est)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS mean_exact,
       |       round(CAST(sum(e) AS DOUBLE) / count(*), 6) AS mean_est,
       |       round(CAST(sum(ae) AS DOUBLE) / count(*), 6) AS mean_abs_err
       |FROM terms GROUP BY decile ORDER BY decile""".stripMargin
  }

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

  /** q199: RRF(60) of the exact and ADC rankings — ranks from the
    * shared CTEs, full-outer fused, two-term IEEE sum.
    */
  private def q199Sql: String =
    pqAdcCte + """,
      |pqr AS (
      |  SELECT query_id, neighbor_id, rn AS r_pq FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |             ORDER BY score DESC, neighbor_id) AS rn
      |    FROM scored)
      |  WHERE rn <= 10),
      |exr AS (
      |  SELECT query_id, neighbor_id, rn AS r_exact FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND b.vec_id != a.vec_id)
      |  WHERE rn <= 10),
      |fused AS (
      |  SELECT COALESCE(exr.query_id, pqr.query_id) AS query_id,
      |         COALESCE(exr.neighbor_id, pqr.neighbor_id) AS neighbor_id,
      |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_exact), CAST(0.0 AS DOUBLE))
      |           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_pq), CAST(0.0 AS DOUBLE)) AS rrf
      |  FROM exr FULL JOIN pqr
      |    ON exr.query_id = pqr.query_id AND exr.neighbor_id = pqr.neighbor_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, round(rrf, 6) AS rrf
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY rrf DESC, neighbor_id) AS rn FROM fused)
      |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  /** q103: recompute the expect-or-drop quarantine split in SQL —
    * same planted-NULL rule, same CHECK-violates-on-FALSE semantics,
    * tags joined in constraint-declaration order (len_ok first).
    */
  private def q103Sql: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
      |       n_chars,
      |       concat_ws(',',
      |         CASE WHEN n_chars < 100 THEN 'len_ok' END,
      |         CASE WHEN doc_id % 7 = 0 THEN 'lang IS NOT NULL' END) AS violated
      |FROM documents
      |WHERE doc_id % 3 <> 0 AND (n_chars < 100 OR doc_id % 7 = 0)
      |ORDER BY doc_id""".stripMargin
}





