package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the Queries (q01–q20: the reference pipeline's relational core)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesBase {
  private val primary: Map[String, String] = Map(
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
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  )

  val sql: Map[String, String] = primary
}
