package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesRel2 (relational extensions + warehouse DML states)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesRel2 {
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

  // q100: bloom skipping is a plan property — the oracle is the plain
  // IN-list lookup the pruned scan must reproduce exactly.
  private val q100Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_custkey IN (7, 23, 76, 119, 149)
      |ORDER BY c_custkey""".stripMargin

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

  private val primary: Map[String, String] = Map(
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
    "q64_range_join" ->
      """SELECT w.window_id, e.event_id
        |FROM events e
        |JOIN (SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
        |      FROM events WHERE event_id % 100 = 0) w
        |  ON e.ts >= w.w_start AND e.ts <= w.w_end
        |ORDER BY window_id, event_id""".stripMargin,
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
    "q71_orc_roundtrip" -> OraclesBase.sql("q19_events_day_agg"),
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
"q94_delete_partitioned" -> q94Sql,
// q216: the semi-join prune representation deletes every negative
// balance across ALL segment partitions; coalesce keeps a null
// balance a survivor on both engines
"q216_delete_pruned_joinpath" ->
        """SELECT c_custkey, c_mktsegment, c_acctbal
          |FROM customer
          |WHERE NOT coalesce(c_acctbal < 0, FALSE)
          |ORDER BY c_custkey""".stripMargin,
"q95_update_partitioned" -> q95Sql,
"q96_merge_partitioned" -> q96Sql,
"q97_feed_partitioned" -> q97Sql,
"q98_data_skipping" -> q98Sql,
"q100_bloom_skipping" -> q100Sql,
"q103_quarantine_append" -> q103Sql,
// q104: both generated-column populations (backfill rewrite +
// computed-on-append) must equal DuckDB's own sha-256 of the rows
"q104_generated_column" ->
        """SELECT doc_id, sha256(text) AS text_sha
          |FROM documents
          |ORDER BY doc_id""".stripMargin,
// q107: bloom-pruned locate + MOR forget must land on exactly
// the NOT-requested survivors
"q107_gdpr_forget" ->
        """SELECT c_custkey, c_name, c_acctbal
          |FROM customer
          |WHERE c_custkey % 97 <> 0
          |ORDER BY c_custkey""".stripMargin,
// q108: rename + drop through the engine's DDL must equal a
// plain projection of the raw rows
"q108_column_ddl" ->
        """SELECT c_custkey, c_acctbal AS balance
          |FROM customer
          |ORDER BY c_custkey""".stripMargin,
// q109: a deep clone's rows hash-equal the raw source rows
"q109_clone" ->
        """SELECT c_custkey, c_nationkey, c_acctbal
          |FROM customer
          |ORDER BY c_custkey""".stripMargin,
// q110: identity VALUES are engine-chosen; the deterministic
// invariants (all assigned, all distinct, >= START WITH, batch 2
// beyond batch 1) are what DuckDB recomputes
"q110_identity_column" ->
        """SELECT count(*) AS n_rows, count(*) AS n_ids,
          |       1 AS start_ok, 1 AS batches_ordered
          |FROM customer""".stripMargin,
// q111: the three as-of states recomputed from the raw table —
// v0 full, v1 minus the COW delete, v2 minus both deletes
"q111_time_travel" ->
        """SELECT 0 AS as_of_v, c_custkey, c_acctbal FROM customer
          |UNION ALL
          |SELECT 1, c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
          |UNION ALL
          |SELECT 2, c_custkey, c_acctbal FROM customer
          |WHERE c_custkey % 3 <> 0 AND c_custkey % 5 <> 0
          |ORDER BY as_of_v, c_custkey""".stripMargin,
// q112: the MOR merge's final state — version-rule reprice plus
// shifted-key inserts — recomputed as CASE + UNION ALL
"q112_merge_mor" ->
        """SELECT o_orderkey, o_custkey,
          |       CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
          |            ELSE o_totalprice END AS o_totalprice
          |FROM orders
          |UNION ALL
          |SELECT o_orderkey + 500000000, o_custkey, o_totalprice
          |FROM orders WHERE o_orderkey % 1000 = 0
          |ORDER BY o_orderkey""".stripMargin,
// q211: each key column's mass profile recomputed from a GROUP BY;
// top_key by (cnt DESC, k) order over NON-NULL keys (the operator
// excludes a null key from top_key contention — mirror it here so a
// null-heavy key column cannot diverge cross-engine), ratio and the
// salt recommendation in the same fixed IEEE op order as the Spark
// side (max·n_keys/n_rows on exact longs; hot bytes = max·64·1.0;
// recommend when ratio ≥ 5 AND hot bytes < 256 MiB — AQE's own
// gates, see Skew.profileFromCounts)
"q211_skew_report" ->
        """WITH c1 AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
          |     c2 AS (SELECT l_partkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
          |     c3 AS (SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
          |     c4 AS (SELECT user_id  AS k, count(*) AS cnt FROM events GROUP BY 1)
          |SELECT key_col, n_rows, n_keys, max_key_rows, top_key, skew_ratio,
          |       CAST(max_key_rows AS DOUBLE) * 64.0 * 1.0 AS hot_bytes_est,
          |       CAST(CASE WHEN skew_ratio >= 5.0
          |                  AND CAST(max_key_rows AS DOUBLE) * 64.0 * 1.0 < 268435456.0
          |                 THEN 1 ELSE 0 END AS BIGINT) AS recommend_salt
          |FROM (
          |  SELECT 'orders.o_custkey' AS key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
          |         count(*) AS n_keys, max(cnt) AS max_key_rows,
          |         (SELECT k FROM c1 WHERE k IS NOT NULL ORDER BY cnt DESC, k LIMIT 1) AS top_key,
          |         CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS skew_ratio
          |  FROM c1
          |  UNION ALL
          |  SELECT 'lineitem.l_partkey', CAST(sum(cnt) AS BIGINT), count(*), max(cnt),
          |         (SELECT k FROM c2 WHERE k IS NOT NULL ORDER BY cnt DESC, k LIMIT 1),
          |         CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
          |  FROM c2
          |  UNION ALL
          |  SELECT 'lineitem.l_suppkey', CAST(sum(cnt) AS BIGINT), count(*), max(cnt),
          |         (SELECT k FROM c3 WHERE k IS NOT NULL ORDER BY cnt DESC, k LIMIT 1),
          |         CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
          |  FROM c3
          |  UNION ALL
          |  SELECT 'events.user_id', CAST(sum(cnt) AS BIGINT), count(*), max(cnt),
          |         (SELECT k FROM c4 WHERE k IS NOT NULL ORDER BY cnt DESC, k LIMIT 1),
          |         CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
          |  FROM c4
          |) ORDER BY key_col""".stripMargin,
// q212: the salted join is result-invisible by construction — the
// oracle is the PLAIN join + aggregate it must equal row for row
"q212_salted_join" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin
  )

  /** Queries whose CONTRACT is exact equality with an already-
    * oracled query reuse that query's SQL verbatim. */
  val sql: Map[String, String] = primary ++ Map(
// q101: same full-recompute oracle as q83 — the partitioned
// writer's feed must drive the MV to the identical final state
"q101_incremental_mv_partitioned" -> primary("q83_incremental_mv"),
// q102: same full-recompute oracle again — a STREAMED refresh
// (mvRefreshSink trigger) must land on the identical final state
"q102_streaming_mv_refresh" -> primary("q83_incremental_mv"),
// q105/q106: the q82 DELETE and q84 UPDATE scenarios through the
// merge-on-read mechanics (deletion vectors) — identical final
// states by design, so they share those oracles verbatim; what
// changes is the machinery under the gate (tombstone write +
// DV-subtracting read for q105; MOR update + REORG fold for q106)
"q105_delete_mor" -> primary("q82_delete_rows"),
"q106_update_mor" -> primary("q84_update_rows")
  )
}
