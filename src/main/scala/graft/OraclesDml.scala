package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesDml (SQL DML front-end, merge clauses, substring dedup)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesDml {
  private val primary: Map[String, String] = Map(
// q113: the reference's CTAS + MERGE text run VERBATIM through
// the SQL front-end — final state recomputed from the raw docs:
// even ids carry the initial load (updated where id % 12 = 0:
// matched ∧ watermark ∧ version rule), odd multiples of 3 insert
"q113_sql_dml" ->
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
          |) ORDER BY id""".stripMargin,
// q114: the full-clause MERGE final state on both paths — CASE
// reprice + stale flag, anti-filters for the two delete actions,
// UNION for the conditional inserts; identical recompute per path
"q114_merge_full_clauses" -> {
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
      },
// q115: positioned 8-gram anchors joined on the gram, diagonal
// gaps-and-islands for the longest exact shared run — the same
// relational formulation as Dedup.substringPairs
"q115_substring_pairs" ->
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
          |ORDER BY agg.doc_a, agg.doc_b""".stripMargin,
// q116: the q114 COW scenario driven by MERGE SQL text — same
// recompute, single path
"q116_sql_merge_clauses" ->
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
          |) ORDER BY o_orderkey""".stripMargin,
// q117: incremental-zorder table read back through the pruned
// scan must equal the plain range filter over base ∪ tail
"q117_zorder_incremental" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, o_totalprice + 1000
          |  FROM orders WHERE o_orderkey % 100 = 0
          |) WHERE o_custkey BETWEEN 100 AND 200
          |ORDER BY o_custkey, o_orderkey, o_totalprice""".stripMargin,
// q118: the indexed probe must emit exactly the full q115 pair
// set restricted to pairs involving a batch (doc_id % 3 = 0) doc
"q118_incremental_substring" ->
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
          |ORDER BY agg.doc_a, agg.doc_b""".stripMargin,
// q119: the q114/q116 recompute with the partition column riding
// along — the partitioned writer must land identical values
"q119_merge_clauses_partitioned" ->
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
          |) ORDER BY o_orderkey""".stripMargin,
// q120: fixed-merge BPE token counts — each merge applied as a
// per-word leftmost-replace FIXPOINT (≡ greedy left-to-right
// non-overlapping tiling; a created token never re-matches its
// own pattern, so iterating the leftmost replace is exact)
"q120_bpe_token_counts" ->
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
          |FROM m2f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
// q129: net effect of the bounded [v1, v2] range — the v1 +100
// post-image of a v2-deleted row cancels against its own
// pre-image, so only the original image's delete survives for
// %60 keys, while %30-surviving keys net a delete+insert pair
"q129_change_feed_range" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice,
          |         CAST(0 AS BIGINT) AS n_added, CAST(1 AS BIGINT) AS n_removed,
          |         CAST(-1 AS BIGINT) AS net, 'delete' AS _change_type
          |  FROM orders WHERE o_orderkey % 30 = 0
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, o_totalprice + 100,
          |         CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'insert'
          |  FROM orders WHERE o_orderkey % 30 = 0 AND o_orderkey % 60 <> 0
          |) ORDER BY o_orderkey, _change_type""".stripMargin
  )

  val sql: Map[String, String] = primary
}
