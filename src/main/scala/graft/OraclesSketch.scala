package graft

import graft.OraclesShared._

/** DuckDB oracle SQL for the QueriesSketch (HLL/CMS/quantile sketch contracts)
  * family — one entry per [[SparkEntry.queries]] key owned by that
  * file, kept next to its queries (ContractSpec enforces parity
  * with the Spark side at sbt-test time; [[Oracles]] unions the
  * family maps and rejects duplicate keys).
  */
private[graft] object OraclesSketch {
  // q88: selection is by EXACT count (the CMS contributes the
  // within_bound evidence, whose contract holds deterministically at
  // these sizes) — same shape as q49/q50's sketch contracts.
  private val q88Sql: String =
    """SELECT event_type, count(*) AS exact_n, 1 AS within_bound
      |FROM events GROUP BY 1
      |HAVING count(*) >= 0.10 * (SELECT count(*) FROM events)
      |ORDER BY 1""".stripMargin

  private val primary: Map[String, String] = Map(
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
    "q55_sketch_ledger" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, 1 AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
"q88_heavy_hitters" -> q88Sql,
"q205_quantile_sketch" ->
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
          |GROUP BY event_type ORDER BY event_type""".stripMargin
  )

  val sql: Map[String, String] = primary
}
