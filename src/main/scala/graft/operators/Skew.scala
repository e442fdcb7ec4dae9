package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew DIAGNOSTICS — the measurement half of the "heavy key"
  * problem a 100 TB shuffle has; the mitigation half lives in
  * [[Salt]] (salted joins and two-phase aggregates, present since the
  * early rounds and oracle-gated by q72/q212).
  *
  * At cluster scale a shuffle join or aggregation is only as fast as
  * its heaviest key: one customer with 10⁹ order rows serializes one
  * reducer while the rest idle. The remedies are (a) AQE's runtime
  * skew-join split (on, see [[graft.Engine]]) — which only helps the
  * JOIN operator and only after a stage materializes — and (b)
  * [[Salt]]'s explicit salting, which spreads ONE logical key over
  * `factor` physical shuffle keys and works for any downstream shape.
  * Choosing between them — and choosing the salt factor — needs a
  * measurement, which is what [[keySkewReport]] is: the per-key mass
  * profile of a prospective shuffle key, at one aggregation pass per
  * key column (map-side partial aggregation makes the shuffle
  * O(distinct keys), never O(rows)).
  */
object Skew {

  /** AQE's own skew-join gates (`spark.sql.adaptive.skewJoin.*`
    * defaults): a partition is "skewed" only when it is BOTH ≥ factor×
    * the median AND ≥ the absolute byte threshold — and the bytes AQE
    * reads are COMPRESSED map-output sizes. The executed audit
    * (PLANS.md, round 16) found the two ways a real hot key slips
    * under these gates, wired into [[profileFromCounts]]'s
    * `recommend_salt` below. */
  val aqeSkewedPartitionFactor: Double       = 5.0
  val aqeSkewedPartitionThresholdBytes: Long = 256L * 1024 * 1024

  /** One-row skew profile of `df` grouped by `keyCol`:
    * (key_col = `label`, n_rows, n_keys, max_key_rows, top_key,
    * skew_ratio = max_key_rows / mean rows per key). `top_key` is the
    * heaviest key, ties broken to the SMALLEST key so the row is
    * deterministic (min over (−cnt, key) structs — the COUNT is
    * negated, never the key, so any orderable key type works: string,
    * date, decimal, not just signed numerics, and a Long.MinValue key
    * cannot overflow; one scalar aggregate, no window, no second
    * pass). A NULL key counts in n_rows/n_keys/max_key_rows but is
    * excluded from top_key contention — a null label identifies
    * nothing, and engines disagree on where nulls sort. skew_ratio ≈ 1
    * is uniform; a ratio of r means the heaviest reducer does r× the
    * average work, and r is the first salt factor to try.
    *
    * The ratio is computed max·n_keys/n_rows in that exact IEEE
    * order — two double ops on exactly-represented longs, so the
    * value is bit-identical across engines (the q89 portability rule).
    */
  def keySkewReport(
      df: DataFrame,
      keyCol: String,
      label: String,
      bytesPerRowEst: Long = 64L,
      compressRatioEst: Double = 1.0,
      downstreamPinsPartitioning: Boolean = false): DataFrame =
    profileFromCounts(
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt")), label,
      bytesPerRowEst, compressRatioEst, downstreamPinsPartitioning)

  /** The same one-row profile from PRE-AGGREGATED (k, cnt) counts —
    * the entry point for incremental callers that maintain per-key
    * counts themselves (the streaming skew ledger folds batch deltas
    * into exactly this shape).
    *
    * `recommend_salt` makes the AQE-vs-[[Salt]] choice MECHANICAL: it
    * is true exactly when the key is skewed by AQE's own factor
    * (skew_ratio ≥ [[aqeSkewedPartitionFactor]]) AND the runtime skew
    * split would NOT fire — the two suppression preconditions the
    * round-16 audit observed in a live plan:
    *
    *   1. the hot partition's MAP-OUTPUT bytes sit under
    *      [[aqeSkewedPartitionThresholdBytes]] — AQE thresholds on
    *      COMPRESSED sizes, and a narrow or constant-payload hot key
    *      lz4-compresses below any threshold while still serializing
    *      one reducer's CPU. Estimated here as
    *      max_key_rows × `bytesPerRowEst` × `compressRatioEst` —
    *      declare the measured/expected on-wire row cost (the audit's
    *      constant payload compressed ~50×; an incompressible sha2
    *      payload ~1×);
    *   2. `downstreamPinsPartitioning` — a groupBy/window on the SAME
    *      key downstream of the join imposes a required child
    *      distribution, and AQE declines to split a partitioning a
    *      parent operator requires. Declared by the caller (a query-
    *      shape fact no data profile can see).
    *
    * Both estimates are plan-free arithmetic on the profile's exact
    * longs, so the column replays cross-engine (q211's oracle).
    */
  def profileFromCounts(
      counts: DataFrame,
      label: String,
      bytesPerRowEst: Long = 64L,
      compressRatioEst: Double = 1.0,
      downstreamPinsPartitioning: Boolean = false): DataFrame =
    counts
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_key_rows"),
        min(when(col("k").isNotNull,
          struct((-col("cnt")).as("negcnt"), col("k")))).as("m"))
      .select(
        lit(label).as("key_col"),
        col("n_rows"),
        col("n_keys"),
        col("max_key_rows"),
        col("m.k").as("top_key"),
        (col("max_key_rows").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
      .withColumn("hot_bytes_est",
        col("max_key_rows").cast("double") * lit(bytesPerRowEst.toDouble) *
          lit(compressRatioEst))
      .withColumn("recommend_salt",
        col("skew_ratio") >= lit(aqeSkewedPartitionFactor) &&
          (lit(downstreamPinsPartitioning) ||
            col("hot_bytes_est") < lit(aqeSkewedPartitionThresholdBytes.toDouble)))

}
