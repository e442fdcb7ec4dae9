package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has NO stream compute
  * (SURVEY §2.10 — its "watermark" is a batch high-water mark, kept in
  * [[graft.operators.Watermark]]); this extends the engine to real
  * streams over the same events schema, as the driver's `events` table
  * invites.
  *
  * Batch/stream parity: [[windowedCounts]] over a bounded stream equals
  * Queries.q19_events_day_agg's day buckets when the window is 1 day —
  * asserted in StreamingSpec.
  */
object EventStreams {

  /** The events schema as streamed (ts already micros). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** File-source stream over a directory of event parquet. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked tumbling-window aggregation: counts + sum(value) per
    * (window, event_type). Late data beyond the watermark is dropped;
    * state is bounded — the 100 TB/day streaming shape.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 day",
      watermarkDelay: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )

  /** Watermarked streaming dedup on event_id ALONE: the exactly-once
    * guard an at-least-once ingest (retries, replays) needs in front of
    * every downstream agg — a replay that re-stamps ts still dedups,
    * because ts is deliberately NOT part of the key.
    * dropDuplicatesWithinWatermark bounds state: a key's dedup entry is
    * dropped once the watermark passes it, so 100 TB/day of events
    * holds only a watermark-window of keys, never the full history.
    */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the event stream against a static
    * dimension snapshot (read once per micro-batch; broadcast by
    * Catalyst when small). The standard shape for attaching slowly-
    * changing reference data to a hot stream without stream-stream
    * state.
    */
  def enrichedByUser(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
      broadcast(users.select(col("c_custkey").as("user_id"), col("c_mktsegment"))),
      Seq("user_id"),
      "left"
    )

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
  final case class SessionSummary(user_id: Long, nEvents: Long, totalValue: Double)

  /** Custom stateful aggregation via mapGroupsWithState: a running
    * per-user session summary — the KeyValueGroupedDataset state API
    * the reference never needed but a stream engine must expose.
    * (NoTimeout: with ProcessingTimeTimeout Spark schedules recurring
    * empty batches to fire timeouts, which never lets a bounded test
    * stream quiesce; real deployments opting into timeouts accept that.)
    */
  def userSessions(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          val evs  = batch.toSeq
          val next = SessionState(
            prev.nEvents + evs.size,
            prev.totalValue + evs.map(_.value).sum,
            math.max(prev.lastTs, evs.map(_.ts.getTime).maxOption.getOrElse(0L))
          )
          state.update(next)
          SessionSummary(userId, next.nEvents, next.totalValue)
      }
  }

  /** Stateful funnel tracking — the streaming twin of the batch
    * ordered-funnel query (q155): per user, a tiny
    * (stage, last ts, last id) state advances greedily through the
    * stage list as events arrive; each micro-batch emits the user's
    * current farthest stage (Update mode). Within a batch events sort
    * by (ts, event_id); ACROSS batches the greedy chain equals the
    * batch first-match chain whenever arrival is time-monotone at the
    * batch level (the watermark discipline every funnel consumer
    * already assumes) — pinned against q155 in StreamingSpec. State is
    * three fields per ACTIVE user, the smallest possible footprint for
    * sequence analytics at stream scale.
    */
  def funnelProgress(
      events: Dataset[Event],
      stages: Seq[String]
  ): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
          for (e <- batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
               if st.stage < stages.length) {
            val t = micros(e.ts)
            val after = st.stage == 0 || t > st.lastUs ||
              (t == st.lastUs && e.event_id > st.lastId)
            if (e.event_type == stages(st.stage) && after)
              st = FunnelState(st.stage + 1, t, e.event_id)
          }
          state.update(st)
          FunnelOut(uid, st.stage)
      }
  }

  final case class FunnelState(stage: Int, lastUs: Long, lastId: Long)
  final case class FunnelOut(user_id: Long, stage_reached: Int)

  final case class OpenSession(startUs: Long, endUs: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L

  /** Streaming gap-based sessionization — the stream twin of
    * [[graft.operators.Windows.sessionize]] (batch q37), via
    * flatMapGroupsWithState + event-time timeout.
    *
    * State per user is a set of OPEN sessions as merged intervals:
    * every event inserts as a 1-event interval, then intervals within
    * `gapMicros` coalesce — so an out-of-order event (within the
    * watermark) that bridges two open sessions merges them, exactly
    * like the batch sort would. A session is emitted only when the
    * watermark passes its end + gap, i.e. when no in-order-or-late
    * event can extend it anymore; state for closed sessions is
    * dropped, so state size is bounded by open sessions within the
    * watermark horizon — never the stream history.
    */
  def gapSessions(
      events: Dataset[Event],
      gapMicros: Long,
      watermarkDelay: String = "1 hour"
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (uid, batch, state: GroupState[List[OpenSession]]) =>
        val prior = state.getOption.getOrElse(Nil)
        val merged =
          if (state.hasTimedOut) prior
          else {
            val pts = prior ++ batch.map(e => OpenSession(micros(e.ts), micros(e.ts), 1L))
            pts
              .sortBy(s => (s.startUs, s.endUs))
              .foldLeft(List.empty[OpenSession]) { (acc, s) =>
                acc match {
                  case h :: t if s.startUs - h.endUs <= gapMicros =>
                    OpenSession(h.startUs, math.max(h.endUs, s.endUs), h.n + s.n) :: t
                  case _ => s :: acc
                }
              }
              .reverse
          }
        val wmUs = state.getCurrentWatermarkMs * 1000L
        val (closed, open) = merged.partition(s => s.endUs + gapMicros <= wmUs)
        if (open.isEmpty) state.remove()
        else {
          state.update(open)
          // next possible close: earliest open end + gap (strictly above wm by construction)
          state.setTimeoutTimestamp(open.map(_.endUs).min / 1000L + gapMicros / 1000L + 1L)
        }
        closed.iterator.map(s => SessionOut(uid, s.n, s.startUs, s.endUs))
      }
  }

  /** Watermarked stream-STREAM interval join: each purchase matches
    * the same user's clicks in the `lookback` before it — the
    * attribution join, as two unbounded streams. The time-range
    * predicate plus watermarks on BOTH sides is what lets Spark bound
    * the join state: a click older than the purchase watermark minus
    * `lookback` can never match a future purchase, so its state is
    * evicted; without the range condition the state grows forever. At
    * 100 TB/day this is the only viable stream-stream join shape —
    * equality key (user) for the shuffle, time bound for the state.
    * Output: (purchase_id, click_id, user_id) per qualifying pair.
    */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      watermarkDelay: String = "1 hour",
      lookback: String = "INTERVAL 30 MINUTES"
  ): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    c.join(
      p,
      expr(
        s"""click_user = user_id AND
           |purchase_ts >= click_ts AND
           |purchase_ts <= click_ts + $lookback""".stripMargin)
    ).select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Per-(event_type, day) counts — the q160 grouping, shared by the
    * batch seed and the per-micro-batch delta.
    */
  private def dailyCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))

  /** Seed the daily-count ledger (batch_id = -1). The ledger is a
    * (event_type, day, n) BIGINT table built from per-batch delta
    * partitions whose fold is exact integer addition — the
    * sufficient-statistics discipline of [[graft.streaming.DocStreams]]
    * drift and [[graft.streaming.ClusterStreams]]: replay-safe,
    * order-independent, and types × days small forever. Seed with an
    * empty slice of the events schema to start from nothing.
    */
  def seedDailyLedger(events: DataFrame, ledgerDir: String): Unit =
    dailyCounts(events).write.mode("overwrite").parquet(s"$ledgerDir/batch_id=-1")

  /** Streaming twin of q160's daily-volume anomaly flags: each
    * micro-batch folds its own (event_type, day) counts into the
    * ledger, re-runs the trailing-7-observed-days z² ≥ 4 test (same
    * BIGINT-cleared inequality — the flag itself is exact under
    * replay) and emits flags for ONLY the (event_type, day) pairs the
    * batch touched — the alert fires in the micro-batch the spike
    * arrives in, not after the nightly rollup. Per-batch cost: the
    * batch's own count + a types×days-sized window; the event history
    * is never re-read; the ledger fold EXCLUDES the batch's own
    * partition so a replayed batch flags identically to its first
    * attempt. Replay overwrites the batch's own telemetry
    * and delta partitions (the house exactly-once recipe). When
    * batches arrive day-monotone, each day's final emission equals
    * the batch q160 row — pinned in StreamingSpec.
    */
  def incrementalDailyAnomaly(
      events: DataFrame,
      telemetryDir: String,
      ledgerDir: String
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val delta = graft.operators.Materialize(dailyCounts(batch))
        val eff = spark.read
          .parquet(ledgerDir)
          .filter(col("batch_id") =!= batchId) // replay: ignore own leftovers
          .select(col("event_type"), col("day"), col("n"))
          .unionByName(delta)
          .groupBy("event_type", "day").agg(sum("n").as("n"))
        val w   = Window.partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-7, -1)
        val dev = col("n_prior") * col("n") - col("s")
        eff
          .withColumn("n_prior", count(col("n")).over(w))
          .withColumn("s", sum(col("n")).over(w))
          .withColumn("q", sum(col("n") * col("n")).over(w))
          .select(
            col("event_type"), col("day"), col("n"), col("n_prior"),
            when(col("n_prior") >= 3, col("s").cast("double") / col("n_prior"))
              .as("mean_prior"),
            when(col("n_prior") >= 3,
              (dev * dev >= lit(4L) * (col("n_prior") * col("q") - col("s") * col("s")))
                .cast("int"))
              .as("is_anomaly"))
          .join(delta.select("event_type", "day"), Seq("event_type", "day"), "left_semi")
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        delta.write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .start()

  private def userDays(ev: DataFrame): DataFrame =
    ev.select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("user_id"))
      .distinct()

  /** Seed the user-day ledger (batch_id = -1): the distinct
    * (day, user_id) table. Batch deltas arrive day-clustered, so the
    * per-batch stickiness fold's day filter prunes on parquet footer
    * min/max stats and reads only the ~13-day file slice around the
    * batch — never the event history, never the full ledger (at
    * extreme history length lay the ledger out `partitionBy(day)` for
    * structural directory pruning; seed with a non-empty frame then).
    * Same replay discipline as [[seedDailyLedger]]: per-batch
    * partitions, exact set union as the fold.
    */
  def seedUserDayLedger(events: DataFrame, ledgerDir: String): Unit =
    userDays(events).write.mode("overwrite").parquet(s"$ledgerDir/batch_id=-1")

  /** Streaming twin of q174's DAU/WAU stickiness: each micro-batch
    * folds its distinct user-days into the ledger and re-emits the
    * stickiness rows for ONLY the anchor days its arrivals can move —
    * observed days within [batch day, batch day + 6] (a day's DAU and
    * trailing WAU both only ever see user-days ≤ 6 days older, so the
    * ledger read prunes to the ~13-day window around the batch via
    * footer day stats; cost is O(batch window), independent of
    * history length).
    * The WAU is the same explode-to-equi-join as the batch query —
    * each user-day fans into its ≤ 7 anchors, no range join. With
    * day-monotone arrival each day is emitted exactly once, in the
    * micro-batch it arrives in, equal to the batch q174 row (pinned in
    * StreamingSpec); replay overwrites the batch's own telemetry and
    * delta partitions and excludes them from the fold, so a re-run
    * batch emits identically.
    */
  def incrementalStickiness(
      events: DataFrame,
      telemetryDir: String,
      ledgerDir: String
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val delta = graft.operators.Materialize(userDays(batch))
        val bounds = delta.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
        if (!bounds.isNullAt(0)) {
          val lo     = java.time.LocalDate.parse(bounds.getString(0))
          val hi     = java.time.LocalDate.parse(bounds.getString(1))
          val readLo = lo.minusDays(6).toString
          val readHi = hi.plusDays(6).toString
          // the pruned ledger slice: 13 observed-day directories max
          val eff = spark.read.parquet(ledgerDir)
            .filter(col("batch_id") =!= batchId) // replay: ignore own leftovers
            .filter(col("day") >= readLo && col("day") <= readHi)
            .select(col("day").cast("string").as("day"), col("user_id"))
            .unionByName(delta)
            .distinct()
          // anchors the batch can move: observed ∩ ∪_{batch day b} [b, b+6]
          val anchorSet = delta
            .select(explode(expr("sequence(to_date(day), date_add(to_date(day), 6))")).as("d"))
            .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
            .distinct()
          val dau = eff
            .join(anchorSet, Seq("day"), "left_semi")
            .groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
          val wau = eff
            .select(explode(expr("sequence(to_date(day), date_add(to_date(day), 6))")).as("d"),
              col("user_id"))
            .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("user_id"))
            .join(anchorSet, Seq("day"), "left_semi")
            .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
          dau.join(wau, Seq("day"))
            .select(col("day"), col("dau"), col("wau"),
              round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
            .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        }
        delta.write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .start()

  private def comboUsers(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        graft.operators.PrivacyGrid.valueBucket(col("value")).as("vb"),
        col("user_id"))
      .distinct()

  private def comboRows(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        graft.operators.PrivacyGrid.valueBucket(col("value")).as("vb"))
      .groupBy("event_type", "day", "vb")
      .agg(count(lit(1)).as("n_rows"))

  /** Seed the k-anonymity ledgers: the distinct (combo, user) table
    * and the per-combo row counts — both grid/identity-bounded (the
    * user set per combo saturates at the user base; counts fold by
    * exact integer addition). Same per-batch delta-partition replay
    * discipline as [[seedDailyLedger]].
    */
  def seedKAnonLedger(events: DataFrame, ledgerDir: String): Unit = {
    comboUsers(events).write.mode("overwrite").parquet(s"$ledgerDir/users/batch_id=-1")
    comboRows(events).write.mode("overwrite").parquet(s"$ledgerDir/rows/batch_id=-1")
  }

  /** Streaming twin of q181's k-anonymity audit: each micro-batch
    * folds its quasi-identifier combos into the ledgers and re-emits
    * the per-event-type risk rollup for ONLY the types the batch
    * touched — the privacy gate updates in the batch that changes it,
    * so a combo crossing the k bar flips from risky to safe the
    * moment its k-th distinct user arrives. Per-batch cost: the
    * batch's own aggregates + a grid-sized rollup; the event history
    * is never re-read. Replay excludes the batch's own partitions
    * then overwrites them (the house exactly-once recipe). Once all
    * data has arrived, each type's latest emission equals the batch
    * q181 row — pinned in StreamingSpec.
    */
  def incrementalKAnonymity(
      events: DataFrame,
      telemetryDir: String,
      ledgerDir: String,
      k: Int = 5
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val du = graft.operators.Materialize(comboUsers(batch))
        val dr = graft.operators.Materialize(comboRows(batch))
        val effU = spark.read.parquet(s"$ledgerDir/users")
          .filter(col("batch_id") =!= batchId)
          .select("event_type", "day", "vb", "user_id")
          .unionByName(du)
          .groupBy("event_type", "day", "vb")
          .agg(countDistinct(col("user_id")).as("users"))
        val effR = spark.read.parquet(s"$ledgerDir/rows")
          .filter(col("batch_id") =!= batchId)
          .select("event_type", "day", "vb", "n_rows")
          .unionByName(dr)
          .groupBy("event_type", "day", "vb")
          .agg(sum("n_rows").as("n_rows"))
        effU
          .join(effR, Seq("event_type", "day", "vb"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_combos"),
            sum(when(col("users") < k, 1L).otherwise(0L)).as("risky_combos"),
            sum(when(col("users") < k, col("n_rows")).otherwise(0L)).as("risky_rows"),
            sum(col("n_rows")).as("total_rows"))
          .select(col("event_type"), col("n_combos"), col("risky_combos"),
            col("risky_rows"),
            round(col("risky_rows").cast("double") / col("total_rows"), 6).as("risk_share"))
          .join(dr.select("event_type").distinct(), Seq("event_type"), "left_semi")
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        du.write.mode("overwrite").parquet(s"$ledgerDir/users/batch_id=$batchId")
        dr.write.mode("overwrite").parquet(s"$ledgerDir/rows/batch_id=$batchId")
        ()
      }
      .start()

  private val D19 = org.apache.spark.sql.types.DecimalType(19, 0)
  private val D38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Per-user batch digest for the burstiness fold: endpoints plus
    * the batch-internal gap moments (exact micro-second longs,
    * DECIMAL sums — the q184 discipline).
    */
  private def burstDigest(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"),
        sum(when(col("gap_us").isNotNull, 1L).otherwise(0L)).as("gn"),
        sum(coalesce(col("gap_us"), lit(0L)).cast(D19)).cast(D38).as("gsx"),
        sum(coalesce(col("gap_us"), lit(0L)).cast(D19) *
          coalesce(col("gap_us"), lit(0L)).cast(D19)).cast(D38).as("gsxx"))
  }

  /** Seed the burstiness state ledger: one row per user —
    * (n_gaps, Σgap, Σgap², last_us) with exact integer/decimal sums.
    * Unlike the count ledgers this state is NOT additive across
    * partitions; each batch writes the FULL updated row for the users
    * it touched, and the effective state is the latest batch's row
    * per user (a users-sized table at any history length).
    */
  def seedBurstLedger(events: DataFrame, ledgerDir: String): Unit =
    burstDigest(events)
      .select(col("user_id"), col("gn").as("n_gaps"), col("gsx").as("sx"),
        col("gsxx").as("sxx"), col("last_us"), lit(false).as("stale"))
      .write.mode("overwrite").parquet(s"$ledgerDir/batch_id=-1")

  /** Streaming twin of q184's inter-arrival burstiness: per
    * micro-batch, each touched user's (n, Σx, Σx², last_ts) state
    * stitches the batch's internal gaps PLUS the one boundary gap
    * against the stored last timestamp — so the CV telemetry updates
    * in the batch that moves it, and the event history is never
    * re-read. Per-batch cost: one batch-sized window + a users-sized
    * state join. Time-monotone arrival per user ⇒ the final state
    * equals the batch q184 moments exactly (integer micros, DECIMAL
    * sums — associativity is the whole design), pinned in
    * StreamingSpec. Replay reads state excluding the batch's own
    * partition, then overwrites it (the house exactly-once recipe).
    *
    * When a batch violates the monotonicity precondition for a user
    * (its first event predates the stored watermark), the boundary gap
    * is dropped — but the batch's INTERNAL gaps still fold in, so the
    * state no longer equals the batch q184 recompute. That condition
    * is now surfaced instead of silent: the user's state and telemetry
    * rows carry a sticky `stale` flag, so consumers can tell exactly
    * which users' CV is approximate and recompute them from the batch
    * path if they need exactness.
    */
  def incrementalBurstiness(
      events: DataFrame,
      telemetryDir: String,
      ledgerDir: String
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val digest = graft.operators.Materialize(burstDigest(batch))
        val wLatest = Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)
        val ledger = spark.read
          .parquet(ledgerDir)
          .filter(col("batch_id") =!= batchId)
        // migration shim: a ledger seeded before the `stale` column
        // existed (a persisted-state format change) reads as not-stale
        // rather than failing resolution — the flag only ever turns on
        // going forward, which matches its sticky semantics
        val priorStale =
          if (ledger.columns.contains("stale")) col("stale") else lit(false)
        val prior = ledger
          .withColumn("rn", row_number().over(wLatest))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("n_gaps").as("p_n"), col("sx").as("p_sx"),
            col("sxx").as("p_sxx"), col("last_us").as("p_last"),
            priorStale.as("p_stale"))
        // the boundary gap stitches ONLY when the batch actually follows
        // the stored watermark — an out-of-order or replayed-stale batch
        // must never fold a negative gap into the moments (the state
        // would corrupt silently); its internal gaps still count, and
        // the watermark never regresses
        val stitch = col("p_last").isNotNull && col("first_us") >= col("p_last")
        val bGap   = (col("first_us") - col("p_last")).cast(D19)
        // a batch arriving BEHIND the stored watermark for this user:
        // its boundary gap is dropped (never fold a negative gap), its
        // internal gaps still count, and the user is marked stale —
        // sticky, because once the moments diverge from the batch
        // recompute they never re-converge
        val wentStale = col("p_last").isNotNull && col("first_us") < col("p_last")
        val state = digest
          .join(prior, Seq("user_id"), "left")
          .select(
            col("user_id"),
            (coalesce(col("p_n"), lit(0L)) + col("gn") +
              when(stitch, 1L).otherwise(0L)).as("n_gaps"),
            (coalesce(col("p_sx"), lit(0L).cast(D38)) + col("gsx") +
              when(stitch, bGap).otherwise(lit(0L).cast(D19))).cast(D38).as("sx"),
            (coalesce(col("p_sxx"), lit(0L).cast(D38)) + col("gsxx") +
              when(stitch, bGap * bGap).otherwise(lit(0L).cast(D38))).cast(D38).as("sxx"),
            greatest(col("last_us"), coalesce(col("p_last"), col("last_us"))).as("last_us"),
            (coalesce(col("p_stale"), lit(false)) || wentStale).as("stale"))
        val stateM = graft.operators.Materialize(state)
        stateM
          .filter(col("n_gaps") >= 5)
          .select(col("user_id"), col("n_gaps"), col("stale"),
            (col("sx").cast("double") / col("n_gaps")).as("mean_us"),
            (col("sxx").cast("double") / col("n_gaps")).as("m2_us"))
          .select(col("user_id"), col("n_gaps"),
            round(col("mean_us") / 1e6, 6).as("mean_gap_s"),
            round(sqrt(greatest(lit(0.0), col("m2_us") - col("mean_us") * col("mean_us"))) /
              col("mean_us"), 6).as("cv"),
            col("stale"))
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        stateM.write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .start()

  private val QWidth = graft.operators.Sketches.QuantileBucketWidth

  private def quantileHist(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), floor(col("value") / QWidth).cast("long").as("b"))
      .groupBy("event_type", "b")
      .agg(count(lit(1)).as("c"))

  /** Seed the quantile-histogram ledger (the q205 sufficient
    * statistic): per-group equi-width bucket counts, additive under
    * union — per-batch delta partitions fold by pure integer
    * addition, the same ledger property as [[seedDailyLedger]].
    */
  def seedQuantileLedger(events: DataFrame, ledgerDir: String): Unit =
    quantileHist(events).write.mode("overwrite").parquet(s"$ledgerDir/batch_id=-1")

  /** Streaming twin of q205's quantile readout: each micro-batch
    * folds its bucket counts into the ledger and re-emits, for ONLY
    * the event types it touched, the estimated P50/P90 bucket lower
    * edges with the bucket-width error bound — live percentile
    * telemetry whose per-batch cost is the batch's own histogram plus
    * a groups × buckets readout; raw values are never retained.
    * (Exact-rank gating lives in the batch q205; a stream cannot
    * rank-select without keeping every value, which is the point of
    * the sketch.) Replay excludes the batch's own partition then
    * overwrites it.
    */
  def incrementalQuantiles(
      events: DataFrame,
      telemetryDir: String,
      ledgerDir: String
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val delta = graft.operators.Materialize(quantileHist(batch))
        val eff = spark.read
          .parquet(ledgerDir)
          .filter(col("batch_id") =!= batchId)
          .select("event_type", "b", "c")
          .unionByName(delta)
          .groupBy("event_type", "b")
          .agg(sum("c").as("c"))
        val n = eff.groupBy("event_type").agg(sum(col("c")).as("n"))
        eff
          .withColumn("cum",
            sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("b"))))
          .join(n, Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(
            max(col("n")).as("n"),
            (min(when(col("cum") >= expr("(n + 1) div 2"), col("b"))) * QWidth).as("p50_lo"),
            (min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("b"))) * QWidth).as("p90_lo"))
          .select(col("event_type"), col("n"), col("p50_lo"), col("p90_lo"),
            lit(QWidth).as("bound"))
          .join(delta.select("event_type").distinct(), Seq("event_type"), "left_semi")
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        delta.write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .start()

  // ---- streaming skew ledger (q211's twin) ---------------------------

  private def keyCounts(ev: DataFrame, keyCol: String): DataFrame =
    ev.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))

  /** Seed the per-key count ledger for [[incrementalSkew]]: one
    * (k, cnt) partition, additive under union like the histogram and
    * daily ledgers.
    */
  def seedSkewLedger(events: DataFrame, keyCol: String, ledgerDir: String): Unit =
    keyCounts(events, keyCol).write.mode("overwrite").parquet(s"$ledgerDir/batch_id=-1")

  /** Compact the skew ledger's delta partitions into one seed
    * partition (call between streams — never under a running writer):
    * folding is pure integer addition, so the compacted ledger is
    * value-identical and per-batch fold cost resets to O(distinct
    * keys) regardless of how many batches have accumulated.
    */
  /** Recover a compaction crashed between its two renames: the only
    * window with nothing at `ledgerDir` is after the live ledger
    * stepped aside to `__old` and before the compacted copy moved in —
    * the complete ledger is at `__old`, and recovery is the one rename
    * this performs. Idempotent no-op in every other state. Runs at the
    * top of [[compactSkewLedger]] AND of each [[incrementalSkew]]
    * batch read, so neither a re-compaction nor a restarted stream
    * needs a manual rename after a crash.
    */
  private def healSkewLedger(ledgerDir: String): Unit = {
    val dst = java.nio.file.Paths.get(ledgerDir)
    val old = java.nio.file.Paths.get(ledgerDir + "__old")
    if (!java.nio.file.Files.exists(dst) && java.nio.file.Files.exists(old))
      java.nio.file.Files.move(old, dst)
    ()
  }

  def compactSkewLedger(spark: org.apache.spark.sql.SparkSession, ledgerDir: String): Unit = {
    healSkewLedger(ledgerDir)
    val folded = graft.operators.Materialize(
      spark.read.parquet(ledgerDir)
        .groupBy("k").agg(sum("cnt").as("cnt")))
    // Materialize pins the fold before the overwrite clears its input
    val tmp = ledgerDir + "__compact"
    folded.write.mode("overwrite").parquet(s"$tmp/batch_id=-1")
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
          s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        }
      }
    }
    // promote crash-safely: step the live ledger ASIDE (rename, not
    // delete), move the compacted copy in, delete the superseded copy
    // LAST — a crash at any point leaves a complete ledger at either
    // ledgerDir or ledgerDir__old (recovery = one rename), never a
    // window with no ledger at all.
    val dst = java.nio.file.Paths.get(ledgerDir)
    val old = java.nio.file.Paths.get(ledgerDir + "__old")
    rmTree(old) // leftover from a prior crashed compaction
    if (java.nio.file.Files.exists(dst)) java.nio.file.Files.move(dst, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dst)
    rmTree(old)
  }

  /** Streaming twin of q211's shuffle-key skew audit: each micro-batch
    * appends its per-key count delta to the ledger and re-emits the
    * ONE-ROW profile (n_rows, n_keys, max_key_rows, deterministic
    * top_key, max/mean skew_ratio) of the FOLDED counts — live skew
    * telemetry that tells an ingest-time consumer when a key is
    * heating up, before the nightly shuffle that would discover it the
    * hard way. The profile math is the batch operator's own
    * ([[graft.operators.Skew.profileFromCounts]]), so the emitted row
    * is pinned ≡ the batch q211-style report over all events seen.
    *
    * Replay-idempotent by the ledger discipline (exclude the batch's
    * own partition, then overwrite it). The ledger is keyed state —
    * per-batch fold cost is O(Σ per-batch distinct keys) across
    * retained partitions; [[compactSkewLedger]] folds them back to one
    * between streams.
    *
    * SCHEMA NOTE: round 17 widened the profile row by two columns
    * (`hot_bytes_est`, `recommend_salt`). A `telemetryDir` seeded by
    * the 6-column code now mixes schemas across its `batch_id=N`
    * partitions — read such a dir with
    * `spark.read.option("mergeSchema", true)` (old rows surface NULLs
    * in the new columns) or point new streams at a fresh
    * `telemetryDir`. The LEDGER dir is unaffected (its (k, cnt, ts)
    * shape is unchanged).
    */
  def incrementalSkew(
      events: DataFrame,
      keyCol: String,
      label: String,
      telemetryDir: String,
      ledgerDir: String
  ): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        healSkewLedger(ledgerDir)
        val delta = graft.operators.Materialize(keyCounts(batch, keyCol))
        val folded = spark.read
          .parquet(ledgerDir)
          .filter(col("batch_id") =!= batchId)
          .select("k", "cnt")
          .unionByName(delta)
          .groupBy("k")
          .agg(sum("cnt").as("cnt"))
        graft.operators.Skew.profileFromCounts(folded, label)
          .withColumn("as_of_batch", lit(batchId))
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        delta.write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Run a bounded stream to completion into a memory sink and return
    * the result — the batch-equivalence harness used by tests.
    */
  def runBounded(stream: DataFrame, queryName: String, outputMode: OutputMode): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
