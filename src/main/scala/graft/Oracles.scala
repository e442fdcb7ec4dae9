package graft

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]] (driver
  * contract: same column names, same row order, ANSI SQL runnable by
  * DuckDB over the same parquet tables registered under their bare
  * names). The SQL itself lives in per-family files mirroring the
  * Queries* files — OraclesBase, OraclesText, OraclesDedup,
  * OraclesRel2, OraclesMedia, OraclesSketch, OraclesCorpus,
  * OraclesDml — so each oracle sits next to the family of the query
  * it gates. ContractSpec enforces queries ↔ oracles parity at
  * sbt-test time; the duplicate-key require below catches a query
  * accidentally oracled in two family files.
  */
object Oracles {
  val all: Map[String, String] = {
    val fams: Seq[Map[String, String]] = Seq(
      OraclesBase.sql, OraclesText.sql, OraclesDedup.sql,
      OraclesRel2.sql, OraclesMedia.sql, OraclesSketch.sql,
      OraclesCorpus.sql, OraclesDml.sql)
    val dup = fams.flatMap(_.keys).groupBy(identity).collect {
      case (k, vs) if vs.size > 1 => k
    }
    require(dup.isEmpty, s"oracle key(s) defined in more than one family file: ${dup.mkString(", ")}")
    fams.reduce(_ ++ _)
  }

  /** THE one table of shared-contract queries: each group's members'
    * correctness contract is EXACT RESULT EQUALITY with each other, so
    * they deliberately share one oracle SQL string (README "Driver
    * contract"). ContractSpec asserts this table ≡ the actual
    * duplicate groups in [[all]] in both directions — an oracle edit
    * that silently makes two queries share SQL (copy-paste drift), or
    * silently un-shares a declared pair (weakening one query's gate to
    * a stale copy), fails `sbt test` instead of shipping.
    */
  val sharedOracleGroups: Seq[Set[String]] = Seq(
    // approximate / indexed ANN ≡ the brute-force top-k they must reproduce
    Set("q30_ann_topk", "q31_ann_lsh_topk", "q57_ann_ivf_topk", "q61_ann_ivf_indexed"),
    Set("q86_ann_pq_topk", "q87_ann_ivfpq_topk"),
    // metadata-filtered ANN: join-condition ≡ IVF ≡ partition-pruned index
    Set("q121_ann_filtered", "q123_ann_filtered_ivf", "q124_ann_filtered_indexed"),
    // closure algorithms: propagation ≡ collapse-first pipeline ≡ star contraction
    Set("q38_dedup_clusters", "q47_dedup_pipeline", "q53_star_clusters"),
    // incremental dedup: one-shot ≡ persisted-index probe
    Set("q48_incremental_dedup", "q54_indexed_dedup"),
    // media dedup: raw banded pairs ≡ collapse-first
    Set("q52_phash_pairs", "q56_phash_pairs_collapsed"),
    Set("q209_frame_dedup", "q210_frame_dedup_collapsed"),
    // DML mechanics are result-invisible: COW ≡ partitioned COW ≡ MOR
    Set("q82_delete_rows", "q94_delete_partitioned", "q105_delete_mor"),
    Set("q84_update_rows", "q95_update_partitioned", "q106_update_mor"),
    // MV maintenance: full recompute ≡ incremental ≡ streaming refresh
    Set("q83_incremental_mv", "q101_incremental_mv_partitioned", "q102_streaming_mv_refresh"),
    // ledger readout ≡ its one-shot sketch twin
    Set("q49_approx_distinct", "q55_sketch_ledger"),
    // format round-trip: ORC-written events ≡ the parquet aggregate
    Set("q19_events_day_agg", "q71_orc_roundtrip")
  )
}
