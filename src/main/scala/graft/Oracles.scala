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
}
