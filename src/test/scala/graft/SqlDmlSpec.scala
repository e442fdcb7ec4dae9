package graft

import graft.sources.{SqlDml, Warehouse}
import java.nio.file.Files

/** The SQL DML front-end running the reference notebooks' literal
  * statement text (CTAS, CTE-wrapped MERGE INTO, INSERT INTO with a
  * NOT IN subquery, DESCRIBE HISTORY inside a FROM) plus the Delta DML
  * statements the reference would hit next (DELETE/UPDATE/VALUES,
  * MERGE delete actions).
  */
class SqlDmlSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def fresh() = {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_sqldml").toString)
    (wh, new SqlDml(spark, wh))
  }

  test("CTAS creates a warehouse table; queries resolve main.<layer>.<table>") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, "x"), (2L, "y")).toDF("id", "payload").createOrReplaceTempView("sqldml_src1")
    sql.execute("create table main.silver.t1 as select id, payload from sqldml_src1")
    assert(wh.table("silver", "t1").count() == 2)
    // both the 3-level and 2-level forms resolve in a plain query
    assert(sql.execute("select count(*) as n from main.silver.t1").head().getLong(0) == 2)
    assert(sql.execute("select count(*) as n from silver.t1").head().getLong(0) == 2)
    // CREATE without OR REPLACE refuses an existing table
    intercept[IllegalArgumentException](
      sql.execute("create table main.silver.t1 as select 1 as id"))
    // ... and OR REPLACE replaces
    sql.execute("create or replace table main.silver.t1 as select 9 as id")
    assert(wh.table("silver", "t1").head().getInt(0) == 9)
  }

  test("CTAS PARTITIONED BY lays out hive partitions that DML then prunes on") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "a", 30))
      .toDF("id", "pt", "v").createOrReplaceTempView("sqldml_psrc")
    sql.execute(
      "create or replace table main.silver.pt1 partitioned by (pt) as " +
        "select id, v, pt from sqldml_psrc")
    assert(wh.table("silver", "pt1").count() == 3)
    assert(wh.partitionColumns("silver", "pt1") == Seq("pt"))
    // the layout is real: partition dirs exist and scoped DML slices on them
    assert(wh.table("silver", "pt1").inputFiles.exists(_.contains("pt=a")))
    sql.execute("delete from main.silver.pt1 where pt = 'b'")
    assert(wh.table("silver", "pt1").count() == 2)
    intercept[IllegalArgumentException](
      sql.execute("create or replace view main.silver.vbad partitioned by (pt) as select 1 as x"))
  }

  test("the reference's MERGE text runs verbatim (CTE source, update set *, insert *)") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 0, "a"), (2L, 0, "b")).toDF("id", "version", "title")
      .createOrReplaceTempView("sqldml_source")
    sql.execute("create table main.silver.arxiv as select * from sqldml_source")
    Seq((2L, 1, "b2"), (3L, 0, "c"), (4L, 1, "d"))
      .toDF("id", "version", "title").createOrReplaceTempView("sqldml_batch")
    // silver_arxiv.py:130-152 shape, CTE + alias-qualified condition
    val metrics = sql.execute("""
        with src as (
          select id, version, title
          from sqldml_batch
          where id >= 2
        )
        merge into main.silver.arxiv tgt
        using src
        on tgt.id = src.id
        when matched and src.version > tgt.version
        then update set *
        when not matched
        then insert *
    """).head()
    assert((metrics.getLong(1), metrics.getLong(2), metrics.getLong(3)) == ((2L, 1L, 0L)))
    val state = wh.table("silver", "arxiv").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(state == Seq((1L, 0, "a"), (2L, 1, "b2"), (3L, 0, "c"), (4L, 1, "d")))
    // the reference's DESCRIBE HISTORY metrics query runs verbatim
    // (silver_arxiv.py:175-184)
    val hist = sql.execute("""
        select operationMetrics.numTargetRowsInserted as inserted,
               operationMetrics.numTargetRowsUpdated as updated,
               operationMetrics.numOutputRows as output_rows -- For non-merge operation
        from (
        describe history main.silver.arxiv) t
        order by version desc
        limit 1
    """).head()
    assert((hist.getLong(0), hist.getLong(1)) == ((2L, 1L)))
  }

  test("INSERT INTO with a NOT IN subquery over the target runs verbatim") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq(("k1", "a"), ("k2", "b")).toDF("nyt_sk", "title")
      .createOrReplaceTempView("sqldml_nyt")
    sql.execute("create table main.silver.nyt as select * from sqldml_nyt")
    Seq(("k2", "b"), ("k3", "c")).toDF("nyt_sk", "title")
      .createOrReplaceTempView("sqldml_nyt2")
    // silver_nyt_archive.py:102-120 shape
    sql.execute("""
        insert into main.silver.nyt
        select *
        from (
        select nyt_sk, title
        from sqldml_nyt2 ) t
        where nyt_sk not in (
            select nyt_sk
            from main.silver.nyt
        )
    """)
    assert(wh.table("silver", "nyt").orderBy("nyt_sk").collect()
      .map(_.getString(0)).toSeq == Seq("k1", "k2", "k3"))
  }

  test("DELETE FROM / UPDATE / INSERT VALUES route to warehouse DML") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "amt")
      .createOrReplaceTempView("sqldml_src2")
    sql.execute("create table main.gold.acct as select * from sqldml_src2")
    sql.execute("insert into main.gold.acct values (4, 40.0), (5, 50.0)")
    assert(wh.table("gold", "acct").count() == 5)
    val upd = sql.execute("update main.gold.acct set amt = amt * 2 where id <= 2").head()
    assert(upd.getLong(2) == 2L)
    val del = sql.execute("delete from main.gold.acct where amt > 45").head()
    assert(del.getLong(3) == 1L) // only id 5 (amt 50) exceeds 45
    val state = wh.table("gold", "acct").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(state == Seq((1L, 20.0), (2L, 40.0), (3L, 30.0), (4L, 40.0)))
  }

  test("MERGE delete actions and by-source clauses parse and apply") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 1, "c"), (4L, 1, "d"))
      .toDF("id", "v", "p").createOrReplaceTempView("sqldml_t3")
    sql.execute("create table main.silver.t3 as select * from sqldml_t3")
    Seq((2L, 9, "b2"), (3L, 9, "c2"), (5L, 9, "e"))
      .toDF("id", "v", "p").createOrReplaceTempView("sqldml_b3")
    val m = sql.execute("""
        merge into main.silver.t3 tgt
        using sqldml_b3 src
        on tgt.id = src.id
        when matched and src.id = 2 then delete
        when matched then update set p = src.p, v = src.v + tgt.v
        when not matched and src.id < 6 then insert (id, v, p) values (src.id, src.v, src.p)
        when not matched by source and tgt.id = 4 then update set p = 'stale'
    """).head()
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) == ((1L, 2L, 1L)))
    val state = wh.table("silver", "t3").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(state == Seq((1L, 1, "a"), (3L, 10, "c2"), (4L, 1, "stale"), (5L, 9, "e")))
  }

  test("CREATE OR REPLACE VIEW registers; DESCRIBE HISTORY stands alone") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, "x")).toDF("id", "payload").createOrReplaceTempView("sqldml_src4")
    sql.execute("create table main.gold.a as select * from sqldml_src4")
    sql.execute("insert into main.gold.a values (2, 'y')")
    sql.execute(
      "create or replace view main.gold.vw_a as select id, upper(payload) as p from main.gold.a")
    assert(sql.execute("select * from main.gold.vw_a order by id").collect()
      .map(_.getString(1)).toSeq == Seq("X", "Y"))
    val hist = sql.execute("describe history main.gold.a").orderBy(desc("version")).collect()
    assert(hist.map(_.getAs[String]("operation")).toSeq ==
      Seq("APPEND", "CREATE OR REPLACE"))
    // string literals survive resolution untouched
    assert(sql.execute("select 'main.gold.a' as s").head().getString(0) == "main.gold.a")
  }

  test("time travel, INSERT OVERWRITE, TRUNCATE, DROP TABLE, DESCRIBE DETAIL") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, "a"), (2L, "b")).toDF("id", "p").createOrReplaceTempView("sqldml_tt")
    sql.execute("create table main.gold.tt as select * from sqldml_tt") // v0
    sql.execute("delete from main.gold.tt where id = 2")                // v1
    // Delta time-travel SQL against the warehouse table
    assert(sql.execute("select count(*) as n from main.gold.tt version as of 0")
      .head().getLong(0) == 2)
    assert(sql.execute("select count(*) as n from main.gold.tt").head().getLong(0) == 1)
    // TIMESTAMP AS OF far future resolves to the latest commit
    assert(sql.execute(
      "select count(*) as n from main.gold.tt timestamp as of '2999-01-01'")
      .head().getLong(0) == 1)
    // INSERT OVERWRITE replaces content wholesale
    sql.execute("insert overwrite main.gold.tt values (7, 'z')")
    assert(sql.execute("select * from main.gold.tt").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "z")))
    // DESCRIBE DETAIL surfaces physical facts
    assert(sql.execute("describe detail main.gold.tt")
      .head().getAs[String]("name") == "gold.tt")
    // TRUNCATE empties, table and history remain
    sql.execute("truncate table main.gold.tt")
    assert(sql.execute("select count(*) as n from main.gold.tt").head().getLong(0) == 0)
    // DROP TABLE removes; IF EXISTS tolerates the absence
    sql.execute("drop table main.gold.tt")
    assert(!wh.tableExists("gold", "tt"))
    sql.execute("drop table if exists main.gold.tt")
    intercept[IllegalArgumentException](sql.execute("drop table main.gold.tt"))
  }

  test("OPTIMIZE / VACUUM / RESTORE / ALTER TABLE / SHOW TABLES / table_changes") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 5.0, "x"), (2L, 6.0, "y")).toDF("id", "amt", "seg")
      .createOrReplaceTempView("sqldml_m")
    sql.execute("create table main.gold.m as select * from sqldml_m")      // v0
    sql.execute("update main.gold.m set amt = amt + 1 where id = 1")       // v1
    // RESTORE TABLE ... TO VERSION AS OF
    sql.execute("restore table main.gold.m to version as of 0")            // v2
    assert(sql.execute("select amt from main.gold.m where id = 1").head().getDouble(0) == 5.0)
    // OPTIMIZE (compact) and OPTIMIZE ZORDER BY parse and commit
    sql.execute("optimize main.gold.m")
    sql.execute("optimize main.gold.m zorder by (id, amt)")
    assert(wh.lastOperation("gold.m").get.getAs[String]("operation") == "ZORDER")
    // ALTER TABLE: constraint lifecycle + column DDL
    sql.execute("alter table main.gold.m add constraint amt_pos check (amt > 0)")
    intercept[Exception](
      sql.execute("insert into main.gold.m values (3, -1.0, 'z')"))
    sql.execute("alter table main.gold.m drop constraint amt_pos")
    sql.execute("insert into main.gold.m values (3, -1.0, 'z')")
    sql.execute("alter table main.gold.m rename column seg to segment")
    sql.execute("alter table main.gold.m drop column segment")
    assert(wh.table("gold", "m").columns.toSeq == Seq("id", "amt"))
    // SHOW TABLES lists the layer
    assert(sql.execute("show tables in main.gold").collect()
      .map(_.getString(1)).toSeq.contains("m"))
    // table_changes: the UPDATE's images read back with Delta's
    // inclusive startingVersion
    val changes = sql.execute(
      "select _change_type, id from table_changes('main.gold.m', 1) " +
        "where _commit_version = 1 order by _change_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(changes.toSeq == Seq(("update_postimage", 1L), ("update_preimage", 1L)))
    // VACUUM RETAIN n HOURS parses (a fresh history retains everything)
    assert(sql.execute("vacuum main.gold.m retain 168 hours").head().getLong(3) == 0L)
    assert(sql.execute("vacuum main.gold.m").head().getLong(3) >= 1L)
  }

  test("MERGE clause conditions and SET values may contain CASE WHEN ... THEN") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 1, "a"), (2L, 1, "b")).toDF("id", "v", "p")
      .createOrReplaceTempView("sqldml_cc")
    sql.execute("create table main.silver.cc as select * from sqldml_cc")
    Seq((1L, 9, "x"), (2L, 3, "y"), (3L, 8, "z")).toDF("id", "v", "p")
      .createOrReplaceTempView("sqldml_cc2")
    // the CASE's own WHEN/THEN must not confuse clause splitting or
    // the condition/action split
    sql.execute("""
        merge into main.silver.cc tgt
        using sqldml_cc2 src
        on tgt.id = src.id
        when matched and (case when src.v > 5 then 1 else 0 end) = 1
          then update set p = case when src.v > 8 then 'hi' else 'mid' end, v = src.v
        when not matched then insert *
    """)
    val state = wh.table("silver", "cc").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // id 1: cond true (v 9 > 5), p = 'hi' (9 > 8); id 2: cond false → kept;
    // id 3: inserted as-is
    assert(state == Seq((1L, 9, "hi"), (2L, 1, "b"), (3L, 8, "z")))
  }

  test("ANALYZE TABLE / SHOW PARTITIONS / two-arg table_changes") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 5.0, "a"), (2L, 6.0, "b"), (3L, 7.0, "a")).toDF("id", "amt", "pt")
      .createOrReplaceTempView("sqldml_an")
    sql.execute(
      "create or replace table main.gold.an partitioned by (pt) as " +
        "select id, amt, pt from sqldml_an")                               // v0
    // SHOW PARTITIONS lists the hive leaf dirs
    assert(sql.execute("show partitions main.gold.an").collect()
      .map(_.getString(0)).toSeq == Seq("pt=a", "pt=b"))
    // ANALYZE builds the skipping sidecars; metrics carry file counts
    assert(sql.execute("analyze table main.gold.an compute statistics for columns id, amt")
      .head().getLong(1) >= 1L)
    assert(sql.execute("analyze table main.gold.an compute statistics").head().getLong(1) >= 1L)
    assert(sql.execute("analyze table main.gold.an compute statistics for bloom id")
      .head().getLong(1) >= 1L)
    // three commits: v1 updates id 1; v2 deletes it — the bounded
    // two-arg range [1, 2] sees both, [2, 2] only the delete
    sql.execute("update main.gold.an set amt = amt + 1 where id = 1")      // v1
    sql.execute("delete from main.gold.an where id = 1")                   // v2
    val r12 = sql.execute(
      "select _change_type, _commit_version from table_changes('main.gold.an', 1, 2) " +
        "where id = 1 order by _commit_version, _change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r12 == Seq(("update_postimage", 1L), ("update_preimage", 1L), ("delete", 2L)))
    val r22 = sql.execute(
      "select _change_type from table_changes('main.gold.an', 2, 2)")
      .collect().map(_.getString(0)).toSeq
    assert(r22 == Seq("delete"))
    // net effect over [1, 2]: the v1 post-image (6.0) cancels against
    // the v2 delete of the same row — only the original image's
    // removal survives
    val net = wh.changeFeedNet("gold", "an", 1, 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("amt"),
        r.getAs[Long]("net"), r.getAs[String]("_change_type"))).toSeq
    assert(net == Seq((1L, 5.0, -1L, "delete")))
    // inverted range refuses
    intercept[IllegalArgumentException](wh.changeFeedRange("gold", "an", 2, 1))
    // timestamp-form bounds resolve through the ledger: [ts(v1), ts(v2)]
    // covers the same commits as [1, 2]
    val tsByV = wh.history("gold.an").collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("ts_millis")).toMap
    val iso = (ms: Long) => java.time.Instant.ofEpochMilli(ms).toString
    val rTs = sql.execute(
      s"select _change_type from table_changes('main.gold.an', '${iso(tsByV(1L))}', " +
        s"'${iso(tsByV(2L))}') where id = 1 order by _commit_version, _change_type")
      .collect().map(_.getString(0)).toSeq
    assert(rTs == Seq("update_postimage", "update_preimage", "delete"))
    // DESCRIBE TABLE lists the schema with partition markers
    val desc = sql.execute("describe table main.gold.an").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(desc.keySet == Set("id", "amt", "pt"))
    assert(desc("pt") == "partition column" && desc("id") == "")
  }

  test("OPTIMIZE WHERE compacts only the selected partitions") {
    import spark.implicits._
    val (wh, sql) = fresh()
    // repartition(4) spreads both partition values across 4 tasks ->
    // several files per hive dir, the fragmentation OPTIMIZE fixes
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "pt").repartition(4)
    wh.createOrReplacePartitioned("gold", "oc", df, Seq("pt"))
    def files(p: String) = wh.table("gold", "oc").inputFiles
      .filter(_.contains(s"pt=$p")).map(_.split('/').last).toSet
    val (a0, b0) = (files("a"), files("b"))
    assert(a0.size > 1, "fixture must be fragmented")
    val removed = sql.execute("optimize main.gold.oc where pt = 'a'").head().getLong(3)
    assert(removed == a0.size - 1L, "pt=a collapses to one file")
    assert(files("a").size == 1)
    assert(files("b") == b0, "unselected partition must keep its files by name")
    assert(wh.table("gold", "oc").count() == 40)
    assert(wh.lastOperation("gold.oc").get.getAs[String]("operation") == "COMPACT")
    // predicates over non-partition columns are refused, not silently
    // promoted to a whole-table rewrite
    intercept[IllegalArgumentException](wh.compactWhere("gold", "oc", $"id" > 3))
    // a predicate selecting nothing is a no-op commit
    assert(wh.compactWhere("gold", "oc", $"pt" === "zzz") == 0L)
  }

  test("compaction preserves schema-evolved columns (merged read, not one footer's schema)") {
    import spark.implicits._
    val (wh, _) = fresh()
    wh.createOrReplace("gold", "ev", Seq((1L, "a"), (2L, "b")).toDF("id", "p"))
    // evolution: the appended file carries a column the original lacks
    wh.append("gold", "ev", Seq((3L, "c", 30)).toDF("id", "p", "v"))
    assert(wh.table("gold", "ev").columns.toSeq == Seq("id", "p", "v"))
    wh.compact("gold", "ev")
    val rows = wh.table("gold", "ev").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(rows == Seq((1L, "a", -1), (2L, "b", -1), (3L, "c", 30)),
      "compaction must keep the evolved column and its values")
    // same guarantee on the partition-scoped path
    wh.createOrReplacePartitioned("gold", "evp",
      Seq((1L, "x", "pa"), (2L, "y", "pb")).toDF("id", "p", "pt"), Seq("pt"))
    wh.append("gold", "evp", Seq((3L, "z", 9, "pa")).toDF("id", "p", "v", "pt"))
    wh.compactWhere("gold", "evp", $"pt" === "pa")
    val pa = wh.table("gold", "evp").filter($"pt" === "pa").orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), if (r.isNullAt(r.fieldIndex("v"))) -1
        else r.getAs[Int]("v"))).toSeq
    assert(pa == Seq((1L, -1), (3L, 9)))
  }

  test("OPTIMIZE LEDGER folds per-commit files into one checkpoint; history and time travel survive") {
    import spark.implicits._
    val (wh, sql) = fresh()
    wh.createOrReplace("gold", "lg", Seq((1L, "a"), (2L, "b")).toDF("id", "p"))
    wh.append("gold", "lg", Seq((3L, "c")).toDF("id", "p"))
    wh.delete("gold", "lg", $"id" === 2L)
    wh.update("gold", "lg", $"id" === 1L, Map("p" -> lit("A")))
    val before  = wh.history("gold.lg").orderBy("version").collect().map(_.toSeq).toSeq
    val verPre  = wh.currentVersion("gold", "lg")
    val asOf0   = wh.tableAsOf("gold", "lg", 0L).orderBy("id").collect().map(_.toSeq).toSeq
    val ledger  = new java.io.File(wh.tablePath("_ops", "ledger"))
    def parts() = ledger.listFiles.count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(parts() >= 4, "one ledger file per commit expected before checkpoint")
    val folded = sql.execute("optimize ledger").head().getLong(3)
    assert(folded >= 4L && parts() == 1, "all per-commit files folded into one checkpoint")
    // identical history rows, same current version, time travel intact
    assert(wh.history("gold.lg").orderBy("version").collect().map(_.toSeq).toSeq == before)
    assert(wh.currentVersion("gold", "lg") == verPre)
    assert(wh.tableAsOf("gold", "lg", 0L).orderBy("id").collect().map(_.toSeq).toSeq == asOf0)
    // commits after the checkpoint append fresh files and version on
    wh.append("gold", "lg", Seq((4L, "d")).toDF("id", "p"))
    assert(wh.currentVersion("gold", "lg") == verPre + 1)
    assert(parts() == 2)
    // a second checkpoint folds checkpoint + tail again; idempotent after
    assert(sql.execute("optimize ledger").head().getLong(3) == 2L)
    assert(sql.execute("optimize ledger").head().getLong(3) == 0L)
    assert(wh.table("gold", "lg").count() == 3)
  }

  test("SHOW VIEWS lists registered views; DROP VIEW unregisters (IF EXISTS tolerated)") {
    import spark.implicits._
    val (wh, sql) = fresh()
    wh.createOrReplace("silver", "vbase", Seq((1L, "a"), (2L, "b")).toDF("id", "p"))
    sql.execute("create or replace view main.silver.v1 as select id from silver.vbase")
    sql.execute("create or replace view main.gold.v2 as select count(*) as n from silver.v1")
    assert(sql.execute("show views").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("gold", "v2"), ("silver", "v1")))
    assert(sql.execute("show views in silver").collect().map(_.getString(1)).toSeq == Seq("v1"))
    sql.execute("drop view main.gold.v2")
    assert(sql.execute("show views").count() == 1)
    intercept[IllegalArgumentException](sql.execute("drop view main.gold.v2"))
    sql.execute("drop view if exists main.gold.v2")
    // the dropped name no longer resolves in queries
    intercept[Exception](sql.execute("select * from gold.v2"))
  }

  test("SHOW CREATE TABLE renders schema/partitions/constraints/props; CREATE TABLE LIKE clones them empty") {
    import spark.implicits._
    val (wh, sql) = fresh()
    wh.createOrReplacePartitioned("silver", "src",
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part"), Seq("part"))
    wh.addCheckConstraint("silver", "src", "id_pos", "id > 0")
    wh.setTableProperties("silver", "src", Seq("owner" -> "graft"))
    val ddl = sql.execute("show create table silver.src").collect()(0).getString(0)
    assert(ddl.contains("CREATE TABLE main.silver.src"))
    assert(ddl.contains("id BIGINT") && ddl.contains("v STRING") && ddl.contains("part STRING"))
    assert(ddl.contains("PARTITIONED BY (part)"))
    assert(ddl.contains("CONSTRAINT id_pos CHECK (id > 0)"))
    assert(ddl.contains("'owner' = 'graft'"))

    sql.execute("create table gold.dst like silver.src")
    assert(wh.table("gold", "dst").count() == 0, "LIKE must not copy data")
    assert(wh.table("gold", "dst").schema == wh.table("silver", "src").schema)
    assert(wh.constraints("gold", "dst").map(c => (c._1, c._2)) == Seq(("id_pos", "CHECK")))
    assert(wh.tableProperties("gold", "dst") == Seq("owner" -> "graft"))
    // the clone enforces the cloned constraint
    intercept[Exception](wh.append("gold", "dst",
      Seq((-1L, "x", "p1")).toDF("id", "v", "part")))
    // and refuses to overwrite an existing table
    intercept[IllegalArgumentException](sql.execute("create table gold.dst like silver.src"))
  }

  test("ledger auto-checkpoints on the 64-commit cadence") {
    import spark.implicits._
    val (wh, _) = fresh()
    wh.createOrReplace("gold", "ac", Seq((1L, "a")).toDF("id", "p")) // v0
    val ledger  = new java.io.File(wh.tablePath("_ops", "ledger"))
    def parts() = ledger.listFiles.count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    // 63 metadata commits → v63, no fold yet (cadence is v % 64 == 0)
    (1 to 63).foreach(i => wh.setTableProperties("gold", "ac", Seq("i" -> i.toString)))
    assert(parts() == 64)
    // the 64th commit folds the tail inline: ledger collapses to 1 file
    wh.setTableProperties("gold", "ac", Seq("i" -> "64"))
    assert(parts() == 1)
    assert(wh.currentVersion("gold", "ac") == 64)
    assert(wh.history("gold.ac").count() == 65)
  }

  test("TBLPROPERTIES set/unset/show survive REPLACE and DML; history logs the change") {
    import spark.implicits._
    val (wh, sql) = fresh()
    wh.createOrReplace("gold", "props", Seq((1L, "a")).toDF("id", "p"))
    sql.execute("alter table main.gold.props set tblproperties (" +
      "'delta.appendOnly' = 'false', 'owner' = 'data eng', quality = gold)")
    def show() = sql.execute("show tblproperties gold.props")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(show() == Seq("delta.appendOnly" -> "false", "owner" -> "data eng", "quality" -> "gold"))
    // upsert-in-place keeps order; new key appends
    sql.execute("alter table gold.props set tblproperties ('owner' = 'ml eng', 'pii' = 'no')")
    assert(show() == Seq("delta.appendOnly" -> "false", "owner" -> "ml eng",
      "quality" -> "gold", "pii" -> "no"))
    // properties survive DML and a full REPLACE (sidecar lives beside the dir)
    wh.append("gold", "props", Seq((2L, "b")).toDF("id", "p"))
    wh.createOrReplace("gold", "props", Seq((9L, "z")).toDF("id", "p"))
    assert(show().map(_._1) == Seq("delta.appendOnly", "owner", "quality", "pii"))
    // UNSET: bare form refuses unknown keys, IF EXISTS ignores them
    intercept[IllegalArgumentException](
      sql.execute("alter table gold.props unset tblproperties ('nope')"))
    sql.execute("alter table gold.props unset tblproperties if exists ('nope', 'pii')")
    assert(show().map(_._1) == Seq("delta.appendOnly", "owner", "quality"))
    // the change is a visible zero-metric commit; time travel still works across it
    val ops = wh.history("gold.props").select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "SET TBLPROPERTIES") == 2 && ops.contains("UNSET TBLPROPERTIES"))
    assert(wh.tableAsOf("gold", "props", wh.currentVersion("gold", "props")).count() == 1)
    // dropTable removes the sidecar with the table
    wh.dropTable("gold", "props")
    wh.createOrReplace("gold", "props", Seq((1L, "a")).toDF("id", "p"))
    assert(show().isEmpty)
  }

  test("autoCompact compacts only over-fragmented partitions") {
    import spark.implicits._
    val (wh, _) = fresh()
    wh.createOrReplacePartitioned("gold", "ac",
      Seq((1L, "a"), (2L, "b")).toDF("id", "pt").repartition(1), Seq("pt"))
    // 6 small appends land 6 extra files in pt=a only — the daily
    // ingest fragmentation pattern auto-compaction exists for
    (3L to 8L).foreach(i => wh.append("gold", "ac", Seq((i, "a")).toDF("id", "pt")))
    def files(p: String) = wh.table("gold", "ac").inputFiles
      .filter(_.contains(s"pt=$p")).map(_.split('/').last).toSet
    val (a0, b0) = (files("a"), files("b"))
    assert(a0.size == 7 && b0.size == 1)
    assert(wh.autoCompact("gold", "ac", maxFilesPerPartition = 4) == 1L,
      "exactly the fragmented partition compacts")
    assert(files("a").size == 1)
    assert(files("b") == b0, "healthy partition keeps its file by name")
    assert(wh.table("gold", "ac").count() == 8)
    assert(wh.autoCompact("gold", "ac", maxFilesPerPartition = 4) == 0L, "idempotent no-op")
    // unpartitioned: whole-table pass over the bound, no-op under it
    wh.createOrReplace("gold", "acflat", (1 to 20).toDF("v").repartition(6))
    assert(wh.autoCompact("gold", "acflat", maxFilesPerPartition = 4) == 1L)
    assert(wh.table("gold", "acflat").inputFiles.length == 1)
    assert(wh.autoCompact("gold", "acflat", maxFilesPerPartition = 4) == 0L)
  }

  test("views are late-binding: a SELECT after DML sees the live table") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, "x")).toDF("id", "payload").createOrReplaceTempView("sqldml_lb")
    sql.execute("create table main.gold.base as select * from sqldml_lb")
    sql.execute(
      "create or replace view main.gold.vw as select id, upper(payload) as p from main.gold.base")
    assert(sql.execute("select * from main.gold.vw").collect()
      .map(_.getString(1)).toSeq == Seq("X"))
    // DML retires the generation the view was created over — the view
    // must re-bind to the live state, not serve a stale snapshot (or
    // throw FileNotFoundException on the retired files)
    sql.execute("insert into main.gold.base values (2, 'y')")
    sql.execute("update main.gold.base set payload = 'z' where id = 1")
    assert(sql.execute("select p from main.gold.vw order by id").collect()
      .map(_.getString(0)).toSeq == Seq("Z", "Y"))
    // views over views re-bind transitively
    sql.execute("create or replace view main.gold.vw2 as select count(*) as n from main.gold.vw")
    sql.execute("delete from main.gold.base where id = 2")
    assert(sql.execute("select n from main.gold.vw2").head().getLong(0) == 1)
    // a view redefined over ITSELF refuses at reference instead of
    // recursing forever (Spark rejects these at creation; late binding
    // moves the detection to the read)
    sql.execute("create or replace view main.gold.vw as select * from main.gold.vw")
    val cyc = intercept[Exception](sql.execute("select * from main.gold.vw"))
    assert(cyc.getMessage.contains("references itself"))
  }

  test("MERGE binds by alias, not by textual order (target aliased s, source t)") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 1, "a"), (2L, 1, "b")).toDF("id", "v", "p")
      .createOrReplaceTempView("sqldml_swap")
    sql.execute("create table main.silver.sw as select * from sqldml_swap")
    Seq((1L, 9, "x"), (3L, 9, "y")).toDF("id", "v", "p")
      .createOrReplaceTempView("sqldml_swap2")
    // adversarial aliasing: the TARGET is aliased `s` and the SOURCE
    // `t` — a sequential textual rewrite would bind both sides to one
    // input; the alias map must hold
    sql.execute("""
        merge into main.silver.sw as s
        using sqldml_swap2 t
        on s.id = t.id
        when matched and t.v > s.v then update set v = t.v, p = s.p
        when not matched then insert *
    """)
    val state = wh.table("silver", "sw").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // id 1: v takes the SOURCE's 9, p keeps the TARGET's "a"
    assert(state == Seq((1L, 9, "a"), (2L, 1, "b"), (3L, 9, "y")))
    // colliding aliases are rejected, not silently misbound
    val ex = intercept[Exception](sql.execute("""
        merge into main.silver.sw as x using sqldml_swap2 x
        on x.id = x.id when matched then delete
    """))
    assert(ex.getMessage.contains("alias"))
  }

  test("INSERT OVERWRITE keeps the partition layout and null-fills omitted columns") {
    import spark.implicits._
    val (wh, sql) = fresh()
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "v", "pt")
      .createOrReplaceTempView("sqldml_ow")
    sql.execute(
      "create or replace table main.silver.ow partitioned by (pt) as " +
        "select id, v, pt from sqldml_ow")
    assert(wh.partitionColumns("silver", "ow") == Seq("pt"))
    // full overwrite: layout survives (dirs + registered pcols)
    sql.execute("insert overwrite main.silver.ow values (7, 70, 'c')")
    assert(wh.partitionColumns("silver", "ow") == Seq("pt"),
      "overwrite must not flatten the hive layout")
    assert(wh.table("silver", "ow").inputFiles.exists(_.contains("pt=c")))
    // column-subset overwrite: unlisted columns null-fill, schema intact
    sql.execute("insert overwrite main.silver.ow (id, pt) values (8, 'd'), (9, 'e')")
    assert(wh.table("silver", "ow").columns.toSeq.sorted == Seq("id", "pt", "v"))
    val row = wh.table("silver", "ow").orderBy("id").head()
    assert(row.getAs[Long]("id") == 8L && row.isNullAt(row.fieldIndex("v")))
    // partition-scoped DELETE still prunes after the overwrite
    sql.execute("delete from main.silver.ow where pt = 'd'")
    assert(wh.table("silver", "ow").collect().map(_.getAs[Long]("id")).toSeq == Seq(9L))
  }
}
