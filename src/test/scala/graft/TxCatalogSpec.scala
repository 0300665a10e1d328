package graft

import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** The named-table catalog ([[graft.plans.TxCatalog]]): names and paths
  * are two ADDRESSES of one table state — every surface (SELECT, time
  * travel, INSERT, DML statements, ALTER, SHOW) must hit the same
  * transactional front doors the path surface uses. */
class TxCatalogSpec extends SparkSpecBase {

  private def tmp(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-txcat/$tag"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  private lazy val wired: Unit = {
    spark.conf.set("spark.sql.catalog.gcat", "graft.plans.TxCatalog")
    spark.conf.set("spark.sql.catalog.gcat.root", tmp("metastore"))
  }

  test("CREATE TABLE ... LOCATION registers a pointer; name and path " +
      "surfaces address the SAME state; SHOW TABLES lists it") {
    wired
    import spark.implicits._
    val loc = tmp("t1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.sales")
    spark.sql(s"CREATE TABLE gcat.sales.t1 USING txlog LOCATION '$loc'")
    assert(spark.sql("SHOW TABLES IN gcat.sales")
      .collect().map(_.getString(1)).contains("t1"))
    // first write through the PATH surface...
    TxLog.appendBatchTx(
      Seq(("a", 1L, 10.0), ("b", 2L, 20.0)).toDF("part", "k", "v"),
      loc, "part", "cat-b1")
    // ...reads back through the NAME surface
    assert(spark.sql("SELECT COUNT(*) FROM gcat.sales.t1").head.getLong(0)
      === 2L)
    assert(spark.table("gcat.sales.t1").columns.toSet ===
      Set("part", "k", "v"))
    // INSERT INTO by name = a transactional append on the same log
    // (table column order = data columns then partition columns last)
    spark.sql("INSERT INTO gcat.sales.t1 SELECT CAST(3 AS BIGINT) AS k, " +
      "30.0 AS v, 'c' AS part")
    assert(TxLog.readTable(spark, loc).count() === 3L)
    assert(TxLog.currentVersion(spark, loc) === 2L)
    // name-addressed DML routes to the same front doors
    spark.sql("UPDATE gcat.sales.t1 SET v = v + 1 WHERE k >= 2")
    assert(TxLog.readTable(spark, loc).agg(sum("v")).head.getDouble(0)
      === 10.0 + 21.0 + 31.0)
    spark.sql("DELETE FROM gcat.sales.t1 WHERE part = 'b'")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.sales.t1").head.getLong(0)
      === 2L)
    // MERGE by name
    Seq(("a", 1L, 100.0), ("d", 4L, 40.0)).toDF("part", "k", "v")
      .createOrReplaceTempView("cat_src")
    spark.sql("MERGE INTO gcat.sales.t1 t USING cat_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT SUM(v) FROM gcat.sales.t1").head.getDouble(0)
      === 100.0 + 31.0 + 40.0)
    // time travel by name (both spellings resolve through the catalog)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.sales.t1 VERSION AS OF 1")
      .head.getLong(0) === 2L)
    // DESCRIBE HISTORY / SHOW PARTITIONS by name
    assert(spark.sql("DESCRIBE HISTORY gcat.sales.t1").count() === 5L)
    assert(spark.sql("SHOW PARTITIONS gcat.sales.t1")
      .collect().map(_.getString(0)).toSet === Set("a", "c", "d"))
    // ALTER by name routes to the DDL front doors
    spark.sql("ALTER TABLE gcat.sales.t1 RENAME COLUMN v TO amount")
    assert(spark.table("gcat.sales.t1").columns.contains("amount"))
    assert(TxLog.readTable(spark, loc).columns.contains("amount"))
    // table_changes accepts the catalog NAME too (the Delta spelling) —
    // same feed as the path form (windowed to the append-only prefix:
    // the later DML here was written without change files)
    assert(spark.sql("SELECT * FROM table_changes('gcat.sales.t1', 0, 2)")
      .collect().toSet ===
      spark.sql(s"SELECT * FROM table_changes('$loc', 0, 2)")
        .collect().toSet)
  }

  test("CTAS records schema from the query data; INSERT OVERWRITE by " +
      "name is the atomic full replace; DROP TABLE unregisters only") {
    wired
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    spark.sql("CREATE TABLE gcat.ctas.t2 USING txlog PARTITIONED BY " +
      "(part) AS SELECT 'a' AS part, 1L AS k UNION ALL " +
      "SELECT 'b' AS part, 2L AS k")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.ctas.t2").head.getLong(0)
      === 2L)
    // the recorded partitioning came from PARTITIONED BY
    val loc = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[graft.plans.TxCatalog]
      .locationOf(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ctas"), "t2"))
    assert(TxLog.tableMeta(spark, loc)._2.map(_.name) === Seq("part"))
    // INSERT OVERWRITE = full replace: partition b drops (the existing
    // table's column order is data-then-partition: k, part)
    spark.sql("INSERT OVERWRITE gcat.ctas.t2 " +
      "SELECT CAST(9 AS BIGINT) AS k, 'a' AS part")
    assert(TxLog.partitionValues(spark, loc) === Set("a"))
    assert(spark.sql("SELECT k FROM gcat.ctas.t2").head.getLong(0) === 9L)
    // DROP TABLE removes the NAME; the table state stays on disk
    spark.sql("DROP TABLE gcat.ctas.t2")
    assert(!spark.sql("SHOW TABLES IN gcat.ctas")
      .collect().map(_.getString(1)).contains("t2"))
    assert(TxLog.readTable(spark, loc).count() === 1L)
    // re-register at the same location: recorded partitioning wins
    spark.sql(s"CREATE TABLE gcat.ctas.t2b USING txlog LOCATION '$loc'")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.ctas.t2b").head.getLong(0)
      === 1L)
  }

  test("the admin statements work by name too: RESTORE, DESCRIBE " +
      "DETAIL, OPTIMIZE, VACUUM") {
    wired
    import spark.implicits._
    val loc = tmp("admin-t")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.adm")
    spark.sql(s"CREATE TABLE gcat.adm.t USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(Seq(("a", 1L)).toDF("part", "k"), loc, "part",
      "adm-b1")                                                      // v1
    TxLog.appendBatchTx(Seq(("b", 2L)).toDF("part", "k"), loc, "part",
      "adm-b2")                                                      // v2
    assert(spark.sql("DESCRIBE DETAIL gcat.adm.t").count() === 1L)
    val v = spark.sql("RESTORE TABLE gcat.adm.t TO VERSION AS OF 1")
      .head.getLong(0)
    assert(v === 3L)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.adm.t").head.getLong(0)
      === 1L)
    val opt = spark.sql("OPTIMIZE gcat.adm.t").head
    assert(opt.getLong(0) >= 3L) // version after the maintenance bundle
    assert(spark.sql("VACUUM gcat.adm.t RETAIN 0 HOURS")
      .head.getLong(0) >= 1L,
      "vacuum by name must reclaim the restored-away files")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.adm.t").head.getLong(0)
      === 1L)
  }

  test("DataFrameWriterV2: writeTo(name).using(txlog).create / .append " +
      "/ .overwrite ride the same front doors") {
    wired
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.w2")
    // create() = the CREATE COMMIT (declared schema) + the data commit
    Seq(("a", 1L), ("b", 2L)).toDF("part", "k")
      .writeTo("gcat.w2.t").using("txlog")
      .partitionedBy(col("part")).create()                           // v1+v2
    assert(spark.sql("SELECT COUNT(*) FROM gcat.w2.t").head.getLong(0)
      === 2L)
    Seq(("c", 3L)).toDF("part", "k").writeTo("gcat.w2.t").append()   // v3
    assert(spark.sql("SELECT COUNT(*) FROM gcat.w2.t").head.getLong(0)
      === 3L)
    // overwrite(lit(true)) = the atomic full replace
    Seq(("d", 9L)).toDF("part", "k")
      .writeTo("gcat.w2.t").overwrite(lit(true))                     // v4
    val loc = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[graft.plans.TxCatalog]
      .locationOf(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("w2"), "t"))
    assert(TxLog.partitionValues(spark, loc) === Set("d"))
    assert(TxLog.readTableAt(spark, loc, 3L).count() === 3L)
  }

  test("readStream.table(name) follows the commit log like the path " +
      "surface (offsets are log versions; appends stream exactly once)") {
    wired
    import spark.implicits._
    val loc = tmp("stream-t")
    val cp = tmp("stream-cp")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.str")
    spark.sql(s"CREATE TABLE gcat.str.ev USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(Seq(("a", 1L), ("b", 2L)).toDF("part", "k"),
      loc, "part", "str-b1")                                         // v1
    val q = spark.readStream.table("gcat.str.ev")
      .groupBy("part").count()
      .writeStream.format("memory").queryName("cat_stream")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ===
        Map("a" -> 1L, "b" -> 1L))
      // a new commit arrives as exactly one incremental micro-batch
      TxLog.appendBatchTx(Seq(("a", 3L)).toDF("part", "k"),
        loc, "part", "str-b2")                                       // v2
      q.processAllAvailable()
      assert(spark.table("cat_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ===
        Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("readStream.option(readChangeFeed).table(name) serves the CDF " +
      "stream: change columns declared, partition values decoded, rows " +
      "== the batch feed (the name/path CDF parity contract)") {
    wired
    import spark.implicits._
    val loc = tmp("cdf-t")
    val cp = tmp("cdf-cp")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cdf")
    spark.sql(s"CREATE TABLE gcat.cdf.ev USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(
      Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0))
        .toDF("part", "k", "v"), loc, "part", "cdf-b1")              // v1
    TxLog.updateWhereTx(spark, loc, col("k") === 2L,
      Map("v" -> (col("v") + 5)), changeFeed = true)                 // v2
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("gcat.cdf.ev")
      .writeStream.format("memory").queryName("cat_cdf")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cat_cdf")
      // the DECLARED stream schema carries the change columns (the bug:
      // the catalog handed the batch schema through, so they were absent
      // and the trailing-two-fields partition decode misaligned)
      assert(got.columns.toSeq ===
        Seq("k", "v", "part", "_change_type", "_commit_version"))
      // partition values decode correctly (not dropped/misaligned)
      assert(got.select("part").as[String].collect().toSet === Set("a", "b"))
      val (batch, _) = TxLog.readChangeFeed(spark, loc, 0L)
      val key = (df: org.apache.spark.sql.DataFrame) => df
        .select("k", "v", "part", "_change_type", "_commit_version")
        .collect().map(_.toSeq).toSet
      assert(key(got) === key(batch.get))
    } finally q.stop()
  }

  test("writeStream.format(txlog).toTable(name) routes to the ledgered " +
      "txlog sink (the V1 fallback): appends land as commits, a cold " +
      "restart resumes exactly-once — identical to the path surface") {
    wired
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp("snk-t")
    val cp = tmp("snk-cp")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.snk")
    spark.sql(s"CREATE TABLE gcat.snk.ev USING txlog LOCATION '$loc'")
    // seed through the path surface (records the partitioning)
    TxLog.appendBatchTx(Seq(("a", 1L)).toDF("part", "k"),
      loc, "part", "snk-b0")                                         // v1
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("part", "k").writeStream.format("txlog")
      .option("checkpointLocation", cp)
      .toTable("gcat.snk.ev")
    try {
      mem.addData(("a", 2L), ("b", 3L))
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM gcat.snk.ev")
        .head.getLong(0) === 3L)
      mem.addData(("c", 4L))
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM gcat.snk.ev")
        .head.getLong(0) === 4L)
    } finally q.stop()
    val vAfter = TxLog.currentVersion(spark, loc)
    // COLD RESTART on the same checkpoint: a fresh query resumes the
    // ledgered writer identity — nothing replays, new data lands once
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    // re-offer the original batches so the checkpoint's offsets align;
    // a replayed batch commits idempotently through the writer-seq ledger
    mem2.addData(("a", 2L), ("b", 3L))
    mem2.addData(("c", 4L))
    mem2.addData(("a", 5L))
    val q2 = mem2.toDF().toDF("part", "k").writeStream.format("txlog")
      .option("checkpointLocation", cp)
      .toTable("gcat.snk.ev")
    try {
      q2.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM gcat.snk.ev")
        .head.getLong(0) === 5L)
      assert(TxLog.currentVersion(spark, loc) === vAfter + 1,
        "the restarted stream must commit exactly one new version")
    } finally q2.stop()
    // a MISMATCHED format refuses (Spark's provider check), and a plain
    // parquet toTable on a txlog catalog table never silently lands
    val e = intercept[Exception] {
      mem2.toDF().toDF("part", "k").writeStream.format("parquet")
        .option("checkpointLocation", tmp("snk-cp2"))
        .toTable("gcat.snk.ev")
    }
    assert(!e.getMessage.contains("txlog SQL"), e.getMessage)
  }

  test("USE gcat resolves bare-name DML against the current catalog and " +
      "namespace; temp views shadow; unregistered names and " +
      "spark_catalog defaults delegate untouched") {
    wired
    import spark.implicits._
    val loc = tmp("use-t")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.use")
    spark.sql(s"CREATE TABLE gcat.use.ut USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(
      Seq(("a", 1L, 10.0), ("b", 2L, 20.0)).toDF("part", "k", "v"),
      loc, "part", "use-b1")
    val priorCat = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      spark.sql("USE gcat.use")
      // bare-name DML routes to the same front doors
      spark.sql("UPDATE ut SET v = v + 1 WHERE k = 1")
      assert(TxLog.readTable(spark, loc)
        .agg(sum("v")).head.getDouble(0) === 11.0 + 20.0)
      spark.sql("DELETE FROM ut WHERE part = 'b'")
      assert(TxLog.readTable(spark, loc).count() === 1L)
      Seq(("c", 3L, 30.0)).toDF("part", "k", "v")
        .createOrReplaceTempView("use_src")
      spark.sql("MERGE INTO ut t USING use_src s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT *")
      assert(TxLog.readTable(spark, loc).count() === 2L)
      // namespace-relative 2-part name under the current catalog
      assert(spark.sql("DESCRIBE HISTORY use.ut").count() >= 3L)
      // a TEMP VIEW with the table's name shadows it — Spark's error
      // (UPDATE on a view), never a txlog commit
      Seq((9L, 9.0)).toDF("k", "v").createOrReplaceTempView("shadow_v")
      val before = TxLog.currentVersion(spark, loc)
      val e1 = intercept[Exception] {
        spark.sql("UPDATE shadow_v SET v = 0 WHERE k = 9")
      }
      assert(!e1.getMessage.contains("txlog"), e1.getMessage)
      assert(TxLog.currentVersion(spark, loc) === before)
      // an UNREGISTERED bare name delegates (Spark owns the error)
      val e2 = intercept[Exception] {
        spark.sql("UPDATE never_registered SET v = 0 WHERE k = 1")
      }
      assert(!e2.getMessage.contains("txlog SQL"), e2.getMessage)
    } finally spark.sql(s"USE $priorCat")
    // back on spark_catalog: bare names delegate untouched again
    val e3 = intercept[Exception] {
      spark.sql("UPDATE ut SET v = 0 WHERE k = 1")
    }
    assert(!e3.getMessage.contains("txlog SQL"), e3.getMessage)
  }

  test("catalog statements on NON-graft catalogs delegate untouched; an " +
      "unregistered table under our catalog is a loud NoSuchTable") {
    wired
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("plain_v")
    // spark_catalog names never claim (UPDATE on a view = Spark's error)
    val e = intercept[Exception] {
      spark.sql("UPDATE spark_catalog.default.nonexistent SET k = 1")
    }
    assert(!e.getMessage.contains("txlog SQL"), e.getMessage)
    // our catalog + unknown table = OUR loud error
    val e2 = intercept[Exception] {
      spark.sql("UPDATE gcat.sales.never_made SET k = 1")
    }
    assert(e2.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e2.getMessage.contains("never_made"), e2.getMessage)
  }

  test("SET/UNSET TBLPROPERTIES by name; SHOW TBLPROPERTIES renders the " +
      "recorded set; both addresses see one property state") {
    wired
    import spark.implicits._
    val loc = tmp("props")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.props")
    spark.sql(s"CREATE TABLE gcat.props.t USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(Seq(("a", 1L)).toDF("part", "k"), loc, "part",
      "prop-b1")                                                     // v1
    // Spark's OWN parser handles the name surface → TxCatalog.alterTable
    spark.sql("ALTER TABLE gcat.props.t SET TBLPROPERTIES (" +
      "'team.owner' = 'data-eng', 'graft.vacuum.retentionMs' = '0')") // v2
    // one property state under both addresses
    assert(TxLog.tableProperties(spark, loc) === Map(
      "team.owner" -> "data-eng", "graft.vacuum.retentionMs" -> "0"))
    val shown = spark.sql("SHOW TBLPROPERTIES gcat.props.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team.owner").contains("data-eng"), shown.toString)
    spark.sql(
      "ALTER TABLE gcat.props.t UNSET TBLPROPERTIES ('team.owner')") // v3
    assert(TxLog.tableProperties(spark, loc) ===
      Map("graft.vacuum.retentionMs" -> "0"))
    // a path-surface SET lands in the same log the name surface reads
    spark.sql(s"ALTER TABLE txlog.`$loc` SET TBLPROPERTIES " +
      "('tier' = 'gold')")                                           // v4
    assert(spark.sql("SHOW TBLPROPERTIES gcat.props.t")
      .collect().map(_.getString(0)).contains("tier"))
    // REGISTERING an existing table with TBLPROPERTIES merges them into
    // the one shared log (both names keep reading one property state)
    spark.sql("CREATE TABLE gcat.props.t_alias USING txlog LOCATION " +
      s"'$loc' TBLPROPERTIES ('registered.by' = 'alias')")           // v5
    assert(TxLog.tableProperties(spark, loc) === Map(
      "graft.vacuum.retentionMs" -> "0", "tier" -> "gold",
      "registered.by" -> "alias"))
  }

  test("CREATE TABLE with a declared schema is a real CREATE COMMIT: " +
      "the empty table reads, TBLPROPERTIES ride it, DDL works before " +
      "data, the first writer is held to the declared contract") {
    wired
    import spark.implicits._
    val loc = tmp("declared")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.decl")
    spark.sql("CREATE TABLE gcat.decl.t (k BIGINT, v DOUBLE, " +
      s"part STRING) USING txlog PARTITIONED BY (part) LOCATION '$loc' " +
      "TBLPROPERTIES ('team.owner' = 'data-eng')")                   // v1
    // the declared schema + properties are COMMITTED state, not a hint
    assert(TxLog.currentVersion(spark, loc) === 1L)
    assert(TxLog.tableProperties(spark, loc) ===
      Map("team.owner" -> "data-eng"))
    // the empty table READS: zero rows, the declared columns
    assert(spark.sql("SELECT COUNT(*) FROM gcat.decl.t").head.getLong(0)
      === 0L)
    assert(spark.table("gcat.decl.t").columns.toSeq ===
      Seq("k", "v", "part"))
    // DDL works before any data lands
    spark.sql("ALTER TABLE gcat.decl.t ADD COLUMNS (note STRING)")   // v2
    // a writer that LOST a declared column refuses (the contract holds
    // from v1, not from the first write)
    val e = intercept[Exception] {
      TxLog.appendBatchTx(Seq(("a", 1L)).toDF("part", "k"), loc, "part",
        "decl-b0")
    }
    assert(e.getMessage.contains("drops or retypes"), e.getMessage)
    // a conforming writer lands; both surfaces read it back
    TxLog.appendBatchTx(
      Seq(("a", 1L, 2.0, "n1")).toDF("part", "k", "v", "note"),
      loc, "part", "decl-b1")                                        // v3
    spark.sql("INSERT INTO gcat.decl.t SELECT CAST(2 AS BIGINT), 3.0, " +
      "'n2', 'b'")                                                   // v4
    assert(spark.sql("SELECT SUM(v) FROM gcat.decl.t").head.getDouble(0)
      === 5.0)
    assert(TxLog.readTable(spark, loc).count() === 2L)
    // re-creating over an existing table refuses loudly
    val e2 = intercept[Exception] {
      TxLog.createTableTx(spark, loc,
        spark.table("gcat.decl.t").schema, Seq("part"))
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // TBLPROPERTIES on a brand-new table NEED the declared contract
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.decl.bare USING txlog LOCATION " +
        s"'${tmp("declared-bare")}' TBLPROPERTIES ('x' = 'y')")
    }
    assert(e3.getMessage.contains("TBLPROPERTIES"), e3.getMessage)
  }

  test("CREATE OR REPLACE / REPLACE TABLE: the staged replace is ONE " +
      "whole-table-state commit — no old-row merge, definition reset") {
    wired
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.rep")
    // seed a MANAGED table (defaulted location) and decorate the old
    // definition: rename + constraint + property
    spark.sql("CREATE TABLE gcat.rep.t USING txlog PARTITIONED BY (part) " +
      "AS SELECT 'a' AS part, CAST(1 AS BIGINT) AS k " +
      "UNION ALL SELECT 'b', CAST(2 AS BIGINT)")
    val loc = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[graft.plans.TxCatalog]
      .locationOf(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("rep"), "t"))
    spark.sql("ALTER TABLE gcat.rep.t RENAME COLUMN k TO key")
    spark.sql(s"ALTER TABLE txlog.`$loc` ADD CONSTRAINT pos CHECK (key > 0)")
    spark.sql("ALTER TABLE gcat.rep.t SET TBLPROPERTIES ('tier' = 'old')")
    val vBefore = TxLog.currentVersion(spark, loc)
    // CREATE OR REPLACE with a NEW schema: the dropped-pointer +
    // re-register path would MERGE the old rows in — the staged replace
    // must not
    spark.sql("CREATE OR REPLACE TABLE gcat.rep.t USING txlog " +
      "PARTITIONED BY (part) TBLPROPERTIES ('tier' = 'new') " +
      "AS SELECT 'z' AS part, 'n1' AS label")
    val rows = spark.sql("SELECT part, label FROM gcat.rep.t").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("z", "n1")), "old rows must not merge into the replacement")
    assert(TxLog.tableProperties(spark, loc) === Map("tier" -> "new"))
    val detail = spark.sql("DESCRIBE DETAIL gcat.rep.t").head
    assert(detail.getAs[Long]("n_renamed_columns") === 0L &&
      detail.getAs[Long]("n_constraints") === 0L,
      "the replace must reset mapping and constraints")
    // the old constraint must not police new-definition writers
    spark.sql("INSERT INTO gcat.rep.t SELECT 'n2' AS label, 'z' AS part")
    // time travel pre-replace serves the old definition under BOTH
    // addresses
    assert(spark.sql(
        s"SELECT * FROM gcat.rep.t VERSION AS OF $vBefore")
      .columns.toSet === Set("part", "key"))
    // plain REPLACE TABLE (cols): declared-schema-only replacement
    spark.sql("REPLACE TABLE gcat.rep.t (x BIGINT, part STRING) " +
      "USING txlog PARTITIONED BY (part)")
    val t = spark.table("gcat.rep.t")
    assert(t.count() === 0L && t.columns.toSet === Set("x", "part"))
    // REPLACE of a missing table refuses; CREATE OR REPLACE creates
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.rep.nope (x BIGINT, part STRING) " +
        "USING txlog PARTITIONED BY (part)")
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(not.?found|no such" +
      "|cannot be replaced).*"), e.getMessage)
    spark.sql("CREATE OR REPLACE TABLE gcat.rep.fresh USING txlog " +
      "PARTITIONED BY (part) AS SELECT 'p' AS part, CAST(7 AS BIGINT) AS x")
    assert(spark.sql("SELECT x FROM gcat.rep.fresh").head.getLong(0) === 7L)
    // writerV2 createOrReplace rides the same staged replace
    Seq(("q", 8L)).toDF("part", "x")
      .writeTo("gcat.rep.fresh").using("txlog")
      .partitionedBy(col("part")).createOrReplace()
    assert(spark.sql("SELECT part, x FROM gcat.rep.fresh").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("q", 8L)))
  }

  test("lifecycle by name: TRUNCATE TABLE, SHOW CREATE TABLE's " +
      "PARTITIONED BY, DROP TABLE PURGE reclaims the location") {
    wired
    import spark.implicits._
    val loc = tmp("lifecycle-t")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lc")
    spark.sql(s"CREATE TABLE gcat.lc.t USING txlog LOCATION '$loc'")
    TxLog.appendBatchTx(Seq(("a", 1L), ("b", 2L)).toDF("part", "k"),
      loc, "part", "lc-b1")                                          // v1
    // the recorded partitioning is DSv2 metadata now
    assert(spark.sql("SHOW CREATE TABLE gcat.lc.t").head.getString(0)
      .contains("PARTITIONED BY (part)"))
    val vBefore = TxLog.currentVersion(spark, loc)
    // TRUNCATE: metadata-only, schema and history stay
    spark.sql("TRUNCATE TABLE gcat.lc.t")                            // v2
    val t = spark.table("gcat.lc.t")
    assert(t.count() === 0L && t.columns.toSet === Set("part", "k"))
    assert(TxLog.readTableAt(spark, loc, vBefore).count() === 2L,
      "time travel must cross the truncate")
    // the truncated table keeps working
    TxLog.appendBatchTx(Seq(("c", 3L)).toDF("part", "k"), loc, "part",
      "lc-b2")                                                       // v3
    assert(spark.sql("SELECT k FROM gcat.lc.t").head.getLong(0) === 3L)
    // plain DROP keeps the data (external posture)...
    spark.sql("DROP TABLE gcat.lc.t")
    assert(TxLog.tableExists(spark, loc))
    spark.sql(s"CREATE TABLE gcat.lc.t USING txlog LOCATION '$loc'")
    // ...PURGE reclaims name AND location
    spark.sql("DROP TABLE gcat.lc.t PURGE")
    assert(!spark.catalog.tableExists("gcat.lc.t"))
    assert(!new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(loc)),
      "PURGE must reclaim the table's location")
  }
}
