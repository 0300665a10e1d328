package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink connector (SURVEY §2.1 S6 parity).
  *
  * The reference extracts warehouse tables with `pd.read_sql` over a
  * Postgres connection (customer_analytics_dag.py:177-188) — a single
  * cursor streaming every row through one process. Spark-side the same
  * capability is `spark.read.jdbc`, but the default is equally serial:
  * one task, one connection. At 100 TB-adjacent sizes the ONLY sane JDBC
  * read is the partitioned form (numPartitions parallel range-bounded
  * cursors), so this wrapper makes the partition spec a first-class
  * argument rather than an afterthought, and `readQuery` pushes arbitrary
  * SQL down to the database (the reference's read_sql(query) shape).
  *
  * This is a connector, not an operator: correctness is gated by
  * SourcesSpec against an embedded Derby instance (the JDBC engine that
  * ships with the JDK-adjacent Spark jars), not by a CORRECTNESS row.
  */
object Jdbc {

  private def base(spark: SparkSession, url: String, props: Map[String, String]) =
    props.foldLeft(spark.read.format("jdbc").option("url", url)) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Whole-table read through a single connection. Fine for dimension
    * tables; use [[readPartitioned]] for anything fact-sized. */
  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame =
    base(spark, url, props).option("dbtable", table).load()

  /** Query pushdown: the database runs `sql`, Spark reads the result —
    * the `pd.read_sql(query)` shape. Projection/filter/join work the
    * warehouse can do stays in the warehouse. */
  def readQuery(spark: SparkSession, url: String, sql: String,
                props: Map[String, String] = Map.empty): DataFrame =
    base(spark, url, props).option("query", sql).load()

  /** The scale path: `numPartitions` concurrent connections, each scanning
    * `[lower, upper)` stripes of `partitionColumn` (numeric/date/timestamp).
    * Bounds outside the real min/max silently skew stripe 0 / N-1, so pass
    * true column bounds (one cheap MIN/MAX pushdown via [[readQuery]]). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame =
    base(spark, url, props)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Existence probe via JDBC metadata (one connection, no scan). Used by
    * the streaming upsert sink to distinguish "first batch, table absent"
    * from a transient read failure — only the former may skip the dedup
    * anti-join. Unquoted identifiers fold differently per engine (Derby
    * upper-cases, Postgres lower-cases), so probe the common foldings. */
  def tableExists(url: String, table: String,
                  props: Map[String, String] = Map.empty): Boolean = {
    val conn = connect(url, props)
    try tableExistsOn(conn, table) finally conn.close()
  }

  /** One connection with the SAME props every read/write method accepts
    * — the protocol functions below authenticate like the rest of the
    * connector instead of hoping the URL embeds credentials. */
  private def connect(url: String,
                      props: Map[String, String]): java.sql.Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    java.sql.DriverManager.getConnection(url, p)
  }

  private def tableExistsOn(conn: java.sql.Connection, table: String): Boolean = {
    val md = conn.getMetaData
    // getTables takes a LIKE pattern: an unescaped '_' (present in every
    // sink-generated <t>_stage/<t>_commits name) is a wildcard, so
    // 'landedXstage' would match 'landed_stage' — escape the
    // metacharacters with the driver's escape string first
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    def quote(t: String) =
      t.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = md.getTables(null, null, quote(t), null)
      try rs.next() finally rs.close()
    }
  }

  /** Does `index` exist on `table`? (getIndexInfo, name-case tolerant —
    * unquoted DDL folds identifiers uppercase in Derby/Postgres-family
    * engines while the caller composed the name from exact-case parts.) */
  private def indexExistsOn(conn: java.sql.Connection, table: String,
                            index: String): Boolean = {
    val md = conn.getMetaData
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = md.getIndexInfo(null, null, t, false, true)
      try {
        var found = false
        while (!found && rs.next())
          found = Option(rs.getString("INDEX_NAME"))
            .exists(_.equalsIgnoreCase(index))
        found
      } finally rs.close()
    }
  }

  /** Best-effort DROP TABLE IF EXISTS (portable form: probe then drop) —
    * staging-table cleanup for the exactly-once sink. */
  def dropTableIfExists(url: String, table: String,
                        props: Map[String, String] = Map.empty): Unit = {
    val conn = connect(url, props)
    try if (tableExistsOn(conn, table)) {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table") finally st.close()
    } finally conn.close()
  }

  /** Has `batchId` already been committed to the `commitsTable` ledger?
    * Part of the staged-commit exactly-once protocol
    * ([[graft.streaming.Events.toJdbcExactlyOnceSink]]). */
  def isBatchCommitted(url: String, commitsTable: String, batchId: Long,
                       props: Map[String, String] = Map.empty): Boolean = {
    val conn = connect(url, props)
    try {
      if (!tableExistsOn(conn, commitsTable)) false
      else {
        val ps = conn.prepareStatement(
          s"SELECT COUNT(*) FROM $commitsTable WHERE batch_id = ?")
        try {
          ps.setLong(1, batchId)
          val rs = ps.executeQuery()
          try rs.next() && rs.getLong(1) > 0 finally rs.close()
        } finally ps.close()
      }
    } finally conn.close()
  }

  /** Atomic staged commit: move `staging`'s rows into `target` AND record
    * `batchId` in the `commitsTable` ledger inside ONE database
    * transaction. Either both become visible or neither does — the
    * database's atomicity is what upgrades an at-least-once replayed
    * micro-batch to exactly-once landing. The ledger's PRIMARY KEY is a
    * second line of defense: a racing double-commit of the same batch id
    * violates it and rolls back rather than double-appending. Tables are
    * created on first use (target cloned from staging's shape) — DDL is
    * transactional in Derby/Postgres-family engines, so first-batch
    * crashes also leave nothing behind. */
  def commitStaged(url: String, target: String, staging: String,
                   commitsTable: String, batchId: Long,
                   props: Map[String, String] = Map.empty): Unit = {
    val conn = connect(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        if (!tableExistsOn(conn, target))
          st.executeUpdate(
            s"CREATE TABLE $target AS SELECT * FROM $staging WITH NO DATA")
        if (!tableExistsOn(conn, commitsTable))
          st.executeUpdate(
            s"CREATE TABLE $commitsTable (batch_id BIGINT PRIMARY KEY)")
        st.executeUpdate(s"INSERT INTO $target SELECT * FROM $staging")
        st.executeUpdate(s"INSERT INTO $commitsTable VALUES ($batchId)")
        conn.commit()
      } catch {
        case scala.util.control.NonFatal(e) => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Database-side ON-CONFLICT-DO-NOTHING merge of a staged table into
    * `target`: one transaction runs `INSERT .. SELECT .. WHERE NOT
    * EXISTS (key match)` and drops staging — the scalable upsert shape
    * ([[graft.streaming.Events.toJdbcUpsertSink]]'s per-batch cost
    * becomes "ship the batch + one set-op in the warehouse" instead of
    * downloading the target's full key set per micro-batch, which is
    * O(table) and was the dominant term in the 32× sweep). NULL key
    * semantics match the anti-join path it replaces: a NULL-keyed row
    * never matches and always inserts. First batch creates the target
    * from staging's shape. Replays are no-ops (nothing NOT-EXISTS). */
  def upsertStaged(url: String, target: String, staging: String,
                   keys: Seq[String],
                   props: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty, "upsertStaged: at least one key column")
    val conn = connect(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        val idxName = s"${target.replace('.', '_')}_upsert_key"
        val idx =
          s"""CREATE INDEX $idxName
             |ON $target (${keys.map(k => s""""$k"""").mkString(", ")})"""
            .stripMargin
        if (!tableExistsOn(conn, target)) {
          // first batch: staging BECOMES the target (metadata-only
          // rename — no second copy of the largest write a fresh
          // pipeline does), then the key index lands. The index is what
          // makes later batches' NOT EXISTS probe O(log n) per staged
          // row — without it the database evaluates the subquery as a
          // full target scan PER ROW (quadratic per batch; measured as
          // a hang at 100k events).
          st.executeUpdate(s"RENAME TABLE $staging TO $target")
          st.executeUpdate(idx)
        } else {
          // a PRE-EXISTING target (created by Jdbc.write, not the
          // first-batch rename) never went through the index branch —
          // without the key index every batch's NOT EXISTS probe is a
          // full target scan PER ROW (the quadratic hang the first-batch
          // comment describes). Catalog-guarded: create it exactly once.
          if (!indexExistsOn(conn, target, idxName)) st.executeUpdate(idx)
          // Spark's JDBC writer CREATEs columns with quoted (case-exact)
          // identifiers, so unquoted key refs would fold to uppercase
          // and miss — quote them with the DataFrame's exact names
          val keyMatch = keys.map(k => s"""t."$k" = s."$k"""").mkString(" AND ")
          st.executeUpdate(
            s"""INSERT INTO $target SELECT * FROM $staging s
               |WHERE NOT EXISTS (SELECT 1 FROM $target t WHERE $keyMatch)"""
              .stripMargin)
          st.executeUpdate(s"DROP TABLE $staging")
        }
        conn.commit()
      } catch {
        case scala.util.control.NonFatal(e) => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Sink parity for the reference's `to_sql(if_exists=...)` writes
    * (customer_analytics_dag.py:145-151): mode Overwrite ≈ 'replace',
    * Append ≈ 'append'. Each task opens its own connection — cap
    * parallelism upstream (`coalesce`) if the database can't take
    * `numPartitions` writers. */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            props: Map[String, String] = Map.empty): Unit =
    props.foldLeft(df.write.format("jdbc").option("url", url)) {
      case (w, (k, v)) => w.option(k, v)
    }.option("dbtable", table).mode(mode).save()
}
