package graft

import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** CONCURRENT model-based fuzz of the transaction layer: each step races
  * 2–3 writer threads against one table, then checks the resulting
  * content against the set of states any ADMITTED serialization could
  * produce (every permutation of the step's ops × each op's possible
  * effects — e.g. a restore racing a vacuum may land or legally refuse).
  * A retryable ConcurrentWriteException is legal (the front doors retry
  * internally); a LOST UPDATE (content outside the admissible set), a
  * BRICK (any later read throwing), or an uncaught error is a bug.
  * Round 17's richest bug source was hand-found interaction races
  * (restore-vs-checkpoint, payload-restore conflict direction, the
  * meta-read ordering in seal/addConstraint); this makes the next one
  * findable mechanically. Deterministic op CHOICE per seed (thread
  * interleaving stays nondeterministic — that is the point); key blocks
  * are pre-allocated per thread so ops commute exactly when the model
  * says they do. */
class TxRaceSpec extends SparkSpecBase {

  private def freshRoot(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-txrace/$tag"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  private def partOf(k: Long): String = s"p${math.abs(k % 4)}"

  /** one racing op: run on its own thread; `effects` are the model
    * transitions any admitted serialization may apply (identity rides
    * along when the op may legally refuse or no-op). */
  private final case class RaceOp(
      label: String,
      run: () => Unit,
      effects: Seq[Map[Long, Double] => Map[Long, Double]])

  private def runConcurrent(seed: Long, steps: Int): Unit = {
    import spark.implicits._
    val root = freshRoot(s"race$seed")
    val rnd = new scala.util.Random(seed)
    var model = Map.empty[Long, Double]
    var nextKey = 0L
    var ledgerSealed = false
    // retained snapshots for restore targets: (version, content)
    var history = Vector.empty[(Long, Map[Long, Double])]
    var step = 0

    def df(rows: Map[Long, Double], vName: String) =
      rows.toSeq.map { case (k, v) => (partOf(k), k, v) }
        .toDF("part", "k", vName)

    // schema-aware frame: carries every CURRENT data column (racing ADD
    // COLUMNs appear as NULL-filled extras — the migrated-writer shape;
    // the guard refuses subset writers by contract, so frames must keep
    // up). Rebuilt per attempt inside each op's run().
    def dfAll(rows: Map[Long, Double]): org.apache.spark.sql.DataFrame = {
      val cols = TxLog.readTable(spark, root).columns.toSeq
      val vn = cols.filterNot(c => c == "part" || c == "k").head
      cols.filterNot(c => c == "part" || c == "k" || c == vn)
        .foldLeft(df(rows, vn))((d, c) =>
          d.withColumn(c, lit(null).cast("double")))
    }

    def freshRows(n: Int): Map[Long, Double] = {
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1; k -> rnd.nextInt(100).toDouble
      }.toMap
      rows
    }

    def tableVName(): String =
      TxLog.readTable(spark, root).columns
        .filterNot(c => c == "part" || c == "k").head

    // name surface for the two-address ops: one pointer, same state
    spark.conf.set("spark.sql.catalog.grace", "graft.plans.TxCatalog")
    spark.conf.set("spark.sql.catalog.grace.root", freshRoot(s"racemeta$seed"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grace.ns")
    // the catalog instance (and so its metastore root) is CACHED by the
    // catalog manager from the first run in this JVM — drop any stale
    // pointer there before re-registering the fresh table
    spark.sql(s"DROP TABLE IF EXISTS grace.ns.t$seed")
    spark.sql(s"CREATE TABLE grace.ns.t$seed USING txlog LOCATION '$root'")

    // seed content
    val seedRows = freshRows(12)
    TxLog.appendBatchTx(df(seedRows, "v"), root, "part", s"r$seed-seed")
    model = seedRows
    history :+= ((TxLog.currentVersion(spark, root), model))

    (1 to steps).foreach { i =>
      step = i
      val vName = tableVName()
      // deterministic op menu for this step; disjoint key targets so the
      // model's commutativity matches the table's
      val liveKeys = model.keySet.toSeq.sorted
      val nThreads = 2 + rnd.nextInt(2)
      val slices = liveKeys.zipWithIndex.groupMap(_._2 % nThreads)(_._1)
      val ops: Seq[RaceOp] = (0 until nThreads).map { t =>
        val mine = slices.getOrElse(t, Seq.empty)
        rnd.nextInt(15) match {
          case 14 => // REPLACE racing everything: the whole-table-state
            // supersession (data + mapping + constraints + properties in
            // one "restore"-shaped commit) — VERSION-STRICT, so it
            // conflicts with every concurrent commit and retries to land
            // at SOME serial point; content snaps to exactly its rows.
            // Staged under the CURRENT logical names, so the visible
            // schema is stable for the other ops
            val next = model.filter { case (k, _) => math.abs(k % 3) == 0 }
              .concat(freshRows(1 + rnd.nextInt(2)))
            RaceOp(s"replace$t", () => {
              TxLog.replaceTableTx(dfAll(next), root, Seq("part")): Unit
            }, Seq(_ => next))
          case 9 => // RENAME racing writers: meta commit, content-neutral
            // (the step's own writers stage under the pre-step name; the
            // column-mapping projection serves either name's files) —
            // exercises the version-first/metadata-second discipline
            RaceOp(s"rename$t", () => {
              val cur = tableVName()
              val nxt = if (cur == "v") "w" else "v"
              try TxLog.renameColumnTx(spark, root, cur, nxt): Unit
              catch { case e: Exception
                  // a racing rename/restore may have moved the name, a
                  // racing constraint may reference it — refusing is
                  // legal, a clobber is not
                  if e.getMessage != null &&
                    (e.getMessage.contains("no column") ||
                     e.getMessage.contains("already exists") ||
                     e.getMessage.contains("references")) => () }
            }, Seq(identity))
          case 10 => // CHECK-constraint add+drop racing writers: the
            // existing-rows validation scan and the meta commits race
            // the appends/deletes (and trip the commit-time drift guard
            // on them); all values satisfy it, so content-neutral
            RaceOp(s"constraint$t", () => {
              val cname = s"race_pos_${i}_$t"
              val added =
                try {
                  TxLog.addCheckConstraintTx(spark, root, cname,
                    s"${tableVName()} > -1000000")
                  true
                } catch { case e: Exception
                    if e.getMessage != null &&
                      // a racing rename can invalidate the expression's
                      // column between derivation and validation
                      (e.getMessage.contains("cannot be resolved") ||
                       e.getMessage.contains("UNRESOLVED")) => false }
              if (added)
                try TxLog.dropCheckConstraintTx(spark, root, cname): Unit
                catch { case e: Exception
                    // a racing REPLACE (or a restore to a pre-add
                    // version) legally supersedes the constraint set
                    // between our add and drop
                    if e.getMessage != null &&
                      e.getMessage.contains("no constraint") => () }
            }, Seq(identity))
          case 8 => // FULL-table overwrite racing everything: the commit
            // claims every partition and conflict-rederives, so it lands
            // as SOME serial point — content snaps to exactly its rows
            val next = model.filter { case (k, _) => math.abs(k % 2) == 0 }
              .concat(freshRows(1 + rnd.nextInt(2)))
            RaceOp(s"fullow$t", () => {
              if (next.nonEmpty)
                TxLog.overwriteTableTx(dfAll(next), root,
                  Seq("part")): Unit
            }, Seq(_ => next))
          case 0 | 1 => // append a fresh key block (blind — always lands;
            // the frame rebuilds under the CURRENT logical name per
            // attempt, so a racing rename only costs a restage)
            val rows = freshRows(1 + rnd.nextInt(3))
            if (ledgerSealed)
              RaceOp(s"appendSeq$t", () =>
                TxLog.appendBatchSeqTx(dfAll(rows), root, "part",
                  s"r$seed-w$t", i.toLong): Unit,
                Seq(_ ++ rows))
            else
              RaceOp(s"append$t", () => {
                // a string-id append racing the SEAL may legally refuse
                try TxLog.appendBatchTx(dfAll(rows), root,
                  "part", s"r$seed-s$i-t$t"): Unit
                catch { case e: IllegalArgumentException
                    if e.getMessage.contains("SEALED") => () }
              }, Seq(_ ++ rows, identity))
          case 2 => // dv-delete MY slice (conflict-retried internally)
            val ks = mine.take(1 + rnd.nextInt(2))
            RaceOp(s"dvdel$t", () => {
              if (ks.nonEmpty)
                TxLog.deleteWhereDvTx(spark, root,
                  col("k").isin(ks: _*)): Unit
            }, Seq(_ -- ks))
          case 3 => // rewrite-delete MY slice
            val ks = mine.take(1 + rnd.nextInt(2))
            RaceOp(s"del$t", () => {
              if (ks.nonEmpty)
                TxLog.deleteWhereTx(spark, root, col("k").isin(ks: _*)): Unit
            }, Seq(_ -- ks))
          case 4 => // update MY slice (+1000, disjoint from other threads;
            // the SET key re-derives per attempt — a racing rename costs
            // a loud "unknown column" restage, never a silent add-column)
            val ks = mine.take(1 + rnd.nextInt(2))
            val kset = ks.toSet
            RaceOp(s"upd$t", () => {
              if (ks.nonEmpty) {
                val nm = tableVName()
                TxLog.updateWhereTx(spark, root, col("k").isin(ks: _*),
                  Map(nm -> (col(nm) + 1000.0))): Unit
              }
            }, Seq(m => m.map { case (k, v) =>
              k -> (if (kset(k)) v + 1000.0 else v) }))
          case 5 => // content-neutral maintenance racing the writers
            RaceOp(s"chk$t", () => TxLog.checkpoint(spark, root): Unit,
              Seq(identity))
          case 6 if history.nonEmpty => // restore racing everything:
            // may land (content snaps back) or legally refuse (target
            // expired / pathological contention would surface loudly)
            val (v, m0) = history(rnd.nextInt(history.size))
            RaceOp(s"restore$t", () => {
              try TxLog.restoreTx(spark, root, v): Unit
              catch { case e: Exception
                  if e.getMessage != null &&
                    (e.getMessage.contains("no longer restorable") ||
                     e.getMessage.contains("predates the latest")) => () }
            }, Seq(_ => m0, identity))
          case 11 => // ADD COLUMN racing writers (then DROP it): the
            // metadata-only additive evolution vs in-flight frames —
            // writers staged pre-add restage as subset refusals, writers
            // staged pre-drop restage as tombstone refusals; both
            // terminal-by-contract and re-derived by the op rerun
            RaceOp(s"addcol$t", () => {
              val cname = s"extra_${i}_$t"
              val added =
                try {
                  TxLog.addColumnTx(spark, root, cname,
                    org.apache.spark.sql.types.DoubleType): Unit
                  true
                } catch { case e: Exception
                    if e.getMessage != null &&
                      (e.getMessage.contains("already exists") ||
                       e.getMessage.contains("shadows") ||
                       e.getMessage.contains("DROPPED")) => false }
              if (added)
                try TxLog.dropColumnTx(spark, root, cname): Unit
                catch { case e: Exception
                    // a racing restore reinstates the pre-add schema
                    if e.getMessage != null &&
                      e.getMessage.contains("no column") => () }
            }, Seq(identity))
          case 13 => // SET/UNSET TBLPROPERTIES racing writers: a meta
            // commit carrying the mapping snapshot — must conflict with
            // every snapshot-derived writer and retry internally;
            // content-neutral (the model tracks rows, not policy)
            RaceOp(s"props$t", () => {
              TxLog.setTablePropertiesTx(spark, root,
                Map(s"race.step_$t" -> i.toString)): Unit
              TxLog.unsetTablePropertiesTx(spark, root,
                Seq(s"race.step_$t")): Unit
            }, Seq(identity))
          case 12 => // name-addressed UPDATE racing path-addressed
            // writers on the same table: the two-address invariant under
            // contention (grace.ns.tN and the path are ONE state)
            val ks = mine.take(1 + rnd.nextInt(2))
            val kset = ks.toSet
            RaceOp(s"namedupd$t", () => {
              if (ks.nonEmpty) {
                val nm = tableVName()
                spark.sql(s"UPDATE grace.ns.t$seed SET $nm = $nm + 1000 " +
                  s"WHERE k IN (${ks.mkString(",")})"): Unit
              }
            }, Seq(m => m.map { case (k, v) =>
              k -> (if (kset(k)) v + 1000.0 else v) }))
          case _ => // seal the string ledger (idempotent guard inside)
            RaceOp(s"seal$t", () => {
              if (!ledgerSealed) TxLog.sealBatchLedgerTx(spark, root): Unit
            }, Seq(identity))
          }
      }
      // the seal op flips the mode for FUTURE steps (this step's string
      // appends already tolerate the refusal)
      if (ops.exists(_.label.startsWith("seal"))) ledgerSealed = true

      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = ops.map { op =>
        new Thread(() => {
          var attempts = 0
          var done = false
          while (!done) {
            try { op.run(); done = true }
            catch {
              // these guards are TERMINAL by contract — the caller
              // restages under the CURRENT metadata; re-running the
              // front door (which re-derives its frame) IS the restage
              case e: IllegalArgumentException
                  if attempts < 8 && e.getMessage != null &&
                    (e.getMessage.contains(
                       "constraints changed between stage and commit") ||
                     e.getMessage.contains("drops or retypes") ||
                     e.getMessage.contains("SET targets unknown column") ||
                     e.getMessage.contains("DROPPED physical column")) =>
                attempts += 1
              case t: Throwable => errs.add(t): Unit; done = true
            }
          }
        }, s"race-$seed-$i-${op.label}")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(240000))
      assert(errs.isEmpty, s"[seed=$seed step=$i ops=" +
        s"${ops.map(_.label).mkString(",")}] racing op failed: " +
        s"${Option(errs.peek()).map(_.toString).getOrElse("?")}")

      // admissible states: every permutation of the step's ops × every
      // choice of each op's possible effects
      val admissible: Set[Map[Long, Double]] = {
        def choices(rem: Seq[RaceOp]): Seq[Seq[Map[Long, Double] =>
            Map[Long, Double]]] =
          if (rem.isEmpty) Seq(Seq.empty)
          else for (e <- rem.head.effects; tail <- choices(rem.tail))
            yield e +: tail
        (for {
          chosen <- choices(ops)
          perm <- chosen.permutations
        } yield perm.foldLeft(model)((m, f) => f(m))).toSet
      }
      // the table is not bricked and its content is an admitted state
      val vNow = tableVName()
      val got = TxLog.readTable(spark, root).select("part", "k", vNow)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(admissible.contains(got),
        s"[seed=$seed step=$i ops=${ops.map(_.label).mkString(",")}] " +
          s"content is NOT an admitted serialization: got ${got.size} " +
          s"rows; admissible sizes ${admissible.map(_.size)}; " +
          s"diff-vs-model extra=${(got.keySet -- model.keySet).take(5)} " +
          s"missing=${(model.keySet -- got.keySet).take(5)}")
      model = got
      // metadata count and enumeration stay coherent with the content
      assert(TxLog.countRows(spark, root) === Some(model.size.toLong),
        s"[seed=$seed step=$i] metadata count diverged")
      val parts = TxLog.partitionValues(spark, root)
      assert(model.keySet.map(partOf).subsetOf(parts),
        s"[seed=$seed step=$i] live partition missing: " +
          s"${model.keySet.map(partOf) -- parts}")
      history :+= ((TxLog.currentVersion(spark, root), model))
      if (history.size > 6) history = history.takeRight(6)
    }
  }

  test("racing CREATORS on overwriteTableTx serialize: the final table " +
      "is exactly ONE writer's frame, never a merge of both") {
    import spark.implicits._
    (1 to 4).foreach { round =>
      val root = freshRoot(s"owcreate$round")
      // disjoint partitions per writer, so a merge is detectable
      val a = Seq(("pa", 1L, 1.0), ("pb", 2L, 2.0)).toDF("part", "k", "v")
      val b = Seq(("pc", 3L, 3.0), ("pd", 4L, 4.0)).toDF("part", "k", "v")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = Seq(a, b).zipWithIndex.map { case (d, t) =>
        new Thread(() => {
          try TxLog.overwriteTableTx(d, root, Seq("part")): Unit
          catch { case e: Throwable => errs.add(e): Unit }
        }, s"owcreate-$round-$t")
      }
      threads.foreach(_.start()); threads.foreach(_.join(240000))
      assert(errs.isEmpty, s"round $round: ${Option(errs.peek())}")
      val parts = TxLog.partitionValues(spark, root)
      assert(parts === Set("pa", "pb") || parts === Set("pc", "pd"),
        s"round $round: racing full replaces merged into $parts — " +
          "readers saw a table NEITHER writer wrote")
    }
  }

  test("convertParquetTx racing plain-parquet readers: conversion " +
      "succeeds, the converted table is exact, racing reads see whole " +
      "partitions of the original content or fail loudly — never " +
      "foreign rows") {
    import spark.implicits._
    val root = freshRoot("convrace")
    val rows = (1L to 200L).map(k => (partOf(k), k, k * 1.5))
    rows.toDF("part", "k", "v").write.partitionBy("part").parquet(root)
    val expect = rows.map { case (_, k, v) => k -> v }.toMap
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = spark.read.parquet(root).select("k", "v").collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          // a racing read may see a SUBSET (trees move one rename at a
          // time) but never a row outside the original content, and
          // only whole partitions may be missing
          val foreign = got.filterNot { case (k, v) => expect.get(k)
            .contains(v) }
          if (foreign.nonEmpty)
            errs.add(new AssertionError(s"foreign rows: $foreign")): Unit
          val missing = expect.keySet -- got.keySet
          if (missing.exists(k => got.keySet.exists(g =>
              partOf(g) == partOf(k))))
            errs.add(new AssertionError(
              s"partial PARTITION visible: missing $missing")): Unit
        } catch { case _: Exception => () } // mid-move reads may fail
      }
    }, "convrace-reader")
    reader.start()
    try TxLog.convertParquetTx(spark, root, Seq("part"))
    finally { stop.set(true); reader.join(240000) }
    assert(errs.isEmpty, s"racing reader saw: ${Option(errs.peek())}")
    val after = TxLog.readTable(spark, root).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after === expect, "converted content must be exact")
  }

  test("maintainTx bundles racing the streaming sink: exactly-once " +
      "holds, every streamed row lands, the table never bricks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot("maintsink")
    val cp = freshRoot("maintsink-cp")
    TxLog.appendBatchTx(Seq(("p0", -1L, 0.0)).toDF("part", "k", "v"),
      root, "part", "ms-seed")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Double)]
    val q = mem.toDF().toDF("part", "k", "v").writeStream.format("txlog")
      .option("checkpointLocation", cp).start(root)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val maintainer = new Thread(() => {
      while (!stop.get()) {
        // DEFAULT vacuum retention: an in-flight writer's staging is
        // age-protected (the documented contract — a zero-retention
        // vacuum reclaims active stagings, exactly like Delta's)
        try TxLog.maintainTx(spark, root, "part",
          smallBytes = 1L << 20): Unit
        catch { case e: Throwable => errs.add(e): Unit }
      }
    }, "maintsink-maintainer")
    maintainer.start()
    try {
      (1 to 8).foreach { i =>
        mem.addData((s"p${i % 4}", i.toLong, i * 1.0))
        q.processAllAvailable()
      }
    } finally {
      stop.set(true); maintainer.join(240000); q.stop()
    }
    assert(errs.isEmpty, s"maintainer failed: ${Option(errs.peek())}")
    val got = TxLog.readTable(spark, root).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(got === ((1L to 8L).toSet + -1L),
      s"streamed rows lost or duplicated under maintenance: $got")
  }

  test("12 racing steps × 2-3 writer threads stay serializable on the " +
      "PAYLOAD representation (seed 7)") {
    spark.conf.set("graft.txlog.chkParquetMin", "1")
    spark.conf.set("graft.txlog.chkMaxHeaderValues", "2")
    try runConcurrent(seed = 7L, steps = 12)
    finally {
      spark.conf.unset("graft.txlog.chkParquetMin")
      spark.conf.unset("graft.txlog.chkMaxHeaderValues")
    }
  }

  test("12 racing steps × 2-3 writer threads stay serializable on the " +
      "PAYLOAD representation (seed 23)") {
    spark.conf.set("graft.txlog.chkParquetMin", "1")
    spark.conf.set("graft.txlog.chkMaxHeaderValues", "2")
    try runConcurrent(seed = 23L, steps = 12)
    finally {
      spark.conf.unset("graft.txlog.chkParquetMin")
      spark.conf.unset("graft.txlog.chkMaxHeaderValues")
    }
  }

  test("12 racing steps × 2-3 writer threads stay serializable on the " +
      "DRIVER representation (seed 42, no payload crossing)") {
    runConcurrent(seed = 42L, steps = 12)
  }

  test("12 racing steps with AUTO-checkpoint crossings interleaving the " +
      "writers (seed 99) — the restore-vs-crossing shape runs hot") {
    // auto-checkpoints fire INSIDE the racing commits' retry loops, so
    // payload crossings interleave with restores/overwrites at arbitrary
    // points — the interleaving class that produced the driver-shape
    // restore brick (now folded as a payload supersession)
    spark.conf.set("graft.txlog.chkParquetMin", "1")
    spark.conf.set("graft.txlog.chkMaxHeaderValues", "2")
    spark.conf.set("graft.txlog.autoCheckpointEvery", "3")
    try runConcurrent(seed = 99L, steps = 12)
    finally {
      spark.conf.unset("graft.txlog.chkParquetMin")
      spark.conf.unset("graft.txlog.chkMaxHeaderValues")
      spark.conf.unset("graft.txlog.autoCheckpointEvery")
    }
  }

  test("SOAK: extra seeds on demand (GRAFT_RACE_SOAK=s1,s2,... — " +
      "canceled in CI; each seed runs BOTH representations)") {
    // the deep-soak entry point: when an op joins the mix, run a wide
    // seed sweep here once before trusting the 4 pinned CI seeds —
    // every prior fuzz find surfaced within a handful of fresh seeds
    val seeds = sys.env.get("GRAFT_RACE_SOAK").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map(_.toLong)
    if (seeds.isEmpty)
      cancel("set GRAFT_RACE_SOAK=3,11,57 to run the soak")
    seeds.foreach { s =>
      runConcurrent(seed = s, steps = 12) // driver representation
      spark.conf.set("graft.txlog.chkParquetMin", "1")
      spark.conf.set("graft.txlog.chkMaxHeaderValues", "2")
      try runConcurrent(seed = s + 1000000L, steps = 12) // payload rep
      finally {
        spark.conf.unset("graft.txlog.chkParquetMin")
        spark.conf.unset("graft.txlog.chkMaxHeaderValues")
      }
    }
  }
}
