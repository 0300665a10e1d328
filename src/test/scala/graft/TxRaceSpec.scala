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

    def freshRows(n: Int): Map[Long, Double] = {
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1; k -> rnd.nextInt(100).toDouble
      }.toMap
      rows
    }

    def tableVName(): String =
      TxLog.readTable(spark, root).columns
        .filterNot(c => c == "part" || c == "k").head

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
        rnd.nextInt(11) match {
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
              if (added) TxLog.dropCheckConstraintTx(spark, root,
                cname): Unit
            }, Seq(identity))
          case 8 => // FULL-table overwrite racing everything: the commit
            // claims every partition and conflict-rederives, so it lands
            // as SOME serial point — content snaps to exactly its rows
            val next = model.filter { case (k, _) => math.abs(k % 2) == 0 }
              .concat(freshRows(1 + rnd.nextInt(2)))
            RaceOp(s"fullow$t", () => {
              if (next.nonEmpty)
                TxLog.overwriteTableTx(df(next, tableVName()), root,
                  Seq("part")): Unit
            }, Seq(_ => next))
          case 0 | 1 => // append a fresh key block (blind — always lands;
            // the frame rebuilds under the CURRENT logical name per
            // attempt, so a racing rename only costs a restage)
            val rows = freshRows(1 + rnd.nextInt(3))
            if (ledgerSealed)
              RaceOp(s"appendSeq$t", () =>
                TxLog.appendBatchSeqTx(df(rows, tableVName()), root, "part",
                  s"r$seed-w$t", i.toLong): Unit,
                Seq(_ ++ rows))
            else
              RaceOp(s"append$t", () => {
                // a string-id append racing the SEAL may legally refuse
                try TxLog.appendBatchTx(df(rows, tableVName()), root,
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
                     e.getMessage.contains("SET targets unknown column")) =>
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
}
