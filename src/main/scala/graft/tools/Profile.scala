package graft.tools

import graft._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Job-level wall-clock profile for named queries (guide §1.5: label your
  * jobs — this is the headless stand-in for the Spark UI's job table).
  * Runs each query twice (the bench methodology: first run carries
  * codegen/JIT noise) and prints, for the SECOND run, every Spark job with
  * its wall ms, stage count, task count and description, so the expensive
  * phase of a multi-job query (tx machinery, streams, iterative loops) is
  * attributable. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Profile q217_tx_stream_compaction_race"
  */
object Profile {
  private final case class JobRow(id: Int, desc: String, ms: Long,
                                  stages: Int, tasks: Int)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local(cpus)
    val rows = mutable.ArrayBuffer.empty[JobRow]
    val starts = mutable.Map.empty[Int, (Long, String, Int)]
    val taskCounts = mutable.Map.empty[Int, Int]
    var capture = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        if (capture) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          starts(js.jobId) = (js.time, desc, js.stageInfos.size)
          taskCounts(js.jobId) = js.stageInfos.map(_.numTasks).sum
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        if (capture) starts.remove(je.jobId).foreach { case (t0, desc, st) =>
          rows += JobRow(je.jobId, desc, je.time - t0, st,
            taskCounts.remove(je.jobId).getOrElse(0))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass (uncaptured), exactly like the bench's min-of-2
      val w0 = System.nanoTime(); fn(spark, dir).count()
      val warmSec = (System.nanoTime() - w0) / 1e9
      rows.clear(); capture = true
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      capture = false
      // let straggler job-end events drain
      Thread.sleep(300)
      println(s"==== $name warm1=${f"$warmSec%.2f"}s warm2=${f"$sec%.2f"}s " +
        s"jobs=${rows.size} jobMs=${rows.map(_.ms).sum} ====")
      rows.sortBy(-_.ms).take(40).foreach { r =>
        println(f"  ${r.ms}%6d ms  job=${r.id}%-4d stages=${r.stages}%-2d " +
          f"tasks=${r.tasks}%-4d ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
