package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.TxLog

/** Batch read path for `spark.read.format("txlog").load(root)` — the
  * Delta-style integration surface, resolved the Spark-first way: the
  * provider's table answers analysis (schema, BATCH_READ capability),
  * and this resolution rule substitutes the relation with the SAME
  * logical plan [[TxLog.readTable]] builds — [[graft.sources.TxFileIndex]]
  * partition pruning + stats skipping, the deletion-vector anti-join,
  * and the column-mapping projection — so the bare format string serves
  * exactly `readTable` semantics with full Catalyst pushdown (the scan
  * is an ordinary parquet HadoopFsRelation underneath; filters and
  * column pruning reach it untouched). Options:
  *
  *   - `versionAsOf` / `timestampAsOf`: time travel, [[TxLog.readTableAt]]
  *     / [[TxLog.readTableAsOf]] boundaries (the schema is the schema AS
  *     OF the pinned version — inferSchema derives it from the same plan).
  *   - `readChangeFeed` + `startingVersion` (+ optional `endingVersion`):
  *     the batch CDF window, [[TxLog.readChangeFeed]] semantics; an empty
  *     window yields an empty frame with the feed schema.
  *
  * The substituted plan is aliased onto the relation's ORIGINAL output
  * attribute ids, so references resolved against the relation stay valid
  * — the standard relation-substitution contract. A session without the
  * extensions never reaches a bare scan: the table's `toBatch` refuses
  * loudly ([[TxStreamTable]]). */
case class TxBatchReadRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[TxStreamTable] =>
        def opt(k: String): Option[String] = Option(r.options.get(k))
        val root = opt("path").getOrElse(
          sys.error("txlog batch read: .load(<table root>) is required"))
        val df =
          if (opt("readChangeFeed").exists(_.toBoolean)) {
            val since = opt("startingVersion").map(_.toLong).getOrElse(0L)
            val until = opt("endingVersion").map(_.toLong)
            TxLog.readChangeFeed(session, root, since, until)._1.getOrElse {
              import scala.jdk.CollectionConverters._
              session.createDataFrame(
                Seq.empty[org.apache.spark.sql.Row].asJava, r.schema)
            }
          } else {
            opt("versionAsOf").map(_.toLong)
              .orElse(opt("timestampAsOf").map(ts =>
                TxLog.versionAsOf(session, root, ts.toLong)))
              .map(v => TxLog.readTableAt(session, root, v))
              .getOrElse(TxLog.readTable(session, root))
          }
        val child = df.queryExecution.analyzed
        val resolver = session.sessionState.conf.resolver
        // re-key the substituted plan's columns onto the relation's
        // attribute ids (name-matched; order may differ in CDF unions)
        val aligned = r.output.map { out =>
          val src = child.output.find(a => resolver(a.name, out.name))
            .getOrElse(sys.error(s"txlog batch read: declared column " +
              s"[${out.name}] is missing from the table plan at $root " +
              s"(have: ${child.output.map(_.name).mkString(", ")})"))
          require(org.apache.spark.sql.types.DataType
              .equalsIgnoreNullability(src.dataType, out.dataType),
            s"txlog batch read: column [${out.name}] resolved as " +
              s"${out.dataType.catalogString} but the table plan serves " +
              s"${src.dataType.catalogString} at $root")
          Alias(src, out.name)(exprId = out.exprId)
        }
        Project(aligned, child)
    }
}
