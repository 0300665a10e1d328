package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Materialized-rollup QUERY REWRITE — the Kylin/materialized-view pattern
  * as a Catalyst optimizer rule: an aggregation over the FACT relation
  * whose groups/aggregates are derivable from a registered summary table
  * (the [[graft.operators.Ivm]] mergeable state: `cnt`, decimal `sum_*`,
  * `min_*`/`max_*`) is rewritten to RE-AGGREGATE THE SUMMARY instead. At
  * 100 TB the dashboard query touches rows ∝ groups, not the fact
  * history — and because the state is mergeable, any SUBSET of the
  * registered keys (including a key-only filter above the scan) is
  * answerable from the same summary.
  *
  * Translatable shapes (the engine's own aggregation idioms — anything
  * else leaves the plan untouched, spec-gated):
  *
  *   - grouping columns ⊆ registered keys (attribute refs only)
  *   - `COUNT(<literal>)` → `SUM(cnt)`
  *   - `SUM(CAST(x AS DECIMAL(18,2)))` for a registered sum column →
  *     `SUM(sum_x)` (cast back to the original result type, so the
  *     rewritten query's schema is bit-identical)
  *   - `MIN(x)` / `MAX(x)` for registered min/max columns
  *   - optional `Filter` directly above the fact scan referencing ONLY
  *     registered key columns (remapped onto the summary)
  *
  * Output attribute exprIds are preserved via aliases, so parent
  * operators (sort/limit/project) are untouched. The rule is idempotent:
  * the rewritten child is the summary relation, which never matches the
  * fact path again. Correctness contract: the summary must be DERIVED
  * from the registered fact (the q150 oracle recomputes from the raw
  * table, so a stale or wrong summary fails the gate).
  */
object RollupRewrite {

  final case class Registration(
      factPathSuffix: String,
      keys: Set[String],
      cntCol: String,
      sumMap: Map[String, String],
      minMap: Map[String, String],
      maxMap: Map[String, String],
      summaryTable: String,
      summary: LogicalPlan)

  private val regs =
    new java.util.concurrent.CopyOnWriteArrayList[Registration]()

  /** Register (or replace, keyed by summary table name) a rollup. The
    * summary plan is captured ANALYZED at registration time — the rule
    * grafts a fresh-exprId copy per rewrite. */
  def register(spark: SparkSession, factPathSuffix: String,
               summaryTable: String, keys: Seq[String], sumCols: Seq[String],
               minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): Unit = {
    // drop any cached relation/file listing first: re-registering after a
    // summary REBUILD (the refresh cycle) must capture the new files, not
    // the session's cached index of the deleted ones (observed:
    // FILE_NOT_EXIST on the second bench iteration without this)
    spark.catalog.refreshTable(summaryTable)
    // strip SubqueryAlias NOW: alias elimination runs at the START of
    // optimization, before this rule fires — a grafted alias would reach
    // the planner unresolved ("No plan for SubqueryAlias")
    val plan = org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
      spark.table(summaryTable).queryExecution.analyzed)
    val reg = Registration(factPathSuffix, keys.toSet, "cnt",
      sumCols.map(c => c -> s"sum_$c").toMap,
      minCols.map(c => c -> s"min_$c").toMap,
      maxCols.map(c => c -> s"max_$c").toMap, summaryTable, plan)
    regs.removeIf(_.summaryTable == summaryTable)
    regs.add(reg)
  }

  def clear(): Unit = regs.clear()

  /** Remove one registration. REFRESH PROTOCOL: a summary REBUILD must
    * deregister first — `unregister → rebuild → register` — because the
    * rebuild aggregation itself matches the rule (rollupState's shapes
    * are translatable by construction) and would be rewritten to read
    * the summary being replaced: self-referential, and a crash once the
    * overwrite has deleted the old files (observed FILE_NOT_EXIST). The
    * same discipline any MV system applies — the view is offline during
    * a full rebuild. */
  def unregister(summaryTable: String): Unit =
    regs.removeIf(_.summaryTable == summaryTable)

  private[plans] def registrations: Seq[Registration] = {
    import scala.jdk.CollectionConverters._
    regs.asScala.toSeq
  }
}

case class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import RollupRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    registrations.foldLeft(plan) { (p, reg) =>
      p.transformUp {
        case agg: Aggregate =>
          stripToFact(agg.child, reg)
            .flatMap { case (filters, _) => tryRewrite(agg, filters, reg) }
            .getOrElse(agg)
      }
    }

  /** Unwrap attribute-only Projects / SubqueryAliases / Filters down to
    * the registered fact relation; collect the filter conditions. */
  private def stripToFact(p: LogicalPlan, reg: Registration)
      : Option[(Seq[Expression], LogicalPlan)] = p match {
    case f: Filter =>
      stripToFact(f.child, reg).map { case (fs, r) => (f.condition +: fs, r) }
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      stripToFact(pr.child, reg)
    case s: SubqueryAlias => stripToFact(s.child, reg)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation
            if fs.location.rootPaths.exists(_.toString.endsWith(reg.factPathSuffix)) =>
          Some((Nil, lr))
        case _ => None
      }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, filters: Seq[Expression],
                         reg: Registration): Option[LogicalPlan] = {
    // fresh exprIds per graft, so two rewrites in one query never collide
    val fresh = reg.summary.transformUp {
      case lr: LogicalRelation => lr.newInstance()
    }
    val sOut: Map[String, Attribute] = fresh.output.map(a => a.name -> a).toMap
    if (!reg.keys.forall(sOut.contains) || !sOut.contains(reg.cntCol)) return None

    // grouping: attribute refs over registered keys only
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if reg.keys.contains(a.name) => a
      case _ => return None
    }
    val keyByExprId: Map[ExprId, Attribute] =
      groupAttrs.map(a => a.exprId -> sOut(a.name)).toMap
    // key-only DETERMINISTIC filters remap by NAME (pushed-down filter
    // attrs are the fact relation's, not the grouping instances). The
    // determinism guard matters: a key-only deterministic predicate is
    // group-uniform (same verdict for every fact row of a group, so
    // filtering summary GROUPS is equivalent) — a non-deterministic one
    // (rand(), spark_partition_id()) is per-ROW sampling that a
    // group-level filter cannot express.
    val newFilters = filters.map { cond =>
      if (!cond.deterministic) return None
      cond.transformUp {
        case a: AttributeReference =>
          if (reg.keys.contains(a.name)) sOut(a.name) else return None
      }
    }

    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val mapped: Expression = ae.aggregateFunction match {
        case c: Count
            if c.children.sizeIs == 1 && c.children.head.isInstanceOf[Literal] &&
              !c.children.head.nullable =>
          // COUNT over zero rows is 0 but SUM is NULL — a filtered-empty
          // (or globally empty) summary must still answer 0, and the
          // original Count attribute is non-nullable, so the coalesce is
          // a correctness AND nullability fix
          Coalesce(Seq(Sum(sOut(reg.cntCol)).toAggregateExpression(),
            Literal(0L)))
        case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _)
            if reg.sumMap.contains(a.name) && dt == DecimalType(18, 2) =>
          Sum(sOut(reg.sumMap(a.name))).toAggregateExpression()
        case Min(a: AttributeReference) if reg.minMap.contains(a.name) =>
          Min(sOut(reg.minMap(a.name))).toAggregateExpression()
        case Max(a: AttributeReference) if reg.maxMap.contains(a.name) =>
          Max(sOut(reg.maxMap(a.name))).toAggregateExpression()
        case _ => return None
      }
      // result-type fidelity: SUM over the (wider) summary decimal widens
      // again — cast back so the rewritten query's schema is unchanged
      Some(if (mapped.dataType == ae.dataType) mapped
      else Cast(mapped, ae.dataType))
    }

    def tx(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference => keyByExprId.get(a.exprId)
      case other =>
        val kids = other.children.map(tx)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        keyByExprId.get(a.exprId) match {
          case Some(s) => Alias(s, a.name)(exprId = a.exprId)
          case None => return None
        }
      case al: Alias =>
        tx(al.child) match {
          case Some(c) => Alias(c, al.name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }
    val child =
      if (newFilters.isEmpty) fresh
      else Filter(newFilters.reduce(And), fresh)
    Some(Aggregate(groupAttrs.map(a => keyByExprId(a.exprId)), newAggs, child))
  }
}
