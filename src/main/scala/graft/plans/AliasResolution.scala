package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Reference SELECT-alias binder extensions
  * (`/root/reference/test/sql/binder/alias_qualification_*.test`,
  * `test/sql/filter/test_alias_filter.test`):
  *
  *  1. A SELECT alias may be referenced from the WHERE clause
  *     (`SELECT i % 2 AS k FROM t WHERE k <> 0`). Real columns take
  *     priority; qualified `table.k` never resolves to an alias; an
  *     alias whose expression aggregates is the reference's binder
  *     error (a WHERE cannot filter on an aggregate).
  *  2. The explicit `alias.x` qualifier (GROUP BY/HAVING/WHERE/ORDER
  *     BY) references SELECT alias x — unless `alias` is a real
  *     relation/column in scope, which keeps priority. Lowered by
  *     stripping the qualifier and delegating to Spark's own
  *     alias-resolution paths (groupByAliases, HAVING/ORDER BY alias
  *     resolution, lateral column aliases in the SELECT list).
  *
  * Injected as an analyzer resolution rule at session build
  * ([[graft.engine.EngineSession.builder]]). Both rewrites fire only on
  * names that do NOT resolve against the child plan, so every plan
  * Spark already accepts is untouched.
  */
object AliasResolution extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.trees.TreePattern.UNRESOLVED_ATTRIBUTE

  private def isAliasQualified(u: UnresolvedAttribute): Boolean =
    u.nameParts.length == 2 && u.nameParts.head.equalsIgnoreCase("alias")

  /** Substitute select-list aliases into a WHERE condition. The aliased
    * expression is spliced UNRESOLVED — it references the same child the
    * filter sees, so normal resolution picks it up in place (waiting for
    * the alias to resolve first would deadlock: Spark resolves a
    * project list only after its child — this very filter — resolves).
    */
  private def substituteInWhere(
      cond: Expression, selectList: Seq[NamedExpression],
      child: LogicalPlan): Expression = {
    val aliases = selectList.collect { case a: Alias => a }
    def lookup(name: String): Option[Alias] = {
      val ms = aliases.filter(a => conf.resolver(a.name, name))
      if (ms.length == 1) Some(ms.head) else None
    }
    cond.transformUpWithPruning(_.containsPattern(UNRESOLVED_ATTRIBUTE)) {
      case u: UnresolvedAttribute
          if child.resolve(u.nameParts, conf.resolver).isEmpty =>
        val name = u.nameParts match {
          case Seq(one) => Some(one)
          case _ if isAliasQualified(u) => Some(u.nameParts(1))
          case _ => None
        }
        name.flatMap(lookup) match {
          case Some(a) =>
            // reference binder errors; an unresolved aggregate splice is
            // also caught by Spark's own WHERE-aggregate check later
            if (a.child.exists(_.isInstanceOf[AggregateExpression]))
              throw new IllegalArgumentException(
                "Binder Error: WHERE clause cannot contain aggregates!")
            checkSpliceable(a)
            a.child
          case None => u
        }
    }
  }

  /** The reference refuses to splice aliases whose expression has a
    * subquery or side effects (alias_qualification_errors.test,
    * alias_where_side_effects.test) — duplicating either changes
    * semantics. Unresolved volatile functions are matched by name (the
    * reference's VolatileFunction set). */
  private val volatileFns = Set(
    "random", "rand", "randn", "uuid", "uuidv4", "uuidv7",
    "gen_random_uuid", "nextval", "setval", "now", "current_timestamp")
  private def checkSpliceable(a: Alias): Unit = {
    if (a.child.exists(_.isInstanceOf[SubqueryExpression]))
      throw new IllegalArgumentException(
        s"""Binder Error: Alias "${a.name}" referenced in a SELECT clause - but the expression has a subquery. This is not yet supported.""")
    val volatileRef = a.child.exists {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        f.nameParts.length == 1 && volatileFns(f.nameParts.head.toLowerCase)
      case e => e.resolved && !e.deterministic
    }
    if (volatileRef)
      throw new IllegalArgumentException(
        s"""Binder Error: Alias "${a.name}" referenced in a WHERE clause - but the expression has side effects. This is not yet supported.""")
  }

  /** One cheap existence scan per apply(): does ANY node carry an
    * `alias.`-qualified unresolved attribute? Resolution rules run at
    * every analyzer fixpoint iteration of every eager Dataset analysis —
    * an unguarded per-node expression TRANSFORM here measured ~0.3 s
    * across the 22-query bench (same lesson as IntCondToBool's r10
    * TreePattern fix); a read-only exists walk with O(1) pattern-bit
    * short-circuits is an order of magnitude cheaper, and `false` (the
    * universal case) turns the generic strip arm into a no-op.
    */
  private def hasAliasQualified(plan: LogicalPlan): Boolean = {
    var found = false
    plan.foreach { node =>
      if (!found)
        found = node.expressions.exists(e =>
          e.containsPattern(UNRESOLVED_ATTRIBUTE) && e.exists {
            case u: UnresolvedAttribute => isAliasQualified(u)
            case _ => false
          })
    }
    found
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.containsPattern(UNRESOLVED_ATTRIBUTE)) return plan
    val aliasQual = hasAliasQualified(plan)
    plan.resolveOperatorsUpWithPruning(_.containsPattern(UNRESOLVED_ATTRIBUTE)) {
      // SELECT aliases referenced from WHERE: the filter sits BELOW the
      // project/aggregate carrying the aliases, so Spark's own resolution
      // never sees them
      case p @ Project(projectList, Filter(cond, child))
          if child.resolved && cond.containsPattern(UNRESOLVED_ATTRIBUTE) =>
        val newCond = substituteInWhere(cond, projectList, child)
        if (newCond fastEquals cond) { if (aliasQual) stripAliasQualifier(p) else p }
        else Project(projectList, Filter(newCond, child))
      case a @ Aggregate(ge, ae, Filter(cond, child), hint)
          if child.resolved && cond.containsPattern(UNRESOLVED_ATTRIBUTE) =>
        val newCond = substituteInWhere(cond, ae, child)
        if (newCond fastEquals cond) { if (aliasQual) stripAliasQualifier(a) else a }
        else Aggregate(ge, ae, Filter(newCond, child), hint)
      // the explicit `alias.x` qualifier anywhere else: strip it when it
      // cannot be a real (relation- or struct-) qualified reference and
      // let Spark's alias resolution take the bare name
      case node if aliasQual && node.children.nonEmpty &&
          node.children.forall(_.resolved) =>
        stripAliasQualifier(node)
    }
  }

  private def stripAliasQualifier(node: LogicalPlan): LogicalPlan =
    node.transformExpressionsUpWithPruning(
      _.containsPattern(UNRESOLVED_ATTRIBUTE)) {
      case u: UnresolvedAttribute
          if isAliasQualified(u) &&
            node.children.forall(_.resolve(u.nameParts, conf.resolver).isEmpty) =>
        // reference: alias.x to a subquery alias is refused even in the
        // SELECT list (alias_qualification_errors.test) — Spark's lateral
        // column aliases would happily resolve it after the strip
        node match {
          case Project(list, _) =>
            list.collect { case a: Alias if conf.resolver(a.name, u.nameParts(1)) => a }
              .filter(_.child.exists(_.isInstanceOf[SubqueryExpression]))
              .foreach { a =>
                throw new IllegalArgumentException(
                  s"""Binder Error: Alias "${a.name}" referenced in a SELECT clause - but the expression has a subquery. This is not yet supported.""")
              }
          case _ => ()
        }
        UnresolvedAttribute(u.nameParts.tail)
    }
}
