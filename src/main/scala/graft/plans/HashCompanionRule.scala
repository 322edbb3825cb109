package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Catalyst optimizer rule: string-equality → hash-companion fast path.
  *
  * The reference rewrites STRINGS filters into VALUES filters over the
  * hidden `$name_HASH` column when one exists (common/filter.cpp:77-90,
  * columnar/columnar.cpp:524-532) so equality never touches string payloads.
  * Our engine writes `<name>__hash` companions (tables/Writer); this rule
  * makes the rewrite automatic: any `Filter` with `col = 'lit'` or
  * `col IN (lits)` over a relation that also exposes `col__hash` gains the
  * equivalent xxhash64 predicate, which Parquet can evaluate against
  * dictionary/stats of a fixed-width long column.
  *
  * The original string predicate is KEPT (collision safety: the conjunction
  * is exact while the hash predicate prunes row groups/pages) — same shape
  * as the reference keeping the analyzer as final verifier. Registered via
  * [[GraftExtensions]]: `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object HashCompanionRule extends Rule[LogicalPlan] {

  private def companionOf(a: Attribute, plan: LogicalPlan): Option[Attribute] = {
    // the companion must come from the SAME relation as the filtered
    // attribute (matched through the leaf OWNING a's exprId): resolving
    // by name over the whole child output could, above a join of two
    // tables sharing the column name, pick the OTHER side's companion
    // and silently filter the wrong table's rows (review r18-8). The
    // companion must ALSO still be in the child's output (not pruned),
    // or the added predicate would reference an unavailable attribute.
    for {
      owner <- plan.collectLeaves()
        .find(_.output.exists(_.exprId == a.exprId))
      comp <- owner.output.find(o =>
        o.name == a.name + graft.tables.Writer.HashSuffix &&
          o.dataType == LongType)
      avail <- plan.output.find(_.exprId == comp.exprId)
    } yield avail
  }

  private def hashLit(s: Any): Literal = s match {
    case u: org.apache.spark.unsafe.types.UTF8String if u.numBytes == 0 =>
      Literal(0L) // empty-string hash pinned to 0 (common/filter.cpp:87)
    case other =>
      Literal(XxHash64(Seq(Literal(other, StringType)), 42L).eval(null), LongType)
  }

  /** The hash predicate a single conjunct earns, if any. */
  private def hashPredFor(c: Expression,
                          child: LogicalPlan): Option[Expression] = c match {
    case EqualTo(a: Attribute, Literal(v, StringType)) if v != null =>
      companionOf(a, child).map(h => EqualTo(h, hashLit(v)))
    case EqualTo(Literal(v, StringType), a: Attribute) if v != null =>
      companionOf(a, child).map(h => EqualTo(h, hashLit(v)))
    case In(a: Attribute, vs) if a.dataType == StringType &&
        vs.nonEmpty && vs.forall {
          case Literal(v, StringType) => v != null
          case _ => false } =>
      companionOf(a, child)
        .map(h => In(h, vs.map { case Literal(v, _) => hashLit(v) }))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      // Per-conjunct fixpoint guard (VERDICT r4 #7): each string-equality
      // conjunct earns its hash predicate independently, and one is added
      // only if not already semantically present — so a filter mixing an
      // already-rewritten predicate with a NEW string predicate still gets
      // the new rewrite, while repeated optimizer passes reach a fixpoint.
      val conjuncts = splitConjuncts(cond)
      val additions = conjuncts.flatMap(c => hashPredFor(c, child))
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      else Filter((additions ++ conjuncts).reduceLeft(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Session extension registration point (SparkSessionExtensions — the
  * engine's planner-integration seam). Besides the optimizer rules, the
  * distance kernels register as SQL FUNCTIONS, so `spark.sql` users get
  * the same codegen'd expressions the Column API builds (H8 surface — the
  * reference exposes its distance functions to the daemon's SQL layer,
  * knn/knn.h:32-37). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, build: (Expression, Expression) => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      "graft.vector", name),
    (args: Seq[Expression]) => {
      if (args.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${args.length}")
      build(args(0), args(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HashCompanionRule)
    // IndexRoutingRule BEFORE AnnRoutingRule (both run in injection order
    // within one fixpoint set): a filter selective enough for the index
    // gate becomes the postings semi-join first, and the ANN rule then
    // sees two relations under the sort and stands down — brute-forcing
    // few survivors, the reference's ShouldUseFullscan preference. The
    // reverse order would let the ANN rule consume the filter into a
    // massively over-probing beam walk before the index rule ever ran
    // (review r10-3).
    ext.injectOptimizerRule(session => new IndexRoutingRule(session))
    ext.injectOptimizerRule(session => new AnnRoutingRule(session))
    // plans the graph family's routed-candidate leaf (AnnRoutingRule's
    // rewrite target for clustered graph indexes)
    ext.injectPlannerStrategy(_ => new GraphCandidatesStrategy)
    // Only the genuine catalyst Expressions register as SQL functions; the
    // text-analysis ops are Column COMPOSITIONS of SQL built-ins, so
    // spark.sql users already have their vocabulary (the oracle replays
    // them in SQL verbatim), and Spark 4's Column AST cannot be embedded
    // unresolved inside a FunctionBuilder result.
    ext.injectFunction(binary("l2_dist", graft.vector.L2Distance(_, _)))
    ext.injectFunction(binary("ip_score", graft.vector.InnerProduct(_, _)))
    ext.injectFunction(binary("cosine_sim", graft.vector.CosineSimilarity(_, _)))
  }
}
