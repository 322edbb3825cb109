package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Automatic secondary-index access-path routing — the reference HOST's
  * missing half of the index story (VERDICT r8 #1). The reference daemon
  * picks the access path per filter automatically: EstimateMinMax
  * (columnar/columnar.cpp:649-675) and the index's iterator counts /
  * CalcCount (secondary/secondary.cpp:745-812) feed a cost choice between
  * the secondary index and the columnar analyzer, and COUNT(*) WHERE
  * short-circuits through CalcCount without materializing a row
  * (secondary.cpp:774-812). Until round 9 the engine's index paths were
  * correct but only reachable through explicit `SecondaryIndex.lookup*`
  * calls; this rule gives a plain `df.filter(...)` / `.count()` the same
  * automation the ANN side already has ([[AnnRoutingRule]]).
  *
  * [[IndexRouting]] is the registry (the analog of "this column has a
  * secondary index" in the reference's table metadata). [[IndexRoutingRule]]
  * (injected by [[GraftExtensions]] into the operator-optimization batch)
  * rewrites two shapes over a registered base relation:
  *
  *  1. `Filter(pred, relation)` where some conjuncts are index-servable
  *     (=, IN, comparisons against literals, IS NOT NULL on the indexed
  *     column) → a LEFT SEMI join of the relation against the exploded
  *     index postings, with the non-servable conjuncts kept as a residual
  *     Filter. Cost-gated like the reference host: route only when the
  *     estimated match fraction is below `spark.graft.index.routeThreshold`
  *     (default 0.1) — a broad filter stays on the pushdown scan, which is
  *     the better plan.
  *  2. `Aggregate([], count(*), Filter(pred, relation))` where EVERY
  *     conjunct is servable → an index-only `sum(cnt)` over the filtered
  *     postings (the CalcCount short-circuit). No gate: the index-only
  *     aggregation never scans the fact table, so it cannot lose.
  *
  * Estimation mirrors the reference's sources, shifted to registration
  * time so PLAN time stays metadata-only (no job inside the optimizer):
  * point predicates use |values| / ndv over the stored non-null count
  * (the CalcCount seam), ranges use the value-span fraction against the
  * index's min/max (the EstimateMinMax seam). Both are uniform-assumption
  * estimates — cheap, monotone in predicate width, and only used to gate,
  * never to answer.
  *
  * Correctness contract: the registered index must COVER the relation
  * (same rows — [[graft.index.IndexCheck]]'s fact reconciliation is the
  * audit), exactly as the reference assumes its per-segment indexes are in
  * sync; [[IndexRouting.unregister]] is the invalidation hook (the
  * reference disables indexes on column update, secondary.cpp:414-434).
  * Multi-valued ([[graft.index.SecondaryIndex.buildMva]]) indexes are NOT
  * registrable here: their postings repeat keys across values, which the
  * semi-join tolerates but the count path must not see.
  *
  * 100 TB note: the routed semi-join broadcasts the exploded key set when
  * the predicate is selective (AQE picks it — the gate guarantees the
  * selective case), so the fact side is a local hash probe with NO shuffle
  * of fact rows; the index scan itself prunes to the few files whose value
  * range matches (the table is value-clustered). The count path scans only
  * those same index files and ships one long.
  */
object IndexRouting {

  /** `mva = true` marks a [[graft.index.SecondaryIndex.buildMva]] index:
    * postings repeat keys across element values, so it serves
    * `array_contains` / `arrays_overlap` filters via the duplicate-
    * insensitive semi-join but is excluded from the count and facet
    * rewrites (sum(cnt) counts element occurrences, not rows).
    * `baseClustered` records whether the BASE table's row-group stats
    * already prune on `valueCol` (the EstimateMinMax input): then the
    * pushdown scan is the better plan and the filter route stands down —
    * the index-only count/facet/distinct rewrites still apply (they skip
    * the fact scan entirely, which clustering cannot match). */
  final case class Registered(basePath: String, indexPath: String,
                              valueCol: String, keyCol: String,
                              rows: Long, ndv: Long, totalCnt: Long,
                              vMin: Option[Double], vMax: Option[Double],
                              indexPlan: LogicalPlan, mva: Boolean,
                              baseClustered: Boolean)

  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, List[Registered]]

  private def qualify(spark: SparkSession, p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(path).toString
  }

  private def numOpt(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  /** Register a [[graft.index.SecondaryIndex]] table for `basePath`: plain
    * filters/counts on `valueCol` become routing candidates. Registration
    * runs ONE small aggregation over the index table (rows ≈ ndv × chunks,
    * tiny next to the fact table) for the gating stats — ndv, stored
    * non-null count, numeric value bounds — and caches the analyzed index
    * relation; plan time then touches no data at all. Re-registering the
    * same (base, index, column) triple is a no-op (bench loops re-enter
    * query builders); use `force = true` after a rebuild. Registration is
    * TABLE-LEVEL session state, as in the reference daemon: every eligible
    * filter over the table in this session routes. */
  def register(spark: SparkSession, basePath: String, indexPath: String,
               valueCol: String, keyCol: String,
               force: Boolean = false, mva: Boolean = false): Unit = {
    val q = qualify(spark, basePath)
    def same(r: Registered): Boolean =
      r.indexPath == indexPath && r.valueCol == valueCol &&
        r.keyCol == keyCol && r.mva == mva
    // idempotency covers the FULL registration key: a re-register with a
    // different keyCol or mva classification must replace, never be
    // silently dropped (it describes a different index contract)
    if (!force && reg.getOrElse(q, Nil).exists(same)) return
    // stats jobs and footer sweeps run OUTSIDE the lock (they can take
    // seconds on big tables; a concurrent maintenance invalidation must
    // not block behind them) — a racing duplicate register just recomputes
    // and last-write-wins on an identical entry
    val hconf = spark.sparkContext.hadoopConfiguration
    val rows = graft.stats.Stats.rowCount(basePath, hconf)
    // the live data of a manifest-managed (or mid-compact) index sits in a
    // generation dir — read through the same resolution every lookup uses
    val idx = spark.read.parquet(
      graft.index.SecondaryIndex.resolve(spark, indexPath))
    import org.apache.spark.sql.functions._
    val s = idx.agg(
      coalesce(sum(when(col("value").isNotNull, col("cnt"))), lit(0L)),
      count_distinct(col("value")),
      min(col("value")), max(col("value"))).head()
    val clustered = !mva &&
      graft.stats.Stats.clusteredBy(basePath, valueCol, hconf)
    val entry = Registered(q, indexPath, valueCol, keyCol, rows,
      math.max(1L, s.getLong(1)), s.getLong(0),
      numOpt(s.get(2)), numOpt(s.get(3)), idx.queryExecution.analyzed, mva,
      clustered)
    reg.synchronized {
      reg.put(q, entry :: reg.getOrElse(q, Nil).filterNot(r =>
        r.indexPath == indexPath && r.valueCol == valueCol))
    }
  }

  def unregister(spark: SparkSession, basePath: String): Unit =
    reg.remove(qualify(spark, basePath))

  def clear(): Unit = reg.clear()

  /** Invalidation hook for index MAINTENANCE ([[graft.index.SecondaryIndex]]
    * calls this from build / appendSegment / compact / compactManifest):
    * the cached analyzed index relation froze its file listing at
    * registration, so a mutated index would silently serve stale postings
    * (or dangle on deleted files after a compaction). Entries for the
    * mutated index are DROPPED — queries fall back to the always-correct
    * scan until the caller re-registers (the reference disables indexes on
    * column update the same way, secondary.cpp:414-434). Paths are matched
    * QUALIFIED, so a register/maintenance spelling difference
    * ("file:/p" vs "/p", trailing slash) cannot skip the invalidation. */
  def onIndexMutated(spark: SparkSession, indexPath: String): Unit = {
    val q = qualify(spark, indexPath)
    reg.synchronized {
      reg.foreach { case (base, entries) =>
        val keep = entries.filterNot(r => qualify(spark, r.indexPath) == q)
        if (keep.size != entries.size) {
          if (keep.isEmpty) reg.remove(base) else reg.put(base, keep)
        }
      }
    }
  }

  private[plans] def lookup(qualifiedPath: String): List[Registered] =
    reg.getOrElse(qualifiedPath, Nil)
}

class IndexRoutingRule(session: SparkSession) extends Rule[LogicalPlan] {

  import IndexRouting.Registered

  private def threshold: Double =
    session.conf.getOption("spark.graft.index.routeThreshold")
      .flatMap(_.toDoubleOption).getOrElse(0.1)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // CalcCount short-circuit: COUNT(*) over a fully-servable filter.
    case agg @ Aggregate(ge, aggs, child, _) if ge.isEmpty && aggs.size == 1 &&
        (aggs.head match {
          case Alias(ae: AggregateExpression, _) => isCountStar(ae)
          case _ => false
        }) =>
      (stripPrune(child) match {
        case Filter(cond, inner) => relationOf(stripPrune(inner))
            .flatMap { case (lr, regs) =>
              tryCount(aggs.head.asInstanceOf[Alias], cond, lr, regs) }
        case _ => None
      }).getOrElse(agg)

    // I7: COUNT(DISTINCT col) from the index's distinct-value stream (the
    // reference precomputes per-column ndv in the index meta,
    // secondary.cpp:380-388) — the distinct runs over index rows
    // (ndv × chunks), never fact rows.
    case agg @ Aggregate(ge, aggs, child, _) if ge.isEmpty && aggs.size == 1 &&
        (aggs.head match {
          case Alias(ae: AggregateExpression, _) => isCountDistinctOnCol(ae)
          case _ => false
        }) =>
      tryCountDistinct(aggs.head.asInstanceOf[Alias], child).getOrElse(agg)

    // Index-served facet / DISTINCT: GROUP BY indexed-col [+ COUNT(*)]
    // over the bare (or fully-servable-filtered) relation → the index's
    // (value [, sum(cnt)]) — no fact scan; the reference's
    // dictionary-backed facet acceleration (TABLE packing makes low-card
    // group-by cheap, builderint.cpp:218-219; the postings counts ARE
    // that dictionary, and the value stream IS the distinct set).
    case agg @ Aggregate(Seq(g: AttributeReference), aggs, child, _)
        if aggs.size <= 2 =>
      tryFacet(g, aggs, child).getOrElse(agg)

    // Access-path choice: servable conjuncts → postings semi-join.
    // Nondeterministic conditions are never split (evaluating the servable
    // conjuncts ahead of a rand()-style residual would change semantics,
    // the same reason PushDownPredicates refuses to reorder them).
    case f @ Filter(cond, lr: LogicalRelation) if cond.deterministic =>
      relationOf(lr).flatMap { case (_, regs) =>
        tryFilter(cond, lr, regs)
      }.getOrElse(f)
  }

  /** GROUP BY valueCol + count(*) → index-only facet. The NULL group
    * reconciles too: the postings keep a NULL-value group whose counts sum
    * to the fact table's NULL rows, matching SQL GROUP BY semantics. MVA
    * indexes are excluded (their counts are element occurrences). */
  private def tryFacet(g: AttributeReference, aggs: Seq[NamedExpression],
                       child: LogicalPlan): Option[LogicalPlan] = {
    val cntAlias = aggs.collectFirst {
      case a @ Alias(ae: AggregateExpression, _) if isCountStar(ae) => a
    }
    val groupOut = aggs.find {
      case ar: AttributeReference => ar.semanticEquals(g)
      case Alias(ar: AttributeReference, _) => ar.semanticEquals(g)
      case _ => false
    }
    // size 1 = DISTINCT (the bare group column), size 2 = facet (+count)
    if (groupOut.isEmpty || (aggs.size == 2 && cntAlias.isEmpty)) return None
    val (inner, lrOpt) = stripPrune(child) match {
      case Filter(cond, c) => (Some(cond), relationOf(stripPrune(c)))
      case other => (None, relationOf(other))
    }
    lrOpt.flatMap { case (lr, regs) =>
      regs.filterNot(_.mva)
        .find(r => r.valueCol == g.name &&
          lr.output.exists(a => a.name == g.name && a.semanticEquals(g)))
        .flatMap { r =>
          for {
            idxValue <- r.indexPlan.output.find(_.name == "value")
            cnt <- r.indexPlan.output.find(_.name == "cnt")
            v <- lr.output.find(_.name == r.valueCol)
            // a filter under the facet must be fully servable by this index
            idxChild <- inner match {
              case None => Some(r.indexPlan)
              case Some(cond) =>
                val conjuncts = splitConjuncts(cond)
                if (conjuncts.forall(servable(_, v)))
                  Some(Filter(
                    conjuncts.map(substitute(_, v, idxValue)).reduce(And),
                    r.indexPlan): LogicalPlan)
                else None
            }
          } yield {
            val sum = Coalesce(Seq(
              Sum(cnt).toAggregateExpression(), Literal(0L)))
            // keep the original output ORDER and exprIds
            val outs = aggs.map {
              case a @ Alias(ae: AggregateExpression, _) if isCountStar(ae) =>
                Alias(sum, a.name)(exprId = a.exprId)
              case ar: AttributeReference =>
                Alias(idxValue, ar.name)(exprId = ar.exprId)
              case al: Alias =>
                Alias(idxValue, al.name)(exprId = al.exprId)
            }
            Aggregate(Seq(idxValue), outs, idxChild, None)
          }
        }
    }
  }

  private def isCountStar(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case Count(Seq(l: Literal)) =>
        l.value != null && !ae.isDistinct && ae.filter.isEmpty
      case _ => false
    }

  private def isCountDistinctOnCol(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case Count(Seq(_: AttributeReference)) =>
        ae.isDistinct && ae.filter.isEmpty
      case _ => false
    }

  /** COUNT(DISTINCT valueCol) [WHERE servable-pred] → the same aggregate
    * over the index's value column: distinct shuffles index rows, never
    * fact rows. NULL semantics match for free — SQL's COUNT(DISTINCT)
    * ignores NULL, and Count-distinct over the index's value column skips
    * its NULL posting group the same way. */
  private def tryCountDistinct(a: Alias,
                               child: LogicalPlan): Option[LogicalPlan] = {
    val target = a.child.asInstanceOf[AggregateExpression]
      .aggregateFunction.asInstanceOf[Count].children.head
      .asInstanceOf[AttributeReference]
    val (inner, lrOpt) = stripPrune(child) match {
      case Filter(cond, c) => (Some(cond), relationOf(stripPrune(c)))
      case other => (None, relationOf(other))
    }
    lrOpt.flatMap { case (lr, regs) =>
      regs.filterNot(_.mva)
        .find(r => r.valueCol == target.name &&
          lr.output.exists(o => o.semanticEquals(target)))
        .flatMap { r =>
          for {
            idxValue <- r.indexPlan.output.find(_.name == "value")
            v <- lr.output.find(_.name == r.valueCol)
            idxChild <- inner match {
              case None => Some(r.indexPlan)
              case Some(cond) =>
                val conjuncts = splitConjuncts(cond)
                if (conjuncts.forall(servable(_, v)))
                  Some(Filter(
                    conjuncts.map(substitute(_, v, idxValue)).reduce(And),
                    r.indexPlan): LogicalPlan)
                else None
            }
          } yield Aggregate(Nil,
            Seq(Alias(Count(idxValue).toAggregateExpression(
              isDistinct = true), a.name)(exprId = a.exprId)),
            idxChild, None)
        }
    }
  }

  /** Peel column-pruning Projects (attribute-only) off a subtree. */
  private def stripPrune(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripPrune(c)
    case o => o
  }

  private def relationOf(p: LogicalPlan)
      : Option[(LogicalRelation, List[Registered])] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.toList match {
        case root :: Nil =>
          val regs = IndexRouting.lookup(root.toString)
          if (regs.isEmpty) None else Some((lr, regs))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case o => Seq(o)
  }

  /** Literal elements of a non-null array literal, or None. */
  private def arrayLits(l: Literal): Option[Seq[Literal]] = l.dataType match {
    case org.apache.spark.sql.types.ArrayType(et, _) if l.value != null =>
      val arr = l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(et)
      if (arr.contains(null)) None else Some(arr.toSeq.map(Literal(_, et)))
    case _ => None
  }

  /** Servable shapes over an MVA index (ref: `ANY(col)` filters on
    * UINT32SET columns are index-accelerated — each set element is posted):
    * membership and overlap against literals. ALL/exclude quantifiers and
    * IS NOT NULL are NOT servable (empty arrays have no postings but are
    * not null). */
  private def servableMva(e: Expression, v: Attribute): Boolean = e match {
    case ArrayContains(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case ArraysOverlap(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && arrayLits(l).exists(_.nonEmpty)
    case _ => false
  }

  /** Is `e` answerable from the postings of index `r` over `v`?
    * (The servable filter shapes of secondary/secondary.cpp:745-812:
    * VALUES, RANGE/FLOATRANGE, NOTNULL.) */
  private def servable(e: Expression, v: Attribute): Boolean = e match {
    case IsNotNull(a: AttributeReference) => a.semanticEquals(v)
    case EqualTo(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case EqualTo(l: Literal, a: AttributeReference) =>
      a.semanticEquals(v) && l.value != null
    case In(a: AttributeReference, vs) => a.semanticEquals(v) &&
      vs.nonEmpty && vs.forall {
        case l: Literal => l.value != null
        case _ => false
      }
    case InSet(a: AttributeReference, hset) =>
      a.semanticEquals(v) && !hset.contains(null)
    case GreaterThan(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case LessThan(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      a.semanticEquals(v) && l.value != null
    case GreaterThan(l: Literal, a: AttributeReference) =>
      a.semanticEquals(v) && l.value != null
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      a.semanticEquals(v) && l.value != null
    case LessThan(l: Literal, a: AttributeReference) =>
      a.semanticEquals(v) && l.value != null
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      a.semanticEquals(v) && l.value != null
    case _ => false
  }

  private def isNotNullPred(e: Expression): Boolean =
    e.isInstanceOf[IsNotNull]

  /** Estimated matching FRACTION of the fact table for one servable
    * conjunct — the registration-time analog of EstimateMinMax
    * (columnar.cpp:649-675) + CalcCount (secondary.cpp:774-812). None =
    * un-estimable (conservative: treated as no evidence of selectivity). */
  private def estimate(e: Expression, r: Registered): Option[Double] = {
    def nonNullFrac: Double =
      if (r.rows <= 0) 1.0 else math.min(1.0, r.totalCnt.toDouble / r.rows)
    def points(n: Int): Option[Double] =
      Some(math.min(1.0, n.toDouble / r.ndv) * nonNullFrac)
    def num(l: Literal): Option[Double] = l.value match {
      case x: java.lang.Number => Some(x.doubleValue())
      case _ => None
    }
    def span(lo: Double, hi: Double): Option[Double] =
      (r.vMin, r.vMax) match {
        case (Some(mn), Some(mx)) =>
          if (hi < mn || lo > mx) Some(0.0)
          else if (mx <= mn) Some(nonNullFrac)
          else Some(math.max(0.0, math.min(1.0,
            (math.min(hi, mx) - math.max(lo, mn)) / (mx - mn))) * nonNullFrac)
        case _ => None
      }
    e match {
      case IsNotNull(_) => Some(nonNullFrac)
      case EqualTo(_: AttributeReference, _: Literal) |
           EqualTo(_: Literal, _: AttributeReference) => points(1)
      case In(_, vs) => points(vs.size)
      case InSet(_, hset) => points(hset.size)
      // MVA: totalCnt counts element occurrences >= matching rows, so the
      // points estimate is an upper bound — conservative against routing
      case ArrayContains(_, _) => points(1)
      case ArraysOverlap(_, l: Literal) =>
        arrayLits(l).flatMap(ls => points(ls.size))
      case GreaterThan(_: AttributeReference, l: Literal) =>
        num(l).flatMap(v => span(v, Double.MaxValue))
      case GreaterThanOrEqual(_: AttributeReference, l: Literal) =>
        num(l).flatMap(v => span(v, Double.MaxValue))
      case LessThan(_: AttributeReference, l: Literal) =>
        num(l).flatMap(v => span(-Double.MaxValue, v))
      case LessThanOrEqual(_: AttributeReference, l: Literal) =>
        num(l).flatMap(v => span(-Double.MaxValue, v))
      case GreaterThan(l: Literal, _: AttributeReference) =>
        num(l).flatMap(v => span(-Double.MaxValue, v))
      case GreaterThanOrEqual(l: Literal, _: AttributeReference) =>
        num(l).flatMap(v => span(-Double.MaxValue, v))
      case LessThan(l: Literal, _: AttributeReference) =>
        num(l).flatMap(v => span(v, Double.MaxValue))
      case LessThanOrEqual(l: Literal, _: AttributeReference) =>
        num(l).flatMap(v => span(v, Double.MaxValue))
      case _ => None
    }
  }

  /** Rewrite predicate conjuncts from the fact column to the index table's
    * `value` column. MVA shapes lower to their element-wise postings form:
    * `array_contains(col, x)` → `value = x`, `arrays_overlap(col, xs)` →
    * `value IN xs` (each set element was posted, so a row matches iff one
    * of its elements' postings holds its key). */
  private def substitute(e: Expression, factCol: Attribute,
                         idxValue: Attribute): Expression = e match {
    case ArrayContains(a: AttributeReference, l: Literal)
        if a.semanticEquals(factCol) => EqualTo(idxValue, l)
    case ArraysOverlap(a: AttributeReference, l: Literal)
        if a.semanticEquals(factCol) =>
      In(idxValue, arrayLits(l).get)
    case _ => e.transform {
      case a: AttributeReference if a.semanticEquals(factCol) => idxValue
    }
  }

  /** The postings key stream as a logical sub-plan:
    * Project(key, Explode(rowids, Filter(pred, indexRelation))). */
  private def keysPlan(r: Registered, idxCond: Expression)
      : Option[(LogicalPlan, Attribute)] = {
    val byName = r.indexPlan.output.map(a => a.name -> a).toMap
    for {
      rowids <- byName.get("rowids")
      elemType <- rowids.dataType match {
        case ArrayType(et, _) => Some(et)
        case _ => None
      }
    } yield {
      val keyAttr = AttributeReference("__graft_idx_key", elemType,
        nullable = false)()
      val gen = Generate(Explode(rowids), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(keyAttr),
        child = Filter(idxCond, r.indexPlan))
      (Project(Seq(keyAttr), gen), keyAttr)
    }
  }

  /** Servable/residual split for the best (most selective) registered
    * index: returns (entry, servable conjuncts, residual conjuncts,
    * estimated fraction). Conjuncts that are ONLY IsNotNull never trigger
    * a route on their own — Catalyst re-infers IsNotNull from the join
    * condition, so routing on it would re-fire every fixpoint pass (and
    * a bare NOTNULL is rarely selective anyway). */
  private def bestSplit(cond: Expression, lr: LogicalRelation,
                        regs: List[Registered])
      : Option[(Registered, Seq[Expression], Seq[Expression], Double)] = {
    val conjuncts = splitConjuncts(cond)
    val candidates = regs.flatMap { r =>
      lr.output.find(_.name == r.valueCol).flatMap { v =>
        val (s0, rest0) = conjuncts.partition(c =>
          if (r.mva) servableMva(c, v) else servable(c, v))
        // MVA: conjuncts are ROW predicates but postings rows hold ONE
        // element — ANDing two onto the same postings row is unsatisfiable
        // (value = 10 AND value = 610 matches nothing even when a row's
        // set holds both). Route only the single most selective conjunct;
        // the rest stay residual above the semi-join.
        val (s, rest) =
          if (r.mva && s0.size > 1) {
            val best = s0.minBy(c => estimate(c, r).getOrElse(Double.MaxValue))
            (Seq(best), rest0 ++ s0.filterNot(_ eq best))
          } else (s0, rest0)
        if (s.forall(isNotNullPred)) None
        else {
          val ests = s.map(estimate(_, r))
          if (ests.exists(_.isEmpty)) None // un-estimable shape: stay exact
          else Some((r, s, rest, ests.flatten.min))
        }
      }
    }
    if (candidates.isEmpty) None else Some(candidates.minBy(_._4))
  }

  /** The filter route stands down for indexes whose BASE table is already
    * clustered by the value column: the pushdown scan prunes to the same
    * few files/row groups WITHOUT the semi-join detour (and the routed
    * plan would scan the whole unfiltered fact side) — the reference's
    * EstimateMinMax-favors-the-columnar-analyzer case. */
  private def tryFilter(cond: Expression, lr: LogicalRelation,
                        regs: List[Registered]): Option[LogicalPlan] =
    bestSplit(cond, lr, regs.filterNot(_.baseClustered)).flatMap {
      case (r, s, rest, est) =>
      if (est > threshold) None
      else for {
        v <- lr.output.find(_.name == r.valueCol)
        factKey <- lr.output.find(_.name == r.keyCol)
        idxValue <- r.indexPlan.output.find(_.name == "value")
        (keys, keyAttr) <- keysPlan(r,
          s.map(substitute(_, v, idxValue)).reduce(And))
      } yield {
        val joinKey: Expression =
          if (factKey.dataType == keyAttr.dataType) factKey
          else Cast(factKey, keyAttr.dataType)
        val join = Join(lr, keys, LeftSemi,
          Some(EqualTo(joinKey, keyAttr)), JoinHint.NONE)
        if (rest.isEmpty) join else Filter(rest.reduce(And), join)
      }
    }

  /** COUNT(*) WHERE servable-pred → index-only sum of stored counts
    * (CalcCount, secondary.cpp:774-812). Requires EVERY conjunct servable
    * by ONE index (a residual would need fact rows); no selectivity gate —
    * the index-only aggregation is strictly cheaper than any fact scan. */
  private def tryCount(a: Alias, cond: Expression, lr: LogicalRelation,
                       regs: List[Registered]): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    regs.filterNot(_.mva).flatMap { r =>
      lr.output.find(_.name == r.valueCol).flatMap { v =>
        if (!conjuncts.forall(servable(_, v))) None
        else for {
          idxValue <- r.indexPlan.output.find(_.name == "value")
          cnt <- r.indexPlan.output.find(_.name == "cnt")
        } yield {
          val idxCond = conjuncts.map(substitute(_, v, idxValue)).reduce(And)
          val sum = Coalesce(Seq(
            Sum(cnt).toAggregateExpression(), Literal(0L)))
          Aggregate(Nil, Seq(Alias(sum, a.name)(exprId = a.exprId)),
            Filter(idxCond, r.indexPlan), None)
        }
      }
    }.headOption
  }
}
