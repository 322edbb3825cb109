package graft.plans

import graft.SparkT
import graft.tables.Writer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The automatic string→hash-companion rewrite: plan gains the pushable
  * long predicate, results stay exact (collision-safe conjunction). */
class HashCompanionRuleSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // Inject on the shared test session via the public experimental hook —
  // equivalent to spark.sql.extensions at session build time. Both engine
  // rules are set (same value AnnRoutingSpec sets), so concurrent suites
  // never strip each other's rule.
  SparkT.spark.experimental.extraOptimizations =
    Seq(HashCompanionRule, new AnnRoutingRule(SparkT.spark))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-hc").resolve("t").toString
    val df = (1 to 2000).map(i => (i.toLong, Seq("alpha", "beta", "gamma", "")(i % 4)))
      .toDF("id", "seg")
    Writer.write(df, d, sortBy = Seq("id"), hashCompanions = Seq("seg"))
    d
  }

  test("equality filter gains the hash predicate and stays exact") {
    val df = SparkT.spark.read.parquet(dir).filter($"seg" === "alpha")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("seg__hash"), physical)
    assert(df.count() === 500)
  }

  test("IN filter gains the hash predicate and stays exact") {
    val df = SparkT.spark.read.parquet(dir).filter($"seg".isin("alpha", "beta"))
    assert(df.queryExecution.executedPlan.toString.contains("seg__hash"))
    assert(df.count() === 1000)
  }

  test("empty-string literal uses the pinned hash 0") {
    val df = SparkT.spark.read.parquet(dir).filter($"seg" === "")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("seg__hash"), plan)
    assert(plan.contains("= 0)") || plan.contains("0 ="), plan)
    assert(df.count() === 500)
  }

  test("tables without a companion are untouched") {
    val df = Seq((1L, "x")).toDF("id", "seg").filter($"seg" === "x")
    assert(!df.queryExecution.optimizedPlan.toString.contains("__hash"))
    assert(df.count() === 1)
  }

  test("mixed conjunction: companion-referencing filter still rewrites the new string conjunct") {
    // VERDICT r4 #7: the old filter-granular guard skipped the whole Filter
    // if ANY conjunct referenced a __hash column, so a fresh string
    // predicate in the same conjunction never got its fast path.
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val alphaHash = XxHash64(Seq(Literal("alpha")), 42L).eval(null)
    val df = SparkT.spark.read.parquet(dir)
      .filter($"seg__hash".isNotNull && $"seg" === "alpha")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains(alphaHash.toString), plan)
    assert(df.count() === 500)
  }

  test("rule is idempotent (no predicate stacking at fixpoint)") {
    val df = SparkT.spark.read.parquet(dir).filter($"seg" === "alpha")
    val plan = df.queryExecution.optimizedPlan.toString
    // EXACTLY one added hash-equality conjunct, no matter how many
    // optimizer batches run the rule (the session extensions and this
    // suite's extraOptimizations both do). Constraint inference may add a
    // benign isnotnull(seg__hash), so count equality predicates, not every
    // mention of the column.
    assert("seg__hash#\\d+L? = ".r.findAllIn(plan).size === 1, plan)
    assert(df.count() === 500)
  }

  test("a filter on a join's companion-less side never earns the OTHER " +
      "side's hash predicate (r18 review)") {
    // t1 has seg + seg__hash; t2 shares the column NAME but has no
    // companion. A filter on t2.seg resolving the companion by name over
    // the join output would add t1.seg__hash = hash('x') and silently
    // drop rows where the two sides disagree.
    val d2 = java.nio.file.Files.createTempDirectory("graft-hc2")
      .resolve("t2").toString
    (1 to 100).map(i => (i.toLong, Seq("alpha", "beta")(i % 2)))
      .toDF("id2", "seg").write.parquet(d2)
    val t1 = SparkT.spark.read.parquet(dir)
      .select($"id", $"seg".as("seg"), $"seg__hash")
    val t2 = SparkT.spark.read.parquet(d2)
    // full-outer join keeps the t2 filter ABOVE the join (not pushable
    // to t2 alone through the null-extending side in all plans); alias
    // the columns apart except the shared name on t2's side
    val joined = t1.withColumnRenamed("seg", "seg1")
      .join(t2, $"id" === $"id2", "full_outer")
    val q = joined.filter($"seg" === "alpha").select($"id2")
    // exactness: every t2 alpha row survives regardless of t1's value
    assert(q.count() === 50)
    // and the plan carries NO hash predicate sourced from t1
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("seg__hash = "),
      s"wrong-side companion predicate injected:\n$opt")
  }
}
