package graft.engine

import graft.SparkT
import graft.filters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level evidence for the inherited storage behaviors the engine
  * relies on (VERDICT r1 flagged these as implemented-but-unverified):
  * S2 late materialization (column pruning reaches the scan), Z1 zone-map
  * predicate pushdown, F10 degenerate-filter elimination. */
class PruningSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def li = Graft.table(SparkT.spark, sfDir, "lineitem")

  test("S2: projection prunes the scan to selected columns (ReadSchema)") {
    val p = li.select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    // the 11-column table must NOT be read in full for a 2-column projection
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("Z1: compiled range filters reach the Parquet scan as pushed filters") {
    val p = li.filter(IntRange("l_orderkey", lo = Some(100L), hi = Some(200L)).toColumn)
      .queryExecution.executedPlan.toString
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_orderkey,100)") &&
      pushed.contains("LessThanOrEqual(l_orderkey,200)"), pushed)
  }

  test("F10: a degenerate (unbounded) range filter is eliminated from the plan") {
    // IntRange with no bounds compiles to lit(true); the optimizer must drop
    // the Filter node entirely (BooleanSimplification + PruneFilters).
    val p = li.filter(IntRange("l_orderkey").toColumn)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Filter"), p)
  }

  test("Z6: ORDER BY + LIMIT lowers to a heap top-k, not a global sort") {
    val p = li.orderBy(col("l_extendedprice").desc).limit(5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p)
  }
}
