package graft.queries

import graft.SparkT
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the relational corpus: the 100 TB contracts
  * (broadcast fires for dimension joins, fact joins shuffle on the key,
  * window/setop shapes) — correctness itself is covered by the oracle gate. */
class RelationalSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(SparkT.spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q_join_broadcast broadcasts the dimension side") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_large shuffles on the join key (no cartesian, no nested loop)") {
    val p = plan("q_join_large")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("semi/anti joins lower to semi/anti hash joins, not materialized subqueries") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("q_window is a single-shuffle window, q_topk-style heap not required") {
    val p = plan("q_window")
    assert(p.contains("Window") || p.contains("WindowGroupLimit"))
    // row_number + rn<=3 filter should enable the group-limit optimization
    // (Spark 3.5+ WindowGroupLimit) so each partition keeps 3 rows early.
    assert(p.contains("WindowGroupLimit"), "WindowGroupLimit missing:\n" + p)
  }

  test("set ops dedup via aggregate, not join explosion") {
    val p = plan("q_union")
    assert(p.contains("HashAggregate"), p)
  }

  test("multi-join headliners: no cartesian/nested-loop anywhere in the chain") {
    Seq("q_mjoin_pricing", "q_mjoin_region").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
        s"$q:\n$p")
    }
  }

  test("q_mjoin_pricing ends in a top-k heap, not a global sort") {
    assert(plan("q_mjoin_pricing").contains("TakeOrderedAndProject"))
  }

  test("q_mjoin_region broadcasts the filtered dimension chain") {
    assert(plan("q_mjoin_region").contains("BroadcastHashJoin"))
  }

  test("json extraction is a codegen'd expression in the scan stage, not a UDF") {
    val p = plan("q_json_agg")
    assert(p.contains("from_json"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q_window_range frame is value-bounded (RANGE), not row-bounded") {
    assert(plan("q_window_range").contains("RangeFrame"))
  }
}
