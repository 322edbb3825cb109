package graft.tables

import graft.SparkT
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-time JSON flattening convention (H6 storage side, ref
  * blockreader.h:96 m_sJsonParentName): typed sibling columns, one parse,
  * pushdown-served predicates, index-sibling lookups. */
class JsonFlattenSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("flatten yields typed siblings with one parse; malformed docs null out") {
    val df = Seq(
      (1L, """{"k": 5, "s": "x"}"""),
      (2L, """{"k": null, "s": "y"}"""),
      (3L, "not json"),
      (4L, null)
    ).toDF("id", "props")
    val schema = new StructType().add("k", LongType).add("s", StringType)
    val flat = JsonFlatten.flatten(df, "props", schema)
    assert(flat.columns.toSeq ===
      Seq("id", "props", "props_k", "props_s"))
    assert(flat.schema("props_k").dataType === LongType)
    val rows = flat.select("id", "props_k", "props_s").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         Option(r.getString(2)))).toMap
    assert(rows(1L) === (Some(5L), Some("x")))
    assert(rows(2L) === (None, Some("y")))
    assert(rows(3L) === (None, None))
    assert(rows(4L) === (None, None))
  }

  test("flattened events: predicate pushes to the scan, no JSON parse in the plan") {
    val sfDir = "/root/testdata/sf0.001"
    System.setProperty("graft.derived.root",
      Files.createTempDirectory("graft-jsonflat").resolve("derived").toString)
    try {
      val flat = Derived.table(SparkT.spark, sfDir, "events_flat")
      val q = flat.filter($"props_k" >= 95).select("event_id", "props_k")
      val plan = q.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      assert(pushed.contains("GreaterThanOrEqual(props_k,95)"), pushed)
      assert(!plan.contains("from_json"), plan)
      // stored siblings agree with a query-time parse of the raw documents
      val direct = graft.engine.Graft.table(SparkT.spark, sfDir, "events")
        .withColumn("props_k", expr("from_json(props, 'k BIGINT').k"))
        .filter($"props_k" >= 95)
        .select("event_id", "props_k").as[(Long, Long)].collect().toSet
      assert(q.as[(Long, Long)].collect().toSet === direct)

      // the index SIBLING serves a value-range lookup over the JSON field
      val base = Derived.tablePath(SparkT.spark, sfDir, "events_flat")
      val keys = graft.index.SecondaryIndex.lookupRangeKeys(SparkT.spark,
        base + "_kidx", lo = Some(95L), hi = None)
        .as[Long].collect().toSet
      assert(keys === direct.map(_._1))
    } finally System.clearProperty("graft.derived.root")
  }
}
