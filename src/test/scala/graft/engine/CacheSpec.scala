package graft.engine

import graft.SparkT
import graft.tables.Writer
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** I8 block cache (ref secondary/blockreader caching; inherited in Spark as
  * `.cache()` over the index table): a cached table must plan as an
  * in-memory scan — repeated index probes then never re-read Parquet. */
class CacheSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("cached index table plans as InMemoryTableScan and stays exact") {
    val d = Files.createTempDirectory("graft-cache").resolve("t").toString
    val df = (1 to 1000).map(i => (i % 10, i.toLong)).toDF("value", "rowid")
    Writer.write(df, d, sortBy = Seq("value"))

    val idx = SparkT.spark.read.parquet(d).cache()
    try {
      idx.count() // populate the cache
      val probe = idx.filter($"value" === 3)
      val physical = probe.queryExecution.executedPlan.toString
      assert(physical.contains("InMemoryTableScan"), physical)
      assert(probe.count() === 100)
      // a second, differently-shaped probe reuses the same cached relation
      val probe2 = idx.filter($"value" >= 8)
      assert(probe2.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
      assert(probe2.count() === 200)
    } finally idx.unpersist()
  }
}
