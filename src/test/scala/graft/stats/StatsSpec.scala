package graft.stats

import graft.SparkT
import graft.tables.Writer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Footer-stats answers vs full-scan truth; estimate bounds; catalog
  * pruning soundness on a sorted multi-file table. */
class StatsSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // Engine-written 4-file table, range-clustered by k (zone-map layout).
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-stats").resolve("t").toString
    val df = (1 to 10000).map(i => (i.toLong, (i % 97).toDouble, s"s$i"))
      .toDF("k", "v", "s")
    Writer.write(df, d, sortBy = Seq("k"), files = 4)
    d
  }

  test("rowCount from footers equals full-scan count (I6)") {
    assert(Stats.rowCount(dir) === 10000L)
    assert(Stats.rowCount(dir) ===
      SparkT.spark.read.parquet(dir).count())
  }

  test("minMax from footers equals full-scan min/max (Z1)") {
    assert(Stats.minMax(dir, "k") === Some((1L, 10000L)))
    assert(Stats.minMax(dir, "v") === Some((0.0, 96.0)))
  }

  test("estimateRange is a sound upper bound and prunes on the sort key (Z4)") {
    val exact = SparkT.spark.read.parquet(dir)
      .filter($"k" >= 100 && $"k" <= 200).count()
    val est = Stats.estimateRange(dir, "k", 100, 200)
    assert(est >= exact)
    // range-clustered on k: the estimate must prune most of the table
    assert(est < 10000L, "no pruning happened on the sort key")
  }

  test("earlyReject fires for out-of-range predicates (Z2)") {
    assert(Stats.earlyReject(dir, "k", 20000, 30000))
    assert(!Stats.earlyReject(dir, "k", 1, 5))
  }

  test("catalog pruning is sound: pruned files contain no matching rows") {
    val cat = Stats.buildCatalog(SparkT.spark, dir, Seq("k", "v"))
    assert(cat.count() === 4)
    assert(cat.agg(sum("rows")).head.getLong(0) === 10000L)
    val surviving = Stats.pruneFiles(cat, "k", 100, 200)
      .select("file").as[String].collect().toSet
    assert(surviving.size < 4, "catalog pruned nothing on the sort key")
    // soundness: rows matching the range live only in surviving files
    val all = Stats.buildCatalog(SparkT.spark, dir, Seq("k"))
      .select("file").as[String].collect().toSet
    val prunedFiles = all -- surviving
    prunedFiles.foreach { f =>
      val n = SparkT.spark.read.parquet(f)
        .filter($"k" >= 100 && $"k" <= 200).count()
      assert(n === 0, s"pruned file $f had $n matching rows")
    }
  }

  test("pruneFiles keeps files without usable column stats (no stats -> no pruning)") {
    // string column: buildCatalog cannot numify its stats -> NaN min/max;
    // a missing column -> null. Neither may be pruned (ADVICE r3: NaN
    // comparisons are false, so these files used to vanish silently).
    val catNaN = Stats.buildCatalog(SparkT.spark, dir, Seq("s"))
    assert(Stats.pruneFiles(catNaN, "s", 0, 1).count() === 4)
    val catMissing = Stats.buildCatalog(SparkT.spark, dir, Seq("k"))
    assert(Stats.pruneFiles(catMissing, "nope", 0, 1).count() === 4)
  }

  test("approxNdv is within rsd of exact ndv (I7)") {
    val df = SparkT.spark.read.parquet(dir)
    val exact = df.select(countDistinct($"v")).head.getLong(0)
    val approx = Stats.approxNdv(df, "v")
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }
}
