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

  test("registered catalog answers registration stats with ZERO footer reads (r10)") {
    // The 100 TB administrative path (VERDICT r9 #5): index registration
    // consumed driver footer sweeps (rowCount + clusteredBy); with a
    // registered catalog both answer from catalog aggregations, and the
    // routing decisions are IDENTICAL to the sweep's.
    val tmp = Files.createTempDirectory("graft-statcat")
    val cb = tmp.resolve("clustered").toString   // v-clustered: stands down
    val ub = tmp.resolve("unclustered").toString // id-sorted: routes
    val ci = tmp.resolve("ci").toString
    val ui = tmp.resolve("ui").toString
    Writer.write((0L until 4000L).map(i => (i, i % 1000)).toDF("id", "v"),
      cb, sortBy = Seq("v"), files = 4)
    Writer.write((0L until 4000L).map(i => (i, i % 1000)).toDF("id", "v"),
      ub, sortBy = Seq("id"), files = 4)
    graft.index.SecondaryIndex.build(SparkT.spark.read.parquet(cb), "v", "id", ci)
    graft.index.SecondaryIndex.build(SparkT.spark.read.parquet(ub), "v", "id", ui)
    // sweep-based truth, before any catalog exists
    assert(Stats.clusteredBy(cb, "v"))
    assert(!Stats.clusteredBy(ub, "v"))
    val sweepRows = Stats.rowCount(cb)
    val sweepEstC = Stats.estimateRange(cb, "v", 10, 10)
    // build catalogs (distributed), PERSIST them, and register the
    // persisted copies — an unpersisted catalog DF would re-run its
    // footer-reading job on every consultation, which is exactly the IO
    // the catalog exists to avoid
    val ccat = tmp.resolve("ccat").toString
    val ucat = tmp.resolve("ucat").toString
    Stats.buildCatalog(SparkT.spark, cb, Seq("id", "v")).write.parquet(ccat)
    Stats.buildCatalog(SparkT.spark, ub, Seq("id", "v")).write.parquet(ucat)
    Stats.registerCatalog(SparkT.spark, cb, SparkT.spark.read.parquet(ccat))
    Stats.registerCatalog(SparkT.spark, ub, SparkT.spark.read.parquet(ucat))
    try {
      val before = Stats.footerReads.get()
      assert(Stats.rowCount(cb) === sweepRows)
      assert(Stats.clusteredBy(cb, "v"))
      assert(!Stats.clusteredBy(ub, "v"))
      // estimateRange answers from the catalog too (the plan-time ANN
      // routing estimate): file-granularity overlap — v-clustered files
      // prune to the one covering file (~1/4 of rows), never under the
      // row-group sweep; the id-sorted table cannot prune (every file
      // spans all v)
      val catEstC = Stats.estimateRange(cb, "v", 10, 10)
      assert(catEstC >= sweepEstC && catEstC < 2000L, s"$catEstC")
      assert(Stats.estimateRange(ub, "v", 10, 10) === 4000L)
      graft.plans.IndexRouting.register(SparkT.spark, cb, ci, "v", "id")
      graft.plans.IndexRouting.register(SparkT.spark, ub, ui, "v", "id")
      assert(Stats.footerReads.get() === before,
        s"registration read ${Stats.footerReads.get() - before} footers " +
          "despite a registered catalog")
      // identical routing behavior: clustered base stands down, the
      // unclustered one routes
      val cq = SparkT.spark.read.parquet(cb).filter($"v" === 10L)
      val uq = SparkT.spark.read.parquet(ub).filter($"v" === 10L)
      def semiJoins(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
        }.size
      assert(semiJoins(cq) == 0, cq.queryExecution.optimizedPlan.toString)
      assert(semiJoins(uq) == 1, uq.queryExecution.optimizedPlan.toString)
      assert(cq.select($"id").as[Long].collect().toSet ===
        Set(10L, 1010L, 2010L, 3010L))
      assert(uq.select($"id").as[Long].collect().toSet ===
        Set(10L, 1010L, 2010L, 3010L))
    } finally {
      Stats.unregisterCatalog(SparkT.spark, cb)
      Stats.unregisterCatalog(SparkT.spark, ub)
      graft.plans.IndexRouting.unregister(SparkT.spark, cb)
      graft.plans.IndexRouting.unregister(SparkT.spark, ub)
    }
  }

  test("clusteredBy catalog scan: many-file scale shape, lag-exact vs brute force") {
    // The adjacency scan must never serialize the catalog through one
    // task (r13 VERDICT #4): it range-partitions and stitches partition
    // boundaries on the driver. Decision must equal the naive
    // sort-then-lag replica EXACTLY, boundaries included.
    def register(name: String,
                 rows: Seq[(String, Long, Map[String, Double], Map[String, Double])]): String = {
      val path = s"/graft-synthetic-$name"
      Stats.registerCatalog(SparkT.spark, path,
        rows.toDF("file", "rows", "col_min", "col_max"))
      path
    }
    def brute(rows: Seq[(Long, Double, Double)], frac: Double): Boolean = {
      val sorted = rows.sortBy(r => (r._2, r._3))
      val ok = sorted.zipWithIndex.collect {
        case ((rw, mn, _), i) if i == 0 || sorted(i - 1)._3 <= mn => rw
      }.sum
      ok.toDouble / math.max(1L, rows.map(_._1).sum) >= frac
    }
    try {
      // 10k files — dozens of range partitions at the 32-partition default
      val n = 10000
      val clustered = (0 until n).map(i =>
        (s"f$i", 100L, Map("v" -> i * 10.0), Map("v" -> (i * 10 + 9).toDouble)))
      val overlapped = (0 until n).map(i =>
        (s"f$i", 100L, Map("v" -> 0.0), Map("v" -> 1e6)))
      assert(Stats.clusteredBy(register("c", clustered), "v"))
      assert(!Stats.clusteredBy(register("o", overlapped), "v"))
      // randomized catalogs near the 0.8 threshold: decision == brute lag
      val rnd = new scala.util.Random(41)
      (0 until 6).foreach { c =>
        val rows = (0 until 500).map { i =>
          val mn = i * 10.0 + (if (rnd.nextDouble() < 0.15) -15.0 else 0.0)
          (s"f$i", 50L + rnd.nextInt(100),
            Map("v" -> mn), Map("v" -> (mn + 9 + rnd.nextInt(8))))
        }
        val want = brute(rows.map(r => (r._2, r._3("v"), r._4("v"))), 0.8)
        assert(Stats.clusteredBy(register(s"r$c", rows), "v") === want,
          s"case $c")
      }
    } finally {
      (Seq("c", "o") ++ (0 until 6).map(i => s"r$i")).foreach(nm =>
        Stats.unregisterCatalog(SparkT.spark, s"/graft-synthetic-$nm"))
    }
  }

  test("approxNdv is within rsd of exact ndv (I7)") {
    val df = SparkT.spark.read.parquet(dir)
    val exact = df.select(countDistinct($"v")).head.getLong(0)
    val approx = Stats.approxNdv(df, "v")
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("hive-partitioned layouts list recursively: rowCount/earlyReject see " +
      "files under col=value/ subdirectories (r18 review)") {
    val dir = java.nio.file.Files.createTempDirectory("stats-part").toString
    val df = (0L until 100L).map(i => (i, s"d${i % 3}", i * 2))
      .toDF("id", "date", "v")
    graft.tables.Writer.writePartitioned(df, dir, Seq("date"))
    val conf = SparkT.spark.sparkContext.hadoopConfiguration
    // one-level listing saw only date=*/ directories -> 0 rows and a
    // false "skip this table" earlyReject
    assert(Stats.rowCount(dir, conf) === 100L)
    assert(!Stats.earlyReject(dir, "v", 10.0, 20.0),
      "matching rows exist: earlyReject must not claim the table is skippable")
    assert(Stats.earlyReject(dir, "v", 1000.0, 2000.0))
  }

  test("an ALL-NULL column chunk still counts its nulls and keeps the " +
      "column visible in file stats (r18 review)") {
    val dir = java.nio.file.Files.createTempDirectory("stats-nulls")
      .resolve("t").toString
    val df = (0L until 50L).map(i => (i, null: java.lang.Long))
      .toDF("id", "all_null").coalesce(1)
    df.write.parquet(dir)
    val fs = Stats.fileStats(dir,
      SparkT.spark.sparkContext.hadoopConfiguration)
    val cs = fs.head.cols.get("all_null")
    assert(cs.isDefined, "everywhere-null column must not vanish from stats")
    assert(cs.get.nulls === Some(50L), cs)
    assert(cs.get.min.isEmpty && cs.get.max.isEmpty)
  }
}
