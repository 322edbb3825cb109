package graft.index

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Chunked postings layout (I2/I4 — ref ROW_BLOCKS_LIST,
  * secondary/blockreader.h:82-89, ROWIDS_PER_BLOCK=1024): on a skewed
  * (low-ndv) column NO index row may exceed the chunk bound, and the
  * lookup/count paths stay exact on the chunked layout. */
class SecondaryIndexSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // Heavily skewed fixture: one value owns 5000 of 5060 rows (unique keys —
  // the engine's rowid contract); a second value has sparse keys; a third
  // has negative keys (floor-division chunking must hold there too).
  private lazy val (dir: String, df: org.apache.spark.sql.DataFrame) = {
    val d = Files.createTempDirectory("graft-sidx").resolve("idx").toString
    val hot = (0 until 5000).map(i => ("hot", i.toLong))
    val sparse = (0 until 50).map(i => ("sparse", 100000L + i * 7919L))
    val neg = (1 to 10).map(i => ("neg", -i.toLong))
    val base = (hot ++ sparse ++ neg).toDF("value", "key")
    SecondaryIndex.build(base, "value", "key", d)
    (d, base)
  }

  test("no posting row exceeds the 1024-rowid chunk bound on a skewed column") {
    val idx = SparkT.spark.read.parquet(dir)
    val maxLen = idx.agg(max(size(col("rowids")))).head.getInt(0)
    assert(maxLen <= SecondaryIndex.RowidsPerChunk,
      s"unchunked posting row of $maxLen rowids")
    // the hot value really did split into multiple chunks
    val hotChunks = idx.filter(col("value") === "hot").count()
    assert(hotChunks === 5)  // 5000 keys / 1024-wide chunks
    // chunk min/max bracket their rowids
    val bad = idx.filter(
      col("chunk_min") > array_min(col("rowids")) ||
      col("chunk_max") < array_max(col("rowids"))).count()
    assert(bad === 0)
  }

  test("lookup over the chunked layout returns exactly the matching keys") {
    val keys = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("hot"))
      .as[Long].collect().toSet
    assert(keys === (0 until 5000).map(_.toLong).toSet)
    val negKeys = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("neg"))
      .as[Long].collect().toSet
    assert(negKeys === (1 to 10).map(i => -i.toLong).toSet)
  }

  test("keyRange probe prunes chunks by min/max and filters exactly") {
    val got = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("hot"),
      keyRange = Some((2000L, 2100L))).as[Long].collect().toSet
    assert(got === (2000L to 2100L).toSet)
  }

  test("calcCount sums per-chunk counts exactly, index-only") {
    assert(SecondaryIndex.calcCount(SparkT.spark, dir, Seq("hot")) === 5000L)
    assert(SecondaryIndex.calcCount(SparkT.spark, dir, Seq("hot", "sparse")) === 5050L)
    assert(SecondaryIndex.calcCount(SparkT.spark, dir, Seq("nope")) === 0L)
  }

  test("property: lookup/count over random key sets equal brute-force filters") {
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val n = 200 + rnd.nextInt(800)
      // unique keys (the rowid contract), values skewed over 3 choices
      val keys = rnd.shuffle((0 until 20000).map(_.toLong - 5000)).take(n)
      val rows = keys.map(k => (Seq("a", "a", "a", "b", "c")(rnd.nextInt(5)), k))
      val d = Files.createTempDirectory(s"graft-sidx-p$trial").resolve("i").toString
      SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
      val idx = SparkT.spark.read.parquet(d)
      assert(idx.agg(max(size(col("rowids")))).head.getInt(0) <=
        SecondaryIndex.RowidsPerChunk)
      Seq(Seq("a"), Seq("b", "c"), Seq("nope")).foreach { vs =>
        val got = SecondaryIndex.lookupKeys(SparkT.spark, d, vs)
          .as[Long].collect().toSet
        val want = rows.filter(r => vs.contains(r._1)).map(_._2).toSet
        assert(got === want, s"trial $trial values $vs")
        assert(SecondaryIndex.calcCount(SparkT.spark, d, vs) === want.size.toLong)
      }
      val (lo, hi) = (-2000L, 3000L)
      val ranged = SecondaryIndex.lookupKeys(SparkT.spark, d, Seq("a"),
        keyRange = Some((lo, hi))).as[Long].collect().toSet
      assert(ranged ===
        rows.filter(r => r._1 == "a" && r._2 >= lo && r._2 <= hi).map(_._2).toSet)
    }
  }

  // Numeric-value fixture for the I3 value-range paths: skewed duplicate
  // values, unique keys.
  private lazy val numDir: String = {
    val d = Files.createTempDirectory("graft-sidx-num").resolve("idx").toString
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3000).map(i => (rnd.nextInt(100).toLong * 10, i.toLong))
    numRows = rows
    SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d, files = 3)
    d
  }
  private var numRows: Seq[(Long, Long)] = Nil

  test("value-range lookup matches brute-force filters for every bound shape") {
    val cases = Seq(
      (Some(200L), Some(600L), true, true),   // closed
      (Some(200L), Some(600L), false, false), // open
      (Some(200L), Some(600L), false, true),  // half-open left
      (None, Some(300L), true, true),         // unbounded below
      (Some(700L), None, false, true),        // unbounded above, exclusive
      (Some(455L), Some(455L), true, true),   // empty (no such value)
      (None, None, true, true))               // unbounded = all NON-NULL keys
    cases.foreach { case (lo, hi, loInc, hiInc) =>
      def in(v: Long): Boolean =
        lo.forall(l => if (loInc) v >= l else v > l) &&
          hi.forall(h => if (hiInc) v <= h else v < h)
      val got = SecondaryIndex.lookupRangeKeys(SparkT.spark, numDir, lo, hi,
        loInc, hiInc).as[Long].collect().toSet
      val want = numRows.filter(r => in(r._1)).map(_._2).toSet
      assert(got === want, s"range $lo..$hi inc=($loInc,$hiInc)")
      assert(SecondaryIndex.calcCountRange(SparkT.spark, numDir, lo, hi,
        loInc, hiInc) === want.size.toLong, s"count $lo..$hi")
    }
  }

  test("NOTNULL lookup/count exclude the null-value group exactly (F5 via index)") {
    val d = Files.createTempDirectory("graft-sidx-nn").resolve("idx").toString
    val rows: Seq[(Option[Long], Long)] =
      (0 until 900).map(i => (if (i % 3 == 0) None else Some(i.toLong % 40), i.toLong))
    SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
    val got = SecondaryIndex.lookupNotNullKeys(SparkT.spark, d)
      .as[Long].collect().toSet
    val want = rows.filter(_._1.isDefined).map(_._2).toSet
    assert(got === want)
    assert(SecondaryIndex.calcCountNotNull(SparkT.spark, d) === want.size.toLong)
    // composes with the rowid window
    val windowed = SecondaryIndex.lookupNotNullKeys(SparkT.spark, d,
      keyRange = Some((100L, 200L))).as[Long].collect().toSet
    assert(windowed === want.filter(k => k >= 100 && k <= 200))
    // a RANGE matches VALUES: the fully-unbounded range also excludes the
    // NULL group, agreeing with every one-sided bound spelling
    val unbounded = SecondaryIndex.lookupRangeKeys(SparkT.spark, d,
      None, None).as[Long].collect().toSet
    assert(unbounded === want)
    assert(SecondaryIndex.calcCountRange(SparkT.spark, d, None, None)
      === want.size.toLong)
    // ... and the integrity reconciliation handles the NULL group (a plain
    // equi-join would split it into two spurious diff rows)
    val rep = IndexCheck.check(SparkT.spark, d,
      fact = Some((rows.toDF("value", "key"), "value", "key")))
    assert(rep.ok, rep.issues.mkString("; "))
  }

  test("value-range predicate reaches the index scan as pushed filters (prunes files)") {
    val q = SparkT.spark.read.parquet(numDir)
      .filter(col("value") >= 200L && col("value") <= 600L)
    val plan = q.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(value,200)") &&
      pushed.contains("LessThanOrEqual(value,600)"), pushed)
    // the lookupRangeKeys plan carries the same pushed predicate
    val lk = SecondaryIndex.lookupRangeKeys(SparkT.spark, numDir,
      Some(200L), Some(600L))
    val lkPushed = lk.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(lkPushed.contains("GreaterThanOrEqual(value,200)"), lkPushed)
  }

  test("value-range lookup composes with the rowid-window seek") {
    val got = SecondaryIndex.lookupRangeKeys(SparkT.spark, numDir,
      Some(0L), Some(400L), keyRange = Some((1000L, 2000L)))
      .as[Long].collect().toSet
    val want = numRows.filter(r => r._1 <= 400 && r._2 >= 1000 && r._2 <= 2000)
      .map(_._2).toSet
    assert(got === want)
  }

  test("segment append + compact: reads correct at every stage, canonical after merge (I9)") {
    val rnd = new scala.util.Random(41)
    val all = (0 until 3000).map(i => (rnd.nextInt(20).toLong * 5, i.toLong))
    val (b0, rest) = all.splitAt(1000)
    val (b1, b2) = rest.splitAt(1000)
    val seg = Files.createTempDirectory("graft-sidx-seg").resolve("idx").toString
    val full = Files.createTempDirectory("graft-sidx-full").resolve("idx").toString
    SecondaryIndex.build(b0.toDF("value", "key"), "value", "key", seg, files = 2)
    SecondaryIndex.appendSegment(b1.toDF("value", "key"), "value", "key", seg)
    SecondaryIndex.appendSegment(b2.toDF("value", "key"), "value", "key", seg)
    SecondaryIndex.build(all.toDF("value", "key"), "value", "key", full, files = 2)

    def readPaths(path: String): (Set[Long], Set[Long], Long) = (
      SecondaryIndex.lookupKeys(SparkT.spark, path, Seq(25L, 60L))
        .as[Long].collect().toSet,
      SecondaryIndex.lookupRangeKeys(SparkT.spark, path, Some(10L), Some(45L))
        .as[Long].collect().toSet,
      SecondaryIndex.calcCount(SparkT.spark, path, Seq(25L)))

    // segmented reads == canonical reads, immediately after append
    assert(readPaths(seg) === readPaths(full))
    // the check's canonical-layout invariant correctly flags segment overlap
    val segReport = IndexCheck.check(SparkT.spark, seg)
    assert(segReport.issues.exists(_.contains("duplicate (value, chunk)")),
      segReport.issues)
    // ... and fact reconciliation still holds on the segmented dir
    assert(!segReport.issues.exists(_.contains("disagree with fact")),
      segReport.issues)

    // OPTIMIZE: compact restores the canonical layout bit-for-bit
    SecondaryIndex.compact(SparkT.spark, seg, files = 2)
    assert(readPaths(seg) === readPaths(full))
    val r = IndexCheck.check(SparkT.spark, seg,
      fact = Some((all.toDF("value", "key"), "value", "key")))
    assert(r.ok, r.issues.mkString("; "))
    val canon = SparkT.spark.read.parquet(full)
      .select("value", "chunk", "cnt", "rowids").collect()
      .map(_.toSeq).toSet
    val compacted = SparkT.spark.read.parquet(seg)
      .select("value", "chunk", "cnt", "rowids").collect()
      .map(_.toSeq).toSet
    assert(compacted === canon)
  }

  test("semiJoin restores exactly the filtered fact rows") {
    val keys = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("sparse"))
    val fact = df.withColumnRenamed("key", "fk")
    val got = SecondaryIndex.semiJoin(fact, "fk", keys)
    assert(got.count() === 50)
    assert(got.filter(col("value") =!= "sparse").count() === 0)
  }
}
