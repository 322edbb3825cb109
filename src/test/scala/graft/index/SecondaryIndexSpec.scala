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

  test("lookup key stream has no dedup aggregation and no extra exchange") {
    // Keys are unique by layout invariant 6, so postingsToKeys carries no
    // defensive distinct (VERDICT r8: it doubled a broad lookup's shuffle
    // volume at scale). Pin the plan: no aggregate anywhere, no shuffle at
    // all in the key stream (scan → chunk-prune → explode).
    val lk = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("hot"))
    val aggs = lk.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      case d: org.apache.spark.sql.catalyst.plans.logical.Distinct => d
    }
    assert(aggs.isEmpty, lk.queryExecution.optimizedPlan.toString)
    val exchanges = lk.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, lk.queryExecution.executedPlan.toString)
  }

  test("reads fall back to <path>_old inside compact's rename window (ADVICE r8)") {
    val tmp = Files.createTempDirectory("graft-sidx-old")
    val d = tmp.resolve("idx").toString
    val rows = (0 until 500).map(i => (i.toLong % 7, i.toLong))
    SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
    val want = rows.filter(_._1 == 3L).map(_._2).toSet
    assert(SecondaryIndex.lookupKeys(SparkT.spark, d, Seq(3L))
      .as[Long].collect().toSet === want)
    // simulate a crash between compact's two renames: index lives at _old
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(SparkT.spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(d),
      new org.apache.hadoop.fs.Path(d + "_old")))
    // every read path still answers, from the backup
    assert(SecondaryIndex.lookupKeys(SparkT.spark, d, Seq(3L))
      .as[Long].collect().toSet === want)
    assert(SecondaryIndex.calcCount(SparkT.spark, d, Seq(3L)) === want.size.toLong)
    assert(SecondaryIndex.lookupRangeKeys(SparkT.spark, d, Some(3L), Some(3L))
      .as[Long].collect().toSet === want)
    // the next compact performs the actual restore + re-cluster
    SecondaryIndex.compact(SparkT.spark, d)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(d + "_old")))
    assert(SecondaryIndex.lookupKeys(SparkT.spark, d, Seq(3L))
      .as[Long].collect().toSet === want)
  }

  test("MVA index posts each set element; semi-join answers ANY filters (ref UINT32SET)") {
    val tmp = Files.createTempDirectory("graft-sidx-mva")
    val d = tmp.resolve("idx").toString
    // sets with overlap (a key under several values), duplicates inside one
    // array (build must dedup, ref builder sorts+dedups MVA sets), an empty
    // set and a NULL set (no postings — the empty-set convention)
    val rows: Seq[(Option[Seq[Long]], Long)] = Seq(
      (Some(Seq(1L, 2L, 3L)), 10L),
      (Some(Seq(2L, 2L, 4L)), 11L),
      (Some(Seq(5L)), 12L),
      (Some(Seq.empty[Long]), 13L),
      (None, 14L),
      (Some(Seq(1L, 5L)), 15L))
    val df = rows.toDF("tags", "key")
    SecondaryIndex.buildMva(df, "tags", "key", d)
    // a key may repeat across matched values; the semi-join dedups
    val keys = SecondaryIndex.lookupKeys(SparkT.spark, d, Seq(2L, 5L))
    val got = SecondaryIndex.semiJoin(df.withColumnRenamed("key", "k"), "k", keys)
      .select("k").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 12L, 15L))
    // single-value count is exact row count; multi-value counts occurrences
    assert(SecondaryIndex.calcCount(SparkT.spark, d, Seq(2L)) === 2L)
    assert(SecondaryIndex.calcCount(SparkT.spark, d, Seq(1L, 5L)) === 4L)
    // NOTNULL-via-index == non-empty set (the reference's F5 semantics)
    assert(SecondaryIndex.lookupNotNullKeys(SparkT.spark, d)
      .as[Long].collect().toSet === Set(10L, 11L, 12L, 15L))
    // integrity: per-(value, key) containment holds under mva = true ...
    val rep = IndexCheck.check(SparkT.spark, d,
      fact = Some((df, "tags", "key")), mva = true)
    assert(rep.ok, rep.issues.mkString("; "))
    // ... while the SCALAR invariant 6 correctly rejects the same dir
    // (keys legitimately appear under several values)
    assert(IndexCheck.check(SparkT.spark, d).issues
      .exists(_.contains("sum(cnt)")))
  }

  test("segment economics: pruning degrades with appends, fully restores after compact") {
    // The 100-TB maintenance story (VERDICT r8 #6): appends keep reads
    // correct but each segment adds files a selective lookup must consider;
    // compact restores the one-clustered-layout economy. Footer stats ARE
    // the pruning mechanism, so measure economy directly as the
    // estimateRange upper bound (rows of row groups intersecting the value).
    val rnd = new scala.util.Random(43)
    val all = (0 until 4000).map(i => (rnd.nextInt(50).toLong * 3, i.toLong))
    val batches = all.grouped(1000).toSeq
    val seg = Files.createTempDirectory("graft-sidx-econ").resolve("idx").toString
    SecondaryIndex.build(batches.head.toDF("value", "key"), "value", "key",
      seg, files = 2)
    val v = 60L
    def prunedEstimate: Long =
      graft.stats.Stats.estimateRange(seg, "value", v.toDouble, v.toDouble,
        SparkT.spark.sparkContext.hadoopConfiguration)
    def lookup: Set[Long] =
      SecondaryIndex.lookupKeys(SparkT.spark, seg, Seq(v)).as[Long].collect().toSet
    val canonicalEst = {
      // reference point: what the estimate looks like on a fresh canonical
      // build of batch 0 only (the same files=2 clustering)
      prunedEstimate
    }
    var correct = batches.head.filter(_._1 == v).map(_._2).toSet
    assert(lookup === correct)
    // appends: reads stay correct immediately, estimate (files to consider)
    // grows with each segment
    var lastEst = canonicalEst
    batches.tail.foreach { b =>
      SecondaryIndex.appendSegment(b.toDF("value", "key"), "value", "key", seg)
      correct ++= b.filter(_._1 == v).map(_._2).toSet
      assert(lookup === correct, "segmented read incorrect")
      val est = prunedEstimate
      assert(est >= lastEst, s"estimate shrank on append: $lastEst -> $est")
      lastEst = est
    }
    assert(lastEst > canonicalEst,
      s"appends did not degrade pruning economy ($canonicalEst -> $lastEst)")
    // segmented dir passes the relaxed integrity contract pre-compact
    val segRep = IndexCheck.check(SparkT.spark, seg,
      fact = Some((all.toDF("value", "key"), "value", "key")), segmented = true)
    assert(segRep.ok, segRep.issues.mkString("; "))
    // compact: canonical layout, economy restored to a fresh-build baseline
    SecondaryIndex.compact(SparkT.spark, seg, files = 2)
    assert(lookup === correct)
    val full = Files.createTempDirectory("graft-sidx-econ2").resolve("idx").toString
    SecondaryIndex.build(all.toDF("value", "key"), "value", "key", full, files = 2)
    val freshEst = graft.stats.Stats.estimateRange(full, "value",
      v.toDouble, v.toDouble, SparkT.spark.sparkContext.hadoopConfiguration)
    assert(prunedEstimate === freshEst,
      "compact did not restore fresh-build pruning economy")
    val rep = IndexCheck.check(SparkT.spark, seg,
      fact = Some((all.toDF("value", "key"), "value", "key")))
    assert(rep.ok, rep.issues.mkString("; "))
  }

  test("semiJoin restores exactly the filtered fact rows") {
    val keys = SecondaryIndex.lookupKeys(SparkT.spark, dir, Seq("sparse"))
    val fact = df.withColumnRenamed("key", "fk")
    val got = SecondaryIndex.semiJoin(fact, "fk", keys)
    assert(got.count() === 50)
    assert(got.filter(col("value") =!= "sparse").count() === 0)
  }

  test("reserved-word / special-character column names build and serve " +
      "(r18 review: the chunk expression is Column ops, not a SQL string)") {
    val d = Files.createTempDirectory("graft-sidx-rsv").resolve("idx").toString
    // "order" is a SQL reserved word; "key-id" cannot appear unquoted in
    // an expr() string -- both must build like any other column
    val base = (0L until 300L).map(i => (i % 3, i))
      .toDF("select", "order")
      .withColumn("key-id", col("order"))
    SecondaryIndex.build(base.select(col("select"), col("key-id")),
      "select", "key-id", d)
    val keys = SecondaryIndex.lookupKeys(SparkT.spark, d, Seq(1L))
    assert(keys.as[Long].collect().toSet ===
      (0L until 300L).filter(_ % 3 == 1).toSet)
  }
}
