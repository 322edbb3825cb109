package graft.tables

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-level join strategies: bucketed co-located joins (no shuffle) and
  * salted skew joins (same rows, spread hot keys). */
class LayoutSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("same-bucketed tables join without a shuffle exchange") {
    val spark = SparkT.spark
    val left = (1 to 5000).map(i => (i.toLong % 997, s"l$i")).toDF("k", "lv")
    val right = (1 to 3000).map(i => (i.toLong % 997, s"r$i")).toDF("k", "rv")
    Writer.writeBucketed(left, "b_left", Seq("k"), 8)
    Writer.writeBucketed(right, "b_right", Seq("k"), 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table("b_left").join(spark.table("b_right"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join still shuffled:\n" + plan)
      // sanity: result matches a plain (shuffling) join
      val expected = left.join(right, "k").count()
      assert(j.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("salted join returns exactly the unsalted join's rows under a hot key") {
    // 90% of the big side hits one key — the salted join must agree exactly.
    val big = (1 to 20000).map(i =>
      (if (i % 10 != 0) 7L else i.toLong % 50, i.toLong)).toDF("bk", "payload")
    val small = (0 until 50).map(i => (i.toLong, s"dim$i")).toDF("sk", "attr")
    val plain = big.join(small, col("bk") === col("sk"))
      .select("payload", "attr").as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "bk", "sk", parts = 8)
      .select("payload", "attr").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("z-ordered layout prunes files on EVERY z column; sortBy only on its own") {
    val spark = SparkT.spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder")
    val sortDir = tmp.resolve("bysort").toString
    val zDir = tmp.resolve("byz").toString
    // independent uniform grid: x = i div 256, y = i mod 256 over 64k rows
    val df = (0 until 65536).map(i =>
      (i.toLong, (i / 256).toLong, (i % 256).toLong)).toDF("id", "x", "y")
    Writer.write(df, sortDir, sortBy = Seq("x"), files = 16)
    Writer.writeZOrdered(df, zDir, Seq("x", "y"), files = 16)
    val catS = graft.stats.Stats.buildCatalog(spark, sortDir, Seq("x", "y"))
      .persist()
    val catZ = graft.stats.Stats.buildCatalog(spark, zDir, Seq("x", "y"))
      .persist()
    import graft.stats.Stats.pruneFiles
    // narrow x predicate: the x-sorted layout prunes to ~1 file; z-order
    // keeps the files whose x bit-planes overlap (ideal ≈ 16^(1-1/2) = 4;
    // RangePartitioner's sampled file boundaries can straddle bit
    // patterns, so allow a straddle margin — the claim is "prunes more
    // than half", not an exact cell count)
    assert(pruneFiles(catS, "x", 0, 15).count() <= 2)
    assert(pruneFiles(catZ, "x", 0, 15).count() <= 8)
    // narrow y predicate: the x-sorted layout prunes NOTHING (every file
    // spans all y); z-order still prunes most files
    assert(pruneFiles(catS, "y", 0, 15).count() === 16L)
    assert(pruneFiles(catZ, "y", 0, 15).count() <= 8)
    // correctness: the z-ordered copy holds exactly the input rows
    val got = spark.read.parquet(zDir).as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq)
    // string columns are not rank-sketchable: rejected loudly
    intercept[IllegalArgumentException] {
      Writer.writeZOrdered(Seq((1L, "s")).toDF("id", "s"),
        tmp.resolve("bad").toString, Seq("id", "s"))
    }
    catS.unpersist(); catZ.unpersist()
  }

  test("bloom-filtered write records real bloom filters in the parquet footer") {
    val spark = SparkT.spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom")
    val dir = tmp.resolve("t").toString
    // u is high-ndv and NOT the sort key: every row group spans its whole
    // range (zone maps useless), which is exactly the bloom's job
    val df = (0L until 20000L).map(i => (i, (i * 2654435761L) % 1000000L))
      .toDF("id", "u")
    Writer.write(df, dir, sortBy = Seq("id"), bloomFor = Seq("u"))
    val file = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = in.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size).map(cols.get)
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("u").getBloomFilterOffset >= 0,
        "no bloom filter recorded for 'u'")
      assert(byName("id").getBloomFilterOffset < 0,
        "unexpected bloom filter on the sort key")
      // and the filter actually answers membership
      val bloom = in.readBloomFilter(byName("u"))
      assert(bloom != null)
      val hit = bloom.findHash(bloom.hash(((5L * 2654435761L) % 1000000L)))
      assert(hit, "present value must hit the bloom")
    } finally in.close()
    // a non-parquet format refuses the option loudly
    intercept[IllegalArgumentException](Writer.write(df,
      tmp.resolve("o").toString, Seq("id"), format = "orc",
      bloomFor = Seq("u")))
  }

  test("hive-partitioned layout prunes whole directories at planning time") {
    val spark = SparkT.spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-hivepart")
    val dir = tmp.resolve("bypart").toString
    val df = (0 until 1000).map(i => (i.toLong, s"p${i % 4}", (i % 100).toLong))
      .toDF("id", "part", "v")
    Writer.writePartitioned(df, dir, partitionCols = Seq("part"),
      sortBy = Seq("id"), files = 8)
    // one directory per partition value
    val dirs = new java.io.File(dir).listFiles
      .map(_.getName).filter(_.startsWith("part=")).toSet
    assert(dirs === Set("part=p0", "part=p1", "part=p2", "part=p3"))
    val rd = spark.read.parquet(dir)
    val q = rd.filter($"part" === "p1" && $"v" < 50L)
    // the partition predicate becomes a PartitionFilter (planning-time
    // listing prune), not a data filter
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("part"), planStr)
    // every file actually read lives under the one matching directory
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("part=p1")), files.toSeq)
    // row parity with the unpartitioned frame, partition column typed back
    val got = q.select($"id", $"v").as[(Long, Long)].collect().toSet
    val want = df.filter($"part" === "p1" && $"v" < 50L)
      .select($"id", $"v").as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
    intercept[IllegalArgumentException](
      Writer.writePartitioned(df, tmp.resolve("bad2").toString, Nil))
  }

  test("zOrder refuses a bit budget past a signed long; saltedJoin refuses " +
      "non-positive parts (r18 review)") {
    val df = (0L until 10L).map(i => (i, i, i, i, i, i, i, i))
      .toDF("a", "b", "c", "d", "e", "f", "g", "h")
    val dir = java.nio.file.Files.createTempDirectory("layout-z").toString
    // 8 cols x 8 bits = 64 > 62: bit 63 is the SIGN bit (range sort
    // reversed) -- must refuse loudly, not cluster wrong
    intercept[IllegalArgumentException](
      Writer.writeZOrdered(df, dir, df.columns.toSeq, zBits = 8))
    // 7 x 8 = 56 fits (zBits stays at the bucket-fold-friendly default:
    // the per-column bucket expression is a 2^zBits-term chain, so large
    // zBits values are bounded by expression depth, not the bit budget)
    Writer.writeZOrdered(df.select("a", "b", "c", "d", "e", "f", "g"), dir,
      Seq("a", "b", "c", "d", "e", "f", "g"), zBits = 8)
    val big = (0L until 100L).map(i => (i, i % 3)).toDF("id", "k")
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("sk", "v")
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, "k", "sk", parts = 0))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, "k", "sk", parts = -4))
    // the admitted MAX must actually execute (r19 review: the range check
    // admitted zBits=16 whose 2M-node expression tree the implementation
    // could never compile) — codegen.fallback=false in tests makes any
    // Janino failure here fatal, so this pins executability at the cap
    val dir10 = java.nio.file.Files.createTempDirectory("layout-z10").toString
    Writer.writeZOrdered((0L until 200L).map(i => (i, i % 7, i % 11))
      .toDF("id", "x", "y"), dir10, Seq("x", "y"), zBits = 10, files = 2)
    assert(SparkT.spark.read.parquet(dir10).count() === 200)
    intercept[IllegalArgumentException](
      Writer.writeZOrdered(big, dir10, Seq("id", "k"), zBits = 11))
  }
}
