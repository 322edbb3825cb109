package graft.index

import graft.SparkT
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CheckSecondaryIndex analog: a healthy index passes; each layout
  * invariant, corrupted in isolation, is caught by name. */
class IndexCheckSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private lazy val (dir: String, fact: DataFrame) = {
    val d = Files.createTempDirectory("graft-icheck").resolve("idx").toString
    val rows = (0 until 4000).map(i => (s"v${i % 5}", i.toLong))
    val df = rows.toDF("value", "key")
    SecondaryIndex.build(df, "value", "key", d, files = 3)
    (d, df)
  }

  private def corrupt(mutate: DataFrame => DataFrame): String = {
    val out = Files.createTempDirectory("graft-icheck-bad").resolve("idx").toString
    mutate(SparkT.spark.read.parquet(dir))
      .write.mode("overwrite").parquet(out)
    out
  }

  test("healthy index passes, including fact reconciliation") {
    val r = IndexCheck.check(SparkT.spark, dir,
      fact = Some((fact, "value", "key")))
    assert(r.ok, r.issues.mkString("; "))
    assert(r.keys === 4000)
    assert(r.chunks > 0)
  }

  test("a NULL-chunk posting row is REPORTED, not an NPE; null-key builds refuse (r19 review)") {
    // a null chunk is exactly the shape a null-rowid build used to
    // produce — the checker must render it in the sample, not crash
    val bad = corrupt(df => df.unionByName(
      df.limit(1).select(lit("vX").as("value"),
        lit(null).cast("long").as("chunk"), lit(3L).as("cnt"),
        expr("array()").cast("array<long>").as("rowids"),
        lit(null).cast("long").as("chunk_min"),
        lit(null).cast("long").as("chunk_max"))))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(!r.ok)
    assert(r.issues.exists(_.contains("null")), r.issues)
    // and the build path now refuses the null key up front
    val d2 = Files.createTempDirectory("graft-icheck-nk").resolve("i").toString
    val nullKey = Seq(("v0", Option(1L)), ("v1", Option.empty[Long]))
      .toDF("value", "key")
    val ex = intercept[Exception] {
      SecondaryIndex.build(nullKey, "value", "key", d2)
    }
    assert(ex.getMessage != null && (ex.getMessage.contains("NULL key") ||
      ex.getMessage.contains("NULL")), ex.getMessage)
    // a NON-CASTABLE key (garbage string) try_casts to null — the
    // post-cast guard must refuse it too instead of silently building a
    // corrupt index (ADVICE r19: the pre-cast guard waved it through)
    val d3 = Files.createTempDirectory("graft-icheck-gk").resolve("i").toString
    val garbageKey = Seq(("v0", "1"), ("v1", "not-a-number"))
      .toDF("value", "key")
    val ex2 = intercept[Exception] {
      SecondaryIndex.build(garbageKey, "value", "key", d3)
    }
    assert(ex2.getMessage != null &&
      ex2.getMessage.contains("non-castable"), ex2.getMessage)
  }

  test("DELETE flow: stale index caught by reconciliation, green and exact after deleteKeys (r20)") {
    val base = Files.createTempDirectory("graft-icheck-del")
    val idx = base.resolve("i").toString
    val factAll = (0L until 4000L).map(k => (s"v${k % 4}", k))
      .toDF("value", "key")
    SecondaryIndex.build(factAll, "value", "key", idx)
    val kept = factAll.filter(col("key") % 10 =!= 3)
    // the fact rewrite deleted a tenth of the rows; the untouched index
    // still posts their keys — reconciliation must flag the window
    val stale = IndexCheck.check(SparkT.spark, idx,
      fact = Some((kept, "value", "key")))
    assert(!stale.ok, "stale index passed reconciliation")
    // maintain: subtract exactly the deleted keys (postings subtraction,
    // rename-swap committed — never a fact re-scan)
    SecondaryIndex.deleteKeys(SparkT.spark, idx,
      factAll.filter(col("key") % 10 === 3).select(col("key")), "key")
    val after = IndexCheck.check(SparkT.spark, idx,
      fact = Some((kept, "value", "key")))
    assert(after.ok, after.issues.mkString("; "))
    // lookups and index-only counts serve exactly the survivors
    val got = SecondaryIndex.lookupKeys(SparkT.spark, idx, Seq("v1"))
      .as[Long].collect().toSet
    val want = kept.filter(col("value") === "v1").select(col("key"))
      .as[Long].collect().toSet
    assert(got === want)
    assert(SecondaryIndex.calcCount(SparkT.spark, idx, Seq("v1")) ===
      want.size.toLong)
  }

  test("cnt != len(rowids) is caught") {
    val bad = corrupt(_.withColumn("cnt",
      when(col("chunk") === 0 && col("value") === "v0", col("cnt") + 1)
        .otherwise(col("cnt"))))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(r.issues.exists(_.contains("cnt != len(rowids)")), r.issues)
  }

  test("unsorted / duplicated rowids are caught") {
    val bad = corrupt(_.withColumn("rowids",
      when(col("chunk") === 1 && col("value") === "v1", reverse(col("rowids")))
        .otherwise(col("rowids"))))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(r.issues.exists(_.contains("not strictly ascending")), r.issues)
  }

  test("wrong chunk_min/chunk_max stats are caught (the seek would skip postings)") {
    val bad = corrupt(_.withColumn("chunk_max",
      when(col("chunk") === 2 && col("value") === "v2", col("chunk_max") - 1)
        .otherwise(col("chunk_max"))))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(r.issues.exists(_.contains("chunk_min/chunk_max disagree")), r.issues)
  }

  test("a rowid outside its chunk window is caught") {
    val bad = corrupt(_.withColumn("rowids",
      when(col("chunk") === 0 && col("value") === "v3",
        concat(col("rowids"), array(lit(999999L))))
        .otherwise(col("rowids"))))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(r.issues.exists(_.contains("outside its chunk's key window")), r.issues)
    // the appended rowid also breaks cnt == len and the max stat
    assert(r.issues.exists(_.contains("cnt != len(rowids)")), r.issues)
  }

  test("duplicate (value, chunk) posting rows are caught") {
    val bad = corrupt(d => d.union(d.filter(col("chunk") === 1 && col("value") === "v4")))
    val r = IndexCheck.check(SparkT.spark, bad)
    assert(r.issues.exists(_.contains("duplicate (value, chunk)")), r.issues)
    // the duplicated keys also violate global key uniqueness
    assert(r.issues.exists(_.contains("key in multiple postings")), r.issues)
  }

  test("a stale index (fact rewritten) is caught by reconciliation") {
    val staleFact = fact.filter(col("key") < 3000)
    val r = IndexCheck.check(SparkT.spark, dir,
      fact = Some((staleFact, "value", "key")))
    assert(r.issues.exists(_.contains("disagree with fact table")), r.issues)
  }

  test("unreadable / non-index tables produce issues, not exceptions") {
    assert(!IndexCheck.check(SparkT.spark, "/nonexistent/idx").ok)
    val notIdx = Files.createTempDirectory("graft-icheck-n").resolve("t").toString
    Seq((1, "a")).toDF("x", "y").write.parquet(notIdx)
    val r = IndexCheck.check(SparkT.spark, notIdx)
    assert(r.issues.exists(_.contains("missing index columns")), r.issues)
  }

  test("an MVA index over arrays containing NULL elements passes invariant " +
      "6 (the NULL-value posting group counts, r18 review)") {
    val d = java.nio.file.Files.createTempDirectory("graft-icknull")
      .resolve("idx").toString
    val df = Seq(
      (1L, Seq[java.lang.Long](10L, null)),
      (2L, Seq[java.lang.Long](10L, 20L)),
      (3L, Seq[java.lang.Long](null))).toDF("id", "vals")
    SecondaryIndex.buildMva(df, "vals", "id", d)
    val r = IndexCheck.check(SparkT.spark, d, mva = true)
    assert(r.ok, r.issues.mkString("; "))
  }
}
