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
}
