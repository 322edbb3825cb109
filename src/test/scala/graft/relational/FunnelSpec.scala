package graft.relational

import graft.SparkT
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel + retention over the events surface (§"beyond the reference"). */
class FunnelSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  /** (user, micros, type) rows as a TimestampType frame. */
  private def tsDf(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  /** Same rows with ts as an integral epoch-NANOS column. */
  private def nsDf(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.map { case (u, us, et) => (u, us * 1000L, et) }
      .toDF("user_id", "ts", "event_type")

  test("greedy earliest chain: order matters, same-micro events do not chain") {
    val rows = Seq(
      // user 1 completes: a@10, b@20, c@30
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2: b precedes every a — no chain
      (2L, 5L, "b"), (2L, 10L, "a"), (2L, 30L, "c"),
      // user 3: b at the SAME micro as a — strict > refuses it; the later
      // b@25 chains instead, and c must follow THAT
      (3L, 10L, "a"), (3L, 10L, "b"), (3L, 25L, "b"), (3L, 20L, "c"),
      // user 4: greedy takes earliest a@1 even though the a@15 chain would
      // also work; b@18, c@19 follow either way
      (4L, 1L, "a"), (4L, 15L, "a"), (4L, 18L, "b"), (4L, 19L, "c"))
    val out = Funnel.earliestChain(tsDf(rows), "user_id", "ts",
        "event_type", Seq("a", "b", "c"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 10L, 20L, 30L), (4L, 1L, 18L, 19L)))
  }

  test("within window is inclusive of the boundary") {
    val rows = Seq(
      (1L, 0L, "a"), (1L, 50L, "b"),   // span exactly 50
      (2L, 0L, "a"), (2L, 51L, "b"))   // span 51
    val at50 = Funnel.earliestChain(tsDf(rows), "user_id", "ts",
        "event_type", Seq("a", "b"), withinMicros = Some(50L))
      .select("user_id").as[Long].collect().toSeq
    assert(at50 === Seq(1L))
    intercept[IllegalArgumentException](Funnel.earliestChain(tsDf(rows),
      "user_id", "ts", "event_type", Seq("a")))
    intercept[IllegalArgumentException](Funnel.earliestChain(tsDf(rows),
      "user_id", "ts", "event_type", Seq("a", "a")))
  }

  test("timestamp and epoch-long representations produce identical funnels") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 3000).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100000).toLong,
        Seq("a", "b", "c", "x")(rnd.nextInt(4)))
    }
    def run(df: DataFrame) = Funnel.earliestChain(df, "user_id", "ts",
        "event_type", Seq("a", "b", "c"), withinMicros = Some(50000L))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(tsDf(rows)) === run(nsDf(rows)))

    // brute-force twin of the greedy chain
    val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
      def after(t: Long, et: String): Option[Long] =
        evs.filter(e => e._3 == et && e._2 > t).map(_._2).minOption
      evs.filter(_._3 == "a").map(_._2).minOption.flatMap { t1 =>
        after(t1, "b").flatMap(t2 => after(t2, "c").map(t3 => (u, t1, t2, t3)))
      }.filter { case (_, t1, _, t3) => t3 - t1 <= 50000L }
    }.toSet
    assert(run(tsDf(rows)) === want)
  }

  test("funnels generalize past three steps") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))   // no d
    val out = Funnel.earliestChain(tsDf(rows), "user_id", "ts",
        "event_type", Seq("a", "b", "c", "d"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 2L, 3L, 4L)))
  }

  test("conversion summary counts chain prefixes; window gates only full completions") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),  // completes fast
      (2L, 10L, "a"), (2L, 20L, "b"), (2L, 999L, "c"), // c outside window
      (3L, 10L, "a"),                                  // stops at a
      (4L, 5L, "b"))                                   // never starts
    val got = Funnel.conversion(tsDf(rows), "user_id", "ts", "event_type",
        Seq("a", "b", "c"), withinMicros = Some(100L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("retention cohorts by first day and counts each user-day once") {
    val day = 86400000000L
    val rows = Seq(
      // u1 first seen day 0, active days 0 (twice — counts once), 2
      (1L, 10L, "x"), (1L, 999L, "x"), (1L, 2 * day + 5L, "x"),
      // u2 first seen day 0, active day 0 only
      (2L, day - 1L, "x"),
      // u3 first seen day 2, active days 2 and 3
      (3L, 2 * day, "x"), (3L, 3 * day + 7L, "x"))
    val got = Funnel.retention(tsDf(rows), "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 2L), (0L, 2L, 1L), (2L, 0L, 1L), (2L, 1L, 1L)))
    // representation-polymorphic like the funnel
    val viaNs = Funnel.retention(nsDf(rows), "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaNs === got)
  }

  test("funnel plan: each step aggregates only its own events, joined on the user key") {
    val rows = Seq((1L, 10L, "a"), (1L, 20L, "b"))
    val plan = Funnel.earliestChain(tsDf(rows), "user_id", "ts",
      "event_type", Seq("a", "b")).queryExecution.optimizedPlan.toString
    // no whole-history window operator anywhere — aggregates + a
    // user-keyed join only (the step filters constant-fold into the
    // local fixture here; on a file source they reach PushedFilters)
    assert(!plan.toLowerCase.contains("window"), plan)
    assert(plan.contains("Join Inner"), plan)
    assert("Aggregate \\[".r.findAllIn(plan).size === 2, plan)
  }

  test("conversion rejects a non-positive window like earliestChain (r18 review)") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Funnel.conversion(df, "user_id", "ts", "event_type", Seq("a", "b"),
        withinMicros = Some(-1L)))
    intercept[IllegalArgumentException](
      Funnel.conversion(df, "user_id", "ts", "event_type", Seq("a", "b"),
        withinMicros = Some(0L)))
  }
}
