package graft.relational

import graft.{GenCheck, SparkT}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** EventTime normalization + representation-polymorphism of the event-time
  * operators: the same instants stored as TIMESTAMP, TIMESTAMP_NTZ (what
  * Parquet `timestamp[us]` reads as) or epoch-nanos longs must produce
  * IDENTICAL results through as-of join, band join and stream windows —
  * the r11 testdata regeneration proved a single hard-coded representation
  * breaks the whole surface at once (VERDICT r11 §next-round 1-2). */
class EventTimeSpec extends AnyFunSuite with GenCheck {

  import SparkT.spark
  import spark.implicits._

  // One set of micro-precision instants (micros `m`, possibly negative —
  // pre-epoch wall clocks must bucket/order identically too), rendered in
  // all three column representations. The long column carries m*1000 nanos,
  // so every representation normalizes to the same epoch nanos.
  private def reps(rows: Seq[(Long, Long, Long, Long)])
      : Seq[(String, DataFrame)] = {
    val base = rows.toDF("id", "key", "m", "v")
    Seq(
      "long_nanos" -> base.withColumn("ts", col("m") * lit(1000L)),
      "timestamp" -> base.withColumn("ts", timestamp_micros(col("m"))),
      "ntz" -> base.withColumn("ts",
        timestamp_micros(col("m")).cast(TimestampNTZType))
    ).map { case (n, df) => n -> df.drop("m") }
  }

  private val rowsGen = for {
    n <- Gen.choose(0, 50)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 3L)
      m <- Gen.choose(-40L, 40L)
      v <- Gen.choose(-100L, 100L)
    } yield (key, m, v))
  } yield rows.zipWithIndex.map { case ((k, m, v), i) => (i.toLong, k, m, v) }

  test("epochNanos / epochMicros / asTimestamp agree across representations") {
    val rows = Seq((0L, 0L, -7L, 0L), (1L, 0L, 0L, 0L), (2L, 0L, 1234L, 0L))
    val expectNanos = rows.map { case (_, _, m, _) => m * 1000L }
    val expectMicros = rows.map { case (_, _, m, _) => m }
    for ((name, df) <- reps(rows)) {
      val ns = df.orderBy("id").select(EventTime.epochNanos(df, "ts")).as[Long].collect().toSeq
      val us = df.orderBy("id").select(EventTime.epochMicros(df, "ts")).as[Long].collect().toSeq
      assert(ns == expectNanos, s"epochNanos($name)")
      assert(us == expectMicros, s"epochMicros($name)")
      val tsDf = df.select(EventTime.asTimestamp(df, "ts").as("t"))
      assert(tsDf.schema("t").dataType == TimestampType, s"asTimestamp($name)")
      assert(tsDf.select(unix_micros(col("t"))).as[Long].collect().toSeq.sorted
        == expectMicros.sorted, s"asTimestamp micros ($name)")
    }
  }

  test("epochNanos truncation: integral input passes through, never floats") {
    // 2^53+1 nanos is unrepresentable in double; exact long math must keep it.
    val big = (1L << 53) + 1L
    val df = Seq(Tuple1(big)).toDF("ts")
    assert(df.select(EventTime.epochNanos(df, "ts")).as[Long].head() == big)
    assert(df.select(EventTime.epochMicros(df, "ts")).as[Long].head() == big / 1000L)
  }

  test("pre-epoch integral nanos FLOOR to micros — agreeing with unix_micros") {
    // -1 ns lives in microsecond -1 (the floor), not 0 (the truncation);
    // unix_micros of the corresponding timestamp floors the same way
    val df = Seq((-1L, -999L, -1000L, -1001L, 1001L)).toDF("a", "b", "c", "d", "e")
    def us(c: String) =
      df.select(EventTime.epochMicros(df, c)).as[Long].head()
    assert(us("a") == -1L)
    assert(us("b") == -1L)
    assert(us("c") == -1L)
    assert(us("d") == -2L)
    assert(us("e") == 1L)
    // asTimestamp lands on the same flooring
    assert(df.select(unix_micros(EventTime.asTimestamp(df, "d")))
      .as[Long].head() == -2L)
    // the floor form must not overflow at the bottom of the long range
    // (a subtraction-based floor would wrap for x within 999 of MinValue)
    val edge = Seq(Tuple1(Long.MinValue + 1L)).toDF("ts")
    assert(edge.select(EventTime.epochMicros(edge, "ts")).as[Long].head() ==
      Long.MinValue / 1000L - 1L)
  }

  test("non-time column is rejected fast with a typed message") {
    val df = Seq(Tuple1("x")).toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.epochNanos(df, "ts"))
    assert(e.getMessage.contains("event-time"))
  }

  test("band join: identical neighbor counts over all three representations") {
    forAll(rowsGen, n = 12) { rows =>
      val width = 7000L // nanos = 7 micros
      val results = reps(rows).map { case (name, df) =>
        name -> RangeJoin.selfNeighborCounts(df, "id", "ts", width)
          .as[(Long, Long)].collect().toMap
      }
      val (refName, ref) = results.head
      for ((name, got) <- results.tail)
        assert(got == ref, s"$name != $refName rows=$rows")
    }
  }

  test("asof join: identical matches over all three representations") {
    forAll(Gen.zip(rowsGen, rowsGen), n = 12) { case (lRows, rRows) =>
      val results = for {
        ((_, l), (name, r)) <- reps(lRows).zip(reps(rRows))
      } yield {
        val j = AsofJoin.backward(l, r, "key", "key", "ts", "ts", "id",
          payload = Seq("v"))
        name -> j.select(col("id"),
            EventTime.epochMicros(j, "asof_ts").as("am"), col("asof_v"))
          .collect()
          .map(rr => (rr.getLong(0),
            if (rr.isNullAt(1)) None else Some((rr.getLong(1), rr.getLong(2)))))
          .toMap
      }
      val (refName, ref) = results.head
      for ((name, got) <- results.tail)
        assert(got == ref, s"$name != $refName L=$lRows R=$rRows")
    }
  }

  test("batch stream-transform replay: identical windows over representations") {
    val rows = Seq(
      (0L, 1L, 1000000L, 10L), (1L, 1L, 3000000L, 20L),
      (2L, 2L, 12000000L, 5L), (3L, 1L, 61000000L, 1L))
    val results = reps(rows).map { case (name, df) =>
      val ev = df.withColumnRenamed("key", "user_id")
        .withColumn("event_type", concat(lit("t"), pmod(col("id"), lit(2))))
        .withColumn("value", col("v").cast("double"))
      name -> graft.streaming.EventStreams
        .windowedCounts(ev, "10 seconds", "0 seconds")
        .select(unix_micros(col("w_start")), col("event_type"), col("n"),
          col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
    }
    val (refName, ref) = results.head
    assert(ref.nonEmpty)
    for ((name, got) <- results.tail) assert(got == ref, s"$name != $refName")
  }
}
