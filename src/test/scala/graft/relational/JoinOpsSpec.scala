package graft.relational

import graft.{GenCheck, SparkT}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** As-of and banded range joins vs brute-force row evaluation on random
  * data — the engine plan (union+window / bucket join) must agree with the
  * O(n²) definition, including ties and no-match rows. */
class JoinOpsSpec extends AnyFunSuite with GenCheck {

  import SparkT.spark
  import spark.implicits._

  // Timestamps span negative values: floor-division bucketing must stay
  // complete around the origin (plain `div` truncation made bucket 0
  // double-width there — ADVICE r4).
  private val rowsGen = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 3L)
      ts <- Gen.choose(-40L, 40L)
      v <- Gen.choose(-100L, 100L)
    } yield (key, ts, v))
  } yield rows.zipWithIndex.map { case ((k, ts, v), i) => (i.toLong, k, ts, v) }

  test("asof backward matches brute force (ties: <=, greatest ts, greatest id)") {
    forAll(Gen.zip(rowsGen, rowsGen), n = 25) { case (lRows, rRows) =>
      val left = lRows.toDF("id", "key", "ts", "v")
      val right = rRows.toDF("id", "key", "ts", "v")
      val got = AsofJoin.backward(left, right, "key", "key", "ts", "ts",
          "id", payload = Seq("v"))
        .select("id", "asof_ts", "asof_v")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val want = lRows.map { case (lid, lk, lts, _) =>
        val cands = rRows.filter { case (_, rk, rts, _) => rk == lk && rts <= lts }
        val best = cands.sortBy { case (rid, _, rts, _) => (rts, rid) }.lastOption
        lid -> best.map { case (_, _, rts, rv) => (rts, rv) }
      }.toMap
      assert(got == want, s"L=$lRows R=$rRows")
    }
  }

  test("asof forward matches brute force (>=, smallest ts, greatest id)") {
    forAll(Gen.zip(rowsGen, rowsGen), n = 25) { case (lRows, rRows) =>
      val left = lRows.toDF("id", "key", "ts", "v")
      val right = rRows.toDF("id", "key", "ts", "v")
      val got = AsofJoin.forward(left, right, "key", "key", "ts", "ts",
          "id", payload = Seq("v"))
        .select("id", "asof_ts", "asof_v")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val want = lRows.map { case (lid, lk, lts, _) =>
        val cands = rRows.filter { case (_, rk, rts, _) => rk == lk && rts >= lts }
        // smallest ts wins; among equal smallest ts, greatest id
        val best = cands.sortBy { case (rid, _, rts, _) => (-rts, rid) }.lastOption
        lid -> best.map { case (_, _, rts, rv) => (rts, rv) }
      }.toMap
      assert(got == want, s"L=$lRows R=$rRows")
    }
  }

  test("asof nearest picks the smaller |dt|, exact ties backward") {
    forAll(Gen.zip(rowsGen, rowsGen), n = 25) { case (lRows, rRows) =>
      val left = lRows.toDF("id", "key", "ts", "v")
      val right = rRows.toDF("id", "key", "ts", "v")
      val got = AsofJoin.nearest(left, right, "key", "key", "ts", "ts",
          "id", "id", payload = Seq("v"))
        .select("id", "asof_ts", "asof_v")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val want = lRows.map { case (lid, lk, lts, _) =>
        val back = rRows.filter { case (_, rk, rts, _) => rk == lk && rts <= lts }
          .sortBy { case (rid, _, rts, _) => (rts, rid) }.lastOption
        val fwd = rRows.filter { case (_, rk, rts, _) => rk == lk && rts >= lts }
          .sortBy { case (rid, _, rts, _) => (-rts, rid) }.lastOption
        val best = (back, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (lts - b._3 <= f._3 - lts) Some(b) else Some(f)
        }
        lid -> best.map { case (_, _, rts, rv) => (rts, rv) }
      }.toMap
      assert(got == want, s"L=$lRows R=$rRows")
    }
  }

  test("interval join matches brute force containment, outsized intervals included") {
    val ivGen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0L, 3L)
        lo <- Gen.choose(-40L, 40L)
        len <- Gen.choose(-3L, 25L) // negative → empty interval
      } yield (key, lo, lo + len))
    } yield rows.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }
    forAll(Gen.zip(rowsGen, ivGen), n = 25) { case (pRows, ivRows) =>
      val points = pRows.toDF("id", "key", "ts", "v")
      val ivs = ivRows.toDF("iid", "ikey", "lo", "hi")
      // typicalLen 8 < max interval length 25: outsized intervals explode
      // more buckets but must still match exactly
      val got = RangeJoin.intervalJoin(points, ivs, "ts", "lo", "hi",
          typicalLen = 8L, pointKey = Some("key"), intervalKey = Some("ikey"))
        .select($"id", $"iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, pk, pts, _) <- pRows
        (iid, ik, lo, hi) <- ivRows
        if ik == pk && pts >= lo && pts <= hi
      } yield (pid, iid)).toSet
      assert(got === want, s"P=$pRows I=$ivRows")
      // keyless form: same containment without the key conjunct
      val gotAll = RangeJoin.intervalJoin(points, ivs, "ts", "lo", "hi", 8L)
        .select($"id", $"iid").as[(Long, Long)].collect().toSet
      val wantAll = (for {
        (pid, _, pts, _) <- pRows
        (iid, _, lo, hi) <- ivRows
        if pts >= lo && pts <= hi
      } yield (pid, iid)).toSet
      assert(gotAll === wantAll)
    }
  }

  test("band join matches brute force |dt| <= width exactly once per pair") {
    forAll(rowsGen, n = 25) { rows =>
      val df = rows.toDF("id", "key", "ts", "v")
      val width = 7L
      val got = RangeJoin.selfNeighborCounts(df, "id", "ts", width)
        .as[(Long, Long)].collect().toMap
      val want = rows.map { case (aid, _, ats, _) =>
        aid -> rows.count { case (bid, _, bts, _) =>
          bid != aid && math.abs(ats - bts) <= width }.toLong
      }.filter(_._2 > 0).toMap
      assert(got == want, s"rows=$rows")
    }
  }

  test("asof rejects a non-integral rightId tiebreak column (fail fast)") {
    val left = Seq((1L, 1L, 10L)).toDF("id", "key", "ts")
    val right = Seq(("x", 1L, 5L)).toDF("sid", "key", "ts")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, "key", "key", "ts", "ts", "sid")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("asof plan shape: one shuffle window, no join operator") {
    val left = Seq((1L, 1L, 10L, 0L)).toDF("id", "key", "ts", "v")
    val right = Seq((2L, 1L, 5L, 9L)).toDF("id", "key", "ts", "v")
    val p = AsofJoin.backward(left, right, "key", "key", "ts", "ts", "id")
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.toLowerCase.contains("join"), p)
  }

  test("band join plan shape: hash join on bucket, never cartesian") {
    val df = Seq((1L, 1L, 10L, 0L), (2L, 2L, 12L, 0L)).toDF("id", "key", "ts", "v")
    val p = RangeJoin.selfNeighborCounts(df, "id", "ts", 7L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("open intervals ending at a far-future TIMESTAMP sentinel join " +
      "exactly, bounded by the points' range (r18 review)") {
    // valid_to = 9999-12-31: pre-fix the micros*1000 wrapped NEGATIVE and
    // the interval silently dropped; with saturation alone the bucket
    // explode would generate ~1e15 rows -- the points-range clamp keeps
    // it exact AND bounded
    val ts = java.sql.Timestamp.valueOf("2026-01-15 12:00:00")
    val points = Seq((1L, ts),
      (2L, java.sql.Timestamp.valueOf("2026-06-01 00:00:00")))
      .toDF("id", "ts")
    val ivs = Seq(
      (10L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("9999-12-31 00:00:00")), // open
      (11L, java.sql.Timestamp.valueOf("2026-05-01 00:00:00"),
        java.sql.Timestamp.valueOf("9999-12-31 00:00:00")), // open, later
      (12L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2020-06-01 00:00:00"))) // closed, misses
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(points, ivs, "ts", "lo", "hi",
        typicalLen = 24L * 3600 * 1000000000L) // 1-day buckets
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L)))
    // pre-epoch + sentinel lo: clamped below too
    val ivs2 = Seq((20L, java.sql.Timestamp.valueOf("1677-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("9999-12-31 00:00:00"))).toDF("iid", "lo", "hi")
    val got2 = RangeJoin.intervalJoin(points, ivs2, "ts", "lo", "hi",
        typicalLen = 24L * 3600 * 1000000000L)
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    assert(got2 === Set((1L, 20L), (2L, 20L)))
  }

  test("bucket floors exactly at the Long extremes (no subtraction " +
      "overflow, r18 review)") {
    val w = 1000L
    val vals = Seq(Long.MinValue, Long.MinValue + 1, -1001L, -1000L, -1L,
      0L, 999L, Long.MaxValue)
    val got = vals.toDF("v")
      .select(RangeJoin.bucket("v", w).as("b")).as[Long].collect().toSeq
    assert(got === vals.map(v => Math.floorDiv(v, w)))
  }

  test("asof NULL timestamps: null-ts right rows never phantom-match, null-ts left rows emit null (r19 review)") {
    // right row id=7 has a NULL ts — under asc (backward) ordering it
    // sorted to the partition HEAD and last(ignoreNulls) handed its
    // payload to left rows with no real match
    val left = Seq((1L, 0L, Option(5L), 10L), (2L, 0L, Option(100L), 11L),
        (3L, 0L, Option.empty[Long], 12L))
      .toDF("id", "key", "ts", "v")
    val right = Seq((7L, 0L, Option.empty[Long], 777L),
        (8L, 0L, Option(50L), 888L))
      .toDF("id", "key", "ts", "v")
    val b = AsofJoin.backward(left, right, "key", "key", "ts", "ts", "id",
        payload = Seq("v"))
      .select("id", "asof_ts", "asof_v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(2)))).toMap
    assert(b(1L) === None, "left ts=5 precedes every real right row")
    assert(b(2L) === Some(888L))
    assert(b(3L) === None, "a null-ts left row has no as-of position")
    // forward: desc ordering sorted the null-ts LEFT row to the END,
    // where it inherited the last payload as a phantom match
    val f = AsofJoin.forward(left, right, "key", "key", "ts", "ts", "id",
        payload = Seq("v"))
      .select("id", "asof_ts", "asof_v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(2)))).toMap
    assert(f(1L) === Some(888L))
    assert(f(2L) === None, "left ts=100 follows every real right row")
    assert(f(3L) === None)
    val n = AsofJoin.nearest(left, right, "key", "key", "ts", "ts", "id",
        "id", payload = Seq("v"))
      .select("id", "asof_ts", "asof_v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(2)))).toMap
    assert(n(1L) === Some(888L) && n(2L) === Some(888L) && n(3L) === None)
  }

  test("asof nearest: sentinel-extreme timestamps cannot overflow the distance compare (r19 review)") {
    // right holds a genuine match at ts=0 and a far-future open-interval
    // sentinel; the left instant is negative, so a raw long subtraction
    // MaxValue - (-1000) wraps negative and the sentinel would win
    val left = Seq((1L, 0L, -1000L, 0L)).toDF("id", "key", "ts", "v")
    val right = Seq((10L, 0L, 0L, 111L), (11L, 0L, Long.MaxValue, 222L))
      .toDF("id", "key", "ts", "v")
    val got = AsofJoin.nearest(left, right, "key", "key", "ts", "ts",
        "id", "id", payload = Seq("v"))
      .select("asof_v").head()
    assert(got.getLong(0) === 111L,
      "the ts=0 row is 1000 nanos away; the sentinel is ~2^63")
  }

  test("asof fails fast on output-name collisions (r18 review)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "asof_note")
    val right = Seq((1L, 5L, 100L, "p")).toDF("k", "ts", "rid", "note")
    // left already carries an asof_* output name
    val e1 = intercept[IllegalArgumentException](
      AsofJoin.backward(left, right, "k", "k", "ts", "ts", "rid",
        payload = Seq("note")))
    assert(e1.getMessage.contains("asof_note"))
    // payload column named like the right ts -> duplicate asof_ts
    val l2 = Seq((1L, 10L)).toDF("k", "lts")
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.backward(l2, right, "k", "k", "lts", "ts", "rid",
        payload = Seq("ts")))
    assert(e2.getMessage.contains("asof_ts"))
  }
}
