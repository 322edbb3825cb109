package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing + deterministic mixture sampling — the two
  * training-data preparation operators beyond the reference's own surface
  * (pipeline §"beyond the reference"). */
class PackMixSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("pack offsets: contiguous per-shard streams, budget-consistent chunk spans") {
    val rnd = new scala.util.Random(3)
    val docs = (0L until 500L).map(i => (i, i % 4, 1 + rnd.nextInt(100)))
      .toDF("id", "shard", "n_tok")
    val out = Pack.sequenceOffsets(docs, "n_tok", "shard", "id", budget = 64)
      .select($"id", $"shard", $"n_tok", $"start_tok", $"first_chunk", $"last_chunk")
      .as[(Long, Long, Int, Long, Long, Long)].collect()

    out.groupBy(_._2).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._1)
      // stream is contiguous: each doc starts where the previous ended
      inOrder.foldLeft(0L) { case (expectStart, (_, _, n, start, first, last)) =>
        assert(start === expectStart)
        assert(first === start / 64)
        assert(last === (start + n - 1) / 64)
        assert(first <= last && (last - first) <= (n / 64) + 1)
        start + n
      }
    }
  }

  test("pack drops zero-token documents and starts each shard at zero") {
    val docs = Seq((1L, 0L, 0), (2L, 0L, 10), (3L, 0L, 0), (4L, 0L, 5),
      (5L, 1L, 3)).toDF("id", "shard", "n_tok")
    val out = Pack.sequenceOffsets(docs, "n_tok", "shard", "id", budget = 8)
      .select($"id", $"start_tok", $"first_chunk", $"last_chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(2L, 4L, 5L))
    // doc 2: tokens [0,10) → chunks 0..1; doc 4: [10,15) → chunk 1
    assert(out(0) === ((2L, 0L, 0L, 1L)))
    assert(out(1) === ((4L, 10L, 1L, 1L)))
    assert(out(2) === ((5L, 0L, 0L, 0L))) // shard 1 restarts at 0
    intercept[IllegalArgumentException](
      Pack.sequenceOffsets(docs, "n_tok", "shard", "id", budget = 0))
  }

  test("chunk manifest tiles every chunk exactly: contiguous [0, budget) coverage") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map(i => (i, i % 3, 1 + rnd.nextInt(90)))
      .toDF("id", "shard", "n_tok")
    val B = 64L
    val rows = Pack.chunkManifest(docs, "n_tok", "shard", "id", budget = B)
      .select($"id", $"shard", $"chunk", $"tok_from", $"tok_to")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (_, _, _, from, to) =>
      assert(from >= 0 && from < to && to <= B)
    }
    // per (shard, chunk): ranges are disjoint, contiguous from 0, and sum
    // to the budget for every chunk except possibly the shard's last
    rows.groupBy(r => (r._2, r._3)).foreach { case ((sh, ch), rs) =>
      val lastChunk = rows.filter(_._2 == sh).map(_._3).max
      val ordered = rs.sortBy(_._4)
      assert(ordered.head._4 === 0L, s"chunk ($sh,$ch) does not start at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4,
          s"gap/overlap in chunk ($sh,$ch): ${a._5} vs ${b._4}")
        case _ =>
      }
      if (ch < lastChunk)
        assert(ordered.last._5 === B, s"chunk ($sh,$ch) not full")
    }
    // total manifested tokens == total input tokens
    val totalIn = docs.agg(sum($"n_tok")).as[Long].head()
    assert(rows.map(r => r._5 - r._4).sum === totalIn)
  }

  test("plan shapes: mix broadcasts the recipe, pack shuffles once on the shard key") {
    val docs = (0L until 1000L).map(i => (i, s"s${i % 3}", 5)).toDF("id", "src", "n_tok")
    val mixPlan = Mix.bySource(docs, "id", "src", Map("s0" -> 0.5, "s1" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin") ||
      mixPlan.contains("BroadcastExchange"), mixPlan)
    val packPlan = Pack.sequenceOffsets(docs, "n_tok", "src", "id", budget = 16)
      .queryExecution.executedPlan.toString
    // exactly one data shuffle: the window's hash partitioning on the shard
    assert("Exchange hashpartitioning".r.findAllIn(packPlan).size == 1, packPlan)
    assert(packPlan.contains("Window"), packPlan)
  }

  test("mixture sampling: deterministic, rate-accurate, recipe-exclusive") {
    val docs = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val rates = Map("s0" -> 0.0, "s1" -> 0.25, "s2" -> 1.0)
    val out = Mix.bySource(docs, "id", "src", rates)
    val got = out.as[(Long, String)].collect().toSet
    // deterministic: a second run selects the identical set
    assert(Mix.bySource(docs, "id", "src", rates)
      .as[(Long, String)].collect().toSet === got)
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!bySrc.contains("s0"))              // rate 0: none
    assert(bySrc("s2") === 1000)               // rate 1: all
    assert(!bySrc.contains("s3"))              // unlisted source: dropped
    // rate 0.25 over 1000 uniform ids: within ±5 points
    assert(math.abs(bySrc("s1") - 250) < 50, bySrc.toString)
    // column order preserved, keep decision is the documented function
    assert(out.columns.toSeq === Seq("id", "src"))
    got.filter(_._2 == "s1").foreach { case (id, _) =>
      assert((id * 69069L + 12345L) % Mix.Resolution < Mix.threshold(0.25))
    }
    intercept[IllegalArgumentException](
      Mix.bySource(docs, "id", "src", Map("s1" -> 1.5)))
    intercept[IllegalArgumentException](
      Mix.bySource(docs, "id", "src", Map.empty))
  }

  test("materializeChunks reconstructs the exact concatenated stream per shard") {
    val rnd = new scala.util.Random(31)
    val docs = (0L until 200L).map { i =>
      (i, i % 3, Vector.fill(1 + rnd.nextInt(40))(s"t${rnd.nextInt(100)}"))
    }.toDF("id", "shard", "toks")
    val B = 64L
    val out = Pack.materializeChunks(docs, "toks", "shard", "id", B)
      .as[(Long, Long, Seq[String])].collect()
    val byShard = out.groupBy(_._1)
    docs.as[(Long, Long, Seq[String])].collect().groupBy(_._2)
      .foreach { case (shard, ds) =>
        val stream = ds.sortBy(_._1).flatMap(_._3).toSeq
        val chunks = byShard(shard).sortBy(_._2)
        // chunk ids are dense from 0 and tile the stream exactly
        assert(chunks.map(_._2).toSeq === (0L until chunks.size).toSeq)
        assert(chunks.flatMap(_._3).toSeq === stream)
        // every chunk is full except possibly the last
        chunks.dropRight(1).foreach(c => assert(c._3.size === B))
        assert(chunks.last._3.size === (stream.size - (chunks.size - 1) * B))
      }
    // withDocIds: provenance array aligned 1:1 with tokens for loss masking
    val withIds = Pack.materializeChunks(docs, "toks", "shard", "id", B,
        withDocIds = true)
      .as[(Long, Long, Seq[String], Seq[Long])].collect()
    val docsById = docs.as[(Long, Long, Seq[String])].collect()
      .map(d => d._1 -> d._3).toMap
    withIds.foreach { case (_, _, toks, ids) =>
      assert(toks.size === ids.size)
      // every (token, doc) pair is consistent: the token appears in that doc
      toks.lazyZip(ids).foreach { (t, id) => assert(docsById(id).contains(t)) }
      // doc ids are non-decreasing within a chunk (order-col order)
      assert(ids === ids.sorted)
    }
    // explicit idCol: under the shuffleShards recipe orderCol is `pos`
    // (a position, NOT a doc id) — provenance must carry the real id
    val shuffled = Pack.shuffleShards(docs, "id", nShards = 3)
    val viaPos = Pack.materializeChunks(shuffled, "toks", "shard", "pos", B,
        withDocIds = true, idCol = "id")
      .select($"tokens", $"doc_ids")
      .as[(Seq[String], Seq[Long])].collect()
    viaPos.foreach { case (toks, ids) =>
      assert(toks.size === ids.size)
      toks.lazyZip(ids).foreach { (t, id) =>
        assert(docsById(id).contains(t), s"token $t attributed to doc $id")
      }
    }
    // and the full token multiset is preserved with real-id provenance
    val gotPairs = viaPos.flatMap { case (t, i) => t.zip(i) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val wantPairs = docs.as[(Long, Long, Seq[String])].collect()
      .flatMap(d => d._3.map(t => (t, d._1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(gotPairs === wantPairs)
    // a non-integral provenance column would cast to NULL doc_ids
    // silently — plan-time failure instead
    val strId = docs.withColumn("sid", concat(lit("d"), $"id"))
    val err = intercept[IllegalArgumentException](Pack.materializeChunks(
      strId, "toks", "shard", "id", B, withDocIds = true, idCol = "sid"))
    assert(err.getMessage.contains("must be integral"))
  }

  test("materializeChunks plan: the offsets window and one bounded aggregate, two shuffles total") {
    val docs = (0L until 100L).map(i => (i, i % 3, Vector("a", "b")))
      .toDF("id", "shard", "toks")
    val plan = Pack.materializeChunks(docs, "toks", "shard", "id", 16L)
      .queryExecution.executedPlan.toString
    // ONE shuffle total: the (shard, chunk) aggregate runs on the offsets
    // window's shard partitioning ((shard, chunk) groups are co-located
    // within shard partitions), so each token crosses the wire once
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("shuffleShards: deterministic spread + order, feeds sequenceOffsets directly") {
    val docs = (0L until 2000L).map(i => (i, 1 + (i % 50).toInt))
      .toDF("id", "n_tok")
    val out = Pack.shuffleShards(docs, "id", nShards = 8)
    val rows = out.as[(Long, Int, Long, Long)].collect()
    assert(rows.forall { case (_, _, sh, _) => sh >= 0 && sh < 8 })
    // pos is a dense 0-based rank within each shard
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (0L until rs.size).toSeq)
    }
    // deterministic under repartition
    val again = Pack.shuffleShards(docs.repartition(17), "id", 8)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(again === rows.toSet)
    // within-shard order is the scaled-hash order (id tiebreak)
    rows.groupBy(_._3).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._4).map(_._1)
      val byHash = rs.map(_._1).sortBy(id =>
        ((id * 69069L + 12345L) % Mix.Resolution, id))
      assert(byPos.toSeq === byHash.toSeq)
    }
    // the emitted (shard, pos) columns ARE a valid pack input
    val packed = Pack.sequenceOffsets(out, "n_tok", "shard", "pos", budget = 64)
    assert(packed.count() === 2000L)
    intercept[IllegalArgumentException](Pack.shuffleShards(docs, "id", 0))
  }

  test("byBudget: inclusive cut, score-desc id-asc order, per-group budgets") {
    val docs = Seq(
      // (id, group, weight, score)
      (1L, "a", 10L, 5L), (2L, "a", 10L, 9L), (3L, "a", 10L, 9L),
      (4L, "a", 15L, 7L), (5L, "b", 100L, 1L), (6L, "b", 1L, 2L)
    ).toDF("id", "grp", "w", "q")
    val out = Mix.byBudget(docs, "id", "grp", "w", "q", budget = 30L)
      .select($"id", $"cum_weight").as[(Long, Long)].collect().sortBy(_._1)
    // group a order: id2(q9,w10)→10, id3(q9,w10)→20, id4(q7,w15)→35 OUT,
    // id1(q5,w10)→45 OUT; group b: id6(q2,w1)→1, id5(q1,w100)→101 OUT
    assert(out.toSeq === Seq((2L, 10L), (3L, 20L), (6L, 1L)))
    intercept[IllegalArgumentException](
      Mix.byBudget(docs, "id", "grp", "w", "q", budget = -1L))
    // NULL scores are excluded explicitly (no rank in the quality order)
    val withNull = Seq((1L, "a", 5L, Some(3L)), (2L, "a", 5L, None))
      .toDF("id", "grp", "w", "q")
    val kept = Mix.byBudget(withNull, "id", "grp", "w", "q", budget = 100L)
      .select($"id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
    // negative weights break the run-pruning equivalence → fail loudly at
    // execution, never silently drop rows the naive cut would keep
    val neg = Seq((1L, "a", 5L, 3L), (2L, "a", -2L, 2L))
      .toDF("id", "grp", "w", "q")
    val ex = intercept[Exception](
      Mix.byBudget(neg, "id", "grp", "w", "q", budget = 10L).collect())
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" ")
    assert(chain.contains("negative"), chain)
  }

  test("byBudget two-phase cut equals the naive single window (randomized, tied scores)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(19)
    val docs = (0L until 2000L)
      .map(i => (i, s"g${rnd.nextInt(6)}", rnd.nextInt(50).toLong,
        rnd.nextInt(8).toLong))  // small score domain → heavy ties
      .toDF("id", "grp", "w", "q")
    val budget = 300L
    val got = Mix.byBudget(docs, "id", "grp", "w", "q", budget)
      .select($"id", $"cum_weight").as[(Long, Long)].collect().toSet
    val naive = Window.partitionBy($"grp").orderBy($"q".desc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = docs.withColumn("cum_weight", sum($"w").over(naive))
      .filter($"cum_weight" <= budget)
      .select($"id", $"cum_weight").as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("byBudget windows partition by (group, score), never by group alone") {
    val docs = (0L until 100L).map(i => (i, s"g${i % 2}", 1L, i % 10))
      .toDF("id", "grp", "w", "q")
    val plan = Mix.byBudget(docs, "id", "grp", "w", "q", budget = 10L)
      .queryExecution.optimizedPlan.toString
    // the row-level window keys on both columns — the per-group
    // serialization the two-phase design exists to avoid
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty, plan)
    assert(windowSpecs.exists(s => s.contains("grp") && s.contains("q")), plan)
  }

  test("stratified: exactly n per group, deterministic, small groups keep all") {
    val docs = (0L until 900L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
      .union(Seq((9000L, "tiny"), (9001L, "tiny")).toDF("id", "grp"))
    val out = Mix.stratified(docs, "id", "grp", n = 7)
    val got = out.as[(Long, String)].collect().toSeq
    val byGrp = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("g0").size === 7 && byGrp("g1").size === 7 && byGrp("g2").size === 7)
    assert(byGrp("tiny") === Set(9000L, 9001L))
    // deterministic: repartitioned input selects the identical rows
    val again = Mix.stratified(docs.repartition(13), "id", "grp", n = 7)
      .as[(Long, String)].collect().toSet
    assert(again === got.toSet)
    // the selection is the n smallest scaled hashes per group
    byGrp("g0").foreach { id =>
      val h = (id * 69069L + 12345L) % Mix.Resolution
      val better = (0L until 900L).filter(i => i % 3 == 0).map(i =>
        (i * 69069L + 12345L) % Mix.Resolution).count(_ < h)
      assert(better < 7, s"id $id hash $h has $better smaller hashes")
    }
    assert(out.columns.toSeq === Seq("id", "grp"))
    intercept[IllegalArgumentException](Mix.stratified(docs, "id", "grp", 0))
  }

  test("stratified prefilter (minGroupRows): identical selection on a skewed fixture") {
    // one huge group, one moderate, one tiny (< n), one with likely ZERO
    // prefilter survivors, plus null group keys
    val rows = (0L until 20000L).map(i => (i, Some("huge"))) ++
      (30000L until 30400L).map(i => (i, Some("mid"))) ++
      (40000L until 40003L).map(i => (i, Some("tiny"))) ++
      Seq((50000L, Some("solo"))) ++
      (60000L until 60005L).map(i => (i, None: Option[String]))
    val docs = rows.toDF("id", "grp")
    val base = Mix.stratified(docs, "id", "grp", n = 7)
      .as[(Long, Option[String])].collect().toSet
    // estimates both under and over the true huge-group size: the
    // selected set must be EXACTLY the unfiltered one either way
    Seq(1000L, 20000L, 500000L).foreach { est =>
      val got = Mix.stratified(docs, "id", "grp", n = 7,
          minGroupRows = Some(est))
        .as[(Long, Option[String])].collect().toSet
      assert(got === base, s"estimate $est")
    }
    // the prefilter actually gates the ranked input (plan shows the hash
    // filter under the window when the estimate warrants it)
    val plan = Mix.stratified(docs, "id", "grp", n = 7,
        minGroupRows = Some(500000L))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("pmod"), plan)
    // tiny estimates (prefilter would not cut anything) take the plain path
    val small = Mix.stratified(docs, "id", "grp", n = 7,
      minGroupRows = Some(8L))
    assert(small.as[(Long, Option[String])].collect().toSet === base)
    intercept[IllegalArgumentException](
      Mix.stratified(docs, "id", "grp", 7, minGroupRows = Some(0L)))
  }

  test("hashScaled is overflow-safe at 64-bit ids and bit-identical to " +
      "the direct LCG where it fits (r18 review)") {
    // direct id*69069 overflows (ANSI: throws) past ~1.3e14; the
    // mod-first form is bit-identical by ring arithmetic
    val ids = Seq(0L, 1L, 12345L, (1L << 19) - 1, 1L << 20,
      987654321987654321L, Long.MaxValue, -5L, Long.MinValue + 1)
    val got = ids.toDF("id")
      .select(Mix.hashScaled(col("id")).as("h")).as[Long].collect()
    ids.zip(got).foreach { case (id, h) =>
      val m = Mix.Resolution
      val expect = java.math.BigInteger.valueOf(id)
        .multiply(java.math.BigInteger.valueOf(69069L))
        .add(java.math.BigInteger.valueOf(12345L))
        .mod(java.math.BigInteger.valueOf(m)).longValueExact()
      assert(h === expect, s"id $id")
      assert(h >= 0 && h < m)
    }
    // bySource survives snowflake-scale ids end-to-end
    val big = Seq((987654321987654321L, "web"), (987654321987654322L, "web"))
      .toDF("id", "source")
    assert(Mix.bySource(big, "id", "source", Map("web" -> 1.0)).count() === 2)
  }

  test("shuffleShards within-shard order does not degenerate to ascending " +
      "ids when the 2^20 hash space ties (r18 review)") {
    // ids equal mod 2^20 share h -- the old (h, id) order fell back to
    // RAW ascending ids (original corpus order); the high-bits tiebreak
    // must decorrelate them
    val ids = (0 until 64).map(i => 7L + i.toLong * (1L << 20))
    val out = Pack.shuffleShards(ids.toDF("id"), "id", nShards = 1)
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(out.toSet === ids.toSet)
    assert(out !== ids.sorted,
      "tied hash runs must not keep original ascending-id order")
    // still deterministic
    val again = Pack.shuffleShards(ids.toDF("id").repartition(5), "id", 1)
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(again === out)
  }
}
