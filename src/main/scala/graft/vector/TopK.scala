package graft.vector

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Grouped top-k via a custom typed `Aggregator` (SURVEY §4.3.2): the
  * bounded-buffer merge runs map-side (partial aggregation), so each
  * group ships at most k rows through the shuffle — vs a window function,
  * which shuffles and sorts EVERY row of every group. At 100 TB with small
  * k this is the difference between a k-row and an all-row shuffle.
  *
  * Ordering: ascending (value, id) — value ties broken by id, matching the
  * engine's knn result convention (rowid-sorted ties, knn/iterator.cpp).
  */
object TopK {

  /** Bounded top-k merge over (id, value) pairs, smallest values first.
    *
    * The buffer invariant is "sorted ascending, at most k elements", so the
    * map-side `reduce` is a bounded insertion: the common case (row worse
    * than the kth best) is ONE comparison and no allocation — not a
    * sort-per-row (VERDICT r4 #8; matters once groups are billions of rows).
    */
  final case class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, s"top-k needs k > 0, got $k") // k=0 would hit Nil.last
    private val ord = Ordering[(Double, Long)]
    // Vector, not List (review r18-8): the reject path reads b.size and
    // b.last per input row, which on a List are O(k) traversals — the
    // documented O(1) reject was two list walks. Vector (and the
    // array-backed Seq a deserialized shuffle buffer comes back as)
    // answers both in effectively constant time.
    override def zero: Seq[(Double, Long)] = Vector.empty
    /** Insert into a sorted bounded buffer: O(1) reject, O(k) insert. */
    override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] = {
      val item = (a._2, a._1)
      if (b.size >= k && ord.gteq(item, b.last)) b
      else {
        val pos = b.indexWhere(e => ord.lt(item, e)) match {
          case -1 => b.size
          case i => i
        }
        val (lo, hi) = b.splitAt(pos)
        (lo ++ (item +: hi)).take(k)
      }
    }
    /** Merge two sorted bounded buffers: linear two-pointer merge. */
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      val (ia, ib) = (a.iterator.buffered, b.iterator.buffered)
      while (out.size < k && (ia.hasNext || ib.hasNext)) {
        if (!ib.hasNext || (ia.hasNext && ord.lteq(ia.head, ib.head)))
          out += ia.next()
        else out += ib.next()
      }
      out.toSeq
    }
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Shared tail of the KNN-join family: grouped top-k over a scored
    * (`__qid`, `__cid`, `__dist`) frame via the bounded aggregator —
    * map-side partials cap the shuffle at k rows per (query, partition).
    * Returns (`qIdCol`, `cIdCol`, dist, rn) best-first, corpus-id
    * tiebreak. */
  private[vector] def topKPairs(scored: DataFrame, qIdCol: String,
                                cIdCol: String, k: Int): DataFrame = {
    // the result carries fixed (dist, rn) columns and builds through
    // (pos, pair) intermediates: caller-chosen id names colliding with
    // them would emit duplicate/ambiguous output columns (review r18-8)
    val reserved = Set("pos", "pair", "dist", "rn")
    require(!reserved.contains(qIdCol) && !reserved.contains(cIdCol),
      s"id column names must avoid ${reserved.mkString("/")}: " +
        s"got ($qIdCol, $cIdCol)")
    import scored.sparkSession.implicits._
    val agg = new TopKAgg(k).toColumn
    scored.select(col("__qid"), col("__cid"), col("__dist"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("__qid", "topk")
      .select(col("__qid"),
        posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col("__qid").as(qIdCol), col("pair._2").as(cIdCol),
        col("pair._1").as("dist"), (col("pos") + 1).as("rn"))
  }

  /** Top-k rows per group: returns (group, id, value, rn) with rn in 1..k.
    * groupCol must be string-typed here (the corpus use case); the
    * Aggregator itself is type-agnostic over its (id, value) input. */
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
               valueCol: String, k: Int): DataFrame = {
    // "g"/"topk" are safe: they are renamed away before the final select
    val reserved = Set("pos", "pair", "rn")
    val names = Seq(groupCol, idCol, valueCol)
    require(names.distinct.size == 3 && !names.exists(reserved.contains),
      s"perGroup column names must be distinct and avoid " +
        s"${reserved.mkString("/")}: got $names")
    import df.sparkSession.implicits._
    val agg = new TopKAgg(k).toColumn
    df.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("i"), col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("g", "topk")
      .select(col("g").as(groupCol),
        posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col(groupCol),
        col("pair._2").as(idCol),
        col("pair._1").as(valueCol),
        (col("pos") + 1).as("rn"))
  }
}
