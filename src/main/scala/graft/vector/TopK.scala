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

  /** Bounded top-k merge over (id, value) pairs, smallest values first. */
  final case class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Seq[(Double, Long)] = Nil
    private def bound(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sorted.take(k)
    override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
      bound(b :+ ((a._2, a._1)))
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      bound(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = bound(r)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Top-k rows per group: returns (group, id, value, rn) with rn in 1..k.
    * groupCol must be string-typed here (the corpus use case); the
    * Aggregator itself is type-agnostic over its (id, value) input. */
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
               valueCol: String, k: Int): DataFrame = {
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
