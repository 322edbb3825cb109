package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.vector.Knn

/** Oracle-checked corpus for vector search (SURVEY.md §2.5, K1-K4+K7) over
  * the `embeddings` fixture (vec_id BIGINT, embedding FLOAT[64], label INT).
  *
  * The query vector is the stored embedding of vec_id=0 — fetched driver-side
  * (a one-row pushed-filter lookup; in real use the query vector is user
  * input). Distances are computed float-read/double-accumulate in both
  * engines (oracle casts to DOUBLE[]), ordered by exact distance with vec_id
  * tiebreak, and emitted rounded so the hash compare is byte-stable.
  */
object VectorQueries {

  private def queryVec(s: SparkSession, d: String): Array[Float] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  private def topK(s: SparkSession, d: String, metric: Knn.Metric,
                   filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val base = t(s, d, "embeddings")
    val df = filter.map(base.filter).getOrElse(base)
    Knn.knn(df, "embedding", "vec_id", queryVec(s, d), 10, metric)
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))
  }

  private val qSub = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

  private def oracleFor(metricExpr: String, where: String = ""): String =
    s"SELECT vec_id, round($metricExpr, 6) AS dist FROM embeddings $where" +
      s"ORDER BY $metricExpr, vec_id LIMIT 10"

  val defs: Map[String, QueryDef] = Map(

    // K1 exact top-k, L2 — ref knn/knn.cpp:455-537, space.cpp L2 kernels
    "q_knn_l2" -> QueryDef(
      (s, d) => topK(s, d, Knn.L2),
      Some(oracleFor(s"list_distance(embedding::DOUBLE[], $qSub)"))),

    // K2 inner-product metric (distance = 1 - dot, hnswlib convention)
    "q_knn_ip" -> QueryDef(
      (s, d) => topK(s, d, Knn.IP),
      Some(oracleFor(s"1.0 - list_inner_product(embedding::DOUBLE[], $qSub)"))),

    // K2 cosine metric (distance = 1 - cosine similarity)
    "q_knn_cosine" -> QueryDef(
      (s, d) => topK(s, d, Knn.Cosine),
      Some(oracleFor(s"1.0 - list_cosine_similarity(embedding::DOUBLE[], $qSub)"))),

    // K3 filtered search — attribute pre-filter, pushed to the scan
    // (ref knn/knn.h:87-94; exact-cost by construction in Spark's model)
    "q_knn_filtered" -> QueryDef(
      (s, d) => topK(s, d, Knn.L2, Some(col("label") === 3)),
      Some(oracleFor(s"list_distance(embedding::DOUBLE[], $qSub)",
        "WHERE label = 3 ")))
  )
}
