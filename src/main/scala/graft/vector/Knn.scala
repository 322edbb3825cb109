package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact top-k vector search (K1/K3/K7) and the index-vs-fullscan cost rule
  * (K4) — ref knn/knn.cpp:455-537 (Search), knn/knn.h:87-94 (filtered),
  * knn/knn.cpp:613-620 (ShouldUseFullscan), knn/iterator.cpp:27-146 (result
  * stream).
  *
  * Plan shape (the 100 TB story): score is a codegen'd expression evaluated
  * inside the scan stage; `orderBy(score).limit(k)` lowers to
  * `TakeOrderedAndProject` — a per-partition bounded heap + single k-row
  * merge at the driver. No shuffle of the fact table, no global sort, and
  * the scan prunes to (id, vec) columns only. Filtered search is a plain
  * pre-filter, which Spark pushes into the scan — the analog of the
  * reference bypassing HNSW for selective filters (knn.cpp:613-620), except
  * exact by construction.
  */
object Knn {

  sealed trait Metric
  case object L2 extends Metric
  case object IP extends Metric
  case object Cosine extends Metric

  /** Score column for a metric, oriented so that ASC = best-first (the
    * reference's "distance": L2 as-is; IP/cosine as `1 - similarity`,
    * matching hnswlib's IP/cosine distance). */
  def distCol(metric: Metric, vec: Column, query: Column): Column = metric match {
    case L2     => distances.l2Dist(vec, query)
    case IP     => lit(1.0) - distances.ipScore(vec, query)
    case Cosine => lit(1.0) - distances.cosineSim(vec, query)
  }

  /** Exact k-nearest-neighbors of `query` in `df(vecCol)`.
    *
    * Returns (idCol, dist) rows, best-first, ties broken by id — the
    * deterministic analog of the reference's rowid-sorted result iterator.
    * Attribute-filtered search (K3) = `knn(df.filter(p), …)`.
    */
  def knn(df: DataFrame, vecCol: String, idCol: String,
          query: Array[Float], k: Int, metric: Metric = L2): DataFrame = {
    val d = distCol(metric, col(vecCol), typedLit(query))
    df.select(col(idCol), d.as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** KNN JOIN — the BATCH form of top-k search (retrieval for every row at
    * once): for each row of `queries`, the k nearest rows of `corpus`.
    * The single-query API serves interactive search; a data pipeline
    * (batch retrieval, cross-corpus linking, embedding-space labeling)
    * needs all queries answered in one distributed plan.
    *
    * Shape (the 100 TB story): the QUERY batch broadcasts (it is the small
    * side by construction — thousands of rows vs a corpus of billions);
    * each corpus partition scores its rows against every query with the
    * codegen'd distance kernel, and the grouped top-k [[TopK.TopKAgg]]
    * aggregator keeps map-side partials, so the one shuffle carries at
    * most k rows per (query, corpus-partition) — never the scored cross
    * product. Corpus-side attribute filters compose as plain pre-filters.
    * For query batches too large to broadcast, run in broadcastable
    * slices — each slice is one independent plan (the k-per-query result
    * makes slices embarrassingly parallel).
    *
    * Returns (qIdCol, cIdCol, dist, rn) with rn in 1..k, best-first,
    * ties broken by corpus id — [[knn]]'s result contract per query. */
  def knnJoin(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, qVecCol: String,
              cIdCol: String, cVecCol: String,
              k: Int, metric: Metric = L2): DataFrame = {
    require(qIdCol != cIdCol,
      s"query and corpus id columns must have distinct names ($qIdCol)")
    val q = broadcast(queries.select(col(qIdCol).cast("long").as("__qid"),
      col(qVecCol).as("__qv")))
    val scored = corpus
      .select(col(cIdCol).cast("long").as("__cid"), col(cVecCol).as("__cv"))
      .crossJoin(q)
      .select(col("__qid"), col("__cid"),
        distCol(metric, col("__cv"), col("__qv")).as("__dist"))
    TopK.topKPairs(scored, qIdCol, cIdCol, k)
  }

  /** Index-vs-fullscan cost rule (K4) — mirrors the shape of the reference's
    * ShouldUseFullscan (knn/knn.cpp:613-620): with a filter of selectivity
    * `sel` over `n` rows, it recommends brute force exactly when the filter
    * is selective enough that scoring the `sel*n` survivors costs no more
    * than `costFactor * k * ef` distance evaluations — the work an ANN graph
    * walk would do anyway. Currently an unused seam: the exact path always
    * fullscans regardless; a future partitioned-ANN planner rule consults
    * this to route `ORDER BY dist LIMIT k` between the two paths.
    */
  def shouldUseFullscan(selectivity: Double, n: Long, k: Int, ef: Int,
                        costFactor: Double = 2.0): Boolean = {
    val survivors = selectivity * n
    survivors <= costFactor * k.toDouble * ef.toDouble
  }
}
