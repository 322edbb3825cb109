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

  /** ENFORCED driver/broadcast budget for the query side of every batch
    * KNN join (r15 VERDICT #1 — the doc-comment "chunk a huge query set"
    * contract, now enforced in code the way [[graft.plans.GraphCandidates]]
    * enforces its filter-id budget): joins whose query batch fits collect
    * or broadcast it (the fast small-batch shape); a batch over budget
    * takes each leg's scale arm — distributed pid-assignment for the
    * routed/quantized graph joins, bounded chunks for the screened flat
    * joins, a non-broadcast join for the exact/IVF legs — so the query
    * side NEVER materializes unbounded on the driver. The reference's
    * host consumes batches through a rowid-stream iterator for the same
    * reason (knn/iterator.cpp:27-146 — never materialize-all). */
  def maxQueryBatch(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.knnJoin.maxQueryBatch")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1 << 16)

  /** Joins that engaged an over-budget scale arm — spec instrumentation
    * only (meaningful in local mode, like
    * [[graft.plans.GraphCandidates.fallbackCount]]). */
  val overBudgetJoins = new java.util.concurrent.atomic.AtomicLong(0L)

  /** ONE budget-limited job decides the arm AND supplies the in-budget
    * batch (no separate count pass — the [[graft.plans.GraphCandidates]]
    * construction): collect at most `max`+1 (id, vector) rows; a full
    * result means over budget → None, and the caller's scale arm re-reads
    * `queries` distributed. */
  private[graft] def boundedQueryBatch(queries: DataFrame, qIdCol: String,
                                       qVecCol: String, max: Int)
      : Option[Array[(Long, Array[Float])]] = {
    import queries.sparkSession.implicits._
    val head = queries.select(col(qIdCol).cast("long"), col(qVecCol))
      .limit(math.min(max, Int.MaxValue - 2) + 1)
      .as[(Long, Array[Float])].collect()
    if (head.length <= max) Some(head)
    else { overBudgetJoins.incrementAndGet(); None }
  }

  /** Budget probe for legs that never collect but BROADCAST the query
    * side (the exact and IVF joins): one bounded count job. */
  private[graft] def fitsBudget(queries: DataFrame, max: Int): Boolean = {
    val fits = queries
      .limit(math.min(max, Int.MaxValue - 2) + 1).count() <= max
    if (!fits) overBudgetJoins.incrementAndGet()
    fits
  }

  /** Identity partitioner for over-budget query slices (key = slice
    * index, one Spark partition per slice). */
  private[vector] final class SlicePartitioner(n: Int)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** The slice-and-union budget machinery shared by the screened batch
    * joins: run `screen` once per STRICTLY ≤max-row query slice and union
    * the results. In budget there is ONE slice, the result returns lazily,
    * and the second tuple element carries the collected batch (callers
    * build broadcast rescore sides from it — never a second evaluation of
    * the queries plan); over budget it is None, slices come from exact
    * zipWithIndex global indices (never an approximate round-robin
    * bound), each slice's result is EAGERLY checkpointed, and `screen`'s
    * cleanup hook runs before the next slice collects — so the driver
    * never holds more than one slice and executors never hold more than
    * one slice's broadcasts. */
  private[vector] def perSliceUnion(queries: DataFrame, qIdCol: String,
                                    qVecCol: String)(
      screen: Array[(Long, Array[Float])] => (DataFrame, () => Unit))
      : (DataFrame, Option[Array[(Long, Array[Float])]]) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val max = maxQueryBatch(spark)
    boundedQueryBatch(queries, qIdCol, qVecCol, max) match {
      case Some(qRows) => (screen(qRows)._1, Some(qRows))
      case None =>
        val qSel = queries.select(col(qIdCol).cast("long"), col(qVecCol))
          .as[(Long, Array[Float])]
        val n = qSel.count()
        val nSlices = math.max(1L, (n + max - 1) / max).toInt
        val sliced = qSel.rdd.zipWithIndex()
          .map { case (r, i) => ((i / max).toInt, r) }
          .partitionBy(new SlicePartitioner(nSlices))
          .map(_._2)
        sliced.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val parts = (0 until nSlices).map { i =>
            val slice = spark.sparkContext.runJob(sliced,
              (it: Iterator[(Long, Array[Float])]) => it.toArray,
              Seq(i)).head
            val (df, cleanup) = screen(slice)
            // eager: the slice's jobs run NOW, so its broadcasts can be
            // freed before the next slice's are built
            val cut = df.localCheckpoint(true)
            cleanup()
            cut
          }
          (parts.reduce(_ union _), None)
        } finally sliced.unpersist(false)
    }
  }

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
    // over [[maxQueryBatch]] the broadcast hint drops and the cross join
    // runs as a distributed cartesian — still quadratic work (it IS the
    // exact join), but never a driver/broadcast OOM (r15 VERDICT #1)
    val qSel = queries.select(col(qIdCol).cast("long").as("__qid"),
      col(qVecCol).as("__qv"))
    val q =
      if (fitsBudget(queries, maxQueryBatch(queries.sparkSession)))
        broadcast(qSel)
      else qSel
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
