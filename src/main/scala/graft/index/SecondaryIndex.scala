package graft.index

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Secondary-index analog (SURVEY §2.4, I1-I4/I6): a value-sorted index
  * table `(value, cnt, rowids)` per indexed column — the Spark shape of the
  * reference's PGM-over-distinct-values + compressed rowid postings
  * (secondary/secondary.cpp:745-812, blockreader.h:82-89, builder.cpp
  * external sort).
  *
  * What replaces what:
  *  - PGM learned index over sorted distinct values (pgm.h:43-155) → the
  *    index table is WRITTEN range-clustered by value, so a point/range
  *    lookup prunes to one file + row group via Parquet stats — the same
  *    O(log) skip the learned index buys, supplied by the storage layout.
  *  - rowid postings blocks (iterator.cpp:30-334) → a sorted `rowids`
  *    array column; consumption is `explode` + semi-join against the fact
  *    table on its key.
  *  - CalcCount without materialization (secondary.cpp:774-812) → sum of
  *    the stored `cnt` column: an index-only scan of a few rows.
  *
  * 100 TB notes: the index build is one shuffle of (value, key) pairs; the
  * semi-join is broadcast when the postings are selective (the common case
  * for point lookups — Catalyst/AQE pick it), else a key shuffle. For a
  * high-ndv column the rowids arrays stay short; for low-ndv columns the
  * postings are long but few — either way the index table is tiny next to
  * the fact table.
  */
object SecondaryIndex {

  /** Build the index table for `valueCol` with postings of `keyCol`
    * (the fact table's join key — the reference's implicit dense rowid;
    * Parquet tables have no stable physical rowid, so the engine indexes
    * the logical key instead). `keyCol` must uniquely identify rows of
    * `df`, exactly as the reference's rowid does — otherwise the semi-join
    * widens the result to all rows sharing a key. */
  def build(df: DataFrame, valueCol: String, keyCol: String,
            path: String, files: Int = 1): Unit = {
    val idx = df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"),
        sort_array(collect_list(col(keyCol))).as("rowids"))
    graft.tables.Writer.write(idx, path, sortBy = Seq("value"), files = files)
  }

  /** I3/I4: point/range lookup → postings → distinct keys (the rowid
    * stream). `values` = IN-list semantics (F1 via index). */
  def lookupKeys(spark: SparkSession, indexPath: String,
                 values: Seq[Any]): DataFrame =
    spark.read.parquet(indexPath)
      .filter(col("value").isin(values: _*))
      .select(explode(col("rowids")).as("key"))
      .distinct()

  /** Index-accelerated filter: semi-join the fact table against the
    * postings (the host-side rowid-stream intersection, SURVEY §3.2). */
  def semiJoin(fact: DataFrame, factKey: String,
               keys: DataFrame): DataFrame =
    fact.join(keys.withColumnRenamed("key", factKey), Seq(factKey), "left_semi")

  /** I6 CalcCount from stored counts — index-only, no fact scan. */
  def calcCount(spark: SparkSession, indexPath: String,
                values: Seq[Any]): Long =
    spark.read.parquet(indexPath)
      .filter(col("value").isin(values: _*))
      .agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)
}
