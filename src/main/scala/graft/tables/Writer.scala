package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Engine-owned write path (S3) — the Spark-native analog of the reference's
  * `CreateColumnarBuilder` (columnar/builder.h:38-47, builder.cpp:149-249).
  *
  * The reference's builder gets its read-side speed from layout decisions
  * made at write time: per-64K-block packing choice (builderint.cpp:213-225),
  * a hierarchical min/max tree (builderminmax.h:138-164), and hidden
  * `$name_HASH` companion columns for strings (columnar/columnar.cpp:465-473).
  * On Spark those map to: range-partitioned + sorted Parquet (Parquet picks
  * dictionary/RLE/delta per page and records row-group/page stats — the
  * zone maps), and explicit xxhash64 companion columns.
  *
  * 100 TB story: `repartitionByRange(sortBy)` gives a global clustering, so
  * range predicates on the sort key prune whole FILES (the analog of the
  * reference's whole-segment EarlyReject, columnar.cpp:695-704) before
  * row-group stats are even consulted. `files` controls output granularity —
  * at cluster scale, size it so each file is O(100 MB–1 GB).
  */
object Writer {

  /** Suffix of the hash companion column (ref: hidden `$name_HASH`,
    * columnar/columnar.cpp:465-473). */
  val HashSuffix = "__hash"

  /** Hash convention: xxhash64 of the string, with the reference's
    * "hash of empty string is 0" rule (common/filter.cpp:87,
    * secondary/builder.cpp:206); NULL stays NULL. */
  def companionHash(c: Column): Column =
    when(c.isNull, lit(null).cast("long"))
      .when(length(c) === 0, lit(0L))
      .otherwise(xxhash64(c))

  /** Write `df` as a sorted Parquet table.
    *
    * @param sortBy         clustering key: rows are range-partitioned across
    *                       `files` output files and sorted within each — the
    *                       zone-map-friendly layout the reference's builder
    *                       produces for DELTA-packed keys.
    * @param hashCompanions string columns that get an `<name>__hash`
    *                       companion column (F4 fast-path parity).
    * @param format         output source format — "parquet" (default) or
    *                       any stats-bearing columnar format Spark ships
    *                       ("orc"): the clustering conventions carry over
    *                       unchanged because zone-map pruning rides the
    *                       format's own file/stripe statistics.
    */
  def write(df: DataFrame, path: String, sortBy: Seq[String],
            hashCompanions: Seq[String] = Nil, files: Int = 1,
            format: String = "parquet"): Unit = {
    val withHashes = hashCompanions.foldLeft(df) { (d, name) =>
      d.withColumn(name + HashSuffix, companionHash(col(name)))
    }
    val clustered =
      if (sortBy.isEmpty) withHashes.coalesce(files)
      else withHashes
        .repartitionByRange(files, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    clustered.write.mode("overwrite").format(format).save(path)
  }

  /** Bucketed managed table: rows hash-partitioned into `numBuckets` files
    * by `bucketCols` and sorted within each. Two tables bucketed the same
    * way join WITHOUT a shuffle (co-located join) — the layout-level answer
    * to repeated fact⋈fact joins on a stable key, which at 100 TB converts
    * every such join from a full two-sided shuffle into a local merge.
    * (Managed-table API: bucket metadata lives in the session catalog.) */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // The in-memory catalog dies with the session but a managed table's
    // warehouse directory survives on disk; a fresh session would then hit
    // LOCATION_ALREADY_EXISTS on create. If the catalog does not know the
    // table, the leftover location is stale — remove it first.
    if (!spark.catalog.tableExists(tableName)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tableName.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)
  }
}
