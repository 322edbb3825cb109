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
  /** @param bloomFor columns that get a parquet BLOOM FILTER per row
    *                 group — the skipping tier for point predicates on
    *                 HIGH-NDV columns the sort key does NOT cluster
    *                 (min/max zone maps are useless there: every row
    *                 group spans the whole value range, but the bloom
    *                 answers "definitely absent" per row group). Parquet
    *                 stores and serves them natively; readers that
    *                 predate blooms just ignore the extra footer bytes. */
  def write(df: DataFrame, path: String, sortBy: Seq[String],
            hashCompanions: Seq[String] = Nil, files: Int = 1,
            format: String = "parquet",
            bloomFor: Seq[String] = Nil): Unit = {
    require(bloomFor.isEmpty || format == "parquet",
      s"bloom filters are a parquet feature, format is '$format'")
    val withHashes = hashCompanions.foldLeft(df) { (d, name) =>
      d.withColumn(name + HashSuffix, companionHash(col(name)))
    }
    val clustered =
      // only shuffle when the layout demands it (ADVICE r19): a frame
      // already at `files` partitions writes as-is; raising the count
      // needs repartition (coalesce cannot raise, and its narrow
      // dependency would collapse upstream compute into `files` tasks —
      // the r19 files=1 serialization hazard); shrinking defaults to the
      // shuffle-free coalesce (the writer's common case is a cheap
      // scan/projection frame, and the write itself is `files` tasks
      // either way), with `spark.graft.write.shuffleShrink=true` opting
      // an EXPENSIVE upstream frame into repartition so its compute
      // keeps its parallelism and only the writes narrow
      if (sortBy.isEmpty) {
        val cur = withHashes.rdd.getNumPartitions
        if (cur == files) withHashes
        else if (cur < files) withHashes.repartition(files)
        else if (df.sparkSession.conf
            .getOption("spark.graft.write.shuffleShrink")
            .exists(_.toBoolean)) withHashes.repartition(files)
        else withHashes.coalesce(files)
      }
      else withHashes
        .repartitionByRange(files, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    val writer = bloomFor.foldLeft(
      clustered.write.mode("overwrite").format(format)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    writer.save(path)
    graft.engine.Graft.invalidate(path)
  }

  /** Z-ORDER (Morton-curve) clustered write: interleave the bit-planes of
    * the columns' rank-bucket numbers and range-cluster files by the
    * resulting z value. A `sortBy` layout prunes on ONE column; z-order
    * gives every listed column partial locality, so file/row-group stats
    * prune selective predicates on ANY of them — the multi-dimensional
    * clustering lever Delta/Iceberg OPTIMIZE ZORDER applies at 100 TB
    * (predicates on k z-columns keep ~N^(1-1/d) of the files instead of
    * all of them).
    *
    * Rank-bucketing: per column, `zBits`-bit bucket numbers from
    * approxQuantile boundaries (one bounded driver-side sketch per column
    * at write time — the same cost class as the writer's stats pass);
    * bucket lookup and bit interleaving are pure codegen expressions
    * (literal shifts only). NULLs bucket to 0 (cluster together at the
    * curve origin). Works for any numeric/date/timestamp column; string
    * columns are not rank-sketchable by approxQuantile and are rejected.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    files: Int = 16, zBits: Int = 8,
                    format: String = "parquet"): Unit = {
    require(zCols.size >= 2, "z-ordering needs at least two columns")
    // 10 is an EXECUTABILITY cap, not just a range check (r19 review):
    // bucketOf builds a 2^zBits-term comparison chain per column, so
    // zBits=16 meant a ~2M-node expression tree (driver StackOverflow /
    // Janino limits) and a 65535-boundary approxQuantile sketch; 1024
    // equi-depth buckets per dimension already out-resolves any
    // file-level clustering target by orders of magnitude
    require(zBits >= 1 && zBits <= 10, s"zBits out of range [1, 10]: " +
      s"$zBits (2^zBits comparison terms per column must stay " +
      "codegen-sized; 1024 buckets/dim out-resolves file-level clustering)")
    // the Morton interleave packs bit j of column i at position j*d+i in
    // ONE long; past bit 62 the shift would wrap mod 64 (colliding
    // columns on the same bit) or set the SIGN bit (reversing the range
    // sort) -- silently wrong clustering, so refuse loudly (review r18-6)
    require(zCols.size * zBits <= 62,
      s"z-value needs ${zCols.size}*$zBits = ${zCols.size * zBits} bits; " +
        "at most 62 fit a signed long -- lower zBits or drop columns")
    val buckets = 1 << zBits
    zCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.DateType,
        s"z-order column '$c' must be numeric/date/timestamp, found $dt")
    }
    // (buckets - 1) interior boundaries per column — equi-depth, so skew
    // cannot collapse the curve into a few cells; ONE multi-column sketch
    // pass for all z columns
    val quantiles = df
      .select(zCols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(zCols.toArray,
        (1 until buckets).map(_.toDouble / buckets).toArray,
        1.0 / (4 * buckets))
    val bounds: Map[String, Array[Double]] = zCols.zip(quantiles).toMap
    // bucket(c) = #boundaries below the value (codegen CASE chain of
    // literal comparisons); NULL → 0
    def bucketOf(c: String): Column = {
      val v = col(c).cast("double")
      val n = bounds(c).foldLeft(lit(0L)) { (acc, b) =>
        acc + when(v > lit(b), 1L).otherwise(0L)
      }
      when(v.isNull, 0L).otherwise(n)
    }
    // Morton interleave: bit j of column i lands at position j*d + i —
    // all shift amounts are Scala literals, so this stays one codegen'd
    // arithmetic expression per row. bucketOf(c) is INLINED per bit term
    // deliberately: codegen's subexpression elimination emits the
    // 2^zBits-term chain once per column (a named-column rewrite was
    // measured to defeat the method splitting and blow Janino's 64 KB
    // limit at zBits = 8 — r19); the zBits cap above bounds the tree
    val d = zCols.size
    val z = zCols.zipWithIndex.map { case (c, i) =>
      val b = bucketOf(c)
      (0 until zBits).map { j =>
        (shiftright(b, j) % lit(2L)) * lit(1L << (j * d + i))
      }.reduce(_ + _)
    }.reduce(_ + _)
    df.withColumn(ZCol, z)
      .repartitionByRange(files, col(ZCol))
      .sortWithinPartitions(col(ZCol))
      .drop(ZCol)
      .write.mode("overwrite").format(format).save(path)
    graft.engine.Graft.invalidate(path)
  }

  /** Internal z-value column name (dropped before the write). */
  private val ZCol = "__graft_z"

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

  /** Hive-style PARTITIONED layout: one directory per `partitionCols`
    * value combination (`col=value/…`), rows range-clustered over
    * (partitionCols ++ sortBy) across `files` write tasks and sorted
    * within each. Equality/IN predicates on a partition column prune whole
    * DIRECTORIES at planning time from the listing alone — before any
    * footer, stats, or index is consulted — which is the coarsest and
    * cheapest pruning tier at 100 TB (the date/tenant/source layout every
    * large table ships with). `sortBy` then gives file/row-group stats
    * pruning WITHIN each partition, so the two tiers compose.
    *
    * Partition columns are stored in directory names, not data files
    * (Spark's partitionBy contract) and come back typed via partition
    * discovery. Keep their cardinality bounded (dates, sources, languages
    * — not user ids): each value is a directory and a listing entry. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortBy: Seq[String] = Nil, files: Int = 1,
                       format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    val keys = (partitionCols ++ sortBy).map(col)
    df.repartitionByRange(math.max(files, 1), keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").format(format)
      .partitionBy(partitionCols: _*)
      .save(path)
    graft.engine.Graft.invalidate(path)
  }
}
