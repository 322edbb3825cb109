package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the engine.
  *
  * The reference (manticoresoftware/columnar) reads one columnar file per
  * table segment (columnar/columnar.cpp:408-440, 769-789); our segments are
  * Parquet files/directories — Spark's vectorized Parquet reader supplies the
  * per-block adaptive decoding, zone-map (row-group/page stats) pruning and
  * late materialization that the reference hand-rolls per packing
  * (columnar/accessor/accessorint.cpp:137-276, builderminmax.h:138-164).
  *
  * Scale notes (100 TB): every knob here is set so the same code runs on a
  * real cluster — AQE on (runtime re-plan + skew-join handling), shuffle
  * partitions sized for the local harness via constructor arg (a cluster
  * deployment overrides `spark.sql.shuffle.partitions` per job), and
  * broadcast joins left to Catalyst + AQE thresholds.
  */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def session(appName: String = "graft", master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      // Engine planner rules (hash-companion rewrite, ANN routing,
      // secondary-index access-path routing) — same registration a
      // cluster deployment uses via --conf spark.sql.extensions.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Local fixtures are single small files; with the default 4 MiB
      // openCostInBytes Spark reads each as ONE split and every scan-heavy
      // stage runs single-threaded. Cheap open cost + a minPartitionNum of
      // 2×cores restores split parallelism on small files without changing
      // cluster-scale behavior (large files still split by maxPartitionBytes).
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .config("spark.sql.files.minPartitionNum", (shufflePartitions * 2).toString)
      // Historical fixtures carried TIMESTAMP(NANOS), which Spark has no
      // native type for — read those as Long epoch nanos. Current fixtures
      // ship timestamp[us] (→ TIMESTAMP_NTZ on read); event-time operators
      // accept either via graft.relational.EventTime.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Storage location of one star-schema table in a scale-factor dir. */
  def tablePath(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one table of the star schema from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(tablePath(dir, name))
}
