package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling spot-check (VERDICT r9 #8): run the most expensive gate
  * queries at 10× the bench scale and record how their wall-times grow.
  * A query whose time grows much faster than the data (beyond a fixed
  * scheduling allowance) has a hidden driver-side loop, an all-pairs
  * join, or a skew hotspot that a real cluster would hit at 100 TB — the
  * local[32] analog of the scale-up test a 1000-executor rollout gets.
  *
  * The 10× dataset derives from the sf0.1 fixtures (no synthetic data):
  * each table unions `factor` key-shifted replicas — every foreign key
  * shifts by the same per-replica offset, so join cardinalities per
  * replica match the original exactly. Document text is Caesar-shifted
  * per replica: replica contents stay statistically identical (same
  * lengths, same shingle structure) while sharing no shingles ACROSS
  * replicas — without this, near-dup queries would face quadratic
  * cross-replica pair blowup that is a property of replicated data, not
  * of the engine. Dimensions (nation, region) copy verbatim, as at any
  * scale factor.
  *
  * Output: BENCH_SF1.json with per-query (small, large, ratio) and a
  * `linear_ok` verdict per query: large <= small * factor * 1.5 + 1.0 s
  * (50% slack for shuffle-width effects + a fixed scheduling allowance —
  * sub-second queries are dominated by job setup, not data).
  */
object BenchScale {

  /** The headline set: the most expensive queries of bench_ref.json,
    * spanning every heavy path — LSH dedup, the e2e curation pipeline,
    * tf-idf, the TPC-H-shaped join pipelines, percentiles, both ANN
    * index families' search loops, and (r10-2) the automatic routed
    * paths whose driver-orchestrated pieces — the filtered graph walk's
    * id job + broadcast, the cross-index OR's postings union — are
    * exactly where a hidden super-linear cost would hide. */
  val Queries: Seq[String] = Seq(
    "q_pipeline_e2e", "q_dedup_near", "q_dedup_simhash", "q_text_tfidf",
    "q_mjoin_region", "q_mjoin_pricing", "q_join_large", "q_percentile",
    "q_knn_adaptive", "q_knn_filtered_ivf",
    "q_knn_filtered_graph_auto", "q_index_auto_or_cross",
    // r12: the event-time operators — the band join's bucket fanout and
    // the as-of join's union+window are exactly the shapes that would go
    // quadratic if mis-keyed (replicas are disjoint in user_id AND in
    // event time, so per-replica join structure matches the original)
    "q_join_asof", "q_join_range",
    // r12-2: the new heavy pipeline operators — incremental dedup (store
    // build + probe join), the repetition expression sweep, and the v2
    // flagship chain (every round-12 operator in one plan)
    "q_dedup_incremental", "q_text_repetition", "q_pipeline_v2",
    // r12-3: decontamination (the broadcast eval side grows with the
    // replicas — the probe must stay one corpus pass), the two-phase
    // budget cut (its windows must scale with (group, score) runs, not
    // group sizes), the v3 flagship chain, and the funnel (one aggregate
    // per step, never a whole-history window)
    "q_decontaminate", "q_mix_budget", "q_pipeline_v3", "q_funnel",
    // r12-4: the interval join's bucket explode must stay ~2 rows per
    // interval as both sides scale
    "q_join_interval")

  /** Per-replica key offset — far above any sf0.1 key. */
  val Off = 100000000L

  private def caesar(c: org.apache.spark.sql.Column, i: Int) = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val s = i % 26
    val from = lower + upper
    val to = lower.drop(s) + lower.take(s) + upper.drop(s) + upper.take(s)
    translate(c, from, to)
  }

  private def replicate(df: DataFrame, factor: Int, keyCols: Seq[String],
                        textCols: Seq[String]): DataFrame =
    (0 until factor).map { i =>
      var out = df
      keyCols.foreach(k => out = out.withColumn(k, col(k) + lit(i * Off)))
      if (i > 0) textCols.foreach(t => out = out.withColumn(t, caesar(col(t), i)))
      out
    }.reduce(_ unionByName _)

  /** Build the scaled tables under `dst` (memoized by _SUCCESS). */
  def buildScaled(spark: SparkSession, src: String, dst: String,
                  factor: Int): Unit = {
    val specs: Seq[(String, Seq[String], Seq[String], String, Int)] = Seq(
      // (table, shifted keys, caesar'd text cols, sort key, files)
      ("orders", Seq("o_orderkey", "o_custkey"), Nil, "o_orderkey", 8),
      ("lineitem", Seq("l_orderkey"), Nil, "l_orderkey", 8),
      ("customer", Seq("c_custkey"), Nil, "c_custkey", 4),
      ("documents", Seq("doc_id"), Seq("text"), "doc_id", 4),
      ("embeddings", Seq("vec_id"), Nil, "vec_id", 4),
      ("nation", Nil, Nil, "n_nationkey", 1),
      ("region", Nil, Nil, "r_regionkey", 1))
    specs.foreach { case (t, keys, texts, sortKey, files) =>
      val path = s"$dst/$t.parquet"
      val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(done)) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val scaled =
          if (keys.isEmpty && texts.isEmpty) base // dimension: verbatim
          else replicate(base, factor, keys, texts)
        graft.tables.Writer.write(scaled, path, sortBy = Seq(sortKey),
          files = files)
      }
    }
    // events: ids shift like any key, and each replica's EVENT TIME shifts
    // by a year — far beyond any band width or session gap — so the
    // per-replica temporal structure (neighbor counts, as-of matches,
    // windows, sessions) is identical to the original. Without the time
    // shift, 10× density in the same span would grow band-join pairs
    // quadratically — a property of replicated data, not of the engine
    // (the Caesar-shift trick's temporal analog).
    locally {
      val path = s"$dst/events.parquet"
      val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(done)) {
        val base = spark.read.parquet(s"$src/events.parquet")
        val scaled = (0 until factor).map { i =>
          base
            .withColumn("event_id", col("event_id") + lit(i * Off))
            .withColumn("user_id", col("user_id") + lit(i * Off))
            .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 366} DAYS"))
        }.reduce(_ unionByName _)
        graft.tables.Writer.write(scaled, path, sortBy = Seq("event_id"),
          files = 4)
      }
    }
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def loadavg(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")(0).toDouble
    catch { case _: Exception => -1.0 }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val loadStart = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .config("spark.sql.files.minPartitionNum", (cpus.toInt * 2).toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildScaled(spark, src, dst, factor)

    def median3(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      materialize(fn(spark, dir)) // warmup (also builds memoized indexes)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        materialize(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("factor", factor)
    root.put("src", src)
    root.put("dst", dst)
    root.put("loadavg_start", loadStart)
    val qn = root.putObject("queries")
    var allOk = true
    Queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val small = median3(fn, src)
      val large = median3(fn, dst)
      val ratio = if (small > 0) large / small else -1.0
      val ok = large <= small * factor * 1.5 + 1.0
      allOk &&= ok
      val n = qn.putObject(name)
      n.put("small_sec", math.round(small * 1e4) / 1e4)
      n.put("large_sec", math.round(large * 1e4) / 1e4)
      n.put("ratio", math.round(ratio * 100) / 100.0)
      n.put("linear_ok", ok)
      println(f"$name%-22s $small%8.3fs -> $large%8.3fs  ratio ${ratio}%6.2f  ok=$ok")
    }
    root.put("loadavg_end", loadavg())
    root.put("all_linear_ok", allOk)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SF1.json"),
      om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    println(om.writeValueAsString(root))
    spark.stop()
    if (!allOk) sys.exit(2)
  }
}
