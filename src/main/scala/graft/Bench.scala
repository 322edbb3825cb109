package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement rules (VERDICT r1 findings #2-#4):
  *  - materialize through the noop sink (count() lets Catalyst prune every
  *    projected column, so select-shaped queries would be timed as
  *    count-only scans);
  *  - one untimed warmup pass (JIT/codegen), then median of 3 timed runs;
  *  - failures are NOT swallowed: the per-query error is recorded in the
  *    JSON and the process exits non-zero.
  */
object Bench {
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      try {
        materialize(fn(spark, sfDir)) // warmup, untimed
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          materialize(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        runs(1) // median of 3
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          -1.0
      }
    }

    val results = names.map(n => n -> timeOne(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    spark.stop()
    // Clean stdout line (build.sbt sets run/outputStrategy=StdoutOutput so
    // sbt does not [info]-prefix it) + a file copy for the driver.
    println(line)
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    if (errors.nonEmpty) sys.exit(1)
  }
}
