package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run.
  *
  * `spark.sql.codegen.fallback=false` makes Janino/codegen defects in custom
  * Expressions hard failures in tests instead of silent interpreted-eval
  * slowdowns (the production default tolerates fallback).
  */
object SparkT {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
