package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * DataFrame program over a scale-factor directory; `oracleSql` carries the
  * equivalent ANSI SQL the driver's DuckDB oracle runs over the same parquet
  * tables (column names aligned — the compare hashes values under sorted
  * column names).
  */
object SparkEntry {

  private val families: Seq[Map[String, QueryDef]] = Seq(
    FilterQueries.defs,
    AggQueries.defs,
    VectorQueries.defs,
    RelationalQueries.defs,
    TextQueries.defs,
    DedupQueries.defs,
    StatsQueries.defs,
    PipelineQueries.defs,
    IndexQueries.defs
  )

  private lazy val all: Map[String, QueryDef] = {
    val merged = families.flatten.toMap
    val dupes = families.map(_.keySet).flatten
      .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    require(dupes.isEmpty, s"duplicate query names: $dupes")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
