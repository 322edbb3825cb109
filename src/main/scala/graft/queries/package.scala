package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One corpus entry: the Spark implementation plus (when SQL-expressible)
    * the equivalent ANSI SQL the DuckDB oracle runs on the same tables.
    * Column names/aliases MUST match between the two — the driver sorts
    * columns by name before hashing. */
  final case class QueryDef(fn: (SparkSession, String) => DataFrame,
                            oracle: Option[String])

  private[queries] def t(s: SparkSession, dir: String, name: String): DataFrame =
    engine.Graft.table(s, dir, name)
}
