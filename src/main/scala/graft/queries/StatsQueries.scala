package graft.queries

import graft.stats.Stats

/** Metadata-only corpus: answers computed from Parquet footers with ZERO
  * data pages scanned (graft.stats.Stats), checked against the oracle's
  * full-scan answers — proving the I6/Z1/Z4 analogs give exact results
  * where they are legal.
  */
object StatsQueries {

  val defs: Map[String, QueryDef] = Map(

    // I6 CalcCount: exact COUNT(*) from footer row counts.
    "q_meta_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        Seq(Stats.rowCount(s"$d/lineitem.parquet")).toDF("cnt")
      },
      Some("SELECT count(*) AS cnt FROM lineitem")),

    // Z1 min/max tree root: exact numeric MIN/MAX from footer stats.
    "q_meta_minmax" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val p = s"$d/lineitem.parquet"
        val (minOk, maxOk) = Stats.minMax(p, "l_orderkey").get match {
          case (a: Long, b: Long) => (a, b)
        }
        val (minPr, maxPr) = Stats.minMax(p, "l_extendedprice").get match {
          case (a: Double, b: Double) => (a, b)
        }
        Seq((minOk, maxOk, minPr, maxPr))
          .toDF("min_ok", "max_ok", "min_price", "max_price")
      },
      Some("SELECT min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok, " +
        "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price " +
        "FROM lineitem"))
  )
}
