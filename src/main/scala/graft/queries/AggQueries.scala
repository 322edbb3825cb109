package graft.queries

import org.apache.spark.sql.functions._
import graft.filters._

/** Aggregation / count / top-k corpus — the host-side capabilities the
  * reference feeds via rowid streams and index metadata (SURVEY.md §2.6),
  * implemented natively: hash aggregation with map-side partials, metadata
  * counts (I6), exact count-distinct (I7), min/max from zone-map roots (Z1),
  * and cutoff/top-k pushdown (Z6 → TakeOrderedAndProject).
  *
  * Double-typed aggregates are rounded in BOTH engines: Spark's partial
  * aggregation order is nondeterministic, so unrounded float sums are not
  * bitwise stable across runs, let alone engines. */
object AggQueries {

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q1 shape: the flagship scan→filter→hash-agg pipeline.
    "q1_agg" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(TsRange("l_shipdate", hi = Some("1998-09-01T00:00:00")).toColumn)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n")),
      Some("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity),2) AS sum_qty, " +
        "round(sum(l_extendedprice),2) AS sum_base, " +
        "round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc, " +
        "round(avg(l_quantity),4) AS avg_qty, " +
        "round(avg(l_discount),4) AS avg_disc, " +
        "count(*) AS n FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus")),

    // Metadata-only count — Parquet answers count(*) from footers, the
    // analog of the reference's stored per-value counts (I6).
    "q_count_star" -> QueryDef(
      (s, d) => t(s, d, "lineitem").groupBy().agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    // CalcCount: exact COUNT(*) under a filter without materializing rows
    // (secondary/secondary.cpp:774-812).
    "q_count_filter" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(Filters.compileAll(Seq(
          FloatRange("l_discount", lo = Some(0.05), hi = Some(0.07)),
          FloatRange("l_quantity", hi = Some(24.0), hiIncl = false))))
        .groupBy().agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem " +
        "WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0")),

    // GetCountDistinct (I7) — exact ndv; the approx (HLL++) path is covered
    // in StatsSpec since approximate answers have no byte-stable oracle.
    "q_count_distinct" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy().agg(
          countDistinct(col("l_partkey")).as("ndv_part"),
          countDistinct(col("l_suppkey")).as("ndv_supp")),
      Some("SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv_part, " +
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ndv_supp FROM lineitem")),

    // MIN/MAX from storage stats (zone-map tree root, builderminmax.h:166-178).
    "q_minmax" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy().agg(
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok")),
      Some("SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship, " +
        "round(min(l_extendedprice),2) AS min_price, " +
        "round(max(l_extendedprice),2) AS max_price, " +
        "min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok FROM lineitem")),

    // Facet counts over a dictionary-encoded column (TABLE packing makes
    // this cheap in the reference — builderint.cpp:218-219; dictionary-aware
    // Parquet read + partial hash agg is the Spark analog).
    "q_facet" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY l_returnflag, l_linestatus")),

    // Multi-dimension group-by with mixed aggregates.
    "q_group_multi" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price")),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        "round(sum(o_totalprice),2) AS sum_price, " +
        "round(avg(o_totalprice),4) AS avg_price " +
        "FROM orders GROUP BY o_orderstatus, o_orderpriority")),

    // Ordered-set aggregates: exact interpolated percentiles (both engines
    // use linear interpolation; rounding absorbs the last-ulp arithmetic).
    "q_percentile" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
          count(lit(1)).as("n")),
      Some("SELECT o_orderstatus, " +
        "round(quantile_cont(o_totalprice, 0.5), 2) AS median_price, " +
        "round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price, " +
        "count(*) AS n FROM orders GROUP BY o_orderstatus")),

    // Cutoff / top-k pushdown (Z6): ORDER BY + LIMIT lowers to a heap
    // (TakeOrderedAndProject) — no global sort, no full shuffle.
    "q_topk" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"))
  )
}
