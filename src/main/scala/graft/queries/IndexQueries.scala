package graft.queries

import org.apache.spark.sql.functions._
import graft.index.SecondaryIndex
import graft.tables.Derived

/** Oracle-checked corpus for the secondary-index access paths (I1-I4, I6):
  * lookups answered THROUGH the engine-written index table, compared to the
  * oracle's direct filters over the base table.
  */
object IndexQueries {

  val defs: Map[String, QueryDef] = Map(

    // I3+I4: point lookup via index postings, semi-joined back to the fact
    // table (the rowid-stream path of SURVEY §3.2).
    "q_index_lookup" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx")
        val keys = SecondaryIndex.lookupKeys(s, idxPath, Seq("1-URGENT", "2-HIGH"))
        SecondaryIndex.semiJoin(t(s, d, "orders"), "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_orderpriority"))
      },
      Some("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority IN ('1-URGENT','2-HIGH')")),

    // I2/I3: rowid-window range probe — the per-chunk (chunk_min, chunk_max)
    // stats skip whole posting chunks before exploding anything (the
    // reference's block-level seek, secondary/blockreader.h:82-89).
    "q_index_range" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx")
        val keys = SecondaryIndex.lookupKeys(s, idxPath, Seq("1-URGENT"),
          keyRange = Some((1000L, 30000L)))
        SecondaryIndex.semiJoin(t(s, d, "orders"), "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_orderpriority"))
      },
      Some("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority = '1-URGENT' " +
        "AND o_orderkey BETWEEN 1000 AND 30000")),

    // I3: VALUE-range lookup served from the index (ref range FixupFilter,
    // secondary/secondary.cpp:680-744) — the interval predicate runs on the
    // value-clustered index table (file/row-group pruning on `value`), the
    // postings semi-join back to the fact table. Oracle filters the base
    // table directly.
    "q_index_vrange" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        val keys = SecondaryIndex.lookupRangeKeys(s, idxPath,
          lo = Some(500L), hi = Some(1500L))
        SecondaryIndex.semiJoin(t(s, d, "orders"), "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("SELECT o_orderkey, o_custkey FROM orders " +
        "WHERE o_custkey BETWEEN 500 AND 1500")),

    // I3/F3: FLOATRANGE through the index — double-valued interval with an
    // exclusive upper bound (the reference's float range block readers;
    // bounds are exact double literals on both sides, so the predicates
    // agree bit-for-bit).
    "q_index_frange" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_price_idx")
        val keys = SecondaryIndex.lookupRangeKeys(s, idxPath,
          lo = Some(50000.0), hi = Some(100000.0), hiInclusive = false)
        SecondaryIndex.semiJoin(t(s, d, "orders"), "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice >= 50000.0 AND o_totalprice < 100000.0")),

    // I3+I6: half-open EXCLUSIVE value range, count served index-only from
    // the stored per-chunk counts (the reference's CalcCount over the
    // range-selected block list, secondary.cpp:774-812).
    "q_index_vrange_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        Seq(SecondaryIndex.calcCountRange(s, idxPath,
          lo = Some(1000L), hi = None, loInclusive = false)).toDF("cnt")
      },
      Some("SELECT count(*) AS cnt FROM orders WHERE o_custkey > 1000")),

    // I9: lookup over a SEGMENTED index (initial build + appended batch,
    // never compacted) — a (value, chunk) group split across segments
    // unions at explode time, so reads are correct immediately after an
    // append (the reference's per-segment indexes before merge).
    "q_index_seg_lookup" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx_seg")
        val keys = SecondaryIndex.lookupKeys(s, idxPath, Seq("2-HIGH"))
        SecondaryIndex.semiJoin(t(s, d, "orders"), "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_orderpriority"))
      },
      Some("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority = '2-HIGH'")),

    // F5 via index: NOTNULL answered from the postings (ref fullscan-limits
    // path, secondary.cpp:50-76) — union of the non-null value groups,
    // semi-joined back; rows whose indexed value is NULL live in the null
    // group and are excluded. The fixture's NULLs are real: customers with
    // no orders (LEFT JOIN derivation).
    "q_index_notnull" -> QueryDef(
      (s, d) => {
        val base = Derived.tablePath(s, d, "cust_last")
        val keys = SecondaryIndex.lookupNotNullKeys(s, base + "_idx")
        SecondaryIndex.semiJoin(Derived.table(s, d, "cust_last"),
            "c_custkey", keys)
          .select(col("c_custkey"), col("last_odate"))
      },
      Some("WITH cust_last AS (SELECT c_custkey, max(o_orderdate) AS last_odate " +
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey " +
        "GROUP BY c_custkey) " +
        "SELECT c_custkey, last_odate FROM cust_last " +
        "WHERE last_odate IS NOT NULL")),

    // F5+I6: NOTNULL count from stored per-chunk counts — index-only.
    "q_index_notnull_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val base = Derived.tablePath(s, d, "cust_last")
        Seq(SecondaryIndex.calcCountNotNull(s, base + "_idx")).toDF("cnt")
      },
      Some("WITH cust_last AS (SELECT c_custkey, max(o_orderdate) AS last_odate " +
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey " +
        "GROUP BY c_custkey) " +
        "SELECT count(*) AS cnt FROM cust_last WHERE last_odate IS NOT NULL")),

    // I6: CalcCount from stored postings counts — index-only, the fact
    // table is never scanned.
    "q_index_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx")
        Seq(SecondaryIndex.calcCount(s, idxPath, Seq("3-MEDIUM"))).toDF("cnt")
      },
      Some("SELECT count(*) AS cnt FROM orders WHERE o_orderpriority = '3-MEDIUM'"))
  )
}
