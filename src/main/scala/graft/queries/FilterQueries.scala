package graft.queries

import org.apache.spark.sql.functions._
import graft.filters._

/** Oracle-checked corpus for the filter algebra (SURVEY.md §2.2, F1-F11).
  * Every query routes through the [[graft.filters.GFilter]] compiler so the
  * e2e gate exercises the library code path, not ad-hoc predicates. */
object FilterQueries {

  val defs: Map[String, QueryDef] = Map(

    // F1 VALUES (IN-list) — accessorint.cpp:920-1027
    "q_values_in" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(Values("l_linenumber", Seq(1L, 3L, 5L, 7L)).toColumn)
        .select(col("l_orderkey"), col("l_linenumber")),
      Some("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_linenumber IN (1,3,5,7)")),

    // F1 single-value fast path — accessorint.cpp:930
    "q_values_single" -> QueryDef(
      (s, d) => t(s, d, "part")
        .filter(Values("p_size", Seq(25L)).toColumn)
        .select(col("p_partkey"), col("p_size")),
      Some("SELECT p_partkey, p_size FROM part WHERE p_size = 25")),

    // F1 + F8 exclude (NOT IN) — accessorint.cpp:506, blockreader.cpp:563-573
    "q_values_excl" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(Values("l_linenumber", Seq(1L, 2L), exclude = true).toColumn)
        .select(col("l_orderkey"), col("l_linenumber")),
      Some("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_linenumber NOT IN (1,2)")),

    // F2 RANGE half-open — interval.h:24-67
    "q_range_int" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter(IntRange("o_custkey", lo = Some(100L), hi = Some(500L),
          loIncl = true, hiIncl = false).toColumn)
        .select(col("o_orderkey"), col("o_custkey")),
      Some("SELECT o_orderkey, o_custkey FROM orders " +
        "WHERE o_custkey >= 100 AND o_custkey < 500")),

    // F2 RANGE right-unbounded, open
    "q_range_open" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(FloatRange("l_extendedprice", lo = Some(50000.0),
          loIncl = false).toColumn)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_extendedprice > 50000.0")),

    // F2 RANGE on timestamps (reference treats TIMESTAMP as UINT32 —
    // common/filter.cpp:29-31)
    "q_ts_range" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(TsRange("l_shipdate", lo = Some("1996-01-01T00:00:00"),
          hi = Some("1997-01-01T00:00:00"), hiIncl = false).toColumn)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT l_returnflag, count(*) AS n FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY l_returnflag")),

    // F3 FLOATRANGE incl. negative bound — common/filter.cpp:48-63
    "q_floatrange" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .filter(FloatRange("c_acctbal", lo = Some(-500.5), hi = Some(2000.25),
          loIncl = true, hiIncl = false).toColumn)
        .select(col("c_custkey"), col("c_acctbal")),
      Some("SELECT c_custkey, c_acctbal FROM customer " +
        "WHERE c_acctbal >= -500.5 AND c_acctbal < 2000.25")),

    // F4 STRINGS set equality — accessorstr.cpp:599-642
    "q_strings_in" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .filter(Strings("c_mktsegment", Seq("BUILDING", "AUTOMOBILE")).toColumn)
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')")),

    // F4 + F8 STRINGS exclude
    "q_strings_excl" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter(Strings("o_orderpriority", Seq("1-URGENT", "2-HIGH"),
          exclude = true).toColumn)
        .select(col("o_orderkey"), col("o_orderpriority")),
      Some("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')")),

    // F5 NOTNULL, Arr kind: non-empty array over the stored MVA table
    // (empty ≠ missing — filter.h:35; accessormva empty-set semantics).
    "q_notnull_arr" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .filter(NotNullF("tags", NotNull.Arr).toColumn)
        .groupBy().agg(count(lit(1)).as("n")),
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT count(*) AS n FROM tagged " +
        "WHERE tags IS NOT NULL AND len(tags) > 0")),

    // F5 NOTNULL, Scalar kind (plain IS NOT NULL).
    "q_notnull_scalar" -> QueryDef(
      (s, d) => t(s, d, "events")
        .filter(NotNullF("value", NotNull.Scalar).toColumn)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      Some("SELECT event_type, count(*) AS n FROM events " +
        "WHERE value IS NOT NULL GROUP BY event_type")),

    // F5 NOTNULL (non-empty string; empty ≠ missing — filter.h:35)
    "q_notnull" -> QueryDef(
      (s, d) => t(s, d, "events")
        .filter(NotNullF("props", NotNull.Str).toColumn)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT event_type, count(*) AS n FROM events " +
        "WHERE props IS NOT NULL AND length(props) > 0 GROUP BY event_type")),

    // F6 MVA ANY membership over a sorted set column — accessormva.cpp:71-139.
    // The array column is STORED (engine-written mcl_attrs table, the analog
    // of UINT32SET storage, accessormva.cpp:615-659): derivation is billed
    // once to the writer, and the filter here pushes into a plain scan of a
    // table sorted by l_orderkey. The oracle derives the same table as a CTE.
    "q_mva_any" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .filter(MvaValues("tags", Seq(6L, 7L), AnyQ).toColumn)
        .select(col("l_orderkey")),
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM tagged WHERE list_has_any(tags, [6,7])")),

    // F7 MVA ALL (empty array never matches include — accessormva.cpp:38-45)
    "q_mva_all" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .filter(MvaValues("tags", Seq(1L, 2L, 3L), AllQ).toColumn)
        .select(col("l_orderkey")),
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM tagged " +
        "WHERE len(tags) > 0 AND list_has_all([1,2,3], tags)")),

    // F6 MVA ANY-range (binary-search range overlap in the reference)
    "q_mva_any_range" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .filter(MvaRange("tags", lo = Some(5L), hi = Some(6L),
          quant = AnyQ).toColumn)
        .select(col("l_orderkey")),
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM tagged " +
        "WHERE len(list_filter(tags, x -> x >= 5 AND x <= 6)) > 0")),

    // F7 + F8 MVA ALL exclude (XOR composition — accessormva.cpp:61-62)
    "q_mva_all_excl" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .filter(MvaValues("tags", Seq(1L, 2L), AllQ, exclude = true).toColumn)
        .select(col("l_orderkey")),
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM tagged " +
        "WHERE NOT (len(tags) > 0 AND list_has_all([1,2], tags))")),

    // F9 rowid-window pseudo-filter — columnar.cpp:575-611
    "q_rowid_window" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(RowidWindow("l_orderkey", 1000L, 2000L).toColumn)
        .groupBy()
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem " +
        "WHERE l_orderkey >= 1000 AND l_orderkey < 2000")),

    // F11 multi-filter conjunction in one scan — columnar.cpp:721-746
    "q_conj" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(Filters.compileAll(Seq(
          TsRange("l_shipdate", lo = Some("1996-01-01T00:00:00")),
          FloatRange("l_discount", lo = Some(0.05), hi = Some(0.07)),
          Values("l_linenumber", Seq(1L, 2L, 3L)))))
        .select(col("l_orderkey"), col("l_linenumber")),
      Some("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_discount >= 0.05 AND l_discount <= 0.07 " +
        "AND l_linenumber IN (1,2,3)")),

    // S3 write -> re-read round trip: the stored mcl_attrs table must carry
    // exactly the data the oracle derives from lineitem (ref build path,
    // columnar/builder.cpp:149-249).
    "q_roundtrip" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "mcl_attrs")
        .groupBy()
        .agg(count(lit(1)).as("n_orders"),
          sum(size(col("tags"))).as("n_tags"),
          sum(expr("aggregate(tags, 0L, (a, x) -> a + x)")).as("tag_sum")),
      // sums are cast to BIGINT: DuckDB sum(BIGINT) returns HUGEINT, which
      // lands in pandas as float64 and string-normalizes as "45832.0" vs the
      // Spark long's "45832" — same value, failed hash (r3 gate).
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT count(*) AS n_orders, CAST(sum(len(tags)) AS BIGINT) AS n_tags, " +
        "CAST(sum(list_sum(tags)) AS BIGINT) AS tag_sum FROM tagged")),

    // S1/S3 source-format breadth: the same filter+project served from the
    // engine's ORC copy of orders (range-clustered sorted ORC write; the
    // predicate pushes into the ORC reader and prunes on stripe/file
    // stats). Oracle reads the parquet fixture — matching rows prove the
    // ORC round trip end to end.
    "q_source_orc" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "orders_orc")
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") <= 5000 &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_orderkey BETWEEN 1000 AND 5000 " +
        "AND o_orderpriority = '1-URGENT'")),

    // Z-ORDERED layout (r12): the derived events copy is Morton-clustered
    // by (user_id, value), so this two-dimensional predicate prunes files
    // on BOTH columns (LayoutSpec pins the pruning economics; a sortBy
    // layout prunes only its own column). Results are layout-independent —
    // the oracle reads the original table.
    "q_source_zorder" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "events_z")
        .filter(col("user_id") >= 100 && col("user_id") <= 120 &&
          col("value") >= 10.0 && col("value") <= 60.0)
        .select(col("event_id"), col("user_id"), col("value")),
      Some("SELECT event_id, user_id, value FROM events " +
        "WHERE user_id BETWEEN 100 AND 120 AND value BETWEEN 10.0 AND 60.0")),

    // HIVE-PARTITIONED layout (r12): the derived documents copy keeps one
    // directory per language, so this predicate prunes whole directories
    // from the listing alone — planning-time pruning before any footer or
    // index (LayoutSpec pins the PartitionFilters plan + directory
    // layout). Results are layout-independent: the oracle reads the
    // original table.
    "q_source_partitioned" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "documents_bylang")
        .filter(col("lang") === "de" && col("n_chars") >= 100L)
        .select(col("doc_id"), col("source"), col("n_chars")),
      Some("SELECT doc_id, source, n_chars FROM documents " +
        "WHERE lang = 'de' AND n_chars >= 100")),

    // F4 hash-companion fast path: filter runs against the engine-written
    // xxhash64 companion column (ref hidden $name_HASH, columnar.cpp:465-473
    // + rewrite common/filter.cpp:77-90); the oracle filters the string
    // directly — results agree modulo 2^-64 collision odds.
    "q_strings_hash" -> QueryDef(
      (s, d) => {
        val c = graft.tables.Derived.table(s, d, "customer_h")
        val hc = col("c_mktsegment" + graft.tables.Writer.HashSuffix)
        // xxhash64(lit) is constant-folded by Catalyst, so the predicate
        // reaches the scan as a literal IN — pushdown-friendly.
        c.filter(Seq("BUILDING", "AUTOMOBILE")
            .map(v => hc === graft.tables.Writer.companionHash(lit(v)))
            .reduce(_ || _))
          .select(col("c_custkey"), col("c_mktsegment"))
      },
      Some("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')"))
  )
}
