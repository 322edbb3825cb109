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

    // I9 DELETE maintenance (r20, VERDICT r19 #6): the orders_del fixture
    // deleted o_orderkey % 10 = 3 from the fact AND subtracted those keys
    // from the index via SecondaryIndex.deleteKeys (postings subtraction —
    // never a fact re-scan); the lookup serves post-delete state exactly,
    // and the oracle replays the delete predicate over the base table.
    "q_index_delete" -> QueryDef(
      (s, d) => {
        val base = Derived.tablePath(s, d, "orders_del")
        val keys = SecondaryIndex.lookupKeys(s, base + "_idx",
          Seq("1-URGENT", "2-HIGH"))
        SecondaryIndex.semiJoin(Derived.table(s, d, "orders_del"),
            "o_orderkey", keys)
          .select(col("o_orderkey"), col("o_orderpriority"))
      },
      Some("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority IN ('1-URGENT','2-HIGH') " +
        "AND o_orderkey % 10 <> 3")),

    // I6 over the deleted index: CalcCount's stored per-chunk counts
    // reflect the subtraction (cnt decrements rode the re-aggregation) —
    // index-only, zero fact IO.
    "q_index_delete_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val base = Derived.tablePath(s, d, "orders_del")
        Seq(SecondaryIndex.calcCount(s, base + "_idx", Seq("3-MEDIUM")))
          .toDF("cnt")
      },
      Some("SELECT count(*) AS cnt FROM orders " +
        "WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 10 <> 3")),

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

    // I1-I4 AUTOMATICALLY ROUTED (VERDICT r8 #1 — the reference host's
    // automatic access-path choice, columnar.cpp:649-675 +
    // secondary.cpp:745-812): the query is a PLAIN filter() over the BASE
    // orders table; registering the o_custkey index makes IndexRoutingRule
    // rewrite it into the postings semi-join at plan time, cost-gated on
    // the registration-time ndv estimate (1/ndv ≪ threshold here). The
    // routed-vs-bypassed plan shapes at both ends of the selectivity gate
    // are pinned by IndexRoutingSpec. Registration is table-level session
    // state, exactly like the ANN side (q_knn_ivf).
    "q_index_auto" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders").filter(col("o_custkey") === 421)
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey = 421")),

    // I3 AUTOMATICALLY ROUTED, value-range shape: a narrow BETWEEN routes
    // through the postings (the span estimate against the index's value
    // bounds — the EstimateMinMax seam); a broad range stays on the scan
    // (IndexRoutingSpec pins the bypass end).
    "q_index_auto_range" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") >= 100 && col("o_custkey") <= 140)
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("SELECT o_orderkey, o_custkey FROM orders " +
        "WHERE o_custkey BETWEEN 100 AND 140")),

    // I6 AUTOMATICALLY ROUTED: a plain count() over a filtered base table
    // lowers to the index-only sum(cnt) (the reference's CalcCount
    // short-circuit is host-automatic, secondary.cpp:774-812) — the fact
    // table never appears in the plan (IndexRoutingSpec pins this).
    "q_index_auto_count" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders").filter(col("o_custkey") === 421)
          .agg(count(lit(1)).as("cnt"))
      },
      Some("SELECT count(*) AS cnt FROM orders WHERE o_custkey = 421")),

    // I1+H5 AUTOMATICALLY ROUTED sorted retrieval (r10 VERDICT #4 — the
    // postings are value-sorted by construction, the builder's external
    // sort, secondary/builder.cpp:43-44, 314-461, so the reference host
    // can stream rowids in value order): a plain
    // `orderBy(valueCol, keyCol).limit(k)` over the registered base is
    // rewritten to take the FIRST ~k index rows in (value, chunk) order,
    // probe the fact table ONCE with their exploded rowids, and let the
    // untouched Sort/Limit re-sort the ~k survivors — no full-fact
    // TakeOrdered scan. The keyCol tie-break makes the result
    // deterministic on both sides; IndexRoutingSpec pins the routed plan,
    // the broad-k bypass, and the null/desc variants.
    "q_index_auto_topk" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders")
          .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("SELECT o_orderkey, o_custkey FROM orders " +
        "ORDER BY o_custkey, o_orderkey LIMIT 100")),

    // The same sorted-retrieval shape over a SEGMENTED index (r12): the
    // route re-merges (value, chunk) groups split across segment files
    // before taking the prefix (the reference's value-sorted runs survive
    // segment merges, secondary/builder.cpp:314-461). events is the one
    // base with no competing canonical index, so this gate exercises the
    // merge path deterministically regardless of registration order.
    "q_index_auto_topk_seg" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "events_uid_idx_seg")
        graft.plans.IndexRouting.register(s, s"$d/events.parquet", idxPath,
          "user_id", "event_id")
        t(s, d, "events")
          .orderBy(col("user_id").asc, col("event_id").asc)
          .limit(100)
          .select(col("event_id"), col("user_id"))
      },
      Some("SELECT event_id, user_id FROM events " +
        "ORDER BY user_id, event_id LIMIT 100")),

    // H4 via index, AUTOMATICALLY ROUTED: a plain groupBy(col).count()
    // over the registered table lowers to the index-only (value, sum(cnt))
    // facet — the postings counts ARE the dictionary the reference's
    // TABLE-packed columns hand their host for cheap facets
    // (builderint.cpp:218-219); the fact table never appears in the plan
    // (IndexRoutingSpec pins this).
    "q_index_auto_facet" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_orderpriority", "o_orderkey")
        t(s, d, "orders").groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY o_orderpriority")),

    // I7 AUTOMATICALLY ROUTED: DISTINCT and COUNT(DISTINCT) over the
    // indexed column served from the index's value stream (the reference
    // precomputes per-column ndv in the index meta, secondary.cpp:380-388)
    // — the distinct shuffles index rows, never fact rows.
    "q_index_auto_distinct" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_prio_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_orderpriority", "o_orderkey")
        t(s, d, "orders").select(col("o_orderpriority")).distinct()
      },
      Some("SELECT DISTINCT o_orderpriority FROM orders")),

    "q_index_auto_ndv" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders").agg(count_distinct(col("o_custkey")).as("ndv"))
      },
      Some("SELECT count(DISTINCT o_custkey) AS ndv FROM orders")),

    // Index-served MIN/MAX under a range filter (r12): the value-sorted
    // postings answer min/max of the indexed column with zero fact IO —
    // the reference's EstimateMinMax seam made exact (columnar.cpp:
    // 649-675). IndexRoutingSpec pins the plan (no fact scan) and the
    // unroutable mixed-column bypass.
    "q_index_auto_minmax" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") > 100L && col("o_custkey") <= 1200L)
          .agg(min(col("o_custkey")).as("mn"), max(col("o_custkey")).as("mx"))
      },
      Some("SELECT min(o_custkey) AS mn, max(o_custkey) AS mx FROM orders " +
        "WHERE o_custkey > 100 AND o_custkey <= 1200")),

    // Index-served SUM/COUNT of the indexed column (r12): the postings'
    // (value, cnt) pairs answer Σ value·cnt and Σ cnt — zero fact IO,
    // integral columns only (a float sum's addition order is an engine
    // detail the regrouping would perturb).
    "q_index_auto_sum" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") > 100L && col("o_custkey") <= 1200L)
          .agg(sum(col("o_custkey")).as("sv"),
            count(col("o_custkey")).as("cv"))
      },
      Some("SELECT sum(o_custkey)::BIGINT AS sv, count(o_custkey) AS cv " +
        "FROM orders WHERE o_custkey > 100 AND o_custkey <= 1200")),

    // Index-served exact PERCENTILE (r12): Spark's weighted percentile
    // over the postings' (value, cnt) pairs expands to the fact multiset
    // exactly — the PGM rank query answered from the index, zero fact IO.
    "q_index_auto_percentile" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        // round() applies ABOVE the aggregate: wrapping the percentile
        // inside the agg alias (Alias(Round(AggregateExpression))) would
        // not match the routing rule's aggregate pattern, silently
        // benchmarking the unrouted plan (review r12-3; IndexRoutingSpec
        // pins this exact shape as routed)
        t(s, d, "orders")
          .filter(col("o_custkey") > 100L && col("o_custkey") <= 1200L)
          .agg(expr("percentile(o_custkey, 0.5)").as("m0"),
            expr("percentile(o_custkey, 0.9)").as("p0"))
          .select(round(col("m0"), 2).as("med"), round(col("p0"), 2).as("p90"))
      },
      Some("SELECT round(quantile_cont(o_custkey, 0.5), 2) AS med, " +
        "round(quantile_cont(o_custkey, 0.9), 2) AS p90 FROM orders " +
        "WHERE o_custkey > 100 AND o_custkey <= 1200")),

    // F6 via index, AUTOMATICALLY ROUTED: a plain array_contains() filter
    // over a registered MVA index routes through the element postings
    // (the reference accelerates ANY(col) on UINT32SET columns the same
    // way). mcl_parts' element ndv ~ the part table, so one element is
    // far below the gate; the tags index (ndv 7) correctly stays on the
    // scan (IndexRoutingSpec pins both ends).
    "q_index_mva_auto" -> QueryDef(
      (s, d) => {
        val base = Derived.tablePath(s, d, "mcl_parts")
        graft.plans.IndexRouting.register(s, base, base + "_idx",
          "parts", "l_orderkey", mva = true)
        Derived.table(s, d, "mcl_parts")
          .filter(array_contains(col("parts"), lit(50L)))
          .select(col("l_orderkey"))
      },
      Some("WITH parts AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_partkey)) AS parts FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM parts WHERE list_contains(parts, 50)")),

    // F6 via index: MVA ANY served from the postings (ref: the secondary
    // index covers UINT32SET columns, common/schema.h:29-44 — each set
    // element is posted). The IN-list lookup may repeat a key across the
    // two matched values (an order whose tag set holds both 5 and 7); the
    // left-semi join is duplicate-insensitive, so the result equals the
    // plain ANY filter the oracle runs.
    "q_index_mva" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "mcl_attrs_idx")
        val keys = SecondaryIndex.lookupKeys(s, idxPath, Seq(5L, 7L))
        SecondaryIndex.semiJoin(Derived.table(s, d, "mcl_attrs"),
            "l_orderkey", keys)
          .select(col("l_orderkey"))
      },
      Some("WITH tagged AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_linenumber)) AS tags FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM tagged WHERE list_has_any(tags, [5,7])")),

    // VERDICT r9 #1 — MULTI-INDEX INTERSECTION, automatically routed: a
    // plain two-column AND filter where NEITHER side alone clears the
    // selectivity gate (priority 1/5 = 0.2, custkey span ≈ 0.33 at
    // sf0.01) but the PRODUCT does (≈ 0.067): the rule inner-joins the two
    // postings key streams (both tiny) and probes the fact table ONCE —
    // the reference host consumes every eligible filter and intersects
    // the sorted rowid streams (columnar/columnar.cpp:721-746;
    // common/blockiterator.h:39 HintRowID merges,
    // secondary/iterator.cpp:102-143). Single-index fallback when one
    // side is broad is pinned in IndexRoutingSpec.
    "q_index_auto_multi" -> QueryDef(
      (s, d) => {
        val ckeyIdx = Derived.tablePath(s, d, "orders_ckey_idx")
        val prioIdx = Derived.tablePath(s, d, "orders_prio_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", ckeyIdx,
          "o_custkey", "o_orderkey")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", prioIdx,
          "o_orderpriority", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_custkey") >= 1 && col("o_custkey") <= 500)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      },
      Some("SELECT o_orderkey, o_custkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority = '1-URGENT' AND o_custkey BETWEEN 1 AND 500")),

    // VERDICT r9 #2 — OR-of-servable shapes route as ONE postings filter
    // (the reference's native bitmap union: a disjunction on one column is
    // one index pass, SpawnBitmapIterator, secondary/blockreader.cpp:
    // 563-598): point OR range lowers to `value = x OR value BETWEEN a
    // AND b` over the index; estimate = sum of branch estimates. The
    // bypassed broad end is pinned in IndexRoutingSpec.
    "q_index_auto_or" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", idxPath,
          "o_custkey", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") === 421 ||
            (col("o_custkey") >= 100 && col("o_custkey") <= 120))
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("SELECT o_orderkey, o_custkey FROM orders " +
        "WHERE o_custkey = 421 OR o_custkey BETWEEN 100 AND 120")),

    // r10 — routing COMPOSES UNDER JOINS: pushdown leaves the servable
    // filter beside the fact relation inside the join, and the route fires
    // there exactly as at top level (the reference host consumes per-table
    // filters before its own join stage) — the routed fact side then
    // broadcast-joins the dimension. Plan pinned in IndexRoutingSpec.
    "q_index_auto_join" -> QueryDef(
      (s, d) => {
        val ckeyIdx = Derived.tablePath(s, d, "orders_ckey_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", ckeyIdx,
          "o_custkey", "o_orderkey")
        t(s, d, "orders").filter(col("o_custkey") === 421)
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("o_totalprice"))
      },
      Some("SELECT o_orderkey, o_custkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey WHERE o_custkey = 421")),

    // r10 — index-only FACET TOP-K: GROUP BY indexed col + count with an
    // ORDER BY/LIMIT above lowers to the index facet (sum of stored
    // counts, no fact scan) under an untouched TakeOrdered — the
    // composition of H4's facet route with Z6's top-k pushdown. Plan
    // pinned in IndexRoutingSpec.
    "q_index_auto_facet_topk" -> QueryDef(
      (s, d) => {
        val prioIdx = Derived.tablePath(s, d, "orders_prio_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", prioIdx,
          "o_orderpriority", "o_orderkey")
        t(s, d, "orders").groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("o_orderpriority").asc).limit(3)
      },
      Some("SELECT o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY 1 ORDER BY n DESC, o_orderpriority LIMIT 3")),

    // r10 — CROSS-INDEX OR UNION: a disjunction across TWO columns, each
    // branch fully served by its own index (`o_custkey = 421 OR
    // o_totalprice < 1500`), unions the per-branch postings key streams
    // into one deduped key set (the reference's rowid-bitmap union across
    // filter iterators — SpawnBitmapIterator unions within an index,
    // secondary/blockreader.cpp:563-598, and the host's filter tree ORs
    // across iterators the same way) and probes the fact table ONCE.
    // Estimate = sum of the branch estimates; the broad end's bypass and
    // the both-streams plan shape are pinned in IndexRoutingSpec.
    "q_index_auto_or_cross" -> QueryDef(
      (s, d) => {
        val ckeyIdx = Derived.tablePath(s, d, "orders_ckey_idx")
        val priceIdx = Derived.tablePath(s, d, "orders_price_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", ckeyIdx,
          "o_custkey", "o_orderkey")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", priceIdx,
          "o_totalprice", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") === 421 || col("o_totalprice") < 1500.0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_custkey = 421 OR o_totalprice < 1500.0")),

    // r10 — STRINGS served FROM the secondary index through the HASH
    // COMPANION, fully automatically (the reference's STRINGS secondary
    // index posts string hashes and re-checks the strings on the matched
    // rows): the plain string equality first earns its hash conjunct
    // (HashCompanionRule), the hash conjunct routes through the
    // companion-column index (IndexRoutingRule runs after it in the same
    // batch), and the original string predicate rides residual on the few
    // semi-joined rows — collision-safe, exact. Two optimizer rules
    // composing into the reference's string-index design from one plain
    // `filter(c_name === ...)`. Plan pinned in IndexRoutingSpec.
    "q_index_auto_hash" -> QueryDef(
      (s, d) => {
        val base = Derived.tablePath(s, d, "customer_h")
        graft.plans.IndexRouting.register(s, base,
          Derived.tablePath(s, d, "customer_h_idx"),
          "c_name" + graft.tables.Writer.HashSuffix, "c_custkey")
        Derived.table(s, d, "customer_h")
          .filter(col("c_name") === "Customer#000000421")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_name = 'Customer#000000421'")),

    // r10 — CalcCount over the CROSS-INDEX OR: COUNT(*) WHERE a = x OR
    // b < y has no single serving index, but the deduped union of the
    // per-branch postings key streams IS the matching row set — counting
    // it (the bitmap popcount) needs zero fact IO. Plan pinned in
    // IndexRoutingSpec.
    "q_index_auto_or_count" -> QueryDef(
      (s, d) => {
        val ckeyIdx = Derived.tablePath(s, d, "orders_ckey_idx")
        val priceIdx = Derived.tablePath(s, d, "orders_price_idx")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", ckeyIdx,
          "o_custkey", "o_orderkey")
        graft.plans.IndexRouting.register(s, s"$d/orders.parquet", priceIdx,
          "o_totalprice", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") === 421 || col("o_totalprice") < 1500.0)
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT count(*) AS n FROM orders " +
        "WHERE o_custkey = 421 OR o_totalprice < 1500.0")),

    // VERDICT r9 #3 — MVA range-ANY served from the element postings (ref
    // MvaAny_T range overlap, columnar/accessormva.cpp:71-139; the index
    // posts each element, so the element-range block walk IS the filter):
    // `exists(parts, x -> 50 <= x <= 60)` lowers to `value BETWEEN 50 AND
    // 60` over the postings, semi-joined back (duplicate keys across
    // matched elements collapse in the left-semi). Routed-plan pinned in
    // IndexRoutingSpec; same oracle shape as q_mva_any_range.
    "q_index_mva_range" -> QueryDef(
      (s, d) => {
        val base = Derived.tablePath(s, d, "mcl_parts")
        graft.plans.IndexRouting.register(s, base, base + "_idx",
          "parts", "l_orderkey", mva = true)
        Derived.table(s, d, "mcl_parts")
          .filter(graft.filters.MvaRange("parts", lo = Some(50L),
            hi = Some(60L), quant = graft.filters.AnyQ).toColumn)
          .select(col("l_orderkey"))
      },
      Some("WITH parts AS (SELECT l_orderkey, " +
        "list_sort(list(DISTINCT l_partkey)) AS parts FROM lineitem " +
        "GROUP BY l_orderkey) " +
        "SELECT l_orderkey FROM parts " +
        "WHERE len(list_filter(parts, x -> x >= 50 AND x <= 60)) > 0")),

    // VERDICT r9 #6 — NON-NUMERIC range routing: a string BETWEEN has no
    // numeric span, so the equi-depth histogram captured at registration
    // estimates it (the reference's PGM orders any type — its range
    // estimates never cared about numerics). The narrow range routes; the
    // broad end's bypass is pinned in IndexRoutingSpec.
    "q_index_auto_strrange" -> QueryDef(
      (s, d) => {
        val idxPath = Derived.tablePath(s, d, "customer_name_idx")
        graft.plans.IndexRouting.register(s, s"$d/customer.parquet", idxPath,
          "c_name", "c_custkey")
        t(s, d, "customer")
          .filter(col("c_name") >= "Customer#000000100" &&
            col("c_name") <= "Customer#000000149")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_name BETWEEN 'Customer#000000100' AND 'Customer#000000149'")),

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
