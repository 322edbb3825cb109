package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-layer corpus (SURVEY.md §2.6, H7): joins, semi/anti joins,
  * windows, set ops, grouping sets. The reference library returns rowid
  * streams and leaves these to the host daemon; our engine exposes them
  * natively through the DataFrame surface — this corpus proves them against
  * the oracle and pins the 100 TB plan shapes:
  *
  *  - dimension⋈fact joins broadcast the small side (no fact shuffle);
  *  - fact⋈fact joins shuffle both sides on the join key once (SMJ/SHJ,
  *    AQE re-plans and handles skew);
  *  - semi/anti joins are the relational form of the reference's rowid
  *    postings intersection (secondary/iterator.cpp HintRowID path) and
  *    inverted-bitmap exclude (blockreader.cpp:563-573);
  *  - windows shuffle once on the partition key;
  *  - set ops are shuffle dedup — the analog of bitmap-union iterators (I5).
  *
  * Double sums are rounded in both engines (see AggQueries); running sums
  * use an integer surrogate (floor(value*1000)) because cumulative float
  * addition order is an engine implementation detail.
  */
object RelationalQueries {

  val defs: Map[String, QueryDef] = Map(

    // H7 broadcast join: customer is the small dimension — explicit
    // broadcast() pins the no-shuffle plan at any scale.
    "q_join_broadcast" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("rev")),
      Some("SELECT c_mktsegment, count(*) AS n, " +
        "round(sum(o_totalprice),2) AS rev " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment")),

    // H7/S3 bucketed co-located join: both facts are written bucketed by
    // the join key into the session catalog (Writer.writeBucketed — the
    // layout that converts every repeated fact⋈fact join at 100 TB from a
    // two-sided shuffle into a local merge; exchange-free plan asserted in
    // LayoutSpec). Tables are built once per (session, sf) and reused.
    "q_join_bucketed" -> QueryDef(
      (s, d) => {
        val sfx = new java.io.File(d).getName.replace(".", "_")
        val ot = s"b_orders_$sfx"
        val lt = s"b_lineitem_$sfx"
        if (!s.catalog.tableExists(ot))
          graft.tables.Writer.writeBucketed(
            t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
            ot, Seq("o_orderkey"), numBuckets = 8)
        if (!s.catalog.tableExists(lt))
          graft.tables.Writer.writeBucketed(
            t(s, d, "lineitem").select("l_orderkey", "l_quantity"),
            lt, Seq("l_orderkey"), numBuckets = 8)
        s.table(ot)
          .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
      },
      Some("SELECT o_orderpriority, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderpriority")),

    // H7 large fact⋈fact join: one shuffle on the join key; AQE picks
    // SMJ/SHJ (or broadcast at toy scale) at runtime.
    "q_join_large" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price")),
      Some("SELECT o_orderpriority, l_returnflag, count(*) AS n, " +
        "round(sum(l_extendedprice),2) AS sum_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority, l_returnflag")),

    // I4 analog: semi join = rowid-postings intersection as a relational op.
    "q_join_semi" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey")),
      Some("SELECT c_custkey FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')")),

    // F8/I5 analog at the relational level: anti join = inverted bitmap.
    // r20 review: the anti side is restricted to BIG orders so the gate
    // is NON-VACUOUS at every fixture SF (1/11/108 surviving customers
    // at sf0.001/0.01/0.1) — the prior full-orders form matched zero
    // rows, a pin an always-empty bug would have passed.
    "q_join_anti" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 250000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")),
      Some("SELECT c_custkey FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 250000.0)")),

    // H7 window: top-3 orders per customer (one shuffle on o_custkey,
    // deterministic via the o_orderkey tiebreak).
    "q_window" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      },
      Some("SELECT o_custkey, o_orderkey, rn FROM (" +
        "SELECT o_custkey, o_orderkey, row_number() OVER (" +
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey" +
        ") AS rn FROM orders) WHERE rn <= 3")),

    // H7 running aggregate per key over event time. The events fixture's
    // TIMESTAMP(NANOS) column is read as Long nanoseconds in Spark (see
    // Graft.session) and as TIMESTAMP in DuckDB — same total order, and it
    // is not projected, so the outputs still align. Integer surrogate sum
    // keeps cumulative addition exact in both engines.
    "q_window_running" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("running_milli",
            sum(floor(col("value") * 1000).cast("long")).over(w))
          .select(col("event_id"), col("running_milli"))
      },
      // outer CAST: DuckDB's window sum over BIGINT yields HUGEINT, which
      // pandas renders as float64 ("49380.0" vs Spark's "49380") and the
      // driver's value hash then mismatches (r3 gate).
      Some("SELECT event_id, CAST(sum(CAST(floor(value*1000) AS BIGINT)) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_milli " +
        "FROM events")),

    // H7 set ops = shuffle dedup (the engine-side analog of the
    // bitmap-union iterator, blockreader.cpp:105-230).
    "q_union" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
        .union(t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("key")))
        .distinct(),
      Some("SELECT c_custkey AS key FROM customer " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "UNION " +
        "SELECT o_custkey AS key FROM orders " +
        "WHERE o_orderpriority = '1-URGENT'")),

    // r20 review: same non-vacuous restriction as q_join_anti — the
    // unrestricted form EXCEPTed to zero rows at every SF.
    "q_except" -> QueryDef(
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("key"))
        .except(t(s, d, "orders").filter(col("o_totalprice") > 250000.0)
          .select(col("o_custkey").as("key"))),
      Some("SELECT c_custkey AS key FROM customer " +
        "EXCEPT SELECT o_custkey AS key FROM orders " +
        "WHERE o_totalprice > 250000.0")),

    "q_intersect" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey").as("key"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("key"))),
      Some("SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000.0 " +
        "INTERSECT SELECT o_custkey AS key FROM orders")),

    // H7 grouping sets: rollup + cube (host-side facets over hierarchies).
    "q_rollup" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)")),

    // Grouped top-k via the custom bounded-merge Aggregator (map-side
    // partial aggregation ships at most k rows per group through the
    // shuffle; a window function would shuffle every row). Oracle is the
    // equivalent window formulation.
    "q_topk_group" -> QueryDef(
      (s, d) => graft.vector.TopK.perGroup(
        t(s, d, "orders"), "o_orderpriority", "o_orderkey", "o_totalprice", 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("rn")),
      Some("SELECT o_orderpriority, o_orderkey, rn FROM (" +
        "SELECT o_orderpriority, o_orderkey, row_number() OVER (" +
        "PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey" +
        ") AS rn FROM orders) WHERE rn <= 3")),

    // H6: WHERE over general expressions — the host-side expression library
    // the reference delegates to its daemon (SURVEY §2.6); Catalyst's
    // string/date functions evaluated inside the scan stage.
    "q_expr_strdate" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter(upper(col("o_orderpriority")).like("1-%") &&
          year(col("o_orderdate")) === 1996 &&
          substring(col("o_orderstatus"), 1, 1).isin("F", "O"))
        .select(col("o_orderkey"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          month(col("o_orderdate")).as("m")),
      Some("SELECT o_orderkey, o_orderstatus || '|' || o_orderpriority AS tag, " +
        "month(o_orderdate) AS m FROM orders " +
        "WHERE upper(o_orderpriority) LIKE '1-%' AND year(o_orderdate) = 1996 " +
        "AND substring(o_orderstatus, 1, 1) IN ('F','O')")),

    // H6: math expressions (floor-micros keeps sqrt/ln engine-stable).
    "q_expr_math" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(sqrt(col("l_extendedprice")) * 1000).cast("long").as("sqrt_milli"),
          floor(log(col("l_extendedprice")) * 1000000).cast("long").as("ln_micros"),
          floor(abs(col("l_discount") - 0.05) * 1000000).cast("long").as("absd_micros")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "floor(sqrt(l_extendedprice) * 1000)::BIGINT AS sqrt_milli, " +
        "floor(ln(l_extendedprice) * 1000000)::BIGINT AS ln_micros, " +
        "floor(abs(l_discount - 0.05) * 1000000)::BIGINT AS absd_micros " +
        "FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0")),

    "q_cube" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY CUBE (o_orderstatus, o_orderpriority)")),

    // Backward as-of join (pipeline op; Spark has no native as-of): each
    // purchase event picks up the most recent prior view of the same user.
    // One shuffle, union+window — the oracle is the O(n²)-shaped LEFT JOIN +
    // max, which only the small fixture can afford; the engine plan is the
    // one that survives 100 TB. The matched event time is emitted as exact
    // epoch micros via EventTime (polymorphic over timestamp/NTZ/epoch-long
    // ts columns — the fixture currently ships timestamp[us]).
    "q_join_asof" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val joined = graft.relational.AsofJoin.backward(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "user_id", "ts", "ts", "event_id")
        joined.select(col("event_id"),
          graft.relational.EventTime.epochMicros(joined, "asof_ts")
            .as("asof_micros"))
      },
      Some("SELECT p.event_id, max(epoch_us(v.ts)) AS asof_micros " +
        "FROM events p LEFT JOIN events v ON v.user_id = p.user_id " +
        "AND v.event_type = 'view' AND v.ts <= p.ts " +
        "WHERE p.event_type = 'purchase' GROUP BY p.event_id")),

    // FORWARD as-of (r12): the mirror direction — for each purchase, the
    // next view at-or-after it (time scanned descending, same one-shuffle
    // union+window plan).
    "q_join_asof_fwd" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val joined = graft.relational.AsofJoin.forward(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "user_id", "ts", "ts", "event_id")
        joined.select(col("event_id"),
          graft.relational.EventTime.epochMicros(joined, "asof_ts")
            .as("asof_micros"))
      },
      Some("SELECT p.event_id, min(epoch_us(v.ts)) AS asof_micros " +
        "FROM events p LEFT JOIN events v ON v.user_id = p.user_id " +
        "AND v.event_type = 'view' AND v.ts >= p.ts " +
        "WHERE p.event_type = 'purchase' GROUP BY p.event_id")),

    // NEAREST as-of (r12): closest view either side, exact ties backward.
    // Oracle: pick the smaller |Δ| of the two directional matches.
    "q_join_asof_near" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val joined = graft.relational.AsofJoin.nearest(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "user_id", "ts", "ts", "event_id", "event_id")
        joined.select(col("event_id"),
          graft.relational.EventTime.epochMicros(joined, "asof_ts")
            .as("asof_micros"))
      },
      Some("WITH b AS (SELECT p.event_id, p.ts, max(epoch_us(v.ts)) AS bt " +
        "FROM events p LEFT JOIN events v ON v.user_id = p.user_id " +
        "AND v.event_type = 'view' AND v.ts <= p.ts " +
        "WHERE p.event_type = 'purchase' GROUP BY p.event_id, p.ts), " +
        "f AS (SELECT p.event_id, min(epoch_us(v.ts)) AS ft " +
        "FROM events p LEFT JOIN events v ON v.user_id = p.user_id " +
        "AND v.event_type = 'view' AND v.ts >= p.ts " +
        "WHERE p.event_type = 'purchase' GROUP BY p.event_id) " +
        "SELECT b.event_id, CASE " +
        "WHEN b.bt IS NULL AND f.ft IS NULL THEN NULL " +
        "WHEN b.bt IS NULL THEN f.ft WHEN f.ft IS NULL THEN b.bt " +
        "WHEN epoch_us(b.ts) - b.bt <= f.ft - epoch_us(b.ts) THEN b.bt " +
        "ELSE f.ft END AS asof_micros " +
        "FROM b JOIN f ON b.event_id = f.event_id")),

    // Banded range join (pipeline op): events within ±10 min of each other,
    // no equality key. The engine buckets by floor(ts/width) and probes
    // {b-1,b,b+1} — an ordinary shuffled hash join; the oracle states the
    // raw inequality join (DuckDB IEJoin handles fixture scale).
    "q_join_range" -> QueryDef(
      (s, d) => graft.relational.RangeJoin.selfNeighborCounts(
        t(s, d, "events"), "event_id", "ts", 600000000000L),
      Some("SELECT a.event_id, count(*) AS n_neighbors " +
        "FROM events a JOIN events b " +
        "ON abs(epoch_ns(a.ts) - epoch_ns(b.ts)) <= 600000000000 " +
        "AND a.event_id <> b.event_id GROUP BY a.event_id")),

    // POINT-IN-INTERVAL join (r12): events inside each user's first-30-
    // minutes window — interval side explodes to its covered buckets
    // (~2 rows) and containment is an ordinary hash join on
    // (bucket, user); never a cartesian. Oracle states the raw
    // containment join.
    "q_join_interval" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val firsts = ev.groupBy(col("user_id").as("iv_user"))
          .agg(min(col("ts")).as("lo"))
          .withColumn("hi", col("lo") + expr("INTERVAL 30 MINUTES"))
        graft.relational.RangeJoin.intervalJoin(ev, firsts,
            "ts", "lo", "hi", typicalLen = 1800000000000L,
            pointKey = Some("user_id"), intervalKey = Some("iv_user"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_in_window"))
      },
      Some("WITH f AS (SELECT user_id, min(ts) AS lo FROM events GROUP BY 1) " +
        "SELECT e.user_id, count(*) AS n_in_window FROM events e JOIN f " +
        "ON e.user_id = f.user_id AND e.ts >= f.lo " +
        "AND e.ts <= f.lo + INTERVAL 30 MINUTE GROUP BY e.user_id")),

    // TPC-H Q3-shaped headliner: broadcast dimension filter + fact⋈fact
    // shuffle join + grouped agg + top-k heap. Revenue is rounded to exact
    // integer cents PER ROW (identical IEEE double ops in both engines),
    // so the sum is order-independent — parallel aggregation safe.
    "q_mjoin_pricing" -> QueryDef(
      (s, d) => {
        val cut = to_timestamp(lit("1996-03-15"))
        t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, d, "orders").filter(col("o_orderdate") < cut),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem").filter(col("l_shipdate") > cut),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long")).as("rev_cents"))
          .orderBy(col("rev_cents").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("SELECT l_orderkey, o_orderdate, CAST(sum(CAST(floor(" +
        "l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS rev_cents FROM customer " +
        "JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1996-03-15' " +
        "AND l_shipdate > TIMESTAMP '1996-03-15' " +
        "GROUP BY l_orderkey, o_orderdate " +
        "ORDER BY rev_cents DESC, l_orderkey LIMIT 10")),

    // TPC-H Q5-shaped headliner: a 5-table snowflake — region/nation
    // broadcast down the chain, customer⋈orders and orders⋈lineitem shuffle
    // on their keys once each; AQE re-plans small sides to broadcast.
    "q_mjoin_region" -> QueryDef(
      (s, d) => t(s, d, "region").filter(col("r_name") === "ASIA")
        .join(t(s, d, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, d, "customer"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("rev_cents"),
          count(lit(1)).as("n")),
      Some("SELECT n_name, CAST(sum(CAST(floor(" +
        "l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS rev_cents, count(*) AS n FROM region " +
        "JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name")),

    // H6 semi-structured: the reference stores JSON attributes host-side and
    // filters on extracted paths; our engine evaluates typed extraction in
    // the scan stage via from_json (codegen'd, no UDF). Note the physical
    // plan evaluates from_json in the Filter and AGAIN in the Project for
    // surviving rows — bounded cost (survivors only), accepted; a single
    // parse would need a pre-projection below the filter, trading pushdown.
    // Oracle uses TRY_CAST twice (string→JSON, extraction→BIGINT) so a
    // malformed props row nulls out exactly like Spark's from_json instead
    // of aborting the oracle (ADVICE r4).
    "q_json_agg" -> QueryDef(
      (s, d) => t(s, d, "events")
        .withColumn("k", expr("from_json(props, 'k BIGINT').k"))
        .filter(col("k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum")),
      Some("SELECT event_type, count(*) AS n, " +
        "CAST(sum(TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT)) AS BIGINT) AS k_sum " +
        "FROM events WHERE TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) >= 50 " +
        "GROUP BY event_type")),

    // H6 semi-structured, row-level: extract + range-filter + project. At
    // 100 TB the parse cost dominates — from_json extracts all needed
    // fields in one schema'd parse (get_json_object per path would
    // re-tokenize the document for each field).
    "q_json_filter" -> QueryDef(
      (s, d) => t(s, d, "events")
        .withColumn("k", expr("from_json(props, 'k BIGINT').k"))
        .filter(col("k") >= 95 && col("event_type") === "click")
        .select(col("event_id"), col("k")),
      Some("SELECT event_id, TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) AS k FROM events " +
        "WHERE TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) >= 95 AND event_type = 'click'")),

    // H6 storage-side JSON: the same filter as q_json_filter served from
    // the write-time FLATTENED sibling column (tables/JsonFlatten — parse
    // billed once to the writer; the table is clustered by props_k, so the
    // range predicate prunes files via zone maps instead of parsing JSON
    // per row). Oracle still extracts from the raw document.
    "q_json_flat_filter" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "events_flat")
        .filter(col("props_k") >= 95 && col("event_type") === "click")
        .select(col("event_id"), col("props_k")),
      Some("SELECT event_id, TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) " +
        "AS props_k FROM events " +
        "WHERE TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) >= 95 " +
        "AND event_type = 'click'")),

    // H6 flattened aggregation: group/sum straight over the typed sibling —
    // no JSON tokenizer anywhere in the query plan.
    "q_json_flat_agg" -> QueryDef(
      (s, d) => graft.tables.Derived.table(s, d, "events_flat")
        .filter(col("props_k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("props_k")).as("k_sum")),
      Some("SELECT event_type, count(*) AS n, " +
        "CAST(sum(TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT)) AS BIGINT) AS k_sum " +
        "FROM events WHERE TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) >= 50 " +
        "GROUP BY event_type")),

    // H6 + I3: the flattened JSON field's secondary-index SIBLING serves a
    // value-range lookup (ref secondary.cpp:426-433 — JSON fields index
    // like any attribute), postings semi-joined back to the flattened
    // table.
    "q_json_flat_idx" -> QueryDef(
      (s, d) => {
        val base = graft.tables.Derived.tablePath(s, d, "events_flat")
        val keys = graft.index.SecondaryIndex.lookupRangeKeys(s,
          base + "_kidx", lo = Some(90L), hi = None)
        graft.index.SecondaryIndex.semiJoin(
            graft.tables.Derived.table(s, d, "events_flat"), "event_id", keys)
          .select(col("event_id"), col("props_k"))
      },
      Some("SELECT event_id, TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) " +
        "AS props_k FROM events " +
        "WHERE TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT) >= 90")),

    // H7 window breadth: lag/lead over event time. The per-row delta is the
    // same IEEE double subtraction in both engines, floored to exact micro
    // units; first row per user yields NULL in both.
    "q_window_lag" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, d, "events")
          .select(col("event_id"),
            floor((col("value") - lag(col("value"), 1).over(w)) * 1000000)
              .cast("long").as("delta_micros"))
      },
      Some("SELECT event_id, CAST(floor((value - lag(value) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id)) * 1000000) AS BIGINT) " +
        "AS delta_micros FROM events")),

    // H7 RANGE frame: trailing 1-hour sum per user keyed by event-time
    // VALUE (not row position) — frame membership is a pure function of ts,
    // so ties need no tiebreak. Integer milli surrogate keeps the in-frame
    // sum order-independent.
    "q_window_range" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(graft.relational.EventTime.epochMicros(ev, "ts").asc)
          .rangeBetween(-3600000000L, 0)
        ev.select(col("event_id"),
          sum(floor(col("value") * 1000).cast("long")).over(w)
            .as("trail_milli"))
      },
      Some("SELECT event_id, CAST(sum(CAST(floor(value*1000) AS BIGINT)) " +
        "OVER (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS trail_milli FROM events")),

    // H7 grouping sets beyond rollup/cube: explicit set list through the
    // SQL surface (same Expand-based plan as cube — one scan, one shuffle).
    "q_grouping_sets" -> QueryDef(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
          "FROM orders GROUP BY GROUPING SETS " +
          "((o_orderstatus), (o_orderpriority), ())")
      },
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
        "FROM orders GROUP BY GROUPING SETS " +
        "((o_orderstatus), (o_orderpriority), ())")),

    // FUNNEL (r12): earliest-completion view→click→purchase chain within
    // 24h — per funnel step one aggregate of only that step's events plus
    // a user-keyed join, never a window over full user histories. Oracle
    // replays the greedy chain step by step.
    "q_funnel" -> QueryDef(
      (s, d) => graft.relational.Funnel.earliestChain(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        withinMicros = Some(86400000000L)),
      Some("WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1_us " +
        "FROM events WHERE event_type='view' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(s1.t1_us) AS t1_us, " +
        "min(epoch_us(e.ts)) AS t2_us FROM events e JOIN s1 " +
        "ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t1_us " +
        "WHERE e.event_type='click' GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(s2.t1_us) AS t1_us, " +
        "min(s2.t2_us) AS t2_us, min(epoch_us(e.ts)) AS t3_us " +
        "FROM events e JOIN s2 " +
        "ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t2_us " +
        "WHERE e.event_type='purchase' GROUP BY e.user_id) " +
        "SELECT user_id, t1_us, t2_us, t3_us FROM s3 " +
        "WHERE t3_us - t1_us <= 86400000000")),

    // FUNNEL CONVERSION (r12): users reaching each step of the greedy
    // chain — the per-step report. Oracle replays every chain prefix.
    "q_funnel_conversion" -> QueryDef(
      (s, d) => graft.relational.Funnel.conversion(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        withinMicros = Some(86400000000L)),
      Some("WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1_us " +
        "FROM events WHERE event_type='view' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(s1.t1_us) AS t1_us, " +
        "min(epoch_us(e.ts)) AS t2_us FROM events e JOIN s1 " +
        "ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t1_us " +
        "WHERE e.event_type='click' GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(s2.t1_us) AS t1_us, " +
        "min(epoch_us(e.ts)) AS t3_us FROM events e JOIN s2 " +
        "ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t2_us " +
        "WHERE e.event_type='purchase' GROUP BY e.user_id) " +
        "SELECT 1::INT AS step, 'view' AS step_name, " +
        "(SELECT count(*) FROM s1) AS n_users " +
        "UNION ALL SELECT 2::INT, 'click', (SELECT count(*) FROM s2) " +
        "UNION ALL SELECT 3::INT, 'purchase', (SELECT count(*) FROM s3 " +
        "WHERE t3_us - t1_us <= 86400000000)")),

    // RETENTION (r12): cohort by first-seen UTC day, count distinct
    // returning users per (cohort day, day offset). Two aggregates; the
    // distinct collapses each user-day map-side.
    "q_retention" -> QueryDef(
      (s, d) => graft.relational.Funnel.retention(
        t(s, d, "events"), "user_id", "ts"),
      Some("WITH d AS (SELECT DISTINCT user_id, " +
        "(epoch_us(ts) // 86400000000)::BIGINT AS day FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1) " +
        "SELECT c.cohort_day, d.day - c.cohort_day AS day_offset, " +
        "count(*) AS n_users FROM d JOIN c ON d.user_id = c.user_id " +
        "GROUP BY 1, 2"))
  )
}
