#!/usr/bin/env python3
"""One-off 10x-corpus oracle sweep (r13 VERDICT #7) — driver-side tooling.

Correctness normally gates at sf0.01; scale bugs (overflow, skew, spill)
hide above it. This sweep replays the DuckDB oracle over the BenchScale
10x corpus for the heavy gate set and writes CORRECTNESS_SF1.json.

Three per-query modes:
  full  — the gate's oracle SQL runs verbatim over the 10x tables
          (everything whose oracle is linear-ish).
  slice — the oracle is all-pairs (quadratic: infeasible over 50k docs /
          20k vectors in DuckDB), so BOTH sides restrict to the same
          deterministic id sample: the oracle computes all pairs WITHIN
          the sample (feasible), the engine's full-corpus output filters
          to pairs with both ends sampled — a true subset EQUALITY at
          10x, catching overflow/skew in the slice. The engine still ran
          the full corpus; only the comparison is sliced.
  skip  — multi-stage pipeline oracles whose all-pairs stage feeds later
          stages (slicing the input would change survivors, so no sound
          slice exists): documented, with the component stages covered by
          their own slice rows and the pipeline hash-gated at sf0.01/0.1
          and time-gated in BENCH_SF1.

Usage: tools/sweep_sf1.py <sf1Dir> <verifyOutDir> [timeoutSec]
"""
import json
import math
import multiprocessing as mp
import sys

TABLES = ["region", "nation", "customer", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> (oracle text rewrite (old, new), engine-output WHERE clause)
SLICE = {
    # modulus 17: ~2.9k sampled docs -> 4.3M oracle pairs (feasible) with
    # a NON-EMPTY planted-pair intersection on every row (17 is coprime to
    # the %5 corpus/batch split, and the replica key offset 1e8 is not a
    # multiple of 17, so the sample crosses replicas too)
    "q_dedup_near": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "a % 17 = 0 AND b % 17 = 0"),
    "q_dedup_simhash": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "a % 17 = 0 AND b % 17 = 0"),
    "q_dedup_incremental": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "corpus_id % 17 = 0 AND new_id % 17 = 0"),
    # neighbor counts are per-PROBE-row: sampling only the a side leaves
    # each sampled row's count over the FULL b side — sound, 17× cheaper
    "q_join_range": (
        ("AND a.event_id <> b.event_id",
         "AND a.event_id <> b.event_id AND a.event_id % 17 = 0"),
        "event_id % 17 = 0"),
    # the forward replay is per-doc independent, so a doc sample is a
    # sound slice; the full-corpus SQL replay blows the timeout at 50k
    "q_embed_transformer": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "doc_id % 17 = 0"),
    # same per-doc-independent forward argument as q_embed_transformer
    # (r16: the decoder's causal replay is quadratic in per-doc length but
    # independent across docs — a doc sample is a sound slice)
    "q_embed_decoder": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "doc_id % 17 = 0"),
    "q_embed_decoder_rope": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "doc_id % 17 = 0"),
    # r17: the unigram-tokenized decoder — same per-doc-independent causal
    # forward, ~128 char-level tokens/doc makes the full replay heavier
    "q_embed_decoder_spm": (
        ("FROM documents)", "FROM documents WHERE doc_id % 17 = 0)"),
        "doc_id % 17 = 0"),
    "q_dedup_embed": (
        ("FROM embeddings)", "FROM embeddings WHERE vec_id % 20 = 0)"),
        "a % 20 = 0 AND b % 20 = 0"),
    # copies get vec_id + 1e6 and replicas + i*1e8; both offsets are
    # divisible by 20, so `id % 20 = 0` selects originals AND their
    # copies consistently on both sides
    "q_dedup_embed_lsh": (
        ("FROM embeddings)", "FROM embeddings WHERE vec_id % 20 = 0)"),
        "a % 20 = 0 AND b % 20 = 0"),
}

SKIP = {
    "q_pipeline_e2e":
        "oracle's near-dup stage is all-pairs jaccard over 50k documents "
        "and later stages depend on the full pair set (no sound slice); "
        "the stage itself is slice-checked via q_dedup_near, the pipeline "
        "hash-gated at sf0.01/0.1 and time-gated in BENCH_SF1",
    "q_pipeline_v2":
        "same all-pairs near-dup stage feeding downstream survivors; "
        "covered by q_dedup_near slice + sf0.01/0.1 hash gates",
}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def compare_one(sf_dir, out_dir, name, sql, where, q):
    import os
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory layout at the 10x scale
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    filt = f" WHERE {where}" if where else ""
    got = con.sql(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'{filt}").df()
    want = con.sql(sql).df()

    def norm(df):
        df = df[sorted(df.columns)]
        return sorted(tuple(norm_cell(v) for v in row)
                      for row in df.itertuples(index=False))

    g, w = norm(got), norm(want)
    schema_ok = sorted(got.columns) == sorted(want.columns)
    rows_ok = len(g) == len(w)
    vals_ok = g == w
    q.put({"rows": len(g), "oracle_rows": len(w), "schema_match": schema_ok,
           "rows_match": rows_ok, "values_match": vals_ok and schema_ok})


def main(sf_dir, out_dir, timeout, only=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    if only:  # merge mode: rerun a subset into the existing JSON
        try:
            results = json.load(open("CORRECTNESS_SF1.json"))["queries"]
        except Exception:
            pass
        oracle = {k: v for k, v in oracle.items() if k in only}
    ok = fail = skip = 0
    for name in sorted(oracle):
        if name in SKIP:
            results[name] = {"mode": "skip", "reason": SKIP[name]}
            skip += 1
            print(f"skip {name}: {SKIP[name][:60]}…")
            continue
        sql, where, mode = oracle[name], None, "full"
        if name in SLICE:
            (old, new), where = SLICE[name]
            assert sql.count(old) == 1, f"{name}: rewrite anchor not unique"
            sql = sql.replace(old, new)
            mode = "slice"
        q = mp.Queue()
        p = mp.Process(target=compare_one,
                       args=(sf_dir, out_dir, name, sql, where, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = {"mode": mode, "err": f"oracle timeout >{timeout}s"}
            fail += 1
            print(f"FAIL {name}: oracle timeout")
            continue
        if q.empty():
            results[name] = {"mode": mode, "err": f"exit {p.exitcode}"}
            fail += 1
            print(f"FAIL {name}: worker exit {p.exitcode}")
            continue
        r = q.get()
        r["mode"] = mode
        results[name] = r
        if r["values_match"]:
            ok += 1
            print(f"ok   {name} ({r['rows']} rows, {mode})")
        else:
            fail += 1
            print(f"FAIL {name}: rows {r['rows']} vs {r['oracle_rows']} "
                  f"schema={r['schema_match']}")
    if only:
        ok = sum(1 for r in results.values() if r.get("values_match"))
        skip = sum(1 for r in results.values() if r.get("mode") == "skip")
        fail = len(results) - ok - skip
    summary = {"sf_dir": sf_dir, "ok": ok, "fail": fail, "skip": skip,
               "queries": results}
    with open("CORRECTNESS_SF1.json", "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    print(f"\n{ok} ok, {fail} fail, {skip} skip -> CORRECTNESS_SF1.json")
    return 1 if fail else 0


if __name__ == "__main__":
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 900, only))
