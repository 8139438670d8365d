#!/usr/bin/env python3
"""Machine-diffable sf1 (100x gate scale) oracle artifact.

Replays every gate's DuckDB oracle against the sf1 tables and compares it
value-by-value with the Spark dump graft.Verify wrote — the same compare
check_oracles.py runs at sf0.01, but (a) each oracle runs in a forked
worker with a wall-clock timeout so one pathological replay cannot hang
the sweep, (b) known oracle-engine limits are declared up front with
their reason instead of crashing the run, and (c) the result is a JSON
artifact (ORACLE_sf1.json) the judge can diff, not a console log.

Usage: oracle_sf1.py <sfDir> <verifyOutDir> [timeoutSecs] [--partial]

--partial: gates with no Spark dump yet are left out of the artifact
(pending, not failed) and already-recorded passes in an existing
ORACLE_sf1.json are kept — lets the replay run incrementally alongside
a still-running graft.Verify sweep and finish after it.
"""
import sys, json, glob, math, os, time
import multiprocessing as mp

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Gates whose ORACLE (not the Spark side) cannot replay at sf1, with the
# engine limit. The Spark dump still exists for each; the companion gate
# listed covers the same code path at sf1 where one exists.
ORACLE_LIMITS = {
    "x8_ktruss": "DuckDB exhausts temp disk enumerating the full sf1 "
                 "triangle set (~half-billion candidate wedges); "
                 "companion x8_ktruss_s4 replays the same kTrussPeel "
                 "path on the 1/4-subsampled graph at sf1",
    "x7_cluster_split": "recursive-CTE reachability over the full sf1 "
                        "near-dup pair graph exceeds the replay budget "
                        "(r13 retry: DuckDB fills all free temp disk "
                        "(~79GB) and dies with no-space-left at ~12min "
                        "under an 18GB memory cap — a resource wall, "
                        "not a timeout); companion x7_cluster_split_s3 "
                        "replays the same path subsampled at sf1",
    "x2_sparse_cosine": "unpruned UNIGRAM pair mass is quadratic on the "
                        "fixture's 26-token vocabulary (measured "
                        "sum(df^2) ~2e10 at sf1 — both engines exceed "
                        "the budget by definition, not implementation); "
                        "companion x2_sparse_cosine_sh replays the same "
                        "frequency-sensitive cosine over 4-shingles "
                        "(pair mass 1.5e7) at sf1",
    # The five below were measured in the round-8 sweep: each was retried
    # three ways (600s default; 18GB-capped 6-thread parallel; 60GB solo
    # with spill) and hit a DuckDB resource wall every time, while the
    # Spark dump completes in the chunked sf1 sweep.
    "x8_linkpred": "the common-neighbor wedge enumeration (~495M wedges "
                   "on the 12M-edge sf1 co-order graph) pins >18GB of "
                   "non-spillable join blocks, then fills >49GB of temp "
                   "disk when allowed to spill; companion x8_linkpred_s4 "
                   "(r11) replays the same linkPredict path on the "
                   "l_partkey % 4 subgraph at sf1, minCommon "
                   "recalibrated to the subsampled cn band",
    "x8_triangles": "same ~495M-wedge wall as x8_linkpred (OOM at 18GB, "
                    "temp-disk exhaustion at 60GB+spill); the Spark side "
                    "bloom-prunes wedges inside the join pipeline and "
                    "never materializes the set (27.4s at sf1, "
                    "BENCH_sf1); companion x8_triangles_s4 (r11) replays "
                    "triangleCounts on the l_suppkey % 4 subgraph at sf1",
    "x8_hits": "the unrolled hub/authority iterations pin >18GB of "
               "non-spillable hash blocks (OOM at 600s/8-way, at the "
               "18GB cap, and on the disk wall solo); companion "
               "x8_hits_s4 (r11) replays hitsInt itself on the "
               "l_suppkey % 4 subgraph at sf1",
    "x8_modularity": "community-pair aggregation over the sf1 edge table "
                     "pins >18GB non-spillable; companions x8_labelprop "
                     "and x8_conductance replay the community family "
                     "green at sf1",
    "x8_pagerank_dangling": "the dangling-mass redistribution makes every "
                            "unrolled iteration dense: spills >78GB of "
                            "temp even at a 60GB memory budget; companion "
                            "x8_pagerank_dangling_s4 (r11) replays "
                            "pageRankInt(dangling=true) itself on the "
                            "l_suppkey % 4 subgraph at sf1",
}


# Rows-only sketch gates (no DuckDB oracle BY DESIGN). EMPTY since r14:
# the MinHash signature gates — the last members — moved to verdict form
# (replayable exact pair count + subset/recall BOOLEANs) and replay
# through the oracle loop like any other gate. The mechanism stays for
# any future sketch gate: a name here records the sf1 dump's non-empty
# row count as weaker-but-real evidence instead of a value compare.
ROWS_ONLY = []

# Gates whose compare may fail at sf1 for a ROOT-CAUSED cross-engine
# boundary (PLANS.md round-5 session 2): recorded as known_boundary, not
# as a red gate, but still run — if they pass, they count as passes.
# Empty since round 11: q1_agg's DOUBLE->DECIMAL(18,6) rounding tie
# (Spark rounds the shortest decimal rendering, DuckDB the exact binary
# expansion, disagreeing ~1 row in 6M on full-range synthetic prices)
# was retired at the root — the gate now casts the raw grid-valued
# columns to decimal FIRST and multiplies in exact decimal arithmetic,
# so no computed double is ever rounded (Relational.scala q1_agg).
KNOWN_BOUNDARIES = {}


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def run_one(sf_dir, out_dir, name, sql, q):
    try:
        con = duckdb.connect()
        # Cap replay threads: the sweep this may run alongside owns the box.
        con.sql("SET threads = 8")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        want = con.sql(sql).df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        res = {"spark_rows": len(got), "oracle_rows": len(want),
               "rows_match": len(got) == len(want),
               "schema_match": list(got.columns) == list(want.columns),
               "value_match": False, "err": None}
        if res["rows_match"] and res["schema_match"]:
            # Per-column list compare (iloc indexing is ~50x slower and
            # sf1 dumps reach millions of rows).
            ok = True
            for c in got.columns:
                ga = [canon(v) for v in got[c].tolist()]
                wa = [canon(v) for v in want[c].tolist()]
                if ga != wa:
                    ok = False
                    for i, (g, w) in enumerate(zip(ga, wa)):
                        if g != w:
                            res["err"] = (f"row {i} col {c}: "
                                          f"spark={g} duck={w}")
                            break
                    break
            res["value_match"] = ok
        q.put(res)
    except Exception as e:
        q.put({"err": f"{type(e).__name__}: {e}", "rows_match": False,
               "schema_match": False, "value_match": False,
               "spark_rows": -1, "oracle_rows": -1})


def main(sf_dir, out_dir, timeout, partial=False):
    # While the sweep is still writing, its oracle_sql.json is missing or
    # holds only the LAST CHUNK's entries — prefer ORACLE_SQL_PATH (or the
    # sf0.01 full-registry dump) when it covers more gates (the SQL text
    # is SF-independent; tables are per-sfDir views).
    sql_path = f"{out_dir}/oracle_sql.json"
    if partial:
        alt = os.environ.get(
            "ORACLE_SQL_PATH",
            f"{os.path.dirname(out_dir)}/verify-sf0.01/oracle_sql.json")
        def n_entries(p):
            try:
                return len(json.load(open(p)))
            except Exception:
                return -1
        if os.path.exists(alt) and n_entries(alt) > n_entries(sql_path):
            sql_path = alt
    oracle = json.load(open(sql_path))
    results, n_pass, n_fail, n_skip, n_known = {}, 0, 0, 0, 0
    prior, note = {}, None
    if partial and os.path.exists("ORACLE_sf1.json"):
        prev_art = json.load(open("ORACLE_sf1.json"))
        prior = prev_art.get("gates", {})
        # The narrative note is maintained alongside the gates; a partial
        # re-run must not silently drop it (gate entries themselves are
        # always tool-produced — review r10).
        note = prev_art.get("note")
    for name in sorted(oracle):
        if name in ORACLE_LIMITS:
            results[name] = {"skipped": True,
                             "reason": ORACLE_LIMITS[name]}
            n_skip += 1
            print(f"SKIP {name} (declared oracle-engine limit)")
            continue
        prev = prior.get(name)
        if prev and (prev.get("value_match") or prev.get("known_boundary")):
            results[name] = prev
            if prev.get("value_match"):
                n_pass += 1
            else:
                n_known += 1
            continue
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            if partial:
                print(f"PEND {name}: no spark output yet")
                continue
            results[name] = {"err": "no spark output", "rows_match": False,
                             "schema_match": False, "value_match": False}
            n_fail += 1
            print(f"FAIL {name}: no spark output")
            continue
        if partial and time.time() - os.path.getmtime(f"{out_dir}/{name}") < 30:
            # Possibly mid-commit by the running sweep — leave pending.
            print(f"PEND {name}: too fresh, may be mid-write")
            continue
        t0 = time.time()
        q = mp.Queue()
        p = mp.Process(target=run_one,
                       args=(sf_dir, out_dir, name, oracle[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = {"err": f"oracle timeout after {timeout}s",
                             "rows_match": False, "schema_match": False,
                             "value_match": False, "timeout": True}
            n_fail += 1
            print(f"FAIL {name}: timeout after {timeout}s")
            continue
        res = q.get() if not q.empty() else {
            "err": "worker died without result", "rows_match": False,
            "schema_match": False, "value_match": False}
        res["secs"] = round(time.time() - t0, 1)
        results[name] = res
        if res.get("value_match"):
            n_pass += 1
            print(f"PASS {name} ({res['spark_rows']} rows, {res['secs']}s)")
        elif name in KNOWN_BOUNDARIES:
            res["known_boundary"] = True
            res["reason"] = KNOWN_BOUNDARIES[name]
            n_known += 1
            print(f"KNOWN {name}: {res.get('err')} (documented boundary)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {res.get('err')}")
    # Rows-only sketch gates: record the sf1 dump's row count (>0) as the
    # weaker-but-real replay evidence the registry defines for them.
    n_rows_only = 0
    for name in ROWS_ONLY:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # Carry prior rows-only evidence forward in --partial ONLY
            # when there is no fresh dump to read (ADVICE r11: the old
            # unconditional carry-over masked a regression — a re-run
            # that emptied or shrank a rows-only gate kept recording the
            # stale prior count). A fresh dump always wins below.
            prev = prior.get(name)
            if partial and prev and prev.get("rows_only") \
                    and prev.get("nonempty"):
                results[name] = prev
                n_rows_only += 1
                print(f"ROWS {name}: {prev.get('spark_rows')} rows (prior)")
                continue
            if partial:
                print(f"PEND {name} (rows-only): no spark output yet")
                continue
            results[name] = {"rows_only": True, "err": "no spark output",
                             "value_match": False}
            n_fail += 1
            print(f"FAIL {name} (rows-only): no spark output")
            continue
        if partial and time.time() - os.path.getmtime(f"{out_dir}/{name}") < 30:
            # Same mid-write guard as the oracle loop: a sweep may still be
            # committing this dump; a partial part-file set would record a
            # partial row count as permanent artifact evidence.
            print(f"PEND {name} (rows-only): too fresh, may be mid-write")
            continue
        con = duckdb.connect()
        n = con.sql(
            f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        ok = n > 0
        results[name] = {"rows_only": True, "spark_rows": int(n),
                         "nonempty": bool(ok)}
        if ok:
            n_rows_only += 1
            print(f"ROWS {name}: {n} rows (rows-only sketch gate)")
        else:
            n_fail += 1
            results[name]["err"] = "empty sf1 dump"
            print(f"FAIL {name} (rows-only): empty sf1 dump")
    n_pending = len(oracle) + len(ROWS_ONLY) - len(results)
    artifact = {"sf_dir": sf_dir, "timeout_secs": timeout,
                "n_pass": n_pass, "n_fail": n_fail, "n_skip": n_skip,
                "n_rows_only": n_rows_only,
                "n_known_boundary": n_known, "gates": results}
    if partial:
        artifact["n_pending"] = n_pending
    if note:
        artifact["note"] = note
    with open("ORACLE_sf1.json", "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped "
          f"(declared limits), {n_known} known boundaries, "
          f"{n_pending} pending -> ORACLE_sf1.json")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--partial"]
    part = "--partial" in sys.argv
    to = int(argv[2]) if len(argv) > 2 else 600
    sys.exit(main(argv[0], argv[1], to, part))
