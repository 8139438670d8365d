#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate: read each
SparkEntry query's parquet dump (written by graft.Verify) and compare it
against the DuckDB oracle from oracle_sql.json, value by value.

Usage: check_oracles.py <sfDir> <verifyOutDir>

Rendering-aware decimal check (VERDICT r11 item 4): the driver does not
compare values — it hashes canonicalized RENDERINGS, reading the Spark
parquet dump through pyarrow (DECIMAL -> exact decimal.Decimal ->
"137869.000000") and the oracle through DuckDB's pandas conversion
(DECIMAL -> float64 -> "137869.0"). A value-level compare through pandas
on both sides (this tool's original mode) is structurally blind to that
divergence and passed q1_agg all of round 11 while the driver was red.
So: any gate whose Spark dump or oracle result carries a decimal-typed
column gets a second, rendering-level pass that reproduces the driver's
eyes — Spark side read via pyarrow with decimals stringified at their
declared scale, oracle side rendered exactly as DuckDB's pandas layer
hands it over. A decimal column therefore FAILS here the way it fails
on the driver, which is the point: DECIMAL gate output of any precision
is banned by SURVEY §5.2 / OutputTypeContractSpec.
"""
import sys, json, glob, math, os
import decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


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


def render_check(name, files, want):
    """Driver-eyes pass for decimal-typed gates: compare RENDERINGS, not
    values. Spark side via pyarrow (decimal.Decimal keeps declared
    scale), oracle side as DuckDB's pandas layer rendered it (float64
    for decimals). Order-insensitive (sorted row tuples) like the
    driver's hash of the canonicalized multiset. Returns None if the
    gate has no decimal column anywhere, else a PASS/FAIL message."""
    tab = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    spark_dec = any(pa.types.is_decimal(f.type) for f in tab.schema)
    want_dec = any(
        isinstance(v, decimal.Decimal)
        for c in want.columns for v in want[c].head(1))
    if not (spark_dec or want_dec):
        return None
    got = tab.to_pandas()[sorted(tab.schema.names)]
    rows_g = sorted(tuple(canon(v) for v in row)
                    for row in got.itertuples(index=False, name=None))
    rows_w = sorted(tuple(canon(v) for v in row)
                    for row in want.itertuples(index=False, name=None))
    if rows_g != rows_w:
        bad = next((g, w) for g, w in zip(rows_g, rows_w) if g != w)
        return (f"FAIL {name}: decimal RENDERING diverges (driver-hash-"
                f"unsafe; values may still match): spark={bad[0]} "
                f"duck={bad[1]} — render the column as STRING per §5.2")
    return f"PASS {name} rendering ({len(rows_g)} rows, decimal present)"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are single files; GenData scale sets are
        # Spark-written directories of part files.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = canon(got[c].iloc[i]), canon(want[c].iloc[i])
                if a != b:
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a} duck={b}")
            n_fail += 1
            continue
        # Value-level pass — now reproduce the driver's rendering-level
        # hash for decimal-typed gates (see module docstring).
        try:
            rmsg = render_check(name, files, want)
        except Exception as e:
            rmsg = f"FAIL {name}: rendering pass crashed: {e}"
        if rmsg is not None and rmsg.startswith("FAIL"):
            print(rmsg)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
