#!/usr/bin/env python3
"""Oracle spot-pass at a big scale factor (the sf1/sf10 decade checks).

Usage:
  python3 tools/sf_spotcheck.py <sfDir> <verifyOutDir> <q1,q2,...|@file> [perQueryTimeoutSec]

Same comparison semantics as tools/compare.py (column sort, row sort,
stringified-value equality — the driver's hash semantics), but:

  - runs ONLY the named queries (the big-sf replay list: heavy naive
    oracles — the quadratic all-pairs verifies, deep CC unrolls — cost
    tens of minutes to hours in DuckDB at sf1+ and stay pinned at
    sf0.01/sf0.1 where the replay is feasible);
  - prints per-query START/PASS/FAIL lines with wall seconds, flushed, so
    a long replay is visibly progressing rather than apparently hung;
  - with a timeout (seconds), a watchdog `con.interrupt()` bounds each
    oracle replay: a too-heavy oracle records TIMEOUT and the sweep moves
    on (the row's proof then stands at the small sf, as BASELINE.md's sf1
    section documents for the quadratic naive replays).

The verifyOutDir must hold the big-sf Verify dump (run graft.Verify with
the big sf dir and the same query list first).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import glob

import duckdb
from compare import TABLES, canon


def main(sf_dir, out_dir, names, timeout_sec=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = [n for n in names if n not in oracle]
    if unknown:
        sys.exit(f"ERROR: not in oracle_sql.json: {', '.join(unknown)}")
    npass = 0
    results = {}
    for i, name in enumerate(names):
        print(f"[{i + 1}/{len(names)}] START {name}", flush=True)
        t0 = time.time()
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            print(f"[{i + 1}/{len(names)}] FAIL  {name}: no Spark dump", flush=True)
            continue
        watchdog = None
        if timeout_sec:
            import threading
            watchdog = threading.Timer(timeout_sec, con.interrupt)
            watchdog.start()
        try:
            odf = canon(con.sql(oracle[name]).df())
        except Exception as e:  # surfaced per query, the sweep continues
            dt = time.time() - t0
            kind = ("TIMEOUT" if timeout_sec and dt >= timeout_sec - 1
                    else f"ORACLE_ERROR: {e}")
            results[name] = kind
            print(f"[{i + 1}/{len(names)}] FAIL  {name}: {kind} ({dt:.1f}s)", flush=True)
            continue
        finally:
            if watchdog:
                watchdog.cancel()
        sdf = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        verdict = None
        if list(sdf.columns) != list(odf.columns):
            verdict = f"SCHEMA: spark={list(sdf.columns)} oracle={list(odf.columns)}"
        elif len(sdf) != len(odf):
            verdict = f"ROWS: spark={len(sdf)} oracle={len(odf)}"
        else:
            for c in sdf.columns:
                a, b = sdf[c], odf[c]
                if a.dtype.kind != b.dtype.kind:
                    verdict = f"DTYPE[{c}]: spark={a.dtype} oracle={b.dtype}"
                    break
                bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
                if bad.any():
                    j = bad.idxmax()
                    verdict = f"VALUE[{c}] row{j}: spark={a[j]!r} oracle={b[j]!r}"
                    break
        dt = time.time() - t0
        if verdict is None:
            npass += 1
            results[name] = f"OK ({len(sdf)} rows)"
            print(f"[{i + 1}/{len(names)}] PASS  {name}: {len(sdf)} rows in {dt:.1f}s",
                  flush=True)
        else:
            results[name] = verdict
            print(f"[{i + 1}/{len(names)}] FAIL  {name}: {verdict} ({dt:.1f}s)",
                  flush=True)
    print(f"\n{npass}/{len(names)} spot queries match")
    return 0 if npass == len(names) else 1


if __name__ == "__main__":
    arg = sys.argv[3]
    qs = (open(arg[1:]).read().split() if arg.startswith("@")
          else [q for q in arg.split(",") if q])
    tmo = float(sys.argv[4]) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], qs, tmo))
