#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
creates DuckDB views named after the testdata tables, runs each oracle SQL,
and compares result sets: same columns (sorted by name), same row multiset,
exact string-repr match on every value (i.e. floats must agree bit-for-bit).
On mismatch a near-miss diagnostic reports the largest relative float
difference so ulp-level drift is distinguishable from structural mismatch.
"""
import json, sys, math
from pathlib import Path
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def rows_key(rows):
    # sort rows by string repr for multiset compare
    return sorted([tuple(str(c) for c in r) for r in rows])

def unsortable_cols(cols, rows):
    """The DRIVER's comparator does a pandas sort_values over every column;
    array/struct/map cells crash it ("unhashable type: numpy.ndarray" — the
    round-2 q50 red row). Flag them here so the local gate catches the
    failure class even though our own compare stringifies."""
    bad = set()
    for r in rows[:100]:
        for c, v in zip(cols, r):
            if isinstance(v, (list, tuple, dict, set, bytearray)) or \
               type(v).__name__ == "ndarray":
                bad.add(c)
    return sorted(bad)

def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # optional include filter (comma-separated substrings) for resuming a
    # long sf1 run past a crash without re-running everything
    include = [s for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else [])
               if s]
    con = duckdb.connect()
    # bound DuckDB so a heavy oracle under concurrent-JVM pressure degrades
    # to spilling instead of a bad_alloc that kills the run; recursive-CTE
    # oracles can't spill, so sf1 runs may need GRAFT_DUCKDB_MEM=64GB
    import os
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '32GB')}'")
    con.execute(f"SET threads={os.environ.get('GRAFT_DUCKDB_THREADS', '16')}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships one file per table; GenScale's sf1 output
        # is a Spark-written DIRECTORY of part files — glob in that case
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if include and not any(s in name for s in include):
            continue
        res_dir = out_dir / name
        if not res_dir.exists():
            # A filtered dump (SPARK_GRAFT_ONLY=...) writes a _filtered
            # marker holding the filter substrings; a missing dir is a
            # quiet skip ONLY for names the filter excluded. A name that
            # MATCHES the filter but has no dir crashed during the dump —
            # that stays a hard FAIL (else filtered iteration masks the
            # exact failure class the marker exists to distinguish).
            marker = out_dir / "_filtered"
            if marker.exists():
                subs = [s for s in marker.read_text().split(",") if s]
                if not any(s in name for s in subs):
                    print(f"SKIP {name}: not in this (filtered) dump")
                    continue
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        bad = unsortable_cols(got_cols, got) + unsortable_cols(want_cols, want)
        if bad:
            print(f"FAIL {name}: driver-unsortable (array/struct) columns: {sorted(set(bad))}")
            n_fail += 1
            continue
        # The driver compares via pandas DataFrames, where dtype divergence
        # can change the hashed value even when stringified values match:
        # DuckDB HUGEINT (any sum() over integers) becomes float64, so an
        # int64 Spark column hashes 0 against 0.0 (the round-3 q60 red row).
        # Flag int-vs-float dtype splits; int32-vs-int64 is harmless
        # (observed green in driver rounds 1-3).
        try:
            gdt = {c: str(t) for c, t in
                   con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df().dtypes.items()}
            wdt = {c: str(t) for c, t in con.execute(sql).df().dtypes.items()}
        except (duckdb.Error, MemoryError) as e:
            # advisory probe only (dtype-split early warning) — a probe
            # failure (e.g. DuckDB OOM re-running a heavy sf1 oracle under
            # concurrent-JVM memory pressure) must not kill the whole run.
            # Scoped to the failures it documents: anything else (e.g. a
            # structurally unreadable result parquet) should surface loudly
            # rather than degrade to a WARN — the hash compare would catch
            # it, but with a far less actionable message.
            print(f"WARN {name}: dtype probe failed, check skipped: "
                  f"{type(e).__name__}: {e}")
            gdt = wdt = {}
        mixed = [c for c in gdt if c in wdt and
                 (("int" in gdt[c]) != ("int" in wdt[c])) and
                 ("float" in gdt[c] or "float" in wdt[c])]
        if mixed:
            print(f"FAIL {name}: int-vs-float pandas dtype split (driver hash "
                  f"mismatch): {[(c, gdt[c], wdt[c]) for c in mixed]}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior)
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}")
            n_fail += 1
            continue
        g = rows_key([[r[i] for i in gidx] for r in got])
        w = rows_key([[r[i] for i in widx] for r in want])
        if g == w:
            print(f"PASS {name}: {len(got)} rows exact")
            n_pass += 1
        else:
            # diagnose
            print(f"FAIL {name}: {len(got)} spark rows vs {len(want)} oracle rows")
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            max_rel = 0.0
            for a, b in zip(g, w):
                for x, y in zip(a, b):
                    try:
                        fx, fy = float(x), float(y)
                        if fx != fy and (abs(fx) + abs(fy)) > 0:
                            max_rel = max(max_rel,
                                          abs(fx - fy) / max(abs(fx), abs(fy)))
                    except ValueError:
                        pass
            if max_rel:
                print(f"   near-miss: max relative float diff {max_rel:.3e}")
            for a, b in diff:
                print(f"   spark:  {a}\n   oracle: {b}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
