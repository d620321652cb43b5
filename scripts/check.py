#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf_dir
tables, and compares row counts, sorted columns, and values.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "nan"
            rr.append(repr(v))
        out.append(tuple(rr))
    return sorted(cols), sorted(out)


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(grows)} rows")
            continue
        try:
            # type audit first: the driver's hasher is TYPE-SENSITIVE while
            # this harness compares python values — a HUGEINT/DECIMAL output
            # column passes here but hash-fails the driver gate (two rounds
            # of llm_sample_pps red until the copies CAST landed). DESCRIBE
            # is free; make the divergence loud in the dev loop.
            widened = [
                (c, t) for c, t, *_ in con.execute(f"DESCRIBE {oracle[name]}").fetchall()
                if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
            ]
            if widened:
                print(f"FAIL {name}: oracle outputs driver-hash-unsafe types "
                      f"{widened} — CAST them (usually AS BIGINT)")
                n_fail += 1
                continue
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"   spark: {gr[bad]}")
            print(f"   duck : {er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
