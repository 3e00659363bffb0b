#!/usr/bin/env python3
"""Local dry-run of the driver's t2 gate: compare Verify parquet output
against DuckDB running oracle_sql.json on the same test tables.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Comparison is stricter than the driver plausibly is: row count, column
names, and exact values in order (after sorting columns by name). Any
mismatch here means a likely driver-side hash mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # driver testdata ships single-file tables; GenScaledData's sf1
        # fixtures are Spark-style directories of part files
        path = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # A throwing query writes a 1-row marker parquet whose only column is
    # __graft_error. Oracled entries fail the schema compare anyway, but a
    # rows-only (oracle=None) entry would look like an ordinary 1-row
    # result — scan EVERY dump dir for the marker so no failure hides.
    import pyarrow.parquet as pq
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}*.parquet")
        if not files:
            continue
        # schema-only read: scanning 200+ dumps' data just for column
        # names would double the gate's I/O
        if pq.ParquetFile(files[0]).schema_arrow.names == ["__graft_error"]:
            msg = pd.read_parquet(files[0]).iloc[0, 0]
            print(f"FAIL {name}: query threw: {msg}")
            n_fail += 1
    errs_path = f"{out_dir}/_errors.json"
    if os.path.exists(errs_path):
        for name, msg in sorted(json.load(open(errs_path)).items()):
            print(f"ERROR {name}: {msg}")
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                if a.dtype != b.dtype:
                    # normalize (e.g. int32 vs int64, datetime units) but report
                    an, bn = a.astype(object), b.astype(object)
                else:
                    an, bn = a, b
                neq = ~((an == bn) | (an.isna() & bn.isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} (dtypes {a.dtype}/{b.dtype})"
                    break
                if a.dtype != b.dtype:
                    bad_dtype = f"col {c}: dtype {a.dtype} vs {b.dtype} (values equal)"
                    print(f"WARN {name}: {bad_dtype}")
            except Exception as e:
                bad = f"col {c}: compare error {e}"; break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
