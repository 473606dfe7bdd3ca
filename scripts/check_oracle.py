#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
parquet dumps against DuckDB executing SparkEntry.oracleSql on the same
testdata dir, compare values exactly (column-name-sorted, row-sorted).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name; stringify values canonically; sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v!r}")
            elif isinstance(v, bytes):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(d + "/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        got_cols = tbl.column_names
        got_rows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
        if name not in oracle:
            print(f"[SKIP] {name}: rows-only ({tbl.num_rows} rows)"); n_skip += 1
            if tbl.num_rows == 0:
                print(f"       WARNING: zero rows")
            continue
        try:
            res = con.execute(oracle[name])
            want_cols = [d2[0] for d2 in res.description]
            want_rows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}"); n_fail += 1; continue
        g, gc = canon(got_rows, got_cols)
        w, wc = canon(want_rows, want_cols)
        if gc != wc:
            print(f"[FAIL] {name}: columns differ spark={gc} duckdb={wc}"); n_fail += 1; continue
        if g == w:
            print(f"[PASS] {name}: {len(g)} rows"); n_pass += 1
        else:
            print(f"[FAIL] {name}: rows differ (spark={len(g)}, duckdb={len(w)})")
            sg, sw = set(g), set(w)
            for x in list(sg - sw)[:3]: print(f"   spark-only: {x[:200]}")
            for x in list(sw - sg)[:3]: print(f"   duck-only:  {x[:200]}")
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
