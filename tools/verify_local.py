#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
outDir/<name> parquet written by graft.Verify, replay outDir/
oracle_sql.json in DuckDB over the same scale-factor tables, and
compare result sets (sorted columns, sorted rows, float tolerance).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != {wcols}");  n_fail += 1;  continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}");  n_fail += 1;  continue
        bad = None
        for gr, wr in zip(grows, wrows):
            if not all(approx_eq(a, b) for a, b in zip(gr, wr)):
                bad = (gr, wr);  break
        if bad:
            print(f"FAIL {name}: first mismatch\n  got  {bad[0]}\n  want {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    extra = [k for k in glob.glob(f"{out_dir}/*/") if os.path.basename(k.rstrip('/')) not in oracle]
    for k in sorted(extra):
        name = os.path.basename(k.rstrip('/'))
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
