#!/usr/bin/env python3
"""Triage one fuzz failure: show the first rows where the Spark parquet
written by graft.Verify and the DuckDB oracle replay disagree over the
SAME mutated tables.

Usage: python3 tools/fuzz_triage.py <seedDir> <query> [--limit N]
  seedDir like /tmp/graft_fuzz/seed1 (contains data/ and out/)
"""
import json, sys, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import canon, exact_eq


def main(seed_dir, name, limit=10):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{seed_dir}/data/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sql = json.load(open(f"{seed_dir}/out/oracle_sql.json"))[name]
    res_glob = glob.glob(f"{seed_dir}/out/{name}/*.parquet")
    if not res_glob:
        print("no spark output; Verify's stderr for this query is the lead")
        return 1
    got = con.sql(f"SELECT * FROM '{seed_dir}/out/{name}/*.parquet'")
    want = con.sql(sql)
    gcols, grows = canon(got.fetchall(), got.columns)
    wcols, wrows = canon(want.fetchall(), want.columns)
    print(f"cols spark={gcols}")
    if gcols != wcols:
        print(f"COLS DIFFER: oracle={wcols}")
        return 1
    print(f"rows spark={len(grows)} oracle={len(wrows)}")
    gset = {tuple(str(x) for x in r) for r in grows}
    wset = {tuple(str(x) for x in r) for r in wrows}
    only_g = [r for r in grows if tuple(str(x) for x in r) not in wset]
    only_w = [r for r in wrows if tuple(str(x) for x in r) not in gset]
    print(f"spark-only rows: {len(only_g)}")
    for r in only_g[:limit]:
        print("  S:", r)
    print(f"oracle-only rows: {len(only_w)}")
    for r in only_w[:limit]:
        print("  O:", r)
    if not only_g and not only_w:
        # value-identical as strings: fall back to exact positional diff
        diverged = False
        for i, (a, b) in enumerate(zip(grows, wrows)):
            if not all(exact_eq(x, y) for x, y in zip(a, b)):
                diverged = True
                print(f"row {i}: S={a} O={b}")
                if limit := limit - 1:
                    continue
                break
        return 1 if diverged else 0
    # a printed spark-only/oracle-only row IS a divergence — exit
    # nonzero so scripting on the status can't read it as clean (r13)
    return 1


if __name__ == "__main__":
    lim = 10
    if "--limit" in sys.argv:
        i = sys.argv.index("--limit"); lim = int(sys.argv[i+1])
    sys.exit(main(sys.argv[1], sys.argv[2], lim))
