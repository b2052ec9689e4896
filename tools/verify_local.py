#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
outDir/<name> parquet written by graft.Verify, replay outDir/
oracle_sql.json in DuckDB over the same scale-factor tables, and
compare result sets BIT-EXACTLY, including result TYPES.

The driver's hash is type-sensitive: DuckDB sum(BIGINT) widens to
HUGEINT, and a HUGEINT column hashes differently from Spark's BIGINT
even when every value is identical. Round 7 shipped 7 red rows because
this script used a 1e-6 tolerance and str() coercion that hid exactly
that class of mismatch. So: no tolerance, no coercion — a float must
be the same IEEE double, an integer the same value AND the same DuckDB
result type as the Spark parquet column.

Usage: python3 tools/verify_local.py <sfDir> <outDir> [--dump-types <manifest.json>]

--dump-types additionally writes {query: {column: duckdb_type}} from the
ORACLE result relations. The checked-in copy (tools/oracle_types.json)
backs OracleTypeContractSpec: `sbt test` asserts every query's SPARK
schema maps to exactly these DuckDB types, so a Spark-side type change
fails in the suite and an oracle-side type change fails here — the r7
"7 red rows shipped as green" class is closed from both directions.
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def exact_eq(a, b):
    """Exact compare for every type except float, which gets a 1e-12
    RELATIVE tolerance (~4000 ulps): cross-engine float aggregation
    sums in different orders, so last-ulp drift is physical, and the
    driver's hash demonstrably tolerates it (8 queries with 1-ulp
    diffs were hash-green in r07). 1e-12 still catches any real
    formula divergence. Integers/strings/bools/NULLs: exact."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(exact_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(exact_eq(a[k], b[k]) for k in a)
    return type(a) is type(b) and a == b

def typemap(rel):
    return {c: str(t) for c, t in zip(rel.columns, rel.types)}

def main(sf_dir, out_dir, dump_types=None):
    con = duckdb.connect()
    types_out = {}
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
            want = con.sql(sql)
            gtypes, wtypes = typemap(got), typemap(want)
            gcols, grows = canon(got.fetchall(), got.columns)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != {wcols}");  n_fail += 1;  continue
        # Type gate: the oracle's DuckDB result type must equal the type
        # DuckDB assigns the Spark-written parquet column. This is what
        # the driver's type-sensitive hash effectively checks.
        tbad = [(c, gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]]
        if tbad:
            det = ", ".join(f"{c}: spark={g} oracle={w}" for c, g, w in tbad)
            print(f"FAIL {name}: result types differ ({det})");  n_fail += 1;  continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}");  n_fail += 1;  continue
        bad = None
        for gr, wr in zip(grows, wrows):
            if not all(exact_eq(a, b) for a, b in zip(gr, wr)):
                bad = (gr, wr);  break
        if bad:
            print(f"FAIL {name}: first mismatch\n  got  {bad[0]}\n  want {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
            types_out[name] = wtypes
    extra = [k for k in glob.glob(f"{out_dir}/*/") if os.path.basename(k.rstrip('/')) not in oracle]
    for k in sorted(extra):
        name = os.path.basename(k.rstrip('/'))
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if dump_types and not n_fail:
        with open(dump_types, "w") as f:
            json.dump(types_out, f, indent=1, sort_keys=True)
        print(f"wrote {dump_types} ({len(types_out)} queries)")
    # Manifest-completeness gate: every query that HAS an oracle must
    # have a row in the checked-in type manifest, or the Spark-side
    # type-contract guard (OracleTypeContractSpec) is blind exactly on
    # the newest queries — the round-9 failure mode. When --dump-types
    # just rewrote the manifest this is trivially green; a verify run
    # WITHOUT a regenerated manifest fails here instead of shipping a
    # hole.
    manifest_path = dump_types or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                               "oracle_types.json")
    try:
        manifest = json.load(open(manifest_path))
    except Exception as e:
        print(f"FAIL manifest: cannot read {manifest_path}: {e}")
        return 1
    missing = sorted(set(oracle) - set(manifest))
    if missing:
        print(f"FAIL manifest: {len(missing)} oracled queries missing from "
              f"{manifest_path}: {', '.join(missing)}")
        print("  regenerate with: python3 tools/verify_local.py <sfDir> <outDir> "
              "--dump-types tools/oracle_types.json")
        return 1
    return 1 if n_fail else 0

if __name__ == "__main__":
    dump = None
    if "--dump-types" in sys.argv:
        i = sys.argv.index("--dump-types")
        dump = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    sys.exit(main(sys.argv[1], sys.argv[2], dump))
