#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each SparkEntry query,
load the Spark parquet dump and run the oracle SQL in DuckDB over the same
sf tables; sort columns by name; compare row-by-row.

Usage: python3 tools/compare.py /root/testdata/sf0.001 /tmp/vout [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Queries without an oracle still must have produced rows (the driver's
    # weaker rows-only check); a query whose dump errored has no output dir.
    try:
        all_queries = json.load(open(f"{outdir}/queries.json"))
    except FileNotFoundError:
        all_queries = list(oracles)
    for name in sorted(set(all_queries) - set(oracles)):
        if only and name not in only:
            continue
        pq = f"{outdir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir (rows-only query)")
            n_fail += 1
            continue
        n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
        if n > 0:
            print(f"PASS {name} ({n} rows, rows-only)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows-only query returned 0 rows")
            n_fail += 1
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = f"{outdir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        got = got[gcols]
        exp = exp[ecols]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        bad = None
        for i, (g, e) in enumerate(zip(grows, erows)):
            if g != e:
                # allow tiny float tolerance report (driver hashes exactly!)
                close = all(
                    (a == b) or (isinstance(a, float) and isinstance(b, float)
                                 and abs(a - b) < 1e-9)
                    for a, b in zip(g, e))
                bad = (i, g, e, close)
                break
        if bad:
            i, g, e, close = bad
            tag = "NEAR" if close else "DIFF"
            print(f"FAIL {name}: row {i} {tag}\n  spark : {g}\n  oracle: {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main()
