#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each SparkEntry query,
load the Spark parquet dump and run the oracle SQL in DuckDB over the same
sf tables; sort columns by name; compare row-by-row.

The driver hashes TYPED values, so this mirror is type-exact on two axes the
old pandas-based version was blind to (round-5 postmortem):
  1. schema gate — the DuckDB oracle relation's column types must match the
     Spark parquet schema exactly (as seen by DuckDB's parquet reader); a
     sum()-typed HUGEINT vs Spark's BIGINT is a FAIL even when every value
     is equal, because the driver's hash disagrees.
  2. values are fetched natively from DuckDB on BOTH sides (no pandas
     round-trip, which coerced HUGEINT->float64 and nullable int->float64),
     so integer columns compare with exact Python int equality.

Usage: python3 tools/compare.py /root/testdata/sf0.001 /tmp/vout [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FLOAT_TYPES = {"FLOAT", "DOUBLE", "REAL"}


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def types_ok(spark_t, oracle_t):
    """Exact type-name equality, modulo the one rename DuckDB's parquet
    reader performs (REAL is what `DESCRIBE` calls a parquet FLOAT)."""
    canon = lambda t: "FLOAT" if t.upper() == "REAL" else t.upper()
    return canon(spark_t) == canon(oracle_t)


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
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM '{pq}/*.parquet'").fetchall()
            snames = [r[0] for r in sdesc]
            stypes = {r[0]: r[1] for r in sdesc}
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            onames = list(rel.columns)
            otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        gcols, ecols = sorted(snames), sorted(onames)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        # -- schema gate: the driver hashes typed values, so a type drift is
        # a failure even when every value compares equal.
        badt = [(c, stypes[c], otypes[c]) for c in gcols
                if not types_ok(stypes[c], otypes[c])]
        if badt:
            det = ", ".join(f"{c}: spark={s} oracle={o}" for c, s, o in badt)
            print(f"FAIL {name}: TYPE mismatch — {det}")
            n_fail += 1
            continue
        try:
            grows = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchall()
            erows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: fetch error: {str(e)[:200]}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        gperm = [snames.index(c) for c in gcols]
        eperm = [onames.index(c) for c in ecols]
        is_float = [stypes[c] in FLOAT_TYPES
                    for c in gcols]
        bad = None
        for i, (gr, er) in enumerate(zip(grows, erows)):
            g = tuple(norm(gr[j]) for j in gperm)
            e = tuple(norm(er[j]) for j in eperm)
            if g != e:
                # label sub-1e-9 float drift NEAR — still a FAIL, the
                # driver hashes exactly; the label just aids triage.
                close = all(
                    (a == b) or (f and isinstance(a, float)
                                 and isinstance(b, float)
                                 and abs(a - b) < 1e-9)
                    for a, b, f in zip(g, e, is_float))
                bad = (i, g, e, close)
                break
        if bad:
            i, g, e, close = bad
            tag = "NEAR" if close else "DIFF"
            print(f"FAIL {name}: row {i} {tag}\n  spark : {g}\n  oracle: {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main()
