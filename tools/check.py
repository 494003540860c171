#!/usr/bin/env python3
"""Local image of the driver's t2 correctness gate.

Runs every SparkEntry oracle SQL in DuckDB over the same sf-dir parquet
tables, reads the Spark-written parquet results, and compares:
column names (sorted), dtypes, row counts, and values (row-sorted).

Usage: tools/check.py <sfdir> <verify_outdir> [query ...]
(run tools/run.sh graft.Verify <sfdir> <outdir> first)
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v): rr.append("NaN")
                else: rr.append(repr(v))
            else: rr.append(repr(v))
        out.append(tuple(rr))
    return sorted(out)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (e.g. ScaleProbe corpora)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.sql(sql)
            ocols = list(o.columns); otypes = [str(t) for t in o.types]
            orows = o.fetchall()
            srel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = list(srel.columns); stypes = [str(t) for t in srel.types]
            srows = srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        # sort columns by name (driver behavior)
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        ocols_s = [ocols[i] for i in operm]; scols_s = [scols[i] for i in sperm]
        otypes_s = [otypes[i] for i in operm]; stypes_s = [stypes[i] for i in sperm]
        if ocols_s != scols_s:
            print(f"FAIL {name}: cols oracle={ocols_s} spark={scols_s}"); n_fail += 1; continue
        if otypes_s != stypes_s:
            # The driver's hash is type-sensitive (e.g. DuckDB widening a
            # windowed SUM(BIGINT) to HUGEINT reads as red there), so the
            # local gate must be at least as strict.
            print(f"FAIL {name}: dtypes oracle={otypes_s} spark={stypes_s}")
            n_fail += 1; continue
        orows_p = [tuple(r[i] for i in operm) for r in orows]
        srows_p = [tuple(r[i] for i in sperm) for r in srows]
        if len(orows_p) != len(srows_p):
            print(f"FAIL {name}: rows oracle={len(orows_p)} spark={len(srows_p)}"); n_fail += 1; continue
        oc, sc = canon(orows_p), canon(srows_p)
        if oc != sc:
            bad = [(a, b) for a, b in zip(oc, sc) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(orows_p)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
