#!/usr/bin/env python3
"""Dev-only driver mimic: compare Verify output parquet against DuckDB oracle.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Not part of the library (the engine is pure Scala/Spark); this replicates the
driver's correctness gate locally so oracle-SQL mismatches surface before a
round ends.
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    # sort columns by name, then rows by string repr (driver-style canonicalization)
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q_*"))
    n_ok = n_bad = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_bad += 1; continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = spark_tbl.column_names
        spark_rows = [tuple(r[c] for c in spark_cols) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            status = "rows-only" + (" OK" if len(spark_rows) > 0 else " EMPTY!")
            print(f"{status:>12}  {name}: {len(spark_rows)} rows")
            if len(spark_rows) == 0: n_bad += 1
            else: n_ok += 1
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_bad += 1; continue
        problems = []
        # Oracle type lint: the driver's hasher serializes HUGEINT/DECIMAL
        # differently from int64/float64 even when values are equal (this is
        # the blind spot that shipped 4 value-identical-but-red rows in r12 —
        # python comparison below can't see it). DESCRIBE the oracle and fail
        # loudly on any final column of a hash-unsafe type.
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name].rstrip().rstrip(';')})").fetchall()
            bad_types = [(c, t) for c, t, *_ in desc
                         if any(k in t.upper() for k in ("HUGEINT", "DECIMAL", "UHUGEINT"))]
            if bad_types:
                problems.append(f"oracle type lint: hash-unsafe columns {bad_types} "
                                f"(wrap in CAST(... AS BIGINT/DOUBLE))")
        except Exception as e:
            problems.append(f"oracle DESCRIBE failed: {e}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if not problems:
            a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}"); n_bad += 1
        else:
            print(f"OK    {name}: {len(spark_rows)} rows"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
