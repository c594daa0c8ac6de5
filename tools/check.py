#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify parquet
dumps (sort columns by name, sort rows, exact-or-tolerant compare).

Usage: tools/check.py <sfDir> <verifyOutDir> [query...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def rows_of(cols, names):
    # sort columns by name, then produce row tuples sorted
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    rows = list(zip(*cols)) if cols else []
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r)), \
        [names[i] for i in order]

def cmp_val(a, b):
    # EXACT compare, mirroring the driver's value-hash gate: no float
    # tolerance, no Decimal coercion (round-1 lesson: the 1e-9 tolerance
    # masked 21 driver hash failures). A decimal/float/int type mismatch
    # or a representation difference is a FAIL, exactly like the driver.
    a, b = norm(a), norm(b)
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    import decimal
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        # exact string form must match — '1.5' vs '1.500000' is a FAIL
        return type(a) is type(b) and str(a) == str(b)
    if type(a) is not type(b):
        return False
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(pdir)
            s_names = tbl.column_names
            s_cols = [c.to_pylist() for c in tbl.columns]
            s_rows, s_names_sorted = rows_of(s_cols, s_names)
            res = con.execute(sql)
            d_names = [d[0] for d in res.description]
            d_data = res.fetchall()
            d_cols = list(map(list, zip(*d_data))) if d_data else \
                [[] for _ in d_names]
            d_rows, d_names_sorted = rows_of(d_cols, d_names)
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}")
            n_fail += 1
            continue
        if s_names_sorted != d_names_sorted:
            print(f"FAIL {name}: columns {s_names_sorted} != {d_names_sorted}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                if not cmp_val(a, b):
                    bad = (i, s_names_sorted[j], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
