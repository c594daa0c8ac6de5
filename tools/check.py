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

def norm_type(t):
    """Normalize an Arrow type to the granularity the driver's
    type-sensitive value hash distinguishes. HUGEINT (decimal128/int128
    from an uncast DuckDB sum) must NOT collapse into int64 — that is
    exactly the class of driver failure (round-4 x10) this mirror
    exists to catch locally. Differences the driver demonstrably
    tolerates (89 green rows in CORRECTNESS_r04 establish these) are
    collapsed: string vs large_string, timestamp tz annotation."""
    import pyarrow as pa
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_integer(t):
        # int32 row_number vs int64 passes the driver (s2/v1/v7 green in
        # r4) — widths collapse; decimal128 (DuckDB HUGEINT) does NOT
        return "int"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)

def cmp_types(s_tbl, d_tbl, names_sorted):
    bad = []
    for n in names_sorted:
        st = norm_type(s_tbl.schema.field(n).type)
        dt = norm_type(d_tbl.schema.field(n).type)
        # an all-null DuckDB column can come back as null type; the
        # driver hashes nulls identically regardless of declared type
        if "null" in (st, dt):
            continue
        if st != dt:
            bad.append((n, st, dt))
    return bad

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

def selftest():
    """Regression: an uncast DuckDB sum() (HUGEINT→decimal128) against a
    Spark long column must FAIL the type compare; the sqlLsum-cast form
    must PASS. Guards against check.py regressing into the round-4
    type-erasing compare that masked the x10 driver failure."""
    import pyarrow as pa
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(3 AS BIGINT) AS x")
    spark_side = pa.table({"s": pa.array([3], type=pa.int64())})
    uncast = con.execute("SELECT sum(x) AS s FROM t").arrow()
    cast = con.execute("SELECT CAST(sum(x) AS BIGINT) AS s FROM t").arrow()
    ok = (cmp_types(spark_side, uncast, ["s"]) != []
          and cmp_types(spark_side, cast, ["s"]) == [])
    print("selftest: " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)

def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
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
            d_tbl = con.execute(sql).arrow()
            d_names = d_tbl.column_names
            d_cols = [c.to_pylist() for c in d_tbl.columns]
            d_rows, d_names_sorted = rows_of(d_cols, d_names)
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}")
            n_fail += 1
            continue
        if s_names_sorted != d_names_sorted:
            print(f"FAIL {name}: columns {s_names_sorted} != {d_names_sorted}")
            n_fail += 1
            continue
        type_bad = cmp_types(tbl, d_tbl, s_names_sorted)
        if type_bad:
            n, st, dt = type_bad[0]
            print(f"FAIL {name}: col {n} type spark={st} duckdb={dt}"
                  + (f" (+{len(type_bad)-1} more)" if len(type_bad) > 1 else ""))
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
