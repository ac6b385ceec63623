#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf tables, and compares: row count,
column names/types, and values (columns sorted by name, rows sorted, doubles
compared with tolerance).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb


def canon(rows, cols):
    # sort columns by name, then rows by stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple("" if v is None else str(v) for v in t)), \
        [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        g_rows, g_cols = canon(got, got_cols)
        e_rows, e_cols = canon(exp, exp_cols)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns spark={g_cols} oracle={e_cols}")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rowcount spark={len(g_rows)} oracle={len(e_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g_rows, e_rows)):
            if not all(eq(a, b) for a, b in zip(gr, er)):
                bad = (i, gr, er)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
