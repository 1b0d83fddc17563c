#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result produced by
graft.Verify, runs the matching SQL from oracle_sql.json in DuckDB over
the raw parquet tables in <sfDir>, and compares values exactly:
columns sorted by name, rows sorted by all columns, cell-by-cell.
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # decimal vs float, numpy vs python ints etc.
    try:
        if a == b:
            return True
    except Exception:
        pass
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    names = sorted(oracle)
    for name in names:
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cells_equal(x, y):
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    for name in sorted(set(os.listdir(out_dir)) - set(names)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p):
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
    print(f"\n{n_pass} pass / {n_fail} fail of {len(names)} oracle-checked")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
