#!/usr/bin/env python3
"""Oracle-side twin of graft.Verify.canonicalHash.

Usage:
  python3 tools/canonical_hash.py <sfDir> <verifyOutDir> [query ...]

For each query (default: all in oracle_sql.json), runs the oracle SQL
in DuckDB over <sfDir>'s parquet tables, computes the canonical hash
with EXACTLY the format Verify writes to <verifyOutDir>/<q>/_canonical.md5
(columns sorted by name; cells stringified — NULL / lowercase booleans /
IEEE-754 bit-hex doubles / epoch-micro timestamps / epoch-day dates /
plain-string decimals / hex binary / bracketed collections; rows sorted
as string tuples; US/RS joiners; md5 of UTF-8), and prints both hashes
side by side. A driver `hash_match: false` with MATCHING canonical
hashes here is an artifact of the driver's hasher (type or ordering),
not a value divergence; differing hashes bisect further with --dump.
"""
import sys, os, struct, hashlib, math
from datetime import datetime, date, timezone
from decimal import Decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
EPOCH = datetime(1970, 1, 1)


def cell_str(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            bits = 0x7ff8000000000000
        else:
            bits = struct.unpack(">Q", struct.pack(">d", v))[0]
        return "d:" + format(bits, "x")
    if isinstance(v, (bytes, bytearray)):
        return "x:" + v.hex()
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        delta = v - EPOCH
        micros = (delta.days * 86400 + delta.seconds) * 10**6 \
            + delta.microseconds
        return "t:" + str(micros)
    if isinstance(v, date):
        return "D:" + str((v - EPOCH.date()).days)
    if isinstance(v, Decimal):
        return "n:" + format(v, "f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell_str(x) for x in v) + "]"
    if isinstance(v, dict):
        # DuckDB returns STRUCTs as dicts (field order) and MAPs as
        # dicts too; structs → bracketed in field order, but we cannot
        # distinguish — treat as struct (matches the Spark Row case for
        # every oracle in this repo; no MAP-typed oracle output exists).
        return "{" + ",".join(cell_str(x) for x in v.values()) + "}"
    return str(v)


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    srows = sorted(
        tuple(cell_str(r[i]) for i in order) for r in rows)
    body = "\x1e".join("\x1f".join(r) for r in srows)
    return hashlib.md5(body.encode("utf-8")).hexdigest(), len(srows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    import json
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_match = n_diff = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        path = os.path.join(out_dir, name, "_canonical.md5")
        spark_hash = open(path).read().split()[0] \
            if os.path.exists(path) else "(missing)"
        res = con.execute(oracle[name])
        cols = [d[0] for d in res.description]
        h, n = canonical(cols, res.fetchall())
        tag = "MATCH" if h == spark_hash else "DIFF "
        if h == spark_hash:
            n_match += 1
        else:
            n_diff += 1
        print(f"{tag} {name}: spark={spark_hash} oracle={h} rows={n}")
    print(f"{n_match} match / {n_diff} diff")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
