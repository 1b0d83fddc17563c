#!/usr/bin/env python3
"""Oracle type lint: reject engine-width-divergent output columns.

Usage: python3 tools/oracle_type_lint.py <sfDir> <oracleJsonPath>

Runs `DESCRIBE <sql>` for every oracle query in DuckDB over the parquet
tables in <sfDir> and fails if any RESULT column types HUGEINT or
UHUGEINT. DuckDB widens sum() over integers to int128; Spark stays
BIGINT, and the driver's hasher treats the widths as different types
even when every value is bit-identical — this exact artifact produced
driver-red rows in rounds 5 and 7 (q_token_budget, q_text_diversity,
q_quality_ensemble). The repo rule (ops/core.scala): every
engine-dependent integer width is CAST(… AS BIGINT) on both sides.
This lint makes the rule mechanical: OracleLintSpec runs it in
`sbt test`, so dropping a CAST fails the build before the driver ever
sees it.

Exit 0 = clean; exit 1 = violations (listed on stdout); exit 2 = usage
or setup error.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT")


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: oracle does not bind: {e}")
            bad += 1
            continue
        for col, ctype, *_ in rows:
            if any(b in ctype.upper() for b in BAD):
                print(f"HUGEINT {name}: column `{col}` types {ctype}; "
                      f"CAST it to BIGINT in the oracle (and match the "
                      f"Spark side)")
                bad += 1
    if bad:
        print(f"FAIL: {bad} violation(s)")
        return 1
    print(f"OK: {len(oracle)} oracles, no HUGEINT/UHUGEINT output columns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
