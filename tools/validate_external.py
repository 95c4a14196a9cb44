#!/usr/bin/env python3
"""Second-engine validation of the medallion silver/gold tables — the role
Trino plays in the reference (scripts/run_pipeline.py:238-277 runs
COUNT(*) / LIMIT 1 through a second engine over the tables Spark wrote;
cross-engine readability is the acceptance test). Locally the second engine
is DuckDB. Invoked by graft.medallion.Pipeline.validate.

Usage: python3 tools/validate_external.py <silver_location> <gold_location>
Exit 0 = both tables readable and non-empty from DuckDB; 1 = validation
failed; prints EXTERNAL_SKIP if duckdb is not importable.
"""
import sys

try:
    import duckdb
except ImportError:
    print("EXTERNAL_SKIP: duckdb not importable")
    sys.exit(0)


def strip_scheme(p: str) -> str:
    return p[5:] if p.startswith("file:") else p


def check(con, name: str, loc: str) -> bool:
    glob = strip_scheme(loc).rstrip("/") + "/**/*.parquet"
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{glob}', hive_partitioning=true)"
    ).fetchone()[0]
    one = con.execute(
        f"SELECT * FROM read_parquet('{glob}', hive_partitioning=true) LIMIT 1"
    ).fetchall()
    print(f"{name}: count={n} limit1={'ok' if one else 'empty'}")
    return n > 0 and len(one) == 1


def main() -> int:
    silver_loc, gold_loc = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    try:
        ok = check(con, "silver", silver_loc) and check(con, "gold", gold_loc)
    except Exception as e:
        print(f"external validation error: {e}")
        return 1
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
