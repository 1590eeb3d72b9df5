"""Scan every registered oracle's OUTPUT TYPES for representation hazards.

The driver hashes Spark and oracle results through Arrow.  DuckDB renders
HUGEINT (int128, e.g. ``SUM`` over INTEGER) and DECIMAL literals as
``decimal128(38,0)`` / ``decimal128(p,s)`` at the Arrow layer, while the
Spark side emits int64 / double — a guaranteed hash MISMATCH even when
every value is identical (the round-4 h8/k3 driver reds).  This scanner
binds each oracle (no Spark, no full execution) and reports any column
whose DuckDB logical type is HUGEINT or DECIMAL.

Usage: python scripts/scan_oracle_types.py [sf_dir]
Exit 0 = clean; exit 1 = hazards found (listed per query/column).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

HAZARD_TYPES = ("HUGEINT", "DECIMAL")


def main() -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    n_hazard = 0
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
        except Exception as exc:
            print(f"  ERROR {name}: {type(exc).__name__}: {exc}")
            n_hazard += 1
            continue
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ).upper()
            if any(h in ts for h in HAZARD_TYPES):
                print(f"  HAZARD {name}.{col}: {typ}")
                n_hazard += 1
    print(f"TOTAL: {len(oracles)} oracles scanned, {n_hazard} hazard columns")
    return 1 if n_hazard else 0


if __name__ == "__main__":
    sys.exit(main())
