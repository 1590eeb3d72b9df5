"""Simulate the driver harness end-to-end: vanilla SparkSession (no engine
confs — the driver builds its own), entry() smoke at sf0.001, every
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 with
row-count + column-name + order-insensitive value comparison.

Usage: python scripts/driver_sim.py [sf_dir] [--window N]

--window N restricts the run to the FIRST N queries in registration
order — the driver's own sampled gate checks exactly that window, so
``python scripts/driver_sim.py --window 50`` is the one-command
pre-snapshot check that the gated window is green.
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import canon_rows  # noqa: E402

_parser = argparse.ArgumentParser(description=__doc__)
_parser.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
_parser.add_argument("--window", type=int, default=None,
                     help="restrict to the first N queries in registration order")
_parser.add_argument("--only", default=None,
                     help="comma-separated name substrings — run only matching queries")
_cli = _parser.parse_args()
SF_DIR = _cli.sf_dir
WINDOW = _cli.window
ONLY = _cli.only.split(",") if _cli.only else None


def main() -> int:
    # Vanilla session, as the driver would build it.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = entrymod.entry(spark).collect()
    print(f"entry() smoke: {len(rows)} rows — {'OK' if rows else 'FAIL'}")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    items = list(qs.items())  # registration order — the order the driver samples in
    if WINDOW is not None:
        items = items[:WINDOW]
    if ONLY is not None:
        items = [(n, q) for n, q in items if any(s in n for s in ONLY)]
        print(f"window: first {len(items)} queries in registration order")
    n_ok = n_fail = n_rows_only = 0
    for name, fn in items:
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  rows-only {name}: {len(s_rows)} rows [{time.perf_counter()-t0:.2f}s]")
                n_rows_only += 1
                continue
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            # The driver hashes through Arrow: DuckDB HUGEINT/DECIMAL columns
            # render as decimal128 vs Spark int64/double — a representation
            # hash-mismatch even when values agree (round-4 h8/k3 reds).
            # fetchall() below normalizes those types away, so flag them here.
            hazards = [
                f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
            ]
            d_rows = rel.fetchall()
            ok = (
                not hazards
                and sorted(s_cols) == sorted(d_cols)
                and len(s_rows) == len(d_rows)
                and canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows)
            )
            if hazards:
                print(f"  REPR-HAZARD {name}: oracle Arrow-decimal columns {hazards}")
            print(f"  {'MATCH' if ok else 'MISMATCH'} {name}: {len(s_rows)} rows "
                  f"[{time.perf_counter()-t0:.2f}s]")
            n_ok += ok
            n_fail += not ok
        except Exception as exc:  # driver records errors per query
            print(f"  ERROR {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
    print(f"TOTAL: {n_ok} match, {n_rows_only} rows-only, {n_fail} fail / {len(items)}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
