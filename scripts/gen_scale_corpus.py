"""Generate a deterministic scaled replica corpus for scale-stress sweeps.

The driver's corpus stops at sf0.1 (TESTDATA.md), but SCALE.md's 100 TB
claims deserve at least one decade of empirical slope — so this script
manufactures an sfN directory by replicating sf0.1 M times (default
M=10 → "sf1") with KEY-SHIFTED replicas, preserving every distribution
and join relationship while scaling all fact cardinalities linearly:

- fact keys are shifted by ``replica * base_count`` so replicas never
  collide and every FK keeps exactly one parent (orders->customer,
  lineitem->orders/part/supplier, events.user_id space);
- ``region``/``nation`` stay fixed — real dimension tables don't grow
  with fact volume;
- ``documents.text`` gets a per-replica word-suffix rewrite (every
  token ``w -> w r<k>``): within-replica shingle/Jaccard structure
  (planted near-dups, term frequencies' SHAPE) is preserved exactly,
  while cross-replica similarity collapses to ~0, so near-dup pair
  counts scale linearly instead of quadratically-by-copy;
- ``embeddings.embedding`` is cyclically rolled by 7*replica dims:
  norms and within-replica cosines are bit-preserved, cross-replica
  cosines are isotropic-random (the corpus-gap property j9b/j44 rely
  on survives);
- ``events`` keeps its 30-day window and gains 10x users — densities
  rise the way a production scale-up's would.

Determinism: pure SQL over the read-only sf0.1 parquet, no RNG at all.

Usage:  python scripts/gen_scale_corpus.py [--mult 10] [--out scratch/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

BASE = "/root/testdata/sf0.1"

# base-table cardinalities at sf0.1 (verified against the parquet)
N = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def table_sql(t: str, m: int) -> str:
    src = f"read_parquet('{BASE}/{t}.parquet')"
    reps = f"(SELECT UNNEST(range({m})) AS r) reps"
    if t in ("region", "nation"):
        return f"SELECT * FROM {src}"
    if t == "customer":
        return f"""
            SELECT c_custkey + r * {N['customer']} AS c_custkey,
                   printf('Customer#%09d', c_custkey + r * {N['customer']}) AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src}, {reps}"""
    if t == "supplier":
        return f"""
            SELECT s_suppkey + r * {N['supplier']} AS s_suppkey,
                   printf('Supplier#%09d', s_suppkey + r * {N['supplier']}) AS s_name,
                   s_nationkey, s_acctbal
            FROM {src}, {reps}"""
    if t == "part":
        return f"""
            SELECT p_partkey + r * {N['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src}, {reps}"""
    if t == "orders":
        return f"""
            SELECT o_orderkey + r * {N['orders']} AS o_orderkey,
                   o_custkey + r * {N['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src}, {reps}"""
    if t == "lineitem":
        return f"""
            SELECT l_orderkey + r * {N['orders']} AS l_orderkey,
                   l_partkey + r * {N['part']} AS l_partkey,
                   l_suppkey + r * {N['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src}, {reps}"""
    if t == "events":
        return f"""
            SELECT event_id + r * {N['events']} AS event_id,
                   ts,
                   user_id + r * 1500 AS user_id,
                   event_type, value, props
            FROM {src}, {reps}"""
    if t == "documents":
        # word-suffix rewrite for r>0 — see module docstring
        return f"""
            SELECT doc_id + r * {N['documents']} AS doc_id,
                   text2 AS text, lang, source,
                   length(text2) AS n_chars
            FROM (
              SELECT doc_id, r, lang, source,
                     CASE WHEN r = 0 THEN text
                          ELSE regexp_replace(text, '([^ ]+)',
                                              '\\1r' || CAST(r AS VARCHAR), 'g')
                     END AS text2
              FROM {src}, {reps})"""
    if t == "embeddings":
        return f"""
            SELECT vec_id + r * {N['embeddings']} AS vec_id,
                   CASE WHEN r = 0 THEN embedding
                        ELSE CAST(list_transform(range(1, 65),
                                 i -> embedding[1 + CAST((i - 1 + r * 7) % 64 AS INT)])
                             AS FLOAT[])
                   END AS embedding,
                   label
            FROM {src}, {reps}"""
    raise ValueError(t)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="scratch/sf1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list (default: all) — e.g. documents,embeddings for a "
        "text/vector-only probe corpus where lineitem would not fit",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # Round-10b lesson: without a memory cap + insertion-order release
    # the --mult 100 lineitem COPY dies silently (DuckDB buffers the
    # whole ordered result).  Harmless at small mults.
    con.execute("SET memory_limit = '20GB'")
    con.execute("SET preserve_insertion_order = false")
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    if args.tables:
        tables = [t.strip() for t in args.tables.split(",")]
    for t in tables:
        dst = os.path.join(args.out, f"{t}.parquet")
        con.execute(
            f"COPY ({table_sql(t, args.mult)}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
