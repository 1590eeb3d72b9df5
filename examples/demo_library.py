"""Library-API tour — what switching to this engine looks like in code
(the CLI/route JSON path is examples/route_*.json; this is the
programmatic face).  Runs end to end on the sf0.01 corpus:

    python examples/demo_library.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import ma_anonymization_etl_spark as mael  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = mael.session.get_spark(app_name="mael-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Load + classify + anonymize as one lazy plan.
    customer = mael.io.load(spark, sf_dir, "customer")
    roles = mael.pipeline.classify_columns(
        {"c_name": "di", "c_nationkey": "qi", "c_acctbal": "sa", "c_custkey": "keep"}
    )
    sanitized = mael.pipeline.anonymize_pipeline(
        customer,
        [
            {"op": "pseudonymize_sha2", "col": "c_name", "salt": "demo|"},
            {"op": "generalize_numeric", "col": "c_acctbal", "width": 2500,
             "out": "bal_bin"},
            {"op": "k_enforce_suppress", "qis": ["c_nationkey", "bal_bin"], "k": 8},
        ],
    )
    k = mael.anonymize.k_anonymity_metric(
        sanitized, ["c_nationkey", "bal_bin"]
    ).collect()[0]["k_anonymity"]
    assert k >= 8, k
    print(f"1. anonymized route: {sanitized.count()} rows, k-anonymity {k} "
          f"(DI roles: {roles['di']})")

    # 2. A DP release next to it (noise deterministic per salt).
    release = mael.dp.dp_sum_clipped(
        customer, "c_nationkey", "c_acctbal", 0.0, 1000.0, epsilon=1.0, salt="demo|"
    )
    print(f"2. dp release: {release.count()} noisy per-nation sums")

    # 3. Near-dup dedup over documents (MinHash-LSH, banded candidates).
    pairs = mael.llm.j3_dedup_near_minhash(spark, sf_dir)
    print(f"3. near-dup pairs (MinHash-LSH, exact-verified): {pairs.count()}")

    # 4. SQL text through the same engine.
    top = mael.sql.run_sql(
        spark, sf_dir,
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment",
    )
    print("4. sql:", [tuple(r) for r in top.limit(2).collect()])

    # 5. Similarity: top-3 neighbours of vector 0.
    sims = mael.similarity.j8_sim_topk(spark, sf_dir).limit(3)
    print("5. cosine top-3:", [tuple(r) for r in sims.collect()])

    spark.stop()
    print("demo OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
