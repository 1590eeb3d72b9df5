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

    # 6. Data-quality gate before releasing anything.
    from ma_anonymization_etl_spark.operators.quality import q2_constraint_check

    checks = {r.check_name: r.n_violations for r in
              q2_constraint_check(spark, sf_dir).collect()}
    assert all(v == 0 for v in checks.values()), checks
    print(f"6. constraint suite: {len(checks)} checks, 0 violations")

    # 7. A tabular release with cell suppression (route step form).
    table = mael.pipeline.anonymize_pipeline(
        customer,
        [{"op": "cell_suppression", "qis": ["c_nationkey", "c_mktsegment"],
          "threshold": 5}],
    )
    hidden = table.filter(F.col("status") != "ok").count()
    print(f"7. suppressed frequency table: {table.count()} cells, {hidden} hidden")

    # 8. Graph analytics on the co-purchase graph.
    from ma_anonymization_etl_spark.operators.graph import p1_pagerank

    top_parts = p1_pagerank(spark, sf_dir).limit(3)
    print("8. pagerank top-3 parts:", [tuple(r) for r in top_parts.collect()])

    # 9. Curation library on YOUR OWN DataFrames (the parameterized
    # df-first API the registered demos delegate to).
    docs = mael.io.load(spark, sf_dir, "documents")
    kept = mael.llm.repetition_signals(docs, dup2_max=0.05, top_max=0.12)
    audit = mael.llm.split_audit(
        mael.llm.split_assign(docs, "doc_id", salt="demo|"), "source"
    )
    print(f"9. curation: {kept.filter('keep').count()} docs pass repetition, "
          f"split audit {audit.count()} rows")

    # 10. CDC apply (n11's library form) on a toy base + changelog.
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, val double")
    log = spark.createDataFrame(
        [(2, 1, "U", 25.0), (3, 2, "I", 30.0), (1, 3, "D", 0.0)],
        "k long, seq long, op string, val double",
    )
    merged = {r.key: r.action for r in mael.etl.cdc_apply(base, log).collect()}
    assert merged == {2: "update", 3: "insert"}, merged
    print(f"10. cdc apply: {merged}")

    # 11. Quality library on an arbitrary table.
    psi = mael.quality.fd_violation_profile(docs, "source", "lang")
    print("11. fd profile:", [tuple(r) for r in psi.collect()])

    # 12. Round-7 additions: skyline, exact set-similarity, weighted
    # sampling, quantile binning, robust outliers — all df-first.
    from ma_anonymization_etl_spark.operators.llm import (
        set_similarity_join,
        weighted_sample_topk,
        word_shingles,
    )
    from ma_anonymization_etl_spark.operators.relational import (
        quantile_binning,
        skyline_2d,
    )

    orders = mael.io.load(spark, sf_dir, "orders")
    sky = skyline_2d(
        orders.select("o_orderkey", "o_orderdate", "o_totalprice"),
        "o_orderdate", "o_totalprice",
    )
    toks = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("tok"))
    pairs = set_similarity_join(toks, 0.5)
    sample = weighted_sample_topk(docs, "n_chars", 10, "demo|")
    bins = quantile_binning(orders.select("o_totalprice"), "o_totalprice", 4)
    outl = mael.quality.mad_outlier_report(
        mael.io.load(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal"
    )
    print(f"12. skyline {sky.count()} orders; {pairs.count()} exact near-dup "
          f"pairs; sample {sample.count()}; {bins.count()} quartile bins; "
          f"outlier report {outl.count()} segments")

    spark.stop()
    print("demo OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
