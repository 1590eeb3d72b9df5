"""Scale-stress sweep: time registry queries at two scale factors and
report the empirical scaling slope of each.

This is the empirical check behind SCALE.md — the corpus decade is
sf0.1 (driver-shipped) -> sf1 (scripts/gen_scale_corpus.py, 10x rows
in every fact table).  For each query we report

    ratio    = t_big / t_small
    exponent = log(ratio) / log(mult)      # 1.0 = perfectly linear

Absolute times at these sizes still carry constant session/job
overhead (~0.1-0.3 s per job), so exponents UNDER 1 are expected for
cheap queries; the red flags are exponents meaningfully ABOVE 1 on
queries whose plan should be linear.

Modes:
  --rank DIR            one timed pass over every registry query at DIR
                        (after one untimed warm), print slowest-first
  --names a,b,c         sweep the named queries across --small/--big
  --runs N              timed samples per (query, dir); median reported
                        (a query whose first sample exceeds --budget
                        seconds is reported on that single sample)

Output: one JSON line; optionally a markdown table with --md.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")

from ma_anonymization_etl_spark import registry  # noqa: E402
from ma_anonymization_etl_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    try:
        df.write.mode("overwrite").format("noop").save()
    except Exception:
        df.collect()


def time_query(spark, fn, sf_dir: str, runs: int, budget: float) -> float:
    samples = []
    for i in range(runs):
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
        if samples[0] > budget:
            break
    return sorted(samples)[len(samples) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", help="time every registry query once at DIR")
    ap.add_argument("--names", help="comma-separated query names to sweep")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--budget", type=float, default=60.0,
                    help="skip extra samples once a first run exceeds this")
    ap.add_argument("--md", action="store_true", help="also print a markdown table")
    args = ap.parse_args()

    # Round-11 sf100 lesson: the session default (shuffle = cpus) makes
    # N/cpus-row sort partitions at big scale factors — j9d's sf100 OOM
    # was exactly this, cured by widening the shuffle.  Sweeps default
    # to 4x cpus; callers can still override via SPARK_GRAFT_SHUFFLE.
    import os

    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE",
        str(4 * int(os.environ.get("SPARK_GRAFT_CPUS", "8"))),
    )
    spark = get_spark(app_name="mael-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.load_all()

    if args.rank:
        out = {}
        for name, q in all_q.items():
            try:
                materialize(q.fn(spark, args.rank))  # warm
                t0 = time.perf_counter()
                materialize(q.fn(spark, args.rank))
                out[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # pragma: no cover - diagnostics only
                out[name] = f"ERR {type(e).__name__}: {e}"
                print(f"ERR {name}: {e}", file=sys.stderr)
        ranked = sorted(
            ((n, t) for n, t in out.items() if isinstance(t, float)),
            key=lambda x: -x[1],
        )
        print(json.dumps({"sf_dir": args.rank, "ranked": ranked}))
        return

    names = [n for n in (args.names or "").split(",") if n]
    results = {}
    for name in names:
        q = all_q[name]
        materialize(q.fn(spark, args.small))  # warm (codegen etc.)
        t_small = time_query(spark, q.fn, args.small, args.runs, args.budget)
        materialize(q.fn(spark, args.big))
        t_big = time_query(spark, q.fn, args.big, args.runs, args.budget)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[name] = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(args.mult), 3),
        }
        print(f"  {name}: {t_small:.2f}s -> {t_big:.2f}s "
              f"(x{ratio:.1f}, exp {results[name]['exponent']})", file=sys.stderr)
    print(json.dumps({"small": args.small, "big": args.big,
                      "mult": args.mult, "results": results}))
    if args.md:
        print("\n| query | t@sf0.1 | t@sf1 | ratio | exponent |")
        print("|---|---|---|---|---|")
        for n, r in sorted(results.items(), key=lambda x: -x[1]["exponent"]):
            print(f"| {n} | {r['t_small']} | {r['t_big']} | {r['ratio']} | {r['exponent']} |")


if __name__ == "__main__":
    main()
