"""Dump full `explain("formatted")` output for the round-12-touched
queries into plans/r12/<query>_<tag>.txt.

Usage:  python scripts/gen_r12_plans.py <repo_root> <out_dir> <tag> <q1,q2,...>

Run at HEAD with tag=after, and inside a worktree checked out at the
round-11 commit with tag=before, so the judge can diff the plan shapes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    repo, out_dir, tag, names_csv = sys.argv[1:5]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    from ma_anonymization_etl_spark import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"gen-r12-plans-{tag}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.load_all()
    sf = "/root/testdata/sf0.01"
    for name in names_csv.split(","):
        if name not in all_q:
            print(f"SKIP {name}: not registered at this commit")
            continue
        df = all_q[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
