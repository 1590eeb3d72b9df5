"""Big-SF probe harness (VERDICT r11 item 2): one measured run of named
registry queries at a large scale directory (scratch/sf10, scratch/sf100),
with the SPILL-AWARE SESSION SIZING the round-11 j9d diagnosis proved
necessary — the sweep/probe default of `shuffle partitions = cpus` makes
N/cpus-row sort partitions at the second decade and manufactures FALSE
OOM boundaries (j9d at sf100: a 40 GB heap retry changed nothing;
SPARK_GRAFT_SHUFFLE=256 removed the failure entirely, BASELINE.md round
11).  Defaults here, all overridable via the environment:

  SPARK_GRAFT_SHUFFLE     = 4 x cpus   (wide enough that a 5M-doc explode
                                        sorts in executor-memory-sized runs)
  SPARK_GRAFT_DRIVER_MEM  = 24g        (the measured safe ceiling on this
                                        box; 48g provoked a kernel OOM,
                                        dmesg round 9)

Usage:
  python scripts/probe_scale.py <sf_dir> [name,name,...]

One JSON line per query; a failure prints the boundary honestly
(error type + message) instead of dying.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

# Sizing BEFORE the session import chain reads the environment.
os.environ.setdefault(
    "SPARK_GRAFT_SHUFFLE",
    str(4 * int(os.environ.get("SPARK_GRAFT_CPUS", "8"))),
)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from ma_anonymization_etl_spark import registry  # noqa: E402
from ma_anonymization_etl_spark.session import get_spark  # noqa: E402

# The flagship dedup/ANN set the sf100 probes measure by default.
DEFAULT_NAMES = [
    "j9d_sim_pair_lsh_fast",
    "j53_incremental_dedup",
    "j56b_maximal_dup_spans_chars",
    "j60_fuzzy_dedup_edit",
    "j63_mp_prebuilt_probe",      # cold: build + probe
    "j63b_mp_prebuilt_reprobe",   # warm: probe against the cached index
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scratch/sf100"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_NAMES
    spark = get_spark(app_name="probe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.load_all()
    conf = {
        "sf_dir": sf_dir,
        "shuffle": spark.conf.get("spark.sql.shuffle.partitions"),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
    }
    print(json.dumps({"probe_config": conf}), flush=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            all_q[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            print(
                json.dumps(
                    {"q": name, "sec": round(time.perf_counter() - t0, 1)}
                ),
                flush=True,
            )
        except Exception as e:  # boundary report, not a crash
            print(
                json.dumps(
                    {
                        "q": name,
                        "sec": round(time.perf_counter() - t0, 1),
                        "err": f"{type(e).__name__}: {e}"[:300],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
