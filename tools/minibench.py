"""Focused A/B bench: same methodology as bench.py (noop sink, one
untimed warmup, median of N trials per head) over a SUBSET of heads.

Usage: python tools/minibench.py head1 head2 ... [--trials N] [--sf DIR]

Exists so an optimization round can re-measure ONLY the touched heads
between full bench runs; the full bench.py remains the artifact of
record (its numbers are the driver-comparable ones).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_release_1_10_0_spark.queries import all_queries
from flink_release_1_10_0_spark.session import get_spark


def main():
    args = sys.argv[1:]
    trials = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args
    spark = get_spark("minibench")
    qs = all_queries()

    def run(name):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        run(name)  # warmup
    for name in names:
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run(name)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: median={statistics.median(ts):.3f} "
              f"min={min(ts):.3f} max={max(ts):.3f}")


if __name__ == "__main__":
    main()
