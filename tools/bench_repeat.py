"""Re-measure specific bench queries with pinned repetitions (round-4
verdict item #7: explain the r2→r3 movers ann_cosine_topk / token_stats /
quality_scores).

Each query runs in its OWN taskset-pinned subprocess (fresh JVM, nothing
else on the session), cold first, then N timed repetitions; prints
per-query min/median/max so host-noise variance is on the record.

Usage: python tools/bench_repeat.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from igtdetect_spark.session import build_session
from igtdetect_spark.entry_queries import queries as registry
from igtdetect_spark.operators.dedup import release_plan_caches

name, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = build_session(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
fn = registry()[name]
times = []
for i in range(reps + 1):  # rep 0 = cold (JIT/codegen), reported separately
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.count()
    dt = time.time() - t0
    release_plan_caches(df)
    times.append(round(dt, 3))
print(json.dumps({"query": name, "cold": times[0], "warm": times[1:]}))
spark.stop()
"""

DEFAULT_QUERIES = ["ann_cosine_topk", "token_stats", "quality_scores"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    n_host = os.cpu_count() or 32
    results = {}
    for name in names:
        cmd = ["taskset", "-c", f"{n_host - 8}-{n_host - 1}",
               sys.executable, "-c", RUNNER, name, sf_dir, "3"]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd="/root/repo", timeout=900)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(
                f"runner failed for {name!r} (rc={out.returncode})"
            )
        r = json.loads(lines[-1])
        warm = r["warm"]
        results[name] = {
            "cold": r["cold"],
            "warm": warm,
            "min": min(warm),
            "median": round(statistics.median(warm), 3),
            "max": max(warm),
        }
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
