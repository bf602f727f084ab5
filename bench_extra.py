"""Round-6 optimization measurement harness (NOT the driver bench).

Times individual registry queries with the exact force() methodology of
bench.py (count + bit_xor(xxhash64(*)) checksum), optionally multiple
repeats, and can dump .explain("formatted") per query to plans/r06/.

Usage:
  python bench_extra.py [--sf-dir DIR] [--repeats N] [--explain SUFFIX] q1 q2 ...
  python bench_extra.py --all            # every bench.py query
Prints one JSON line: {"queries": {name: [t1, t2, ...]}, "sf_dir": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def force(d):
    def h(f):
        if "map<" in f.dataType.simpleString():
            return f"to_json(`{f.name}`)"
        return f"`{f.name}`"

    cols = ", ".join(h(f) for f in d.schema.fields)
    return d.selectExpr(
        "count(1) AS n", f"bit_xor(xxhash64({cols})) AS chk"
    ).collect()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="dump plans/r06/<query>_<SUFFIX>.txt")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from igtdetect_spark.entry_queries import queries as registry
    from igtdetect_spark.operators.dedup import release_plan_caches
    from igtdetect_spark.session import build_session

    spark = build_session(
        app_name="igtdetect_spark_bench_extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry()
    names = args.names
    if args.all:
        names = [n for n in qs]
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for i in range(args.repeats):
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            force(df)
            samples.append(round(time.time() - t0, 3))
            if args.explain and i == 0:
                os.makedirs("plans/r06", exist_ok=True)
                with open(f"plans/r06/{name}_{args.explain}.txt", "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            release_plan_caches(df)
        out[name] = samples
        print(f"# {name}: {samples}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": args.sf_dir,
                      "cpus": args.cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
