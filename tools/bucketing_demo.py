"""Bucketed co-located join demonstration (SURVEY §4 partitioning story).

Writes orders and lineitem bucketed by their join key, then shows the
join plan has NO Exchange on either side (SortMergeJoin over pre-bucketed
scans). At 100 TB this is the difference between shuffling the fact table
on every join and never shuffling it: bucket layout is paid once at write
time and amortized over every downstream join/aggregation on the key.

Appends findings to stdout; evidence is the physical plan itself.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    from pyspark.sql import functions as F

    from igtdetect_spark.session import build_session

    wh = tempfile.mkdtemp(prefix="bucketing_wh_")
    spark = build_session(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            # disable auto-broadcast so the bucketing (not broadcast)
            # eliminates the exchange in this demo
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )

    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    print("=== bucketed join plan (truncated) ===")
    print("\n".join(plan.splitlines()[:12]))
    print(f"exchanges in bucketed join: {n_exchanges}")

    # contrast: the same join on unbucketed parquet
    joined_plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    plan2 = joined_plain._jdf.queryExecution().executedPlan().toString()
    print(f"exchanges in unbucketed join: {plan2.count('Exchange')}")

    ok = n_exchanges == 0 and plan2.count("Exchange") >= 2
    print("BUCKETING_DEMO", "PASS" if ok else "FAIL")
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
