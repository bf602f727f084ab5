"""AQE skew-join demonstration (SURVEY §4: skew mitigation for joins is
AQE's job; our custom salting is only for the window/grouped stages that
Catalyst cannot split).

Builds a fact table where one key owns ~80% of rows, joins it to a dim
with broadcast disabled, and shows the adaptive plan splitting the skewed
partition (``skew=true`` in the AQEShuffleRead).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    from pyspark.sql import functions as F

    from igtdetect_spark.session import build_session

    spark = build_session(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 400_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
    )
    joined = fact.join(dim, "k")
    # execute THIS DataFrame's QueryExecution (count() would build a new
    # aggregate plan and leave this one unfinalized)
    joined._jdf.queryExecution().executedPlan().execute().count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    skewed = "skew=true" in plan
    print("=== adaptive plan (grep) ===")
    print("\n".join(l for l in plan.splitlines() if "AQEShuffleRead" in l or "skew" in l.lower()))
    print("SKEW_JOIN_DEMO", "PASS" if skewed else "FAIL")
    spark.stop()
    sys.exit(0 if skewed else 1)


if __name__ == "__main__":
    main()
