"""O(delta) evidence for the typed-store merge (the 100-TB claim).

The partition-scoped merge's promise: applying a fixed-size delta costs
I/O proportional to the delta's dirty closure, NOT the store size.  This
probe builds the same-shaped store at two sizes (5x apart), applies the
IDENTICAL delta to both, and reports the merge wall times + their ratio —
O(store) behavior would show ~5x, O(delta) shows ~1x (plus the fixed
Spark job overhead).

Sizes default to 1M / 5M nodes (each with n/5 five-node ways) and a
10k-node delta — big enough that real I/O, not job overhead, dominates
(VERDICT r3 item 6; the r3 run at 30k/152k nodes measured overhead).
Override via SPARK_GRAFT_MERGE_NODES="1000000,5000000" and
SPARK_GRAFT_MERGE_DELTA=10000.

Writes MERGE_SCALE.json:
  {"sizes": [n1, n2], "merge_sec": {...}, "bulk_sec": {...},
   "merge_ratio": r, "bulk_ratio": r2, "n_delta": d}

Usage: python tools/merge_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gol_tool_spark.functions import synth  # noqa: E402
from gol_tool_spark.session import get_spark  # noqa: E402
from gol_tool_spark.streaming import changes_full as CF  # noqa: E402

SIZES = tuple(
    int(s)
    for s in os.environ.get("SPARK_GRAFT_MERGE_NODES", "1000000,5000000").split(",")
)
N_DELTA = int(os.environ.get("SPARK_GRAFT_MERGE_DELTA", "10000"))


def store_inputs(spark, n: int):
    """n synthetic nodes (same integer-hash x/y mixing as the points
    table) + n/5 ways of 5 consecutive nodes each."""
    base = spark.range(1, n + 1, numPartitions=32)
    x, y = synth.point_xy(F.col("id"))
    nodes_in = base.select(
        "id", x.alias("x"), y.alias("y"),
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    ways_in = spark.range(0, n // 5).select(
        F.col("id"),
        F.expr("transform(sequence(1, 5), i -> id * 5 + i)").alias("refs"),
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    return nodes_in, ways_in


def main():
    spark = get_spark("merge-scale-probe")
    out = {"sizes": [], "bulk_sec": {}, "merge_sec": {}}
    for n in SIZES:
        nodes_in, ways_in = store_inputs(spark, n)
        td = tempfile.mkdtemp(prefix=f"mergescale{n}_")
        try:
            store = os.path.join(td, "store")
            t0 = time.time()
            CF.write_full_store(nodes_in, ways_in, None, store)
            out["bulk_sec"][str(n)] = round(time.time() - t0, 2)
            out["sizes"].append(n)
            # the IDENTICAL delta for every size: nodes 1..N_DELTA exist
            # in all stores; each moves to a flipped-x pile (dirty-way
            # respread included in the measured cost)
            delta = spark.range(1, N_DELTA + 1).select(
                F.lit("upsert").alias("op"), F.lit("n").alias("ftype"), "id",
                F.lit(2).alias("version"),
            )
            x, y = synth.point_xy(F.col("id"))
            delta = delta.select(
                "op", "ftype", "id", "version",
                (-x - 1).alias("x"), y.alias("y"),
                F.lit(None).cast("map<string,string>").alias("tags"),
                F.lit(None).cast("array<long>").alias("refs"),
                F.lit(None).cast(
                    "array<struct<mtype:string,ref:long,role:string>>"
                ).alias("members"),
                F.lit(1).alias("seq"),
            )
            delta.coalesce(1).write.mode("overwrite").json(os.path.join(td, "delta"))
            t0 = time.time()
            q = CF.apply_changes_full(
                spark, os.path.join(td, "delta"), store, os.path.join(td, "ck")
            )
            assert q.awaitTermination(1200)
            out["merge_sec"][str(n)] = round(time.time() - t0, 2)
            out["n_delta"] = N_DELTA
        finally:
            shutil.rmtree(td, ignore_errors=True)
    a, b = (out["merge_sec"][str(s)] for s in out["sizes"])
    out["merge_ratio"] = round(b / a, 2)
    ba, bb = (out["bulk_sec"][str(s)] for s in out["sizes"])
    out["bulk_ratio"] = round(bb / ba, 2)
    out["size_ratio"] = round(out["sizes"][1] / out["sizes"][0], 2)
    with open("MERGE_SCALE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
