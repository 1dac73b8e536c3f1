"""O(delta) evidence for the typed-store merge (the 100-TB claim).

The partition-scoped merge's promise: applying a fixed-size delta costs
I/O proportional to the delta's dirty closure, NOT the store size.  This
probe builds the same-shaped store at two sizes (4x apart), applies the
IDENTICAL delta to both, and reports the merge wall times + their ratio —
O(store) behavior would show ~4x, O(delta) shows ~1x (plus the fixed
Spark job overhead that dominates at these sizes).

Writes MERGE_SCALE.json:
  {"sizes": [n1, n2], "merge_sec": {...}, "bulk_sec": {...},
   "merge_ratio": r, "bulk_ratio": r2}

Usage: python tools/merge_scale_probe.py [sf_dir]
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
from gol_tool_spark.operators import tiling  # noqa: E402
from gol_tool_spark.session import get_spark  # noqa: E402
from gol_tool_spark.streaming import changes_full as CF  # noqa: E402

# id % SIZE == 0 keeps ~1/SIZE of the points (ids are orderkey*8+linenumber,
# so strides must be odd to hit anything); 15 vs 3 = 5x apart
SIZES = (15, 3)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("merge-scale-probe")
    pts = tiling.assign_points(synth.points_df(spark, sf)).localCheckpoint(eager=True)
    mem = synth.membership_df(spark, sf)
    out = {"sizes": [], "bulk_sec": {}, "merge_sec": {}}
    for stride in SIZES:
        sub = pts.filter(F.col("id") % stride == 0)
        n = sub.count()
        out["sizes"].append(n)
        nodes_in = sub.select(
            "id", "x", "y", F.lit(None).cast("map<string,string>").alias("tags")
        )
        mem_sub = mem.filter(F.col("way_id") % stride == 0)
        ways_in = (
            mem_sub.groupBy("way_id")
            .agg(F.array_sort(F.collect_list(F.struct("seq", "node_ref"))).alias("s"))
            .select(
                F.col("way_id").alias("id"),
                F.transform("s", lambda e: e["node_ref"]).alias("refs"),
                F.lit(None).cast("map<string,string>").alias("tags"),
            )
        )
        td = tempfile.mkdtemp(prefix=f"mergescale{stride}_")
        try:
            store = os.path.join(td, "store")
            t0 = time.time()
            CF.write_full_store(nodes_in, ways_in, None, store)
            out["bulk_sec"][str(n)] = round(time.time() - t0, 2)
            # the IDENTICAL delta for both sizes: ids divisible by an ODD
            # common multiple of the strides exist in every store (an even
            # modulus never matches ids of the form orderkey*8+linenumber)
            delta_ids = 405  # 27 * 15 — divisible by both strides, odd
            delta = nodes_in.filter(F.col("id") % delta_ids == 0).select(
                F.lit("upsert").alias("op"), F.lit("n").alias("ftype"), "id",
                F.lit(2).alias("version"), (-F.col("x") - 1).alias("x"), "y",
                F.col("tags"),
                F.lit(None).cast("array<long>").alias("refs"),
                F.lit(None).cast(
                    "array<struct<mtype:string,ref:long,role:string>>"
                ).alias("members"),
                F.lit(1).alias("seq"),
            )
            n_delta = delta.count()
            delta.coalesce(1).write.mode("overwrite").json(os.path.join(td, "delta"))
            t0 = time.time()
            q = CF.apply_changes_full(
                spark, os.path.join(td, "delta"), store, os.path.join(td, "ck")
            )
            assert q.awaitTermination(600)
            out["merge_sec"][str(n)] = round(time.time() - t0, 2)
            out["n_delta"] = n_delta
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
