"""O(delta) evidence for the typed-store merge (the 100-TB claim).

The partition-scoped merge's promise: applying a delta costs I/O
proportional to the delta's DIRTY CLOSURE (the piles + index buckets it
touches), not the store size.  This probe builds the same-shaped store
at two sizes (5x apart) and applies two IDENTICAL 10k-node deltas to
both:

  * "local"   — all changed nodes inside ONE zoom-3 pile (the realistic
    minutely-diff shape: edits cluster spatially).  Dirty closure = a
    couple of piles -> merge cost should be ~flat across store sizes
    (ratio ~1), the O(delta) claim.
  * "scatter" — changed nodes spread world-wide, dirtying EVERY pile.
    This is the documented upper bound: cost ∝ sum of affected piles =
    the whole store at this pile granularity (64 zoom-3 piles), so the
    ratio approaches the size ratio.  At deployment scale the pile zoom
    is a config knob — finer piles shrink the worst case the same way
    the reference's per-z12-tile patching does.

Sizes default to 1M / 5M nodes (each with n/5 five-node ways) — big
enough that real I/O, not job overhead, dominates (VERDICT r3 item 6;
the r3 run at 30k/152k nodes measured overhead).  Override via
SPARK_GRAFT_MERGE_NODES="1000000,5000000" / SPARK_GRAFT_MERGE_DELTA.

Writes MERGE_SCALE.json:
  {"sizes": [n1, n2], "bulk_sec": {...},
   "merge_sec": {"local": {...}, "scatter": {...}},
   "merge_ratio": {"local": r, "scatter": r}, "bulk_ratio": r, ...}

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


GRID_W = 1 << 16  # nodes per row; row width = the whole world
GRID_STEP = 1 << 16  # x spacing -> a row of 65536 nodes spans 2^32


def grid_xy(idc):
    """Locality-preserving node layout: consecutive ids are adjacent in x
    (rows of GRID_W nodes scattered world-wide in y), so a run of ids is
    spatially LOCAL — the shape real map data has (ways connect nearby
    nodes) and the property the "local" delta needs."""
    x = (idc % GRID_W) * GRID_STEP - (1 << 31)
    y = (((idc / GRID_W).cast("long") * 7919 * GRID_STEP) % (1 << 32)) - (1 << 31)
    return x.cast("long"), y.cast("long")


def store_inputs(spark, n: int):
    """n synthetic grid nodes + n/5 ways of 5 consecutive (= spatially
    adjacent) nodes each."""
    base = spark.range(1, n + 1, numPartitions=32)
    x, y = grid_xy(F.col("id"))
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


def delta_df(spark, shape: str):
    """10k-node delta over nodes 1..N_DELTA (present in every store).
    "local": all move INTO one zoom-3 pile (x,y packed near the origin
    of one cell).  "scatter": each flips to its mirrored-x pile."""
    base = spark.range(1, N_DELTA + 1)
    gx, gy = grid_xy(F.col("id"))
    if shape == "local":
        # nudge within the same pile: nodes 1..10k sit in the first grid
        # row (~1-2 adjacent z3 piles), their parent ways too — the
        # dirty closure stays at a couple of piles + index buckets
        nx, ny = (gx + 1).alias("x"), gy.alias("y")
    else:
        # world-wide re-hash: every z3 pile gets dirty
        sx, sy = synth.point_xy(F.col("id"))
        nx, ny = sx.alias("x"), sy.alias("y")
    return base.select(
        F.lit("upsert").alias("op"), F.lit("n").alias("ftype"), "id",
        F.lit(2).alias("version"), nx, ny,
        F.lit(None).cast("map<string,string>").alias("tags"),
        F.lit(None).cast("array<long>").alias("refs"),
        F.lit(None).cast(
            "array<struct<mtype:string,ref:long,role:string>>"
        ).alias("members"),
        F.lit(1).alias("seq"),
    )


def main():
    spark = get_spark("merge-scale-probe")
    out = {
        "sizes": [], "bulk_sec": {},
        "merge_sec": {"local": {}, "scatter": {}},
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "n_delta": N_DELTA,
    }
    for n in SIZES:
        nodes_in, ways_in = store_inputs(spark, n)
        td = tempfile.mkdtemp(prefix=f"mergescale{n}_")
        try:
            store = os.path.join(td, "store")
            t0 = time.time()
            CF.write_full_store(nodes_in, ways_in, None, store)
            out["bulk_sec"][str(n)] = round(time.time() - t0, 2)
            out["sizes"].append(n)
            for shape in ("local", "scatter"):
                d = os.path.join(td, f"delta_{shape}")
                delta_df(spark, shape).coalesce(1).write.mode("overwrite").json(d)
                t0 = time.time()
                q = CF.apply_changes_full(
                    spark, d, store, os.path.join(td, f"ck_{shape}")
                )
                assert q.awaitTermination(1800)
                out["merge_sec"][shape][str(n)] = round(time.time() - t0, 2)
        finally:
            shutil.rmtree(td, ignore_errors=True)
    # optional: pile_zoom sweep on the scattered-delta worst case.  The
    # same 1k scattered delta dirties ALL 64 z3 piles but only ~20% of
    # the 4096 z6 piles — HOWEVER, at sandbox sizes (5M rows = ~1.2k
    # rows/z6-pile) per-partition commit/listing overhead dominates and
    # z6 measures SLOWER.  The correct reading: pile zoom must track
    # bytes-per-pile (the maxPartitionBytes / Iceberg target-file-size
    # rule) — finer piles pay off once piles hold GBs, i.e. exactly at
    # the 100-TB scale the knob exists for, not at toy scale.
    if os.environ.get("SPARK_GRAFT_MERGE_PZ_SWEEP"):
        n = SIZES[-1]
        out["pile_zoom_sweep"] = {"n": n, "n_delta": 1000, "merge_sec": {}}
        for pz in (3, 6):
            nodes_in, ways_in = store_inputs(spark, n)
            td = tempfile.mkdtemp(prefix=f"mergescale_pz{pz}_")
            try:
                store = os.path.join(td, "store")
                CF.write_full_store(nodes_in, ways_in, None, store, pile_zoom=pz)
                d = os.path.join(td, "delta")
                delta_df(spark, "scatter").limit(1000).coalesce(1).write.mode(
                    "overwrite"
                ).json(d)
                t0 = time.time()
                q = CF.apply_changes_full(spark, d, store, os.path.join(td, "ck"))
                assert q.awaitTermination(1800)
                out["pile_zoom_sweep"]["merge_sec"][f"z{pz}"] = round(
                    time.time() - t0, 2
                )
            finally:
                shutil.rmtree(td, ignore_errors=True)

    out["merge_ratio"] = {}
    for shape in ("local", "scatter"):
        a, b = (out["merge_sec"][shape][str(s)] for s in out["sizes"])
        out["merge_ratio"][shape] = round(b / a, 2)
    ba, bb = (out["bulk_sec"][str(s)] for s in out["sizes"])
    out["bulk_ratio"] = round(bb / ba, 2)
    out["size_ratio"] = round(out["sizes"][1] / out["sizes"][0], 2)
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open("MERGE_SCALE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
