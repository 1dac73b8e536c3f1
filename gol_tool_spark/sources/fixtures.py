"""Deterministic synthetic fixtures generated IN-JOB (no external data).

These realize FIXTURES.md: the `images` table of exactly the BASELINE.json
input_hint shape (image_id, bytes, w, h, fmt, caption, phash), plus spatial
fixtures (points with skewed hot cells, ways incl. dangling refs, relations
incl. super-relations and cycles, polygons).  Generation is distributed —
`spark.range` partitions feed an Arrow-batched mapInPandas, so a 10^12-row
table generates at cluster width with no driver bottleneck; everything is
keyed off the row id, so any subset regenerates identically (the property
the resumable build pipeline relies on).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import image as IMG

NOUNS = ("tram", "bridge", "pub", "forest", "harbor", "tower", "market", "museum")
FMTS = ("raw", "png", "jpg")
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def _caption(i: int, lat: float, lon: float) -> str:
    return f"a photo of {NOUNS[i % len(NOUNS)]} at {lat:.5f},{lon:.5f}"


def _image_latlon(i: int) -> tuple[float, float]:
    # deterministic pseudo-location tied to the point synthesis constants
    lon = ((i * 2654435761) % (1 << 32)) / (1 << 32) * 360.0 - 180.0
    lat = ((i * 2246822519 + 1013904223) % (1 << 32)) / (1 << 32) * 170.0 - 85.0
    return lat, lon


def images(spark: SparkSession, n: int, sizes=(16, 32, 64), partitions: int | None = None) -> DataFrame:
    """The authoritative input table (BASELINE.json input_hint shape)."""
    sizes = tuple(int(s) for s in sizes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                w = sizes[i % len(sizes)]
                h = sizes[(i // len(sizes)) % len(sizes)]
                fmt = FMTS[i % len(FMTS)]
                px = IMG.generate_pixels(i, w, h)
                enc = IMG.encode(px, fmt)
                # phash from DECODED pixels (FIXTURES.md §1) so lossy fmts
                # carry the hash of what a consumer will actually see
                dec = IMG.decode(enc, w, h, fmt)
                lat, lon = _image_latlon(i)
                rows.append(
                    (f"img{i:012d}", enc, w, h, fmt, _caption(i, lat, lon), IMG.phash64(dec))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, IMAGES_SCHEMA)


def image_points(spark: SparkSession, n: int) -> DataFrame:
    """Locations co-generated with images (image_id FK), int-Mercator grid.
    Pure column math — reuses the skewed synthesis of functions/synth.py."""
    from ..functions.synth import point_xy

    base = spark.range(n).select(F.col("id").cast("bigint").alias("seq"))
    x, y = point_xy(F.col("seq") + 1)
    return base.select(
        (F.col("seq") + 1).alias("id"),
        F.format_string("img%012d", F.col("seq")).alias("image_id"),
        x.alias("x"),
        y.alias("y"),
    )


def relations_with_cycles(spark: SparkSession) -> DataFrame:
    """Small relation fixture exercising C4-C6/C9 edge cases: plain
    relations, 2-level super-relations, a 3-cycle, an empty relation
    referenced by a parent, a self-reference (must be dropped), missing
    members (Purgatory)."""
    rows = [
        # (rel_id, [(mtype, ref, role)])
        (1, [("node", 9, ""), ("node", 17, "stop")]),          # plain
        (2, [("way", 7, "outer"), ("way", 15, "inner")]),       # multipolygon-ish
        (3, [("relation", 1, ""), ("relation", 2, "")]),        # super
        (4, [("relation", 3, ""), ("node", 25, "via")]),        # super-super
        (5, [("relation", 6, "")]),                             # cycle 5->6
        (6, [("relation", 5, "")]),                             # cycle 6->5
        (7, [("relation", 7, "")]),                             # self-ref
        (8, []),                                                # empty
        (9, [("relation", 8, ""), ("node", 999999999, "")]),    # empty child + missing
    ]
    data = [
        (rid, [{"mtype": m, "ref": r, "role": ro} for (m, r, ro) in members])
        for rid, members in rows
    ]
    return spark.createDataFrame(
        data, "rel_id long, members array<struct<mtype:string, ref:long, role:string>>"
    )


POLYGONS = {
    "square": [(0, 0), (1 << 28, 0), (1 << 28, 1 << 28), (0, 1 << 28)],
    "concave-u": [
        (0, 0), (3 << 27, 0), (3 << 27, 3 << 27), (1 << 28, 3 << 27),
        (1 << 28, 1 << 27), (1 << 27, 1 << 27), (1 << 27, 3 << 27), (0, 3 << 27),
    ],
    "sliver": [(-(1 << 30), 0), (1 << 30, 1000), (1 << 30, 2000), (-(1 << 30), 1000)],
}
POLYGON_HOLES = {
    "ring-with-hole": (
        [(0, 0), (1 << 28, 0), (1 << 28, 1 << 28), (0, 1 << 28)],
        [[(1 << 26, 1 << 26), (3 << 26, 1 << 26), (3 << 26, 3 << 26), (1 << 26, 3 << 26)]],
    ),
}


def edit_images(images: DataFrame, every: int = 7) -> DataFrame:
    """Deterministic second EPOCH of an image table for change-detection
    lanes: every `every`-th image (by its numeric id suffix) gets its
    top-left quadrant inverted (255 - v); the rest pass through
    untouched.  The edit re-encodes as PNG (lossless), so a diff against
    the original decode is EXACTLY the planted quadrant — u8 inversion
    never fixes a pixel in place (255 - v == v has no integer solution),
    which the tests exploit for exact changed-pixel counts."""
    import numpy as np
    import pandas as pd

    from ..kernels import image as IMG

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                seq = int(str(r.image_id).lstrip("img") or 0)
                if seq % every == 0:
                    px = IMG.decode(bytes(r.bytes), r.w, r.h, r.fmt).copy()
                    px[: r.h // 2, : r.w // 2] = 255 - px[: r.h // 2, : r.w // 2]
                    out.append((r.image_id, IMG.encode(px, "png"), r.w, r.h,
                                "png", r.caption, IMG.phash64(px)))
                else:
                    out.append(tuple(r))
            yield pd.DataFrame(out, columns=list(pdf.columns))

    return images.mapInPandas(run, images.schema)
