"""density_raster: the PNG in each row must decode to exactly the binned
counts (lossless roundtrip), stats must come from decoded pixels, counts
clamp at 255, and bin indices must match the shift/mask math."""

from __future__ import annotations

import numpy as np

from gol_tool_spark.kernels import image as IMG
from gol_tool_spark.operators import multimodal

HALF = 1 << 31


def _bin_expected(pts, zoom, grid):
    gbits = grid.bit_length() - 1
    shift = 32 - zoom - gbits
    exp = {}
    for x, y in pts:
        tcol = (x + HALF) >> (32 - zoom)
        trow = (HALF - 1 - y) >> (32 - zoom)
        tile = zoom * (1 << 24) + trow * 4096 + tcol
        bx = ((x + HALF) >> shift) % grid
        by = ((HALF - 1 - y) >> shift) % grid
        g = exp.setdefault(tile, np.zeros((grid, grid), np.int64))
        g[by, bx] += 1
    return {t: np.minimum(g, 255).astype(np.uint8) for t, g in exp.items()}


def test_png_decodes_to_exact_bins(spark):
    rng = np.random.default_rng(42)
    pts = [
        (int(x), int(y))
        for x, y in zip(
            rng.integers(-(1 << 31), 1 << 31, 500),
            rng.integers(-(1 << 31), 1 << 31, 500),
        )
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = multimodal.density_raster(df, zoom=2, grid=8).collect()
    exp = _bin_expected(pts, 2, 8)
    assert {r["tile"] for r in rows} == set(exp)
    for r in rows:
        dec = IMG.decode(bytes(r["png"]), 8, 8, "png")
        assert (dec[:, :, 0] == exp[r["tile"]]).all()
        # all three channels carry the same grayscale plane
        assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 0] == dec[:, :, 2]).all()
        assert r["filled"] == int((exp[r["tile"]] > 0).sum())
        assert r["px_sum"] == int(exp[r["tile"]].astype(np.int64).sum())


def test_clamps_at_255(spark):
    # 300 coincident points -> one bin, clamped to 255 in the u8 raster
    df = spark.createDataFrame([(5, 5)] * 300 + [(1 << 30, 1 << 30)], "x long, y long")
    rows = {r["tile"]: r for r in multimodal.density_raster(df, zoom=1, grid=4).collect()}
    exp = _bin_expected([(5, 5)] * 300 + [(1 << 30, 1 << 30)], 1, 4)
    for t, r in rows.items():
        dec = IMG.decode(bytes(r["png"]), 4, 4, "png")
        assert (dec[:, :, 0] == exp[t]).all()
        assert dec[:, :, 0].max() == 255 or t != min(exp)
    assert any(r["px_sum"] >= 255 for r in rows.values())


def test_grid_validation(spark):
    df = spark.createDataFrame([(0, 0)], "x long, y long")
    import pytest

    with pytest.raises(ValueError):
        multimodal.density_raster(df, zoom=4, grid=12)
    with pytest.raises(ValueError):
        multimodal.density_raster(df, zoom=30, grid=16)
