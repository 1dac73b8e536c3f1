"""Density-adaptive tile catalog — the engine's partitioning function.

Capability parity: the reference builds a quad pyramid from zoom-12 node
densities: roll counts up through configured zoom levels (12->9->6->3->0,
build/TileIndexBuilder.java:193-241), keep at most `max_tiles` tiles whose
rolled-up count >= `min_density` (top-K with floor, TileIndexBuilder.java:
286-310, 181-191; defaults max-tiles<=64000 / min density 75000 / zooms
0,3,6,9,12 per default-config.fab:8-11), always keep the root, then map every
leaf cell to its finest kept ancestor.  Pile = dense ordinal of kept tiles;
pile 1 is Purgatory for unresolved features (TileCatalog.java:69-71).

This module is the driver-side (numpy) builder used on the COLLECTED density
table — the density aggregation itself runs in Spark (operators/catalog.py);
at planet scale the rollup output is <=4^12 rows at z12, a few MB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import tile as T

DEFAULT_ZOOMS = (0, 3, 6, 9, 12)
PURGATORY_PILE = 1


@dataclass
class TileCatalog:
    """Kept-tile catalog: tile id -> pile (dense ordinal, 2..n+1)."""

    zooms: tuple[int, ...]
    tiles: np.ndarray          # packed tile ids (int64), sorted
    piles: np.ndarray          # pile ordinal per tile
    counts: np.ndarray         # rolled-up density per kept tile
    _by_zoom: dict[int, dict[int, int]] = field(default_factory=dict, repr=False)

    def __post_init__(self):
        for t, p in zip(self.tiles.tolist(), self.piles.tolist()):
            self._by_zoom.setdefault(t >> 24, {})[t] = p

    def __len__(self) -> int:
        return len(self.tiles)

    def pile_of_point(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized leaf-cell -> pile lookup: finest kept ancestor wins
        (TileCatalog.java:225-228 resolve through pyramid)."""
        x = np.asarray(x, np.int64)
        y = np.asarray(y, np.int64)
        out = np.zeros(x.shape, np.int64)
        for z in sorted(self.zooms):          # coarse first; finer overwrites
            zmap = self._by_zoom.get(z)
            if not zmap:
                continue
            tz = T.tile_of_point(x, y, z)
            keys = np.fromiter(zmap.keys(), np.int64, len(zmap))
            vals = np.fromiter(zmap.values(), np.int64, len(zmap))
            order = np.argsort(keys)
            keys, vals = keys[order], vals[order]
            idx = np.searchsorted(keys, tz)
            idx_c = np.clip(idx, 0, len(keys) - 1)
            hit = keys[idx_c] == tz
            out = np.where(hit, vals[idx_c], out)
        return out

    def tile_of_pile(self, pile: int) -> int:
        i = int(np.nonzero(self.piles == pile)[0][0])
        return int(self.tiles[i])


def build_catalog(
    z12_tiles: np.ndarray,
    z12_counts: np.ndarray,
    zooms: tuple[int, ...] = DEFAULT_ZOOMS,
    max_tiles: int = 64000,
    min_density: int = 75000,
) -> TileCatalog:
    """Build the catalog from a z12 density table (tile id -> node count)."""
    z12_tiles = np.asarray(z12_tiles, np.int64)
    z12_counts = np.asarray(z12_counts, np.int64)
    top_zoom = max(zooms)
    if np.any((z12_tiles >> 24) != top_zoom):
        raise ValueError(f"density table must be at zoom {top_zoom}")

    # hierarchical rollup: per configured level, sum child counts (D3)
    level_tiles: dict[int, np.ndarray] = {top_zoom: z12_tiles}
    level_counts: dict[int, np.ndarray] = {top_zoom: z12_counts}
    for z in sorted(zooms, reverse=True)[1:]:
        parents = T.zoomed_out(z12_tiles, z)
        uniq, inv = np.unique(parents, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, z12_counts)
        level_tiles[z], level_counts[z] = uniq, sums

    # candidate selection: density floor at every non-root level; root always
    # kept; cap at max_tiles preferring coarser zoom then higher count (F6)
    cand_t, cand_c = [], []
    for z in sorted(zooms):
        t, c = level_tiles[z], level_counts[z]
        if z == min(zooms):
            keep = np.ones(len(t), bool)
        else:
            keep = c >= min_density
        cand_t.append(t[keep])
        cand_c.append(c[keep])
    tiles = np.concatenate(cand_t)
    counts = np.concatenate(cand_c)
    zoom_of = tiles >> 24
    # min-zoom first, then density alone across zooms, then id
    # (TileIndexBuilder.compareTilesByDensity:181-191)
    order = np.lexsort((tiles, -counts, zoom_of != min(zooms)))
    tiles, counts = tiles[order][:max_tiles], counts[order][:max_tiles]

    # stable pile numbering: by tile id; pile 1 reserved for Purgatory
    order = np.argsort(tiles)
    tiles, counts = tiles[order], counts[order]
    piles = np.arange(2, len(tiles) + 2, dtype=np.int64)
    return TileCatalog(tuple(zooms), tiles, piles, counts)
