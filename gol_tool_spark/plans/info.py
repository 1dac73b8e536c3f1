"""`gol info` analogue: store-level report from parquet FOOTER metadata.

Reference parity: InfoCommand.java:23-90 prints the tile-set GUID, tile
counts/loaded state and (with -i/-t/-f) index, tile and free-block detail
from the store's header structures.  The parquet mapping has no free-block
list (immutable files replace the mmap'd free-space allocator), so the
report covers the analogous surfaces: pile inventory, per-pile rows/bytes/
bucket counts, key-index (keybits) bucket histogram, and row-group counts —
all read driver-side from footers, zero data scan (the same trick as the
build manifests; on Iceberg this is the `files` metadata table)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def store_info(
    store_dir: str,
    tileset_dir: str | None = None,
    files: list[str] | None = None,
) -> dict:
    """Footer-only store report: {guid?, piles, rows, bytes, n_files,
    n_row_groups, keybits: {mask: rows}, per_pile: {pile: {rows, bytes,
    buckets}}}.

    `files`: explicit file list to report over instead of walking the
    directory — versioned stores pass the CURRENT snapshot's manifest
    file list so grace-period superseded epoch files are not counted."""
    piles: dict[str, dict] = {}
    keybits: dict[int, int] = {}
    total_rows = total_bytes = n_files = n_rg = 0
    if files is not None:
        groups: dict[str, list[str]] = {}
        for full in files:
            groups.setdefault(os.path.dirname(full), []).append(
                os.path.basename(full)
            )
        walk_iter = [(d, None, sorted(fl)) for d, fl in sorted(groups.items())]
    else:
        walk_iter = sorted(os.walk(store_dir))
    for dp, _, fs in walk_iter:
        rel = os.path.relpath(dp, store_dir)
        parts = dict(seg.split("=", 1) for seg in rel.split(os.sep) if "=" in seg)
        pile = parts.get("pile")
        bucket = parts.get("keybits")
        for f in sorted(fs):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dp, f)).metadata
            nbytes = os.path.getsize(os.path.join(dp, f))
            n_files += 1
            n_rg += md.num_row_groups
            total_rows += md.num_rows
            total_bytes += nbytes
            if pile is not None:
                e = piles.setdefault(pile, {"rows": 0, "bytes": 0, "buckets": set()})
                e["rows"] += md.num_rows
                e["bytes"] += nbytes
                if bucket is not None:
                    e["buckets"].add(int(bucket))
            if bucket is not None:
                kb = int(bucket)
                keybits[kb] = keybits.get(kb, 0) + md.num_rows
    out = {
        "piles": len(piles),
        "rows": int(total_rows),
        "bytes": int(total_bytes),
        "n_files": n_files,
        "n_row_groups": n_rg,
        "keybits": {str(k): int(v) for k, v in sorted(keybits.items())},
        "per_pile": {
            p: {"rows": int(e["rows"]), "bytes": int(e["bytes"]), "buckets": len(e["buckets"])}
            for p, e in sorted(piles.items())
        },
    }
    if tileset_dir:
        ts = os.path.join(tileset_dir, "tileset.json")
        if os.path.exists(ts):
            with open(ts) as fh:
                out["guid"] = json.load(fh).get("guid")
    return out


def full_store_info(store_path: str) -> dict:
    """`gol info` for the typed store (changes_full layout): one footer-only
    report per sub-store (nodes/ways/relations) plus every index —
    InfoCommand.java's tile inventory, generalized to the typed layout.

    On versioned stores the report resolves the CURRENT snapshot: only
    manifest-listed files are counted (grace-period superseded epochs are
    excluded), the snapshot version is included, and the per-partition
    {rows, bytes} metrics PERSISTED in the manifest at commit time ride
    along under `manifest_metrics` (the Iceberg snapshot-summary shape)."""
    from ..streaming import txstore
    from ..streaming.changes_full import _paths

    out: dict = {}
    p = _paths(store_path)
    if txstore.is_versioned(store_path):
        man = txstore.load_manifest(store_path)
        out["snapshot_version"] = man["version"]

        def _live(key: str) -> list[str]:
            t = man["tables"][key]
            return [
                os.path.join(p[key], f)
                for fl in t["parts"].values()
                for f in fl
            ]

        for kind in ("nodes", "ways", "relations"):
            if kind in man["tables"]:
                out[kind] = store_info(p[kind], files=_live(kind))
                m = man["tables"][kind].get("metrics")
                if m is not None:
                    out[kind]["manifest_metrics"] = m
        out["indexes"] = {
            key[4:]: store_info(p[key], files=_live(key))
            for key in sorted(man["tables"])
            if key.startswith("idx_")
        }
        return out
    for kind in ("nodes", "ways", "relations"):
        d = os.path.join(store_path, kind)
        if os.path.isdir(d):
            out[kind] = store_info(d)
    idx_root = store_path.rstrip("/") + "_idx"
    if os.path.isdir(idx_root):
        out["indexes"] = {
            k: store_info(os.path.join(idx_root, k))
            for k in sorted(os.listdir(idx_root))
            if os.path.isdir(os.path.join(idx_root, k))
        }
    return out
