"""Tile-set export / import — `gol save` / `gol load` parity.

Reference: SaveCommand.java:50-98 exports tiles as files in a TIP-folder
hierarchy with a `tileset.txt` manifest + GUID match check; LoadCommand.java:
32-71 fetches absent tiles back into a GOL.  Spark form: the compiled store
is already one file-set per pile; save copies per-pile parquet files into a
tileset directory with a JSON manifest carrying a deterministic content
checksum per pile (md5 of sorted footer (rows, bytes) + file names); load
restores absent piles into a store and verifies checksums — the GUID-match
equivalent.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _pile_dirs(store_dir: str) -> list[str]:
    return sorted(
        d for d in os.listdir(store_dir)
        if d.startswith("pile=") and os.path.isdir(os.path.join(store_dir, d))
    )


def _pile_checksum(path: str) -> str:
    import pyarrow.parquet as pq

    parts = []
    for dp, _, fs in sorted(os.walk(path)):  # recurse: piles may hold
        for f in sorted(fs):                 # keybits=* bucket subdirs
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(dp, f)
            try:
                nrows = pq.ParquetFile(full).metadata.num_rows
            except Exception:  # unreadable footer == corrupt tile
                nrows = "CORRUPT"
            rel = os.path.relpath(full, path)
            parts.append(f"{rel}:{nrows}:{os.path.getsize(full)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def save_tileset(store_dir: str, tileset_dir: str) -> dict:
    """Export every pile + write tileset.json (the tileset.txt analogue)."""
    os.makedirs(tileset_dir, exist_ok=True)
    manifest = {"piles": {}}
    for d in _pile_dirs(store_dir):
        src = os.path.join(store_dir, d)
        dst = os.path.join(tileset_dir, d)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        manifest["piles"][d] = _pile_checksum(dst)
    manifest["guid"] = hashlib.md5(
        json.dumps(manifest["piles"], sort_keys=True).encode()
    ).hexdigest()
    with open(os.path.join(tileset_dir, "tileset.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def load_tileset(tileset_dir: str, store_dir: str, verify: bool = True) -> dict:
    """Fetch piles absent from the store; verify checksums (GUID check).
    Returns {loaded: [...], skipped: [...], verified: bool}."""
    with open(os.path.join(tileset_dir, "tileset.json")) as fh:
        manifest = json.load(fh)
    os.makedirs(store_dir, exist_ok=True)
    loaded, skipped = [], []
    for d, checksum in manifest["piles"].items():
        src = os.path.join(tileset_dir, d)
        dst = os.path.join(store_dir, d)
        if verify and _pile_checksum(src) != checksum:
            raise ValueError(f"tileset corrupt: checksum mismatch for {d}")
        if os.path.exists(dst):
            skipped.append(d)
            continue
        shutil.copytree(src, dst)
        loaded.append(d)
    return {"loaded": loaded, "skipped": skipped, "verified": verify}
