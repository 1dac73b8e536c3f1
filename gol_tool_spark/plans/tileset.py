"""Tile-set export / import — `gol save` / `gol load` parity.

Reference: SaveCommand.java:50-98 exports tiles as files in a TIP-folder
hierarchy with a `tileset.txt` manifest + GUID match check; LoadCommand.java:
32-71 fetches absent tiles back into a GOL.  Spark form: the compiled store
is already one file-set per pile; save copies per-pile parquet files into a
tileset directory with a JSON manifest carrying a deterministic content
checksum per pile (md5 of sorted footer (rows, bytes) + file names); load
restores absent piles into a store and verifies checksums — the GUID-match
equivalent.

Repositories may be local paths OR http(s) URLs (LoadCommand.java:32-71
fetches tiles from a URL repo): the manifest carries each pile's relative
file list, so an HTTP loader needs no directory listing — it GETs
tileset.json, then only the files of piles absent from the local store
(incremental, like the reference's absent-tile fetch).
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


def _pile_files(path: str) -> list[str]:
    out = []
    for dp, _, fs in sorted(os.walk(path)):
        for f in sorted(fs):
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dp, f), path))
    return out


def save_tileset(store_dir: str, tileset_dir: str) -> dict:
    """Export every pile + write tileset.json (the tileset.txt analogue).
    Each pile entry carries {checksum, files} so HTTP repos are loadable
    without directory listings."""
    os.makedirs(tileset_dir, exist_ok=True)
    manifest = {"piles": {}}
    for d in _pile_dirs(store_dir):
        src = os.path.join(store_dir, d)
        dst = os.path.join(tileset_dir, d)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        manifest["piles"][d] = {
            "checksum": _pile_checksum(dst),
            "files": _pile_files(dst),
        }
    manifest["guid"] = hashlib.md5(
        json.dumps(manifest["piles"], sort_keys=True).encode()
    ).hexdigest()
    with open(os.path.join(tileset_dir, "tileset.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def _is_url(repo: str) -> bool:
    return repo.startswith(("http://", "https://"))


def _safe_join(base: str, *parts: str) -> str:
    """Join manifest-controlled path segments under `base`, rejecting
    absolute segments, '..' traversal, and anything whose real path escapes
    base — a hostile or compromised repo must not be able to write outside
    the store (the checksum check runs only AFTER bytes land on disk, so it
    cannot defend against this)."""
    for p in parts:
        norm = os.path.normpath(p)
        if os.path.isabs(p) or norm.startswith("..") or ".." in norm.split(os.sep):
            raise ValueError(f"tileset manifest path escapes the store: {p!r}")
    full = os.path.join(base, *parts)
    base_real = os.path.realpath(base)
    if not os.path.realpath(full).startswith(base_real + os.sep):
        raise ValueError(f"tileset manifest path escapes the store: {parts!r}")
    return full


def _http_get(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url) as r:  # noqa: S310 - repo URL is caller-supplied config
        return r.read()


def load_tileset(repo: str, store_dir: str, verify: bool = True) -> dict:
    """Fetch piles absent from the store from a local directory OR an
    http(s) repo URL (LoadCommand.java:32-71); verify checksums (the
    GUID-match equivalent).  Incremental: present piles are skipped without
    any fetch.  Returns {loaded: [...], skipped: [...], verified: bool}."""
    from_url = _is_url(repo)
    if from_url:
        manifest = json.loads(_http_get(repo.rstrip("/") + "/tileset.json"))
    else:
        with open(os.path.join(repo, "tileset.json")) as fh:
            manifest = json.load(fh)
    os.makedirs(store_dir, exist_ok=True)
    # validate the WHOLE manifest before any fetch or copy: a hostile pile
    # name or file entry must fail the load up front, not after some piles
    # already landed
    for d, info in manifest["piles"].items():
        _safe_join(store_dir, d)
        if isinstance(info, dict):
            for rel in info.get("files", []):
                _safe_join(store_dir, d, rel)
    loaded, skipped = [], []
    for d, info in manifest["piles"].items():
        checksum = info["checksum"] if isinstance(info, dict) else info
        dst = _safe_join(store_dir, d)
        if not from_url and verify and _pile_checksum(os.path.join(repo, d)) != checksum:
            # local repos verify EVERY manifest pile, present-or-not —
            # a corrupt repo must surface even when nothing needs fetching.
            # (HTTP repos can't verify without downloading; skipped piles
            # there are trusted until fetched.)
            raise ValueError(f"tileset corrupt: checksum mismatch for {d}")
        if os.path.exists(dst):
            skipped.append(d)
            continue
        if from_url:
            try:
                for rel in info["files"]:
                    data = _http_get(f"{repo.rstrip('/')}/{d}/{rel}")
                    full = _safe_join(dst, rel)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(data)
                if verify and _pile_checksum(dst) != checksum:
                    raise ValueError(f"tileset corrupt: checksum mismatch for {d}")
            except Exception:
                shutil.rmtree(dst, ignore_errors=True)  # no partial piles
                raise
        else:
            shutil.copytree(os.path.join(repo, d), dst)
        loaded.append(d)
    return {"loaded": loaded, "skipped": skipped, "verified": verify}
