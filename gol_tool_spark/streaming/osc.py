"""OsmChange XML reader — `gol update`'s input format (A10).

Reference parity: update/ChangeReader.java parses (optionally gzip'd)
OsmChange XML with a SAX pass into typed change records — ChangedNode
(id, version, tags, x, y), ChangedWay (id, version, tags, nodeIds),
ChangedRelation (id, version, tags, memberIds, roles) — under <create> /
<modify> / <delete> sections (ChangeReader.java:250-272: create and modify
are the same upsert operation; delete carries no payload).  Coordinates
project lon/lat onto the int-Mercator grid at parse time
(ChangeReader.java:156-159, Mercator.xFromLon/yFromLat).

Spark form: the per-file parse is a generator over ElementTree.iterparse
(constant memory, like SAX); `osc_to_changes` distributes it over files
with spark.read.format("binaryFile") + mapInPandas — one OsmChange delta
is small, but a backlog of thousands of them (a week of minutely diffs)
parses in parallel.  The output rows use the typed change schema of
`changes_full.apply_changes_full`, so the two compose into the reference's
read -> find tiles -> patch pipeline.
"""

from __future__ import annotations

import gzip
import io
import math
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

GRID = 4294967296.0
MAX_LAT = 85.0511287798066


def _xy_of(lon: float, lat: float) -> tuple[int, int]:
    x = int(round(lon / 360.0 * GRID))
    lat = max(min(lat, MAX_LAT), -MAX_LAT)
    y = int(round(math.asinh(math.tan(math.radians(lat))) / (2.0 * math.pi) * GRID))
    clamp = lambda v: max(-(1 << 31), min((1 << 31) - 1, v))  # noqa: E731
    return clamp(x), clamp(y)


def parse_osc(data: bytes, seq_base: int = 0) -> Iterator[dict]:
    """Parse one OsmChange document (raw or gzip'd bytes) into typed change
    records.  Yields dicts matching changes_full.CHANGE_SCHEMA_FULL:
    {op, ftype, id, version, x, y, tags, refs, members, seq}.  `seq` is
    seq_base + document position — OsmChange files are ordered, and a
    distributed shuffle preserves no row order, so the order must travel
    WITH the record (same rule as the JSON change stream)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    op = None
    seq = seq_base
    # iterparse start events track the enclosing <create>/<modify>/<delete>;
    # end events emit a completed feature and free its subtree
    for event, el in ET.iterparse(io.BytesIO(data), events=("start", "end")):
        if event == "start":
            if el.tag in ("create", "modify"):
                op = "upsert"
            elif el.tag == "delete":
                op = "delete"
            continue
        if el.tag in ("create", "modify", "delete"):
            op = None
            el.clear()
            continue
        if el.tag not in ("node", "way", "relation") or op is None:
            continue
        rec: dict = {
            "op": op,
            "ftype": el.tag[0] if el.tag != "relation" else "r",
            "id": int(el.get("id")),
            "version": int(el.get("version", "1")),
            "x": None,
            "y": None,
            "tags": None,
            "refs": None,
            "members": None,
            "seq": seq,
        }
        seq += 1
        if op != "delete":
            if el.tag == "node":
                rec["x"], rec["y"] = _xy_of(
                    float(el.get("lon")), float(el.get("lat"))
                )
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            rec["tags"] = tags or None
            if el.tag == "way":
                rec["refs"] = [int(nd.get("ref")) for nd in el.findall("nd")]
            elif el.tag == "relation":
                rec["members"] = [
                    {
                        "mtype": m.get("type"),
                        "ref": int(m.get("ref")),
                        "role": m.get("role") or "",
                    }
                    for m in el.findall("member")
                ]
        yield rec
        el.clear()


def osc_to_changes(
    spark: SparkSession,
    path: str | None = None,
    rank_base: int = 0,
    files: list[str] | None = None,
) -> DataFrame:
    """Distributed OsmChange parse: binaryFile scan over `path` (glob ok,
    .osc and .osc.gz), each file parsed in a mapInPandas worker.  Files are
    ordered by name (minutely diffs sort chronologically): (rank_base +
    file rank) * 2^32 + in-file position = the global `seq`, so later
    diffs beat earlier ones in the merge's winner-per-id rule.  rank_base
    lets a caller staging several batches into one directory keep seq
    monotone ACROSS batches (see stage_osc).

    `files`: an explicit file list overriding the glob — callers that
    RESERVED a rank range from their own listing (stage_osc) pass it so
    files arriving between their listing and this parse can never be
    ranked beyond the reservation."""
    from pyspark.sql import functions as F

    if files is not None:
        paths = sorted(files)
        raw = spark.read.format("binaryFile").load(paths).select("path", "content")
    else:
        if path is None:
            raise ValueError("osc_to_changes needs a path glob or a file list")
        raw = spark.read.format("binaryFile").load(path).select("path", "content")
        # rank from the driver-enumerated file listing (bounded by file
        # count; column pruning means only paths are listed, no bytes
        # read), then broadcast-join back — a global Window here would
        # both funnel rows through one partition and trip WindowExec
        # warnings
        paths = sorted(r.path for r in raw.select("path").distinct().collect())
    ranked = spark.createDataFrame(
        [(pth, i + rank_base) for i, pth in enumerate(paths)],
        "path string, frank long",
    )
    files = raw.join(F.broadcast(ranked), "path")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content, rank in zip(pdf["content"], pdf["frank"]):
                rows.extend(parse_osc(bytes(content), seq_base=int(rank) << 32))
            yield pd.DataFrame(
                rows,
                columns=[
                    "op", "ftype", "id", "version", "x", "y",
                    "tags", "refs", "members", "seq",
                ],
            )

    from .changes_full import CHANGE_SCHEMA_FULL

    return files.mapInPandas(run, CHANGE_SCHEMA_FULL)


def _stage_meta_path(changes_dir: str) -> str:
    import os

    return os.path.join(changes_dir, "_staged_meta.json")


def _load_rank_base(changes_dir: str) -> int:
    import json
    import os

    meta = _stage_meta_path(changes_dir)
    if os.path.exists(meta):
        with open(meta) as fh:
            return int(json.load(fh)["next_rank_base"])
    return 0


def _store_rank_base(changes_dir: str, next_base: int) -> None:
    import json
    import os

    meta = _stage_meta_path(changes_dir)
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"next_rank_base": next_base}, fh)
    os.replace(tmp, meta)  # atomic on posix


def stage_osc(spark: SparkSession, osc_glob: str, changes_dir: str) -> int:
    """Convert OsmChange file(s) into JSON-lines change files under
    `changes_dir` — the file-source feed of apply_changes_full's stream
    (the reference's Updater reads the .osc directly; the Spark stream
    wants a replayable JSON source directory).  Returns the record count.

    seq across stagings: file ranks continue from a persisted monotone
    counter (`_staged_meta.json` in changes_dir) instead of restarting at
    0, so when TWO stagings land before one apply_changes_full run — both
    JSON sets then share a single availableNow micro-batch — a feature
    changed in both diffs still resolves to the LATER staging's record
    (last-diff-wins), matching the reference's sequential apply order
    (update/Updater.java applies .osc files strictly in sequence)."""
    import os

    os.makedirs(changes_dir, exist_ok=True)
    base = _load_rank_base(changes_dir)
    # ONE listing, used for both the reservation and the parse: files
    # arriving after this point belong to the NEXT staging — they can
    # never be ranked beyond this reservation because the explicit list
    # (not the glob) is what gets parsed (ADVICE r4: the old re-list in
    # osc_to_changes could rank racing arrivals past the reservation,
    # and the corrective bump ran after the append — a crash between the
    # two let the next staging reuse those ranks and tie seq values).
    staged_files = sorted(
        r.path
        for r in spark.read.format("binaryFile")
        .load(osc_glob)
        .select("path")
        .distinct()
        .collect()
    )
    n_files = len(staged_files)
    if n_files == 0:
        return 0
    # RESERVE the rank range BEFORE appending: a crash between the append
    # and a meta update can then never hand the same ranks to the next
    # staging (which would tie seq values and break last-diff-wins); a
    # crash after the reservation but before the append just leaves an
    # unused rank gap, which is harmless
    _store_rank_base(changes_dir, base + n_files)
    # cache across the write + count: without it the count re-scans and
    # re-parses every .osc a second time
    df = osc_to_changes(spark, rank_base=base, files=staged_files).cache()
    try:
        df.write.mode("append").json(changes_dir)
        return df.count()
    finally:
        df.unpersist()
