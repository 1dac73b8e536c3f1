"""Full-fidelity change stream (A10 complete): typed node/way/relation
changes with tag payloads, OsmChange XML ingestion, and the dirty-closure
cascade — a node move re-runs its parent ways' C2 spread and re-piles
affected relations transitively, rewriting ONLY the affected piles.

Reference parity: update/ChangeReader.java (XML -> records),
update/Updater.java + TileFinder/FeatureFinder (dirty closure),
tiles/TagTableBuilder.java:309 (tag diff/merge semantics).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gol_tool_spark.streaming import changes_full as CF
from gol_tool_spark.streaming import osc as OSC

PILE_W = 1 << 29  # zoom-3 cell width on the int-Mercator grid


def px(cell: int, off: int = 1000) -> int:
    """x inside zoom-3 column `cell` (0..7 maps to -4..3)."""
    return (cell - 4) * PILE_W + off


def write_changes(tmp_path, name: str, recs: list[dict]) -> str:
    d = tmp_path / "changes"
    d.mkdir(exist_ok=True)
    with open(d / name, "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    return str(d)


def run_merge(spark, changes_dir: str, store: str, ckpt: str) -> None:
    q = CF.apply_changes_full(spark, changes_dir, store, ckpt)
    assert q.awaitTermination(180), "merge stream did not finish in 180s"


def pile_files(root: str) -> dict[str, dict[str, int]]:
    """pile=N -> {file: mtime} map, layout-agnostic: legacy keeps
    <table>/pile=N/ directly, versioned nests them under epoch dirs
    (<table>/e<V>/pile=N/); file names are globally unique (part-UUIDs)
    so merging across epochs is safe."""
    out: dict[str, dict[str, int]] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        d = os.path.basename(dirpath)
        if not d.startswith("pile="):
            continue
        files = out.setdefault(d, {})
        for f in filenames:
            if f.startswith(("_", ".")):
                continue
            files[f] = os.stat(os.path.join(dirpath, f)).st_mtime_ns
    return dict(sorted(out.items()))


def node_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, x long, y long, tags map<string,string>"
    )


def way_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, refs array<long>, tags map<string,string>"
    )


def rel_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, members array<struct<mtype:string,ref:long,role:string>>, "
        "tags map<string,string>",
    )


def base_store(spark, store: str, layout: str = "versioned"):
    """n1(cell0) n2(cell1) n3(cell5); w1=[n1,n2] spread {p0,p1};
    w2=[n3] spread {p5}; r1=[n1, w1]; r2=[r1] (super)."""
    nodes = node_df(
        spark,
        [
            (1, px(0), 1000, {"name": "a"}),
            (2, px(1), 1000, {"name": "b"}),
            (3, px(5), 1000, None),
        ],
    )
    ways = way_df(
        spark, [(10, [1, 2], {"highway": "x"}), (11, [3], {"highway": "y"})]
    )
    rels = rel_df(
        spark,
        [
            (20, [("node", 1, "stop"), ("way", 10, "")], {"type": "route"}),
            (21, [("relation", 20, "")], {"type": "super"}),
        ],
    )
    CF.write_full_store(nodes, ways, rels, store, layout=layout)
    return nodes, ways, rels


def read_kind(spark, store, kind):
    return CF.read_store(spark, store, kind)


class TestFullStoreBulk:
    def test_way_spread_and_rel_piles(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        ways = read_kind(spark, store, "ways")
        spread = {
            (r.id, r.pile) for r in ways.select("id", "pile").collect()
        }
        piles_of = lambda wid: {p for (i, p) in spread if i == wid}  # noqa: E731
        assert len(piles_of(10)) == 2  # w1 spans two piles
        assert len(piles_of(11)) == 1
        rels = read_kind(spark, store, "relations")
        rp = {r.id: r.pile for r in rels.collect()}
        # r1 = min over member piles; super r2 inherits through fixed point
        assert rp[21] == rp[20]
        nodes = read_kind(spark, store, "nodes")
        n1_pile = nodes.filter(F.col("id") == 1).collect()[0].pile
        assert rp[20] == min(piles_of(10) | {n1_pile})


class TestNodeMoveRetilesWay:
    def test_move_across_pile_boundary(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        before_ways = pile_files(os.path.join(store, "ways"))
        before_nodes = pile_files(os.path.join(store, "nodes"))

        ways0 = read_kind(spark, store, "ways")
        old_spread = {r.pile for r in ways0.filter(F.col("id") == 10).collect()}

        # move n1 from cell0 to cell3 — crosses a zoom-3 pile boundary
        changes = write_changes(
            tmp_path,
            "c1.json",
            [
                {
                    "op": "upsert", "ftype": "n", "id": 1, "version": 2,
                    "x": px(3), "y": 1000, "tags": {"name": "a"}, "seq": 1,
                }
            ],
        )
        run_merge(spark, changes, store, str(tmp_path / "ck"))

        nodes = read_kind(spark, store, "nodes")
        n1 = nodes.filter(F.col("id") == 1).collect()[0]
        assert n1.x == px(3)
        ways = read_kind(spark, store, "ways")
        new_spread = {r.pile for r in ways.filter(F.col("id") == 10).collect()}
        assert new_spread != old_spread  # the parent way re-tiled
        assert len(new_spread) == 2
        # w2 (pile of n3) untouched: same files, same mtimes
        after_ways = pile_files(os.path.join(store, "ways"))
        after_nodes = pile_files(os.path.join(store, "nodes"))
        n3_pile = nodes.filter(F.col("id") == 3).collect()[0].pile
        assert after_ways[f"pile={n3_pile}"] == before_ways[f"pile={n3_pile}"]
        assert after_nodes[f"pile={n3_pile}"] == before_nodes[f"pile={n3_pile}"]

        # rebuild-equivalence oracle: a from-scratch store over the mutated
        # input must equal the incrementally merged store, table by table
        store2 = str(tmp_path / "s2")
        nodes2 = node_df(
            spark,
            [
                (1, px(3), 1000, {"name": "a"}),
                (2, px(1), 1000, {"name": "b"}),
                (3, px(5), 1000, None),
            ],
        )
        ways2 = way_df(
            spark, [(10, [1, 2], {"highway": "x"}), (11, [3], {"highway": "y"})]
        )
        rels2 = rel_df(
            spark,
            [
                (20, [("node", 1, "stop"), ("way", 10, "")], {"type": "route"}),
                (21, [("relation", 20, "")], {"type": "super"}),
            ],
        )
        CF.write_full_store(nodes2, ways2, rels2, store2)
        for kind in ("nodes", "ways", "relations"):
            a = read_kind(spark, store, kind)
            b = read_kind(spark, store2, kind)
            cols = [c for c in a.columns if c not in ("tags", "members")]
            got = sorted(tuple(r) for r in a.select(*cols).collect())
            want = sorted(tuple(r) for r in b.select(*cols).collect())
            assert got == want, kind
            # tags compared as sorted entry lists (map order is undefined)
            ga = sorted(
                (r.id, sorted((r.tags or {}).items()))
                for r in a.select("id", "tags").collect()
            )
            gb = sorted(
                (r.id, sorted((r.tags or {}).items()))
                for r in b.select("id", "tags").collect()
            )
            assert ga == gb, kind

    def test_relation_and_super_repile(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        rels0 = {r.id: r.pile for r in read_kind(spark, store, "relations").collect()}
        # move BOTH w1 nodes and n1 far east -> r1's min member pile changes,
        # r2 (super) must follow through the transitive dirty closure
        changes = write_changes(
            tmp_path,
            "c1.json",
            [
                {"op": "upsert", "ftype": "n", "id": 1, "version": 2,
                 "x": px(6), "y": 1000, "tags": {"name": "a"}, "seq": 1},
                {"op": "upsert", "ftype": "n", "id": 2, "version": 2,
                 "x": px(7), "y": 1000, "tags": {"name": "b"}, "seq": 2},
            ],
        )
        run_merge(spark, changes, store, str(tmp_path / "ck"))
        rels = {r.id: r.pile for r in read_kind(spark, store, "relations").collect()}
        assert rels[20] != rels0[20]
        assert rels[21] == rels[20]  # super-relation followed


class TestTagSemantics:
    def test_replace_and_patch(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        # modify = full replace (merge(old, diff(old, new)) == new)
        c1 = write_changes(
            tmp_path, "c1.json",
            [{"op": "upsert", "ftype": "n", "id": 1, "version": 2,
              "x": px(0), "y": 1000,
              "tags": {"amenity": "cafe", "name": "a2"}, "seq": 1}],
        )
        run_merge(spark, c1, store, str(tmp_path / "ck"))
        n1 = read_kind(spark, store, "nodes").filter(F.col("id") == 1).collect()[0]
        assert dict(n1.tags) == {"amenity": "cafe", "name": "a2"}
        # patch = bare diff: null value deletes a key, others upsert;
        # x/y omitted -> coordinates carried forward
        c2 = write_changes(
            tmp_path, "c2.json",
            [{"op": "patch", "ftype": "n", "id": 1, "version": 3,
              "tags": {"name": None, "cuisine": "it"}, "seq": 2}],
        )
        run_merge(spark, c2, store, str(tmp_path / "ck"))
        n1 = read_kind(spark, store, "nodes").filter(F.col("id") == 1).collect()[0]
        assert dict(n1.tags) == {"amenity": "cafe", "cuisine": "it"}
        assert n1.x == px(0)

    def test_way_tag_update_keeps_refs(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "patch", "ftype": "w", "id": 10, "version": 2,
              "tags": {"highway": "primary"}, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        w = (
            read_kind(spark, store, "ways")
            .filter(F.col("id") == 10)
            .collect()
        )
        assert all(dict(r.tags) == {"highway": "primary"} for r in w)
        assert all(list(r.refs) == [1, 2] for r in w)
        assert len(w) == 2  # spread unchanged


class TestCascades:
    def test_delete_node_shrinks_way_spread(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "delete", "ftype": "n", "id": 2, "version": 2, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        nodes = read_kind(spark, store, "nodes")
        assert nodes.filter(F.col("id") == 2).count() == 0
        spread = {
            r.pile
            for r in read_kind(spark, store, "ways")
            .filter(F.col("id") == 10)
            .collect()
        }
        assert len(spread) == 1  # only n1's pile remains

    def test_way_created_before_its_node(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c1 = write_changes(
            tmp_path, "c1.json",
            [{"op": "upsert", "ftype": "w", "id": 12, "version": 1,
              "refs": [99], "tags": {"highway": "z"}, "seq": 1}],
        )
        run_merge(spark, c1, store, str(tmp_path / "ck"))
        w12 = read_kind(spark, store, "ways").filter(F.col("id") == 12).collect()
        assert [r.pile for r in w12] == [CF.PURGATORY]
        # the missing node arrives in a later batch: the node_ways index
        # (which records unresolved refs too) re-dirties the way
        c2 = write_changes(
            tmp_path, "c2.json",
            [{"op": "upsert", "ftype": "n", "id": 99, "version": 1,
              "x": px(2), "y": 1000, "seq": 2}],
        )
        run_merge(spark, c2, store, str(tmp_path / "ck"))
        w12 = read_kind(spark, store, "ways").filter(F.col("id") == 12).collect()
        assert len(w12) == 1 and w12[0].pile != CF.PURGATORY

    def test_delete_way_and_relation(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [
                {"op": "delete", "ftype": "w", "id": 11, "version": 2, "seq": 1},
                {"op": "delete", "ftype": "r", "id": 21, "version": 2, "seq": 2},
            ],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        assert (
            read_kind(spark, store, "ways").filter(F.col("id") == 11).count() == 0
        )
        assert (
            read_kind(spark, store, "relations").filter(F.col("id") == 21).count()
            == 0
        )
        # r1 survives untouched
        assert (
            read_kind(spark, store, "relations").filter(F.col("id") == 20).count()
            == 1
        )


class TestTypedStoreKeybits:
    def test_keybits_column_query_and_merge(self, spark, tmp_path):
        """indexed-keys on the typed store: nodes carry a keybits column
        (sorted within each pile for row-group pruning), query_store ANDs
        the SIndexTree-style prefilter automatically, and the merge
        recomputes the bits when tags change."""
        from gol_tool_spark.functions import keybits as KB

        store = str(tmp_path / "s")
        nodes = node_df(
            spark,
            [
                (1, px(0), 1000, {"amenity": "pub"}),
                (2, px(0) + 10, 1000, {"shop": "bakery"}),
                (3, px(0) + 20, 1000, {"name": "x"}),
            ],
        )
        CF.write_full_store(nodes, None, None, store, indexed_keys="amenity shop")
        stored = {r.id: r.keybits for r in CF.read_store(spark, store, "nodes").collect()}
        assert stored == {1: 1, 2: 2, 3: 0}
        hits = CF.query_store(
            spark, store, px(0) - 500, 0, px(0) + 500, 2000, goql="n[amenity=pub]"
        )
        assert {r.id for r in hits.collect()} == {1}
        # tag change through the merge updates the bits
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "patch", "ftype": "n", "id": 3, "version": 2,
              "tags": {"amenity": "cafe"}, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        rows = {r.id: r for r in CF.read_store(spark, store, "nodes").collect()}
        assert rows[3].keybits == 1
        # and every stored keybits equals a fresh recompute over its tags
        schema = KB.parse_schema("amenity shop")
        nd = CF.read_store(spark, store, "nodes")
        mismatch = nd.filter(
            F.col("keybits") != KB.keybits_col(F.col("tags"), schema)
        ).count()
        assert mismatch == 0
        cafes = CF.query_store(
            spark, store, px(0) - 500, 0, px(0) + 500, 2000, goql="n[amenity]"
        )
        assert {r.id for r in cafes.collect()} == {1, 3}


class TestRandomizedRebuildEquivalence:
    def test_multi_batch_random_changes_match_rebuild(self, spark, tmp_path):
        """Property: after ANY sequence of change batches, the incremental
        store equals a from-scratch store over the final feature state —
        randomized (seeded) moves/deletes/creates/tag-changes across
        nodes, ways and relations, applied over 3 separate micro-batch
        passes."""
        import random

        rng = random.Random(42)
        # base: 24 nodes across several piles, 8 ways, 3 relations (one super)
        nodes = {
            i: (px(rng.randrange(8), off=1000 + i), 1000 + 37 * i, {"v": str(i)})
            for i in range(1, 25)
        }
        ways = {100 + w: [rng.randrange(1, 25) for _ in range(3)] for w in range(8)}
        rels = {
            200: [("node", 1, ""), ("way", 100, "r")],
            201: [("way", 101, ""), ("way", 102, "")],
            202: [("relation", 200, ""), ("node", 2, "")],
        }
        store = str(tmp_path / "s")
        CF.write_full_store(
            node_df(spark, [(i, x, y, t) for i, (x, y, t) in nodes.items()]),
            way_df(spark, [(w, refs, {"w": str(w)}) for w, refs in ways.items()]),
            rel_df(spark, [(r, m, None) for r, m in rels.items()]),
            store,
        )
        seq = 0
        for batch in range(3):
            recs = []
            for _ in range(6):
                seq += 1
                kind = rng.choice(["move", "del_node", "retag", "way_edit", "new_node"])
                if kind == "move" and nodes:
                    nid = rng.choice(list(nodes))
                    x, y, t = nodes[nid]
                    nodes[nid] = (px(rng.randrange(8), off=5000 + seq), y, t)
                    recs.append({"op": "upsert", "ftype": "n", "id": nid, "seq": seq,
                                 "x": nodes[nid][0], "y": y, "tags": t})
                elif kind == "del_node" and len(nodes) > 4:
                    nid = rng.choice(list(nodes))
                    del nodes[nid]
                    recs.append({"op": "delete", "ftype": "n", "id": nid, "seq": seq})
                elif kind == "retag" and nodes:
                    nid = rng.choice(list(nodes))
                    x, y, _ = nodes[nid]
                    t = {"v": f"b{seq}", "new": "y"}
                    nodes[nid] = (x, y, t)
                    recs.append({"op": "upsert", "ftype": "n", "id": nid, "seq": seq,
                                 "x": x, "y": y, "tags": t})
                elif kind == "way_edit" and ways:
                    wid = rng.choice(list(ways))
                    ways[wid] = [rng.randrange(1, 30) for _ in range(3)]
                    recs.append({"op": "upsert", "ftype": "w", "id": wid, "seq": seq,
                                 "refs": ways[wid], "tags": {"w": str(wid)}})
                elif kind == "new_node":
                    nid = 1000 + seq
                    nodes[nid] = (px(rng.randrange(8), off=9000 + seq), 777, {"v": "n"})
                    recs.append({"op": "upsert", "ftype": "n", "id": nid, "seq": seq,
                                 "x": nodes[nid][0], "y": 777, "tags": {"v": "n"}})
            write_changes(tmp_path, f"b{batch}.json", recs)
            run_merge(spark, str(tmp_path / "changes"), store, str(tmp_path / "ck"))

        # oracle: rebuild from the mutated python-side state
        store2 = str(tmp_path / "s2")
        CF.write_full_store(
            node_df(spark, [(i, x, y, t) for i, (x, y, t) in nodes.items()]),
            way_df(spark, [(w, refs, {"w": str(w)}) for w, refs in ways.items()]),
            rel_df(spark, [(r, m, None) for r, m in rels.items()]),
            store2,
        )
        for kind in ("nodes", "ways", "relations"):
            cols = [
                c
                for c in read_kind(spark, store, kind).columns
                if c not in ("tags", "members")
            ]
            got = sorted(tuple(r) for r in read_kind(spark, store, kind).select(*cols).collect())
            want = sorted(tuple(r) for r in read_kind(spark, store2, kind).select(*cols).collect())
            assert got == want, kind
            ga = sorted(
                (r.id, sorted((r.tags or {}).items()))
                for r in read_kind(spark, store, kind).select("id", "tags").collect()
            )
            gb = sorted(
                (r.id, sorted((r.tags or {}).items()))
                for r in read_kind(spark, store2, kind).select("id", "tags").collect()
            )
            assert ga == gb, kind
        rep = CF.verify_full_store(spark, store)
        assert rep["ok"], rep


class TestDirectOscStream:
    def test_osc_files_merge_without_staging(self, spark, tmp_path):
        """apply_osc_changes: .osc files are the stream source — parse and
        merge in one job, checkpoint tracks the files, later diffs apply
        incrementally."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        oscdir = tmp_path / "osc"
        oscdir.mkdir()
        (oscdir / "0001.osc").write_bytes(
            b"""<osmChange version="0.6"><modify>
 <node id="1" version="2" lat="0.003" lon="0.003">
  <tag k="name" v="moved"/></node>
</modify></osmChange>"""
        )
        q = CF.apply_osc_changes(spark, str(oscdir), store, str(tmp_path / "ck"))
        assert q.awaitTermination(180)
        n1 = read_kind(spark, store, "nodes").filter(F.col("id") == 1).collect()[0]
        assert dict(n1.tags) == {"name": "moved"}
        grid = 4294967296.0
        assert n1.x == round(0.003 / 360.0 * grid)
        # a later diff deletes the node; only the new file is processed
        import gzip

        (oscdir / "0002.osc.gz").write_bytes(
            gzip.compress(
                b'<osmChange version="0.6"><delete>'
                b'<node id="1" version="3"/></delete></osmChange>'
            )
        )
        q = CF.apply_osc_changes(spark, str(oscdir), store, str(tmp_path / "ck"))
        assert q.awaitTermination(180)
        assert read_kind(spark, store, "nodes").filter(F.col("id") == 1).count() == 0
        rep = CF.verify_full_store(spark, store)
        assert rep["ok"], rep


class TestVerifyFullStore:
    def test_invariants_hold_after_merges(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [
                {"op": "upsert", "ftype": "n", "id": 1, "version": 2,
                 "x": px(3), "y": 1000, "tags": {"name": "a"}, "seq": 1},
                {"op": "delete", "ftype": "n", "id": 2, "version": 2, "seq": 2},
                {"op": "upsert", "ftype": "w", "id": 12, "version": 1,
                 "refs": [99], "tags": {}, "seq": 3},
            ],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        rep = CF.verify_full_store(spark, store)
        assert rep["ok"], rep

    def test_detects_tampering(self, spark, tmp_path):
        # raw partition-dir rewrite = a LEGACY-layout tamper; the
        # versioned twin below corrupts manifest-referenced files instead
        store = str(tmp_path / "s")
        base_store(spark, store, layout="legacy")
        # tamper: rewrite a way copy into the wrong pile
        ways = CF.read_store(spark, store, "ways")
        bad = ways.filter(F.col("id") == 11).withColumn(
            "pile", F.col("pile") + 1
        ).localCheckpoint(eager=True)
        keep = ways.filter(F.col("id") != 11).localCheckpoint(eager=True)
        import shutil

        shutil.rmtree(f"{store}/ways")
        keep.unionByName(bad).write.mode("overwrite").partitionBy("pile").parquet(
            f"{store}/ways"
        )
        rep = CF.verify_full_store(spark, store)
        assert not rep["ok"]
        assert rep["way_unjustified"] > 0

    def test_detects_tampering_versioned(self, spark, tmp_path):
        """On a versioned store the tamper surface is the manifest's file
        list: swap a referenced node-pile file for rows belonging to a
        DIFFERENT pile (the pile column is rebuilt from the file path, so
        a misplaced file = misplaced rows)."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        from gol_tool_spark.streaming import txstore

        man = txstore.load_manifest(store)
        entry = man["tables"]["nodes"]
        # every node pile holds a distinct node: copying one pile's file
        # over another's plants a duplicated id in the wrong pile (the
        # pile column is path-derived) and orphans the overwritten node
        parts = sorted(entry["parts"].items())
        assert len(parts) >= 2
        (pa, fa), (pb, fb) = parts[0], parts[1]
        import shutil

        def _with_crc(rel: str) -> list[tuple[str, str]]:
            # hadoop LocalFS keeps a .<name>.crc sidecar; a consistent
            # tamper replaces both (copying data alone trips the CRC
            # layer first — also a detection, but not the one under test)
            d, b = os.path.split(os.path.join(store, "nodes", rel))
            return [(os.path.join(d, b), ""), (os.path.join(d, f".{b}.crc"), "")]

        for (src, _), (dst, _) in zip(_with_crc(fa[0]), _with_crc(fb[0])):
            if os.path.exists(src):
                shutil.copyfile(src, dst)
        rep = CF.verify_full_store(spark, store)
        assert not rep["ok"]
        assert rep["node_dups"] > 0 or rep["node_idx_diff"] > 0


class TestRelGeometry:
    def test_bbox_and_quad_resolved_bulk(self, spark, tmp_path):
        """Relations carry their resolved bbox + packed tile quad (the
        reference's Validator bbox aggregation + quad placement), fixed
        point through super-relations."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        rels = {r.id: r for r in read_kind(spark, store, "relations").collect()}
        r1, r2 = rels[20], rels[21]
        # r1 members: n1 (px(0),1000) + w1 over n1,n2 (px(0..1), 1000)
        assert (r1.minx, r1.maxx) == (px(0), px(1))
        assert (r1.miny, r1.maxy) == (1000, 1000)
        assert r1.quad is not None
        # super-relation inherits the child footprint through the fixed point
        assert (r2.minx, r2.miny, r2.maxx, r2.maxy) == (
            r1.minx, r1.miny, r1.maxx, r1.maxy,
        )

    def test_merge_updates_bbox(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "upsert", "ftype": "n", "id": 2, "version": 2,
              "x": px(6), "y": 9000, "tags": {"name": "b"}, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        rels = {r.id: r for r in read_kind(spark, store, "relations").collect()}
        # n2 moved east+north: w1's bbox grew, so r1 and the super follow
        assert rels[20].maxx == px(6) and rels[20].maxy == 9000
        assert rels[21].maxx == px(6) and rels[21].maxy == 9000

    def test_unresolvable_relation_null_bbox(self, spark, tmp_path):
        store = str(tmp_path / "s")
        nodes = node_df(spark, [(1, px(2), 1000, None)])
        ways = way_df(spark, [(10, [99], None)])
        rels = rel_df(spark, [(30, [("way", 10, "")], None)])
        CF.write_full_store(nodes, ways, rels, store)
        r = read_kind(spark, store, "relations").collect()[0]
        assert r.minx is None and r.quad is None
        assert r.pile == CF.PURGATORY


class TestRelPurgatoryMember:
    def test_locatable_member_wins_over_purgatory_member(self, spark, tmp_path):
        """A purgatory member (way with no resolvable nodes, pile -1) must
        not drag a relation with locatable members into purgatory — min
        over member piles ignores -1 unless nothing is locatable."""
        store = str(tmp_path / "s")
        nodes = node_df(spark, [(1, px(2), 1000, None)])
        ways = way_df(spark, [(10, [99], None)])  # ref 99 unresolvable
        rels = rel_df(
            spark,
            [
                (20, [("way", 10, ""), ("node", 1, "")], None),
                (21, [("way", 10, "")], None),  # ONLY the purgatory way
            ],
        )
        CF.write_full_store(nodes, ways, rels, store)
        rp = {r.id: r.pile for r in read_kind(spark, store, "relations").collect()}
        n1_pile = read_kind(spark, store, "nodes").collect()[0].pile
        assert rp[20] == n1_pile          # locatable member wins
        assert rp[21] == CF.PURGATORY     # nothing locatable -> purgatory


class TestQueryStore:
    def test_bbox_prunes_piles_exact_filter_and_goql(self, spark, tmp_path):
        """Each layout proves its own pruning mechanism: versioned stores
        prune the FILE LIST at manifest-resolution time (before Catalyst
        ever plans — the Iceberg model), legacy stores rely on Catalyst
        turning the pile isin into scan PartitionFilters."""
        store = str(tmp_path / "s")
        base_store(spark, store)  # versioned (default)
        out = CF.query_store(spark, store, px(0) - 500, 0, px(1) + 500, 2000)
        assert {r.id for r in out.collect()} == {1, 2}
        import re

        from gol_tool_spark.streaming import txstore

        got_piles = {
            int(re.search(r"/pile=(-?\d+)/", f).group(1)) for f in out.inputFiles()
        }
        all_piles = {
            int(p)
            for p in txstore.load_manifest(store)["tables"]["nodes"]["parts"]
        }
        assert got_piles < all_piles  # strict subset: planned-file prune
        assert len(all_piles) == 3 and len(got_piles) == 2  # cells {0,1} of {0,1,5}

        lstore = str(tmp_path / "l")
        base_store(spark, lstore, layout="legacy")
        lout = CF.query_store(spark, lstore, px(0) - 500, 0, px(1) + 500, 2000)
        assert {r.id for r in lout.collect()} == {1, 2}
        plan = lout._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan
        seg = plan[plan.index("PartitionFilters"):].splitlines()[0]
        assert "pile" in seg and "IN" in seg
        tagged = CF.query_store(
            spark, store, px(0) - 500, 0, px(1) + 500, 2000, goql="n[name=a]"
        )
        assert {r.id for r in tagged.collect()} == {1}

    def test_relations_exact_bbox_overlap(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        # r1/r2 footprint spans px(0)..px(1); a bbox far east of it but in
        # an overlapping z3 pile row must NOT return them
        hits = CF.query_store(
            spark, store, px(0) - 500, 0, px(0) + 500, 2000, kind="relations"
        )
        assert {r.id for r in hits.collect()} == {20, 21}
        misses = CF.query_store(
            spark, store, px(7), 0, px(7) + 500, 2000, kind="relations"
        )
        assert misses.count() == 0
        # footprint spans px(0)..px(1) but the row is STORED at the min
        # member pile (cell 0): a bbox over cell 1 only must still hit —
        # relations scope by stored bbox, not by the pile prune
        east = CF.query_store(
            spark, store, px(1) - 500, 0, px(1) + 500, 2000, kind="relations"
        )
        assert {r.id for r in east.collect()} == {20, 21}

    def test_deleted_child_relation_does_not_seed_parents(self, spark, tmp_path):
        """A relation deleted in the batch must not contribute its stale
        stored pile/bbox to dirty parents — the parent falls back to its
        other members (or purgatory if none)."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "delete", "ftype": "r", "id": 20, "version": 2, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        rels = {r.id: r for r in read_kind(spark, store, "relations").collect()}
        assert 20 not in rels
        assert rels[21].pile == CF.PURGATORY  # only member was the deleted child
        assert rels[21].minx is None
        rep = CF.verify_full_store(spark, store)
        assert rep["ok"], rep

    def test_goql_applies_to_way_queries(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        ways = CF.query_store(
            spark, store, px(0) - 500, 0, px(1) + 500, 2000,
            kind="ways", goql="w[highway=x]",
        )
        assert {r.id for r in ways.collect()} == {10}

    def test_ways_pruned_with_purgatory(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        c = write_changes(
            tmp_path, "c1.json",
            [{"op": "upsert", "ftype": "w", "id": 12, "version": 1,
              "refs": [99], "tags": {}, "seq": 1}],
        )
        run_merge(spark, c, store, str(tmp_path / "ck"))
        ways = CF.query_store(
            spark, store, px(0) - 500, 0, px(0) + 500, 2000, kind="ways"
        )
        ids = {r.id for r in ways.collect()}
        assert 10 in ids      # spread copy in the bbox pile
        assert 12 in ids      # purgatory scopes into every query
        assert 11 not in ids  # far pile pruned out


class TestTypedStoreEndToEnd:
    OSC = b"""<osmChange version="0.6">
 <modify>
  <node id="1" version="2" lat="0.002" lon="0.002">
   <tag k="name" v="a &amp; b"/><tag k="amenity" v="cafe"/>
  </node>
 </modify>
 <create>
  <node id="50" version="1" lat="0.001" lon="0.0015">
   <tag k="amenity" v="cafe"/>
  </node>
 </create>
</osmChange>"""

    def test_build_update_query_export(self, spark, tmp_path):
        """gol build -> gol update (OsmChange) -> gol query -b -g ->
        GeoJSON FeatureCollection export -> gol check, on the typed store."""
        import json as _json

        from gol_tool_spark.sinks import writers

        store = str(tmp_path / "s")
        base_store(spark, store)
        oscdir = tmp_path / "osc"
        oscdir.mkdir()
        (oscdir / "1.osc").write_bytes(self.OSC)
        OSC.stage_osc(spark, str(oscdir), str(tmp_path / "staged"))
        run_merge(spark, str(tmp_path / "staged"), store, str(tmp_path / "ck"))

        grid = 4294967296.0
        span = int(0.01 / 360.0 * grid)
        cafes = CF.query_store(
            spark, store, -span, -span, span, span, goql="n[amenity=cafe]"
        )
        assert {r.id for r in cafes.collect()} == {1, 50}

        out_file = str(tmp_path / "out.geojson")
        n = writers.write_geojson_collection(
            writers.geojson_format(cafes.select("id", "x", "y")), out_file
        )
        doc = _json.load(open(out_file))
        assert n == 2 and {f["id"] for f in doc["features"]} == {1, 50}

        rep = CF.verify_full_store(spark, store)
        assert rep["ok"], rep


class TestOscReader:
    OSC = b"""<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6">
 <create>
  <node id="100" version="1" lat="0.001" lon="0.001">
   <tag k="name" v="Marks &amp; Spencer"/>
  </node>
  <way id="200" version="1">
   <nd ref="100"/><nd ref="101"/>
   <tag k="highway" v="residential"/>
  </way>
 </create>
 <modify>
  <relation id="300" version="2">
   <member type="way" ref="200" role="outer"/>
   <member type="node" ref="100" role=""/>
   <tag k="type" v="multipolygon"/>
  </relation>
 </modify>
 <delete>
  <node id="101" version="3"/>
 </delete>
</osmChange>"""

    def test_parse_osc(self):
        recs = list(OSC.parse_osc(self.OSC))
        assert [r["op"] for r in recs] == ["upsert", "upsert", "upsert", "delete"]
        assert [r["ftype"] for r in recs] == ["n", "w", "r", "n"]
        node = recs[0]
        assert node["tags"] == {"name": "Marks & Spencer"}
        assert node["x"] == round(0.001 / 360.0 * 4294967296.0)
        way = recs[1]
        assert way["refs"] == [100, 101]
        rel = recs[2]
        assert rel["members"][0] == {"mtype": "way", "ref": 200, "role": "outer"}
        assert [r["seq"] for r in recs] == [0, 1, 2, 3]

    def test_parse_osc_gzip(self):
        import gzip

        recs = list(OSC.parse_osc(gzip.compress(self.OSC)))
        assert len(recs) == 4

    def test_distributed_parse_and_stage(self, spark, tmp_path):
        oscdir = tmp_path / "osc"
        oscdir.mkdir()
        (oscdir / "000001.osc").write_bytes(self.OSC)
        df = OSC.osc_to_changes(spark, str(oscdir))
        rows = df.orderBy("seq").collect()
        assert len(rows) == 4
        assert rows[1].refs == [100, 101]
        assert rows[2].members[0].asDict() == {
            "mtype": "way", "ref": 200, "role": "outer",
        }
        # end-to-end: stage to JSON, merge into a fresh store
        changes_dir = str(tmp_path / "staged")
        n = OSC.stage_osc(spark, str(oscdir), changes_dir)
        assert n == 4
        store = str(tmp_path / "s")
        run_merge(spark, changes_dir, store, str(tmp_path / "ck"))
        nodes = CF.read_store(spark, store, "nodes")
        assert nodes.count() == 1  # 100 created (101 deleted, never existed)
        n100 = nodes.collect()[0]
        assert dict(n100.tags) == {"name": "Marks & Spencer"}
        ways = CF.read_store(spark, store, "ways")
        assert ways.filter(F.col("id") == 200).count() >= 1

    @staticmethod
    def _node_osc(name_val: str) -> bytes:
        return (
            '<osmChange version="0.6"><modify>'
            '<node id="100" version="2" lat="0.001" lon="0.001">'
            f'<tag k="name" v="{name_val}"/>'
            "</node></modify></osmChange>"
        ).encode()

    def test_two_stagings_before_one_apply_last_diff_wins(self, spark, tmp_path):
        """Two stage_osc calls into the same changes_dir before a single
        apply: the LATER staging must win for a feature changed in both
        diffs, even though its file name sorts earlier and the first
        staging had more files (so under per-call rank restart its rank
        would be lower).  Ranks continue from the persisted counter."""
        d1, d2 = tmp_path / "osc1", tmp_path / "osc2"
        d1.mkdir(), d2.mkdir()
        # staging 1: two files, the later one (by name) sets name=old
        (d1 / "y.osc").write_bytes(self._node_osc("older"))
        (d1 / "z.osc").write_bytes(self._node_osc("old"))
        # staging 2: ONE file whose name sorts before both of staging 1's
        (d2 / "a.osc").write_bytes(self._node_osc("new"))
        staged = str(tmp_path / "staged")
        assert OSC.stage_osc(spark, str(d1), staged) == 2
        assert OSC.stage_osc(spark, str(d2), staged) == 1
        # ranks must be 0,1 then 2 — monotone across stagings
        ranks = sorted(
            r.rank
            for r in spark.read.json(staged)
            .select(F.shiftright("seq", 32).alias("rank"))
            .distinct()
            .collect()
        )
        assert ranks == [0, 1, 2]
        store = str(tmp_path / "s")
        run_merge(spark, staged, store, str(tmp_path / "ck"))
        n100 = CF.read_store(spark, store, "nodes").filter("id = 100").collect()
        assert len(n100) == 1 and dict(n100[0].tags)["name"] == "new"


class TestEmptyKindBulkLoad:
    def test_store_without_relations_accepts_changes(self, spark, tmp_path):
        """Bulk-loading with an EMPTY ways/rels DataFrame must behave like
        omitting them: an empty DF partitionBy-writes a schema-less dir
        that would poison later merges (UNABLE_TO_INFER_SCHEMA on the
        member_rels index)."""
        store = str(tmp_path / "s")
        nodes = node_df(spark, [(1, px(0), 1000, {"name": "a"})])
        CF.write_full_store(
            nodes, way_df(spark, []), rel_df(spark, []), store
        )
        ch = write_changes(
            tmp_path,
            "c.json",
            [
                {"op": "upsert", "ftype": "n", "id": 1, "x": px(1), "y": 5,
                 "tags": {"name": "b"}, "seq": 0},
            ],
        )
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        rows = read_kind(spark, store, "nodes").collect()
        assert len(rows) == 1 and dict(rows[0].tags) == {"name": "b"}
        assert CF.verify_full_store(spark, store)["ok"]


class TestQuadPlacement:
    """Opt-in relation quad placement (VERDICT r3 item 8): replicate a
    relation into every pile of its tile quad (<=4 copies,
    build/Sorter.java:718-802 / TileCatalog.java:260-306) so per-pile
    contents can be compared tile-for-tile; min-member stays the default."""

    def test_bulk_copies_match_quad_column(self, spark, tmp_path):
        from gol_tool_spark.kernels import tile as KT

        store = str(tmp_path / "s")
        nodes = node_df(
            spark,
            [(1, px(0), 1000, {"name": "a"}), (2, px(1), 1000, {"name": "b"}),
             (3, px(5), 1000, None)],
        )
        ways = way_df(spark, [(10, [1, 2], {"highway": "x"}), (11, [3], {"highway": "y"})])
        rels = rel_df(
            spark,
            [(20, [("node", 1, "stop"), ("way", 10, "")], {"type": "route"}),
             (21, [("relation", 20, "")], {"type": "super"})],
        )
        CF.write_full_store(nodes, ways, rels, store, placement="quad")
        rows = CF.read_store(spark, store, "relations").collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.id, {"piles": set(), "quad": r.quad})
            by_id[r.id]["piles"].add(r.pile)
        for rid, info in by_id.items():
            assert info["quad"] is not None, rid
            assert info["piles"] == set(KT.quad_piles(info["quad"])), rid
        # r20 spans cells 0 and 1 -> more than one copy
        assert len(by_id[20]["piles"]) >= 2
        assert CF.verify_full_store(spark, store)["ok"]

    def test_merge_and_query_equivalent_to_min_placement(self, spark, tmp_path):
        sq, sm = str(tmp_path / "q"), str(tmp_path / "m")
        for store, placement in ((sq, "quad"), (sm, "min")):
            nodes = node_df(
                spark,
                [(1, px(0), 1000, {"name": "a"}), (2, px(1), 1000, {"name": "b"}),
                 (3, px(5), 1000, None)],
            )
            ways = way_df(
                spark, [(10, [1, 2], {"highway": "x"}), (11, [3], {"highway": "y"})]
            )
            rels = rel_df(
                spark,
                [(20, [("node", 1, "stop"), ("way", 10, "")], {"type": "route"}),
                 (21, [("relation", 20, "")], {"type": "super"})],
            )
            CF.write_full_store(nodes, ways, rels, store, placement=placement)
            ch = write_changes(
                tmp_path, f"c_{placement}.json",
                [
                    # move n1 far away: r20's footprint (and quad) grows
                    {"op": "upsert", "ftype": "n", "id": 1, "x": px(3), "y": 5,
                     "tags": None, "seq": 0},
                    # new relation over n3
                    {"op": "upsert", "ftype": "r", "id": 22, "version": 1,
                     "members": [{"mtype": "node", "ref": 3, "role": ""}],
                     "tags": {"type": "site"}, "seq": 1},
                ],
            )
            run_merge(spark, ch, store, str(tmp_path / f"ck_{placement}"))
            assert CF.verify_full_store(spark, store)["ok"], placement
        # same relations visible for any bbox, regardless of placement
        W = 1 << 31
        for bbox in ((-W, -W, W - 1, W - 1), (px(0, 0), -1000, px(1, 0) + (1 << 29), 2000)):
            a = {
                r.id
                for r in CF.query_store(spark, sq, *bbox, kind="relations").collect()
            }
            b = {
                r.id
                for r in CF.query_store(spark, sm, *bbox, kind="relations").collect()
            }
            assert a == b, (bbox, a, b)


class TestPileZoom:
    def test_finer_pile_zoom_partitions_and_merges(self, spark, tmp_path):
        """pile_zoom is a per-store knob (persisted in meta): finer piles
        shrink a scattered delta's dirty-partition fraction — the scale
        lever the merge-scale probe documents.  A z6 store partitions at
        z6 granularity, the merge re-piles at z6, and query_store prunes
        with the z6 covering."""
        store = str(tmp_path / "s")
        step = 1 << 26  # z6 cell width
        nodes = node_df(
            spark,
            [(i, -(1 << 29) + i * step, 1000, None) for i in range(1, 9)],
        )
        CF.write_full_store(nodes, way_df(spark, []), None, store, pile_zoom=6)
        piles = {
            r.pile for r in CF.read_store(spark, store, "nodes").collect()
        }
        assert len(piles) == 8  # one z6 pile per node; z3 would give 2
        # move node 1 by one z6 cell (inside the same z3 cell)
        ch = write_changes(
            tmp_path, "c.json",
            [{"op": "upsert", "ftype": "n", "id": 1,
              "x": -(1 << 29) + 9 * step, "y": 1000, "tags": None, "seq": 0}],
        )
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        assert CF.verify_full_store(spark, store)["ok"]
        got = CF.query_store(
            spark, store,
            -(1 << 29) + 9 * step - 10, 0, -(1 << 29) + 9 * step + 10, 2000,
        )
        assert {r.id for r in got.collect()} == {1}


class TestFixedPointConvergenceWarning:
    def test_rel_piles_warns_at_cap(self, spark, caplog):
        """A relation chain deeper than max_iters logs a warning instead of
        silently keeping stale piles (ADVICE r3)."""
        import logging

        nodes = spark.createDataFrame([(1, 100)], "ref long, pile long")
        ways = spark.createDataFrame([], "ref long, pile long")
        # r30 <- r31 <- r32 <- r33: 3 relation hops above the node holder
        rels = rel_df(
            spark,
            [
                (30, [("node", 1, "")], None),
                (31, [("relation", 30, "")], None),
                (32, [("relation", 31, "")], None),
                (33, [("relation", 32, "")], None),
            ],
        )
        with caplog.at_level(logging.WARNING, logger=CF.__name__):
            out = CF.rel_piles(rels, nodes, ways, max_iters=1)
            got = {r.id: r.pile for r in out.collect()}
        assert got[30] == 100 and got[31] == 100  # one pass resolved these
        assert any("did not converge" in r.message for r in caplog.records)
        # and with enough iterations it converges silently
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger=CF.__name__):
            out = CF.rel_piles(rels, nodes, ways, max_iters=10)
            got = {r.id: r.pile for r in out.collect()}
        assert got == {30: 100, 31: 100, 32: 100, 33: 100}
        assert not any("did not converge" in r.message for r in caplog.records)
