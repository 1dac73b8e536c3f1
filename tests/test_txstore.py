"""Atomic snapshot-manifest store (txstore.py — VERDICT r3 item 2).

The legacy layout's documented crash window — dynamic partition overwrite
across several pile directories is not one transaction — is closed by the
versioned layout: immutable epoch files + one atomically-renamed CURRENT
pointer.  These tests drive the crash points directly: a merge that dies
mid-staging or just before the pointer swap must leave every reader on
the complete OLD snapshot; replay then converges to the complete NEW one.

Reference parity: clarisma/common/store/ journaled writes +
update/Updater.java:34-55 (a .osc applies as one recoverable unit).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.streaming import changes_full as CF
from gol_tool_spark.streaming import txstore

from test_changes_full import (
    node_df,
    px,
    rel_df,
    run_merge,
    way_df,
    write_changes,
)


def base_store(spark, store: str, layout: str = "versioned"):
    nodes = node_df(
        spark,
        [
            (1, px(0), 1000, {"name": "a"}),
            (2, px(1), 1000, {"name": "b"}),
            (3, px(5), 1000, None),
        ],
    )
    ways = way_df(spark, [(10, [1, 2], {"highway": "x"}), (11, [3], {"highway": "y"})])
    rels = rel_df(
        spark,
        [
            (20, [("node", 1, "stop"), ("way", 10, "")], {"type": "route"}),
            (21, [("relation", 20, "")], {"type": "super"}),
        ],
    )
    CF.write_full_store(nodes, ways, rels, store, layout=layout)


def snapshot_contents(spark, store):
    out = {}
    for kind in ("nodes", "ways", "relations"):
        out[kind] = {
            (r.id, r.pile)
            for r in CF.read_store(spark, store, kind).select("id", "pile").collect()
        }
    return out


MOVE = [
    {"op": "upsert", "ftype": "n", "id": 1, "x": px(6), "y": 5,
     "tags": {"name": "a2"}, "seq": 0},
    {"op": "upsert", "ftype": "n", "id": 50, "x": px(7), "y": 7,
     "tags": {"amenity": "cafe"}, "seq": 1},
]


class TestVersionedBasics:
    def test_bulk_load_and_merge_match_legacy(self, spark, tmp_path):
        """Same inputs, same changes: versioned store content == legacy."""
        sv, sl = str(tmp_path / "v"), str(tmp_path / "l")
        base_store(spark, sv, layout="versioned")
        base_store(spark, sl, layout="legacy")
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, sv, str(tmp_path / "ckv"))
        run_merge(spark, ch, sl, str(tmp_path / "ckl"))
        assert snapshot_contents(spark, sv) == snapshot_contents(spark, sl)
        assert CF.verify_full_store(spark, sv)["ok"]
        assert txstore.current_version(sv) == 2

    def test_untouched_partition_files_untouched(self, spark, tmp_path):
        """A merge rewrites only affected piles: files of untouched piles
        keep their paths and mtimes across the snapshot swap."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        man1 = txstore.load_manifest(store)
        before = {
            v: tuple(fl) for v, fl in man1["tables"]["nodes"]["parts"].items()
        }
        ch = write_changes(tmp_path, "c.json", MOVE)  # touches cells 0, 6, 7
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        man2 = txstore.load_manifest(store)
        after = {v: tuple(fl) for v, fl in man2["tables"]["nodes"]["parts"].items()}
        untouched = [v for v in before if v in after and before[v] == after[v]]
        # node 2 (cell 1) and node 3 (cell 5) piles were not affected
        assert len(untouched) >= 2
        for v in untouched:
            for f in before[v]:
                assert os.path.exists(os.path.join(store, "nodes", f))

    def test_empty_partition_drops_from_manifest(self, spark, tmp_path):
        """Deleting a pile's last feature removes the partition from the
        manifest — no placeholder files, no schema-poisoning hazard."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        piles_before = set(txstore.load_manifest(store)["tables"]["nodes"]["parts"])
        ch = write_changes(
            tmp_path, "c.json",
            [{"op": "delete", "ftype": "n", "id": 3, "seq": 0}],
        )
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        piles_after = set(txstore.load_manifest(store)["tables"]["nodes"]["parts"])
        assert len(piles_after) == len(piles_before) - 1
        assert CF.read_store(spark, store, "nodes").filter("id = 3").count() == 0
        assert CF.verify_full_store(spark, store)["ok"]

    def test_gc_expires_with_one_snapshot_grace(self, spark, tmp_path):
        """GC is delayed one snapshot: files superseded by commit V are
        kept until commit V+1 (a reader that resolved snapshot V-1 before
        the commit still finds its files), then removed."""
        store = str(tmp_path / "s")
        base_store(spark, store)

        def files_of(version):
            man = txstore.load_manifest(store, version)
            return {
                (k, f)
                for k, t in man["tables"].items()
                for fl in t["parts"].values()
                for f in fl
            }

        v1 = files_of(1)
        # resolve a reader against snapshot 1 BEFORE any commit
        stale_reader = CF.read_store(spark, store, "nodes").select("id", "pile")
        ch1 = write_changes(tmp_path, "c1.json", MOVE)
        run_merge(spark, ch1, store, str(tmp_path / "ck1"))
        v2 = files_of(2)
        p = CF._paths(store)
        # grace: v1-superseded files still on disk after the v2 commit,
        # and the pre-commit reader still executes
        for k, f in v1 - v2:
            assert os.path.exists(os.path.join(p[k], f)), (k, f)
        assert stale_reader.count() == 3
        ch2 = write_changes(
            tmp_path, "c2.json",
            [{"op": "upsert", "ftype": "n", "id": 2, "x": px(2), "y": 9,
              "tags": {"name": "b2"}, "seq": 0}],
        )
        run_merge(spark, ch2, store, str(tmp_path / "ck2"))
        v3 = files_of(3)
        # v1 files superseded by BOTH newer snapshots: now expired
        for k, f in v1 - v2 - v3:
            assert not os.path.exists(os.path.join(p[k], f)), (k, f)
        # v2-superseded (not in v3) files keep their grace period
        for k, f in (v2 - v3) & (v2 - v1):
            assert os.path.exists(os.path.join(p[k], f)), (k, f)
        for k, f in v3:  # live: present
            assert os.path.exists(os.path.join(p[k], f)), (k, f)

    def test_bulk_reload_drops_stale_partitions_and_tables(self, spark, tmp_path):
        """Re-running write_full_store over a versioned store has full
        overwrite semantics: partitions and whole tables absent from the
        new load disappear from the manifest (parity with the legacy
        layout's static overwrite)."""
        store = str(tmp_path / "s")
        base_store(spark, store)  # nodes in 3 piles + ways + relations
        nodes2 = node_df(spark, [(7, px(2), 1000, {"name": "g"})])
        CF.write_full_store(nodes2, None, None, store, layout="versioned")
        man = txstore.load_manifest(store)
        assert set(man["tables"]) == {"nodes", "idx_nodes"}
        assert len(man["tables"]["nodes"]["parts"]) == 1
        rows = CF.read_store(spark, store, "nodes").collect()
        assert {r.id for r in rows} == {7}
        assert CF.verify_full_store(spark, store)["ok"]


class TestMetaInManifest:
    def test_versioned_store_meta_lives_in_manifest(self, spark, tmp_path):
        """ADVICE r4: placement/pile_zoom/indexed_keys must publish with
        the snapshot, not as a mid-load side file."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        man = txstore.load_manifest(store)
        assert man["meta"]["placement"] == "min"
        assert man["meta"]["pile_zoom"] == CF.PILE_ZOOM
        assert not os.path.exists(CF._meta_path(store))
        assert CF._load_meta(store) == man["meta"]

    def test_crashed_reload_keeps_old_meta_with_old_data(self, spark, tmp_path):
        """Re-bulk-load with a DIFFERENT pile_zoom that dies before
        commit: readers must still see the OLD meta paired with the OLD
        committed snapshot — never new meta over old data."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        old_meta = CF._load_meta(store)
        nodes2 = node_df(spark, [(7, px(2), 1000, {"name": "g"})])
        orig_commit = txstore.StoreTx.commit
        try:
            txstore.StoreTx.commit = lambda self: (_ for _ in ()).throw(
                RuntimeError("die before publish")
            )
            with pytest.raises(RuntimeError, match="die before publish"):
                CF.write_full_store(
                    nodes2, None, None, store, layout="versioned", pile_zoom=6
                )
        finally:
            txstore.StoreTx.commit = orig_commit
        assert CF._load_meta(store) == old_meta  # pile_zoom still PILE_ZOOM
        assert CF.verify_full_store(spark, store)["ok"]

    def test_merge_tx_carries_meta_forward(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        assert txstore.current_version(store) == 2
        assert txstore.load_manifest(store)["meta"]["placement"] == "min"

    def test_legacy_store_still_uses_meta_file(self, spark, tmp_path):
        store = str(tmp_path / "l")
        base_store(spark, store, layout="legacy")
        assert os.path.exists(CF._meta_path(store))
        assert CF._load_meta(store)["placement"] == "min"


class TestManifestMetrics:
    def test_metrics_persisted_and_snapshot_scoped_info(self, spark, tmp_path):
        """Per-partition {rows, bytes} metrics persist INSIDE the snapshot
        manifest (the north rule's 'row-count/byte metrics persisted
        alongside snapshots'), survive merges partition-scoped, and
        full_store_info reports over the LIVE snapshot only (grace-period
        superseded files are not double-counted)."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        man = txstore.load_manifest(store)
        m = man["tables"]["nodes"]["metrics"]
        assert set(m) == set(man["tables"]["nodes"]["parts"])
        assert sum(e["rows"] for e in m.values()) == 3
        assert all(e["bytes"] > 0 for e in m.values())
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        man2 = txstore.load_manifest(store)
        m2 = man2["tables"]["nodes"]["metrics"]
        assert sum(e["rows"] for e in m2.values()) == 4  # node 50 arrived
        from gol_tool_spark.plans import info as INFO

        rep = INFO.full_store_info(store)
        assert rep["snapshot_version"] == 2
        # superseded epoch files still exist on disk (1-snapshot grace),
        # but the report counts only the live snapshot
        assert rep["nodes"]["rows"] == 4
        assert rep["nodes"]["manifest_metrics"] == m2
        assert "nodes" in rep["indexes"]


class TestBroadcastDeltaGuard:
    def test_big_delta_unhinted_path_same_result(self, spark, tmp_path, monkeypatch):
        """Above BROADCAST_DELTA_ROWS the merge drops every broadcast
        hint (AQE plans the joins) — results must be identical to the
        hinted path.  Forced here by lowering the threshold to 1."""
        sv, sb = str(tmp_path / "hinted"), str(tmp_path / "big")
        base_store(spark, sv)
        base_store(spark, sb)
        ch1 = write_changes(tmp_path, "c1.json", MOVE)
        run_merge(spark, ch1, sv, str(tmp_path / "ck1"))
        monkeypatch.setattr(CF, "BROADCAST_DELTA_ROWS", 1)
        ch2 = write_changes(tmp_path, "c2.json", MOVE)
        run_merge(spark, ch2, sb, str(tmp_path / "ck2"))
        assert snapshot_contents(spark, sv) == snapshot_contents(spark, sb)
        assert CF.verify_full_store(spark, sb)["ok"]


class TestDoubleWriteGuard:
    def test_second_write_to_same_table_in_one_tx_raises(self, spark, tmp_path):
        """ADVICE r4: a second overwrite of a table inside one tx would
        delete the first call's epoch files while the manifest still
        references them — the latent path must be unreachable."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        p = CF._paths(store)
        tx = txstore.StoreTx(spark, store, p)
        nodes = node_df(spark, [(50, px(7), 7, None)]).withColumn(
            "pile", F.lit(0).cast("long")
        )
        tx.overwrite_parts("nodes", nodes, "pile", affected=[0])
        with pytest.raises(RuntimeError, match="already staged"):
            tx.overwrite_parts("nodes", nodes, "pile", affected=[0])


class TestCrashAtomicity:
    def _crash_then_recover(self, spark, tmp_path, crash_point: str):
        """Drive a merge that dies at `crash_point`; the store must read
        as ONE complete snapshot (old before the manifest claim, new
        after it — never torn), and a replay must converge."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        old = snapshot_contents(spark, store)
        old_version = txstore.current_version(store)
        ch = write_changes(tmp_path, "c.json", MOVE)

        class Boom(RuntimeError):
            pass

        writes_seen = {"n": 0}
        real_overwrite = txstore.StoreTx.overwrite_parts

        def crashing_overwrite(self, key, df, part, affected, sort_within=None):
            real_overwrite(self, key, df, part, affected, sort_within)
            writes_seen["n"] += 1
            if crash_point == "mid_staging" and writes_seen["n"] == 3:
                raise Boom("crash after staging 3 of 8 tables")

        def crashing_advance(self, version):
            # the manifest claim (= the commit point) has already
            # happened; die before the CURRENT hint moves and before GC
            raise Boom("crash after manifest publish")

        mp = pytest.MonkeyPatch()
        try:
            mp.setattr(txstore.StoreTx, "overwrite_parts", crashing_overwrite)
            if crash_point == "after_publish":
                mp.setattr(txstore.StoreTx, "_advance_current", crashing_advance)
            q = CF.apply_changes_full(spark, ch, store, str(tmp_path / "ck"))
            crashed = False
            try:
                q.awaitTermination(180)
                crashed = q.exception() is not None
            except Exception:
                crashed = True
            assert crashed, "merge should have crashed"
        finally:
            mp.undo()

        new_ids = {1, 2, 3, 50}
        if crash_point == "mid_staging":
            # before the claim: every reader sees the complete OLD snapshot
            assert txstore.current_version(store) == old_version
            assert snapshot_contents(spark, store) == old
            expect_after_replay = old_version + 1
        else:
            # after the claim: the commit is durable and discoverable even
            # though the CURRENT hint is stale — readers probe past it and
            # see the complete NEW snapshot (atomic, never a mix)
            assert txstore.current_version(store) == old_version + 1
            ids = {r.id for r in CF.read_store(spark, store, "nodes").collect()}
            assert ids == new_ids
            expect_after_replay = old_version + 2
        assert CF.verify_full_store(spark, store)["ok"]
        qr = CF.query_store(
            spark, store, -(1 << 31), -(1 << 31), (1 << 31) - 1, (1 << 31) - 1
        )
        expect_ids = {1, 2, 3} if crash_point == "mid_staging" else new_ids
        assert {r.id for r in qr.collect()} == expect_ids

        # --- replay (fresh checkpoint = the stream re-delivers); applying
        # the same batch twice is idempotent (upserts/deletes last-wins) ---
        run_merge(spark, ch, store, str(tmp_path / "ck2"))
        assert txstore.current_version(store) == expect_after_replay
        assert CF.verify_full_store(spark, store)["ok"]
        ids = {
            r.id for r in CF.read_store(spark, store, "nodes").collect()
        }
        assert ids == new_ids
        moved = CF.read_store(spark, store, "nodes").filter("id = 1").collect()[0]
        assert dict(moved.tags) == {"name": "a2"}

    def test_crash_mid_staging(self, spark, tmp_path):
        self._crash_then_recover(spark, tmp_path, "mid_staging")

    def test_crash_after_manifest_publish_is_committed(self, spark, tmp_path):
        self._crash_then_recover(spark, tmp_path, "after_publish")

    def _orphan(self, store, age_sec):
        """Plant a tokened orphan epoch (a crashed/conflicted tx's
        staging) with an mtime `age_sec` in the past."""
        import time

        ndir = CF._paths(store)["nodes"]
        d = os.path.join(ndir, "e9-deadbeef", "pile=0")
        os.makedirs(d, exist_ok=True)
        fp = os.path.join(d, "part-orphan.parquet")
        with open(fp, "wb") as fh:
            fh.write(b"junk")
        old = time.time() - age_sec
        os.utime(fp, (old, old))
        return fp

    def test_vacuum_removes_aged_orphans_keeps_live(self, spark, tmp_path):
        """Unique-token staging leaks epoch dirs on crash/conflict by
        design; vacuum_store (the remove-orphan-files action) reclaims
        them after a grace window without touching live snapshot files
        or the manifests commit-time GC still needs."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))  # -> v2
        p = CF._paths(store)
        fresh = self._orphan(store, age_sec=10)  # in-flight lookalike
        aged = None
        rep = txstore.vacuum_store(store, p, grace_sec=3600)
        assert os.path.exists(fresh)  # younger than grace: kept
        os.remove(fresh)
        aged = self._orphan(store, age_sec=7200)
        rep = txstore.vacuum_store(store, p, grace_sec=3600)
        assert rep["files_removed"] >= 1
        assert not os.path.exists(aged)
        # every file of the live + grace snapshots survives
        for v in (1, 2):
            man = txstore.load_manifest(store, v)
            for k, t in man["tables"].items():
                for fl in t["parts"].values():
                    for f in fl:
                        assert os.path.exists(os.path.join(p[k], f)), (v, k, f)
        assert CF.verify_full_store(spark, store)["ok"]
        # a third snapshot retires v1 from the GC horizon: vacuum may
        # then drop its manifest
        ch2 = write_changes(
            tmp_path, "c2.json",
            [{"op": "upsert", "ftype": "n", "id": 2, "x": px(2), "y": 9,
              "tags": {"name": "b2"}, "seq": 0}],
        )
        run_merge(spark, ch2, store, str(tmp_path / "ck2"))  # -> v3
        rep = txstore.vacuum_store(store, p, grace_sec=3600)
        assert rep["manifests_removed"] == 1
        assert not os.path.exists(txstore._manifest_path(store, 1))
        assert CF.verify_full_store(spark, store)["ok"]

    def test_stale_epochs_swept_on_next_tx(self, spark, tmp_path):
        """Epoch dirs left by a crashed attempt are unreferenced and get
        removed when the next transaction opens."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        ndir = CF._paths(store)["nodes"]
        stale = os.path.join(ndir, "e9")
        os.makedirs(os.path.join(stale, "pile=1"), exist_ok=True)
        with open(os.path.join(stale, "pile=1", "part-stale.parquet"), "wb") as fh:
            fh.write(b"junk")
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        assert not os.path.exists(stale)
        assert CF.verify_full_store(spark, store)["ok"]


class TestOptimisticConcurrency:
    """Concurrent writers on one versioned store (round 5 — previously a
    documented single-writer assumption): Delta/Iceberg-style optimistic
    concurrency — atomic put-if-absent manifest claim, read/write-set
    validation, rebase for disjoint commits — replacing the reference's
    exclusive store lock (clarisma/common/store/Store.java; `gol update`
    serializes updaters), which has no object-store analogue."""

    @staticmethod
    def _piles(store):
        man = txstore.load_manifest(store)
        return sorted(int(v) for v in man["tables"]["nodes"]["parts"])

    @staticmethod
    def _touch(tx, pile, marker):
        """Read one pile through the tx (recording the read set) and
        stage a tag-marked rewrite of it."""
        cur = tx.read_parts("nodes", "pile", [pile])
        mod = cur.withColumn(
            "tags",
            F.map_concat("tags", F.create_map(F.lit("touched"), F.lit(marker))),
        ).select(*cur.columns)
        tx.overwrite_parts("nodes", mod, "pile", [pile])

    def test_disjoint_writers_auto_rebase(self, spark, tmp_path):
        """Two writers on disjoint piles: the loser of the version race
        rebases onto the winner's snapshot and BOTH commits land."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        pa, pb = self._piles(store)[:2]
        p = CF._paths(store)
        tx1 = txstore.StoreTx(spark, store, p)
        tx2 = txstore.StoreTx(spark, store, p)
        self._touch(tx2, pb, "two")  # tx2 reads+stages BEFORE tx1 commits
        self._touch(tx1, pa, "one")
        tx1.commit()
        assert txstore.current_version(store) == 2
        tx2.commit()  # lost the race -> rebase -> next version
        assert txstore.current_version(store) == 3
        tags = [
            dict(r.tags)
            for r in CF.read_store(spark, store, "nodes").collect()
        ]
        touched = {t.get("touched") for t in tags}
        assert {"one", "two"} <= touched
        assert CF.verify_full_store(spark, store)["ok"]

    def test_write_write_overlap_conflicts(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        pa, pb = self._piles(store)[:2]
        p = CF._paths(store)
        tx1 = txstore.StoreTx(spark, store, p)
        tx2 = txstore.StoreTx(spark, store, p)
        # tx2 stages a blind overwrite of pa (no read: fresh rows), so
        # the WRITE-set branch is what fires; a read-modify-write tx on
        # the same pile conflicts earlier, on its read set (see
        # test_stale_read_conflicts)
        fresh = node_df(spark, [(99, px(0), 2, {"name": "z"})])
        staged = (
            tx2.read_parts("nodes", "pile", [pb])
            .limit(0)
            .unionByName(
                fresh.withColumn("tile", F.lit(0).cast("long"))
                .withColumn("pile", F.lit(pa).cast("long"))
                .withColumn("keybits", F.lit(0).cast("long")),
                allowMissingColumns=True,
            )
        )
        tx2.overwrite_parts("nodes", staged, "pile", [pa])
        self._touch(tx1, pa, "one")
        tx1.commit()
        with pytest.raises(txstore.CommitConflict, match="write set"):
            tx2.commit()
        # the conflicted tx published nothing
        assert txstore.current_version(store) == 2
        tags = [
            dict(r.tags)
            for r in CF.read_store(spark, store, "nodes").collect()
        ]
        assert {t.get("touched") for t in tags} == {"one", None}
        assert CF.verify_full_store(spark, store)["ok"]

    def test_stale_read_conflicts(self, spark, tmp_path):
        """Serializable validation: a tx whose READ set was overwritten
        conflicts even when its writes are disjoint (its plan consumed a
        snapshot that no longer exists)."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        pa, pb = self._piles(store)[:2]
        p = CF._paths(store)
        tx1 = txstore.StoreTx(spark, store, p)
        tx2 = txstore.StoreTx(spark, store, p)
        tx2.read_parts("nodes", "pile", [pa])  # stale read of tx1's pile
        self._touch(tx2, pb, "two")
        self._touch(tx1, pa, "one")
        tx1.commit()
        with pytest.raises(txstore.CommitConflict, match="read set"):
            tx2.commit()

    def test_whole_table_read_conflicts(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        pa, pb = self._piles(store)[:2]
        p = CF._paths(store)
        tx1 = txstore.StoreTx(spark, store, p)
        tx2 = txstore.StoreTx(spark, store, p)
        tx2.read_parts("nodes")  # unpruned whole-table read
        self._touch(tx2, pb, "two")
        self._touch(tx1, pa, "one")
        tx1.commit()
        with pytest.raises(txstore.CommitConflict, match="read set"):
            tx2.commit()

    def test_identical_intervening_snapshot_no_conflict(self, spark, tmp_path):
        """Validation is diff-based, not version-based: an intervening
        commit that changed nothing this tx touched rebases cleanly even
        though the version number moved."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        pa = self._piles(store)[0]
        p = CF._paths(store)
        tx = txstore.StoreTx(spark, store, p)
        self._touch(tx, pa, "one")
        man = txstore.load_manifest(store, 1)
        man["version"] = 2
        assert txstore._claim_version(store, 2, json.dumps(man))
        tx.commit()
        assert txstore.current_version(store) == 3
        tags = [
            dict(r.tags)
            for r in CF.read_store(spark, store, "nodes").collect()
        ]
        assert "one" in {t.get("touched") for t in tags}
        assert CF.verify_full_store(spark, store)["ok"]

    def test_claim_single_winner_threads(self, tmp_path):
        """The linearization point itself: racing claims for one version
        produce exactly one winner, and the winning manifest is COMPLETE
        (link publishes a fully-written file or nothing)."""
        import threading

        root = str(tmp_path / "m")
        os.makedirs(os.path.join(root, "_manifest"))
        results = {}
        bar = threading.Barrier(8)

        def worker(i):
            bar.wait()
            results[i] = txstore._claim_version(
                root, 1, json.dumps({"version": 1, "who": i})
            )

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        winners = [i for i, ok in results.items() if ok]
        assert len(winners) == 1
        with open(os.path.join(root, "_manifest", "v1.json")) as fh:
            assert json.load(fh)["who"] == winners[0]
        # losers' temp files are cleaned up
        assert os.listdir(os.path.join(root, "_manifest")) == ["v1.json"]

    def test_merge_batch_retries_on_conflict(self, spark, tmp_path, monkeypatch):
        """The streaming merge recomputes a batch whose commit conflicts
        (deterministic given the delta), converging without operator
        intervention."""
        store = str(tmp_path / "s")
        base_store(spark, store)
        calls = {"n": 0}
        real = txstore.StoreTx.commit

        def flaky(self):
            calls["n"] += 1
            if calls["n"] == 1:
                raise txstore.CommitConflict("injected competing commit")
            real(self)

        monkeypatch.setattr(txstore.StoreTx, "commit", flaky)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        assert calls["n"] == 2
        assert txstore.current_version(store) == 2
        ids = {r.id for r in CF.read_store(spark, store, "nodes").collect()}
        assert ids == {1, 2, 3, 50}
        assert CF.verify_full_store(spark, store)["ok"]


class TestTimeTravel:
    """Version-pinned reads + the snapshot history over retained
    manifests — Iceberg VERSION AS OF / `snapshots` metadata-table
    semantics on the versioned store.  The reference's in-place
    journaled store keeps only the latest state (clarisma/common/store/
    has no snapshot log); time travel is what the immutable-snapshot
    mapping buys for free."""

    PILE_W = 1 << 29  # zoom-3 cell width (test_changes_full.px grid)

    def _merged(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        before = snapshot_contents(spark, store)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        return store, before

    def test_version_pinned_reads_see_old_snapshot(self, spark, tmp_path):
        store, before = self._merged(spark, tmp_path)
        after = snapshot_contents(spark, store)
        assert after != before
        v1 = {
            kind: {
                (r.id, r.pile)
                for r in CF.read_store(spark, store, kind, version=1)
                .select("id", "pile")
                .collect()
            }
            for kind in ("nodes", "ways", "relations")
        }
        assert v1 == before
        # pinning the CURRENT version == the default (unpinned) read
        v2n = {
            (r.id, r.pile)
            for r in CF.read_store(spark, store, "nodes", version=2)
            .select("id", "pile")
            .collect()
        }
        assert v2n == after["nodes"]
        # node 1 moved cells in the merge; the pinned read still shows its
        # ORIGINAL coordinate, and node 50 (created by the merge) is absent
        x1 = {r.id: r.x for r in CF.read_store(spark, store, "nodes", version=1).collect()}
        assert x1[1] == px(0)
        assert 50 not in x1

    def test_query_store_pins_data_and_meta(self, spark, tmp_path):
        store, _ = self._merged(spark, tmp_path)
        # bbox covering ONLY the original cell of node 1 (cell 0): the
        # pinned query finds it there, the current query does not (it
        # moved to cell 6) — data, meta and pile pruning all resolve from
        # the one pinned manifest
        w = self.PILE_W
        cell0 = (-4 * w, -(1 << 31), -3 * w - 1, (1 << 31) - 1)
        old = {r.id for r in CF.query_store(spark, store, *cell0, kind="nodes", version=1).collect()}
        cur = {r.id for r in CF.query_store(spark, store, *cell0, kind="nodes").collect()}
        assert 1 in old and 1 not in cur

    def test_history_metrics_and_vacuum_horizon(self, spark, tmp_path):
        store, _ = self._merged(spark, tmp_path)
        hist = CF.store_history(store)
        assert [h["version"] for h in hist] == [1, 2]
        assert hist[1]["current"] and not hist[0]["current"]
        # persisted metrics in the history match an actual count
        assert hist[0]["tables"]["nodes"]["rows"] == 3
        assert hist[1]["tables"]["nodes"]["rows"] == CF.read_store(
            spark, store, "nodes"
        ).count()
        assert hist[0]["tables"]["nodes"]["bytes"] > 0
        # two more merges push v1 behind the GC horizon; vacuum trims its
        # manifest, so history shrinks to the retained window and a pinned
        # read of the expired version fails CLEANLY at manifest resolution
        for i, cell in enumerate((2, 3)):
            recs = [{"op": "upsert", "ftype": "n", "id": 60 + i, "x": px(cell),
                     "y": 9, "tags": None, "seq": 0}]
            ch = write_changes(tmp_path, f"m{i}.json", recs)
            run_merge(spark, ch, store, str(tmp_path / f"ck{i}"))
        # BEFORE vacuum: v1's manifest still exists but commit-time GC may
        # already have freed its files — the pin fails FAST at resolution
        # (ValueError naming the horizon), never mid-scan
        with pytest.raises(ValueError, match="GC horizon"):
            CF.read_store(spark, store, "nodes", version=1)
        with pytest.raises(ValueError, match="GC horizon"):
            CF.store_snapshot_diff(spark, store, "nodes", 1)
        hist4 = CF.store_history(store)
        assert [(h["version"], h["readable"]) for h in hist4] == [
            (1, False), (2, False), (3, True), (4, True),
        ]
        txstore.vacuum_store(store, CF._paths(store), grace_sec=0)
        vs = txstore.list_versions(store)
        assert vs == [3, 4]
        assert [h["version"] for h in CF.store_history(store)] == [3, 4]
        with pytest.raises((OSError, ValueError)):
            CF.read_store(spark, store, "nodes", version=1)
        # the retained window still reads fine after vacuum
        assert CF.read_store(spark, store, "nodes", version=3).count() >= 4

    def test_legacy_store_rejects_time_travel(self, spark, tmp_path):
        store = str(tmp_path / "leg")
        base_store(spark, store, layout="legacy")
        with pytest.raises(ValueError, match="versioned"):
            CF.read_store(spark, store, "nodes", version=1)


class TestSnapshotDiff:
    """store_snapshot_diff — row-level CDC between retained snapshots
    (Iceberg incremental scan / Delta CDF shape).  The partitions to
    compare come from the MANIFEST diff, so the scan is O(changed
    piles); correctness = the diff equals exactly the applied change
    batch."""

    def _merged(self, spark, tmp_path):
        store = str(tmp_path / "s")
        base_store(spark, store)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        return store

    def test_diff_equals_change_batch(self, spark, tmp_path):
        store = self._merged(spark, tmp_path)
        d = CF.store_snapshot_diff(spark, store, "nodes", 1, 2)
        got = {(r.op, r.id, r.x, r.y) for r in d.collect()}
        # MOVE: node 1 px(0)->px(6) (y 1000->5, retagged), node 50 created
        assert got == {
            ("removed", 1, px(0), 1000),
            ("added", 1, px(6), 5),
            ("added", 50, px(7), 7),
        }
        # tags ride along canonicalized (map -> sorted entry array)
        tag = {r.id: r.tags for r in d.filter(F.col("op") == "added").collect()}
        assert [(e["key"], e["value"]) for e in tag[1]] == [("name", "a2")]

    def test_diff_scans_only_changed_partitions(self, spark, tmp_path):
        from gol_tool_spark.kernels.tile import tile_of_point

        store = self._merged(spark, tmp_path)
        d = CF.store_snapshot_diff(spark, store, "nodes", 1, 2)
        changed_piles = {
            int(tile_of_point(px(0), 1000, 3)),   # node 1 left
            int(tile_of_point(px(6), 5, 3)),      # node 1 arrived
            int(tile_of_point(px(7), 7, 3)),      # node 50 created
        }
        scanned = {
            seg.split("=", 1)[1]
            for f in d.inputFiles()
            for seg in f.split("/")
            if seg.startswith("pile=")
        }
        assert scanned  # the plan really is file-list driven
        assert scanned <= {str(p) for p in changed_piles}
        # untouched piles (nodes 2 and 3 never moved) are never read
        untouched = {
            str(int(tile_of_point(px(1), 1000, 3))),
            str(int(tile_of_point(px(5), 1000, 3))),
        }
        assert not (scanned & untouched)

    def test_same_snapshot_diff_is_empty(self, spark, tmp_path):
        store = self._merged(spark, tmp_path)
        assert CF.store_snapshot_diff(spark, store, "nodes", 2, 2).count() == 0

    def test_ways_respread_shows_as_cdc(self, spark, tmp_path):
        store = self._merged(spark, tmp_path)
        d = CF.store_snapshot_diff(spark, store, "ways", 1, 2)
        ops = {(r.op, r.id, r.pile) for r in d.select("op", "id", "pile").collect()}
        # way 10 contains node 1: its copy set changed with the move
        assert any(o == "added" and i == 10 for o, i, _ in ops)
        assert any(o == "removed" and i == 10 for o, i, _ in ops)
        # way 11 (node 3, untouched) produces no diff rows
        assert not any(i == 11 for _, i, _ in ops)


class TestCommitProtocolHardening:
    """Regression tests for the round-5 self-review findings: forward
    CURRENT hints, losable hints + vacuumed v1, vacuum vs in-flight
    transactions, marker lifecycle, and tmp hygiene."""

    def _versions(self, spark, tmp_path, n_extra=0):
        store = str(tmp_path / "s")
        base_store(spark, store)
        ch = write_changes(tmp_path, "c.json", MOVE)
        run_merge(spark, ch, store, str(tmp_path / "ck"))
        for i in range(n_extra):
            recs = [{"op": "upsert", "ftype": "n", "id": 80 + i, "x": px(2),
                     "y": 11 + i, "tags": None, "seq": 0}]
            chx = write_changes(tmp_path, f"x{i}.json", recs)
            run_merge(spark, chx, store, str(tmp_path / f"ckx{i}"))
        return store

    def test_forward_hint_is_validated_not_trusted(self, spark, tmp_path):
        store = self._versions(spark, tmp_path)  # committed: v1, v2
        with open(os.path.join(store, "_manifest", "CURRENT"), "w") as fh:
            fh.write("99")  # crash-reordered / corrupted hint, far ahead
        assert txstore.current_version(store) == 2
        # reads recover without hand-editing anything
        assert CF.read_store(spark, store, "nodes").count() == 4

    def test_store_stays_versioned_without_current_and_v1(self, spark, tmp_path):
        # 4 snapshots -> vacuum trims v1/v2; then the best-effort CURRENT
        # hint is lost (partial restore).  The store must still open as
        # VERSIONED (legacy dynamic overwrites would corrupt the layout).
        store = self._versions(spark, tmp_path, n_extra=2)
        txstore.vacuum_store(store, CF._paths(store), grace_sec=0)
        os.unlink(os.path.join(store, "_manifest", "CURRENT"))
        assert not os.path.exists(os.path.join(store, "_manifest", "v1.json"))
        assert txstore.is_versioned(store)
        assert txstore.current_version(store) == 4
        assert isinstance(
            txstore.open_tx(spark, store, CF._paths(store)), txstore.StoreTx
        )
        assert CF.read_store(spark, store, "nodes").count() == 6

    def test_vacuum_spares_heartbeating_tx_staging(self, spark, tmp_path):
        store = self._versions(spark, tmp_path)
        p = CF._paths(store)
        # simulate an hours-long in-flight tx: old staged file, FRESH marker
        epoch_dir = os.path.join(p["nodes"], "e9-deadbeef", "pile=1")
        os.makedirs(epoch_dir)
        staged = os.path.join(epoch_dir, "part-0.parquet")
        with open(staged, "wb") as fh:
            fh.write(b"x")
        old = 1_000_000.0
        os.utime(staged, (old, old))  # staged long ago
        marker = os.path.join(store, "_manifest", ".inprogress-deadbeef")
        with open(marker, "w") as fh:
            fh.write("1")
        txstore.vacuum_store(store, p, grace_sec=3600)
        assert os.path.exists(staged)  # live tx: spared despite file age
        # tx dies: marker ages out -> staging reclaimed on the next vacuum
        os.utime(marker, (old, old))
        txstore.vacuum_store(store, p, grace_sec=3600)
        assert not os.path.exists(marker)
        assert not os.path.exists(staged)

    def test_marker_lifecycle_and_no_tmp_leaks(self, spark, tmp_path):
        store = self._versions(spark, tmp_path)
        mdir = os.path.join(store, "_manifest")
        names = set(os.listdir(mdir))
        # committed txs removed their markers and temp files
        assert not [n for n in names if n.startswith(".inprogress-")]
        assert not [n for n in names if n.endswith(".tmp")]
        # an open tx holds a marker; commit removes it
        tx = txstore.StoreTx(spark, store, CF._paths(store))
        assert [n for n in os.listdir(mdir) if n.startswith(".inprogress-")]
        tx.commit()
        assert not [
            n for n in os.listdir(mdir) if n.startswith(".inprogress-")
        ]

    def test_garbage_manifest_raises_valueerror_not_assert(self, spark, tmp_path):
        store = self._versions(spark, tmp_path)
        with open(os.path.join(store, "_manifest", "v7.json"), "w") as fh:
            json.dump({"version": 3, "tables": {}}, fh)  # wrong version inside
        assert not txstore._is_committed(store, 7)
        with pytest.raises(ValueError, match="carries version"):
            txstore.load_manifest(store, 7)
        # the probe is not fooled either: current stays 2
        assert txstore.current_version(store) == 2
