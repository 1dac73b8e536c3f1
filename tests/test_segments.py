"""Exact twins for the grid-blocked segment-intersection join.

The brute-force twin runs the identical orientation predicate in Python
big-ints (exact), over every pair — so set equality proves both the
predicate arithmetic AND that the grid blocking loses no candidate pair.
"""

from __future__ import annotations

import pytest

from gol_tool_spark.operators import segments


def _proper(a, b) -> bool:
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b

    def cross(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    d1 = cross(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = cross(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = cross(bx1, by1, bx2, by2, ax1, ay1)
    d4 = cross(bx1, by1, bx2, by2, ax2, ay2)
    return ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
        (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
    )


def _synth_segs(n=400):
    """Python twin of segments.synth_segments over LCG-placed points —
    clustered so crossings actually occur."""
    segs = []
    for i in range(n):
        # points clustered in a few 2^17-wide boxes so segments overlap
        cx = ((i % 7) - 3) * (1 << 27)
        cy = ((i % 5) - 2) * (1 << 27)
        x = cx + (i * 2654435761) % (1 << 17)
        y = cy + (i * 2246822519 + 1013904223) % (1 << 17)
        dx = (i * segments.A_DX) % segments.OFF_MOD - segments.OFF_MOD // 2
        dy = (i * segments.A_DY + segments.C_DY) % segments.OFF_MOD - segments.OFF_MOD // 2
        if dx == 0 and dy == 0:
            dx = 1
        segs.append((i, x, y, x + dx, y + dy))
    return segs


class TestSegmentIntersections:
    def test_matches_bruteforce(self, spark):
        raw = _synth_segs()
        df = spark.createDataFrame(
            [(i, x1, y1) for i, x1, y1, _, _ in raw], "id long, x long, y long"
        )
        got = {
            (r.seg_a, r.seg_b)
            for r in segments.segment_intersections(segments.synth_segments(df)).collect()
        }
        coords = {i: (x1, y1, x2, y2) for i, x1, y1, x2, y2 in raw}
        want = {
            (i, j)
            for i in coords
            for j in coords
            if i < j and _proper(coords[i], coords[j])
        }
        assert got == want
        assert len(want) > 20  # non-vacuous

    def test_hand_cases(self, spark):
        # crossing X; endpoint touch; collinear overlap; parallel
        segs = [
            (1, -10, -10, 10, 10),
            (2, -10, 10, 10, -10),  # crosses 1 at origin
            (3, 10, 10, 20, 0),  # touches 1 at an endpoint -> excluded
            (4, -5, -5, 5, 5),  # collinear with 1 -> excluded
            (5, -10, -9, 10, 11),  # parallel to 1 -> excluded
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {
            (r.seg_a, r.seg_b) for r in segments.segment_intersections(df).collect()
        }
        # 2 also properly crosses the collinear sub-segment 4, and crosses
        # the near-parallel 5 (y = x + 1) at (-0.5, 0.5)
        assert got == {(1, 2), (2, 4), (2, 5)}

    def test_synth_never_degenerate(self, spark):
        df = spark.createDataFrame([(0, 0, 0)], "id long, x long, y long")
        row = segments.synth_segments(df).first()
        assert (row.x1, row.y1) != (row.x2, row.y2)


def _snap_twin(points, segs, cell_shift=16):
    """IEEE-identical brute-force snap: distance to EVERY segment, keep
    pairs within one cell width, min (d2, seg) per point."""
    r2 = float((1 << cell_shift) ** 2)
    best = {}
    for pid, px, py in points:
        for sid, x1, y1, x2, y2 in segs:
            dxs, dys = x2 - x1, y2 - y1
            rx, ry = px - x1, py - y1
            num = dxs * rx + dys * ry
            den = dxs * dxs + dys * dys
            t = min(max(float(num) / float(den), 0.0), 1.0)
            ddx = float(rx) - t * float(dxs)
            ddy = float(ry) - t * float(dys)
            d2 = ddx * ddx + ddy * ddy
            if d2 <= r2:
                k = (d2, sid)
                if pid not in best or k < best[pid]:
                    best[pid] = k
    return {pid: (sid, d2) for pid, (d2, sid) in best.items()}


class TestSnapPoints:
    def test_matches_bruteforce(self, spark):
        raw = _synth_segs()
        # segments from even ids; query points = the odd ids' origins
        seg_rows = [(i, x1, y1, x2, y2) for i, x1, y1, x2, y2 in raw if i % 2 == 0]
        pt_rows = [(i, x1, y1) for i, x1, y1, _, _ in raw if i % 2 == 1]
        segs = spark.createDataFrame(seg_rows, "seg long, x1 long, y1 long, x2 long, y2 long")
        pts = spark.createDataFrame(pt_rows, "id long, x long, y long")
        got = {r.id: (r.seg, r.d2) for r in segments.snap_points(pts, segs).collect()}
        want = _snap_twin(pt_rows, seg_rows)
        assert got == want
        assert len(want) > 50  # non-vacuous
        assert any(d2 > 0 for _, d2 in want.values())

    def test_out_of_range_point_dropped(self, spark):
        segs = spark.createDataFrame(
            [(1, 0, 0, 100, 0)], "seg long, x1 long, y1 long, x2 long, y2 long"
        )
        pts = spark.createDataFrame(
            [(1, 50, 30), (2, 50, (1 << 18))], "id long, x long, y long"
        )
        out = {r.id: (r.seg, r.d2) for r in segments.snap_points(pts, segs).collect()}
        assert out == {1: (1, 900.0)}  # point 2 is beyond one cell width

    def test_endpoint_clamp_and_tiebreak(self, spark):
        # point beyond the segment end -> distance to endpoint (clamped t);
        # two segments at the same distance -> smaller id wins
        segs = spark.createDataFrame(
            [(7, 0, 10, 100, 10), (3, 0, -10, 100, -10)],
            "seg long, x1 long, y1 long, x2 long, y2 long",
        )
        pts = spark.createDataFrame([(1, 50, 0), (2, 140, 10)], "id long, x long, y long")
        out = {r.id: (r.seg, r.d2) for r in segments.snap_points(pts, segs).collect()}
        assert out[1] == (3, 100.0)  # tie at d2=100 -> min seg id
        assert out[2] == (7, 1600.0)  # 40 beyond the (100,10) endpoint


class TestCrossingComponents:
    @staticmethod
    def _uf_twin(segs):
        # union-find over the exact brute-force crossing pairs
        parent = {s[0]: s[0] for s in segs}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    ra, rb = find(a[0]), find(b[0])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        return {s[0]: find(s[0]) for s in segs}

    def test_matches_union_find_twin(self, spark):
        segs = _synth_segs(300)
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: r.comp for r in segments.crossing_components(df).collect()}
        expect = self._uf_twin(segs)
        assert got == expect
        # non-vacuous: some real merging happened AND isolated segs exist
        assert len(set(got.values())) < len(got)
        singles = [s for s, c in got.items() if c == s and list(got.values()).count(c) == 1]
        assert singles

    def test_chain_is_one_component(self, spark):
        # chain of X shapes: seg i properly crosses only its neighbors
        # -> the whole chain contracts to one component
        segs = [
            (i, i * 100, -100 if i % 2 == 0 else 100, (i + 2) * 100, 100 if i % 2 == 0 else -100)
            for i in range(6)
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: r.comp for r in segments.crossing_components(df).collect()}
        expect = self._uf_twin(segs)
        assert got == expect
        assert set(got.values()) == {0}  # the chain contracts to one comp

    def test_isolated_are_singletons(self, spark):
        segs = [(1, 0, 0, 10, 10), (2, 1000, 1000, 1010, 1010), (3, -500, 7, -400, 7)]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: r.comp for r in segments.crossing_components(df).collect()}
        assert got == {1: 1, 2: 2, 3: 3}


class TestCrossingTriangles:
    @staticmethod
    def _tri_twin(segs):
        # brute-force triangle census over the exact crossing pairs
        ids = [s[0] for s in segs]
        adj = {i: set() for i in ids}
        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    adj[a[0]].add(b[0])
                    adj[b[0]].add(a[0])
        out = {}
        for v in ids:
            if not adj[v]:
                continue
            nb = sorted(adj[v])
            tri = sum(
                1
                for i, p in enumerate(nb)
                for q in nb[i + 1:]
                if q in adj[p]
            )
            out[v] = (len(adj[v]), tri)
        return out

    def test_matches_bruteforce(self, spark):
        # the LCG synth segments are too sparse to form triangles (115
        # crossings, 0 triangles at n=800) — mix in dense random chords
        # of one box, which pairwise-cross constantly
        segs = list(_synth_segs(200))
        base = 10_000
        for i in range(60):
            a = (i * 48271 + 11) % 400
            b = (i * 69621 + 137) % 400
            segs.append(
                (base + i, -200 + a, -250, -200 + b, 250)
                if i % 2 == 0
                else (base + i, -250, -200 + a, 250, -200 + b)
            )
        # one remote lone crossing guarantees a tri-free graph node
        segs += [(20001, 900000, -50, 900000, 50), (20002, 899950, 0, 900050, 0)]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: (r.deg, r.tri) for r in segments.crossing_triangles(df).collect()}
        expect = self._tri_twin(segs)
        assert got == expect
        assert any(v[1] > 0 for v in got.values())  # non-vacuous: triangles exist
        assert got[20001] == (1, 0)  # and tri-free nodes too

    def test_three_mutual_crossings(self, spark):
        # a hash-sign triangle: three long segments pairwise crossing
        segs = [
            (1, -100, 10, 100, 20),    # ~horizontal
            (2, -10, -100, 20, 100),   # ~vertical
            (3, -100, 80, 100, -80),   # diagonal crosses both
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: (r.deg, r.tri) for r in segments.crossing_triangles(df).collect()}
        assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}

    def test_wedge_without_closure(self, spark):
        # V shape: 2 crosses 1 and 3, but 1 never crosses 3 -> no triangle
        segs = [
            (1, -100, 10, 0, 10),
            (2, -60, -50, -40, 50),
            (3, -100, -30, 0, -30),
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: (r.deg, r.tri) for r in segments.crossing_triangles(df).collect()}
        assert got == {1: (1, 0), 2: (2, 0), 3: (1, 0)}

    def test_isolated_emit_nothing(self, spark):
        segs = [(1, 0, 0, 10, 10), (2, 1000, 1000, 1010, 1010)]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        assert segments.crossing_triangles(df).collect() == []


class TestCrossingKcore:
    @staticmethod
    def _peel_twin(segs, k, rounds):
        adj = {s[0]: set() for s in segs}
        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    adj[a[0]].add(b[0])
                    adj[b[0]].add(a[0])
        live = {v for v, nb in adj.items() if nb}
        for _ in range(rounds):
            keep = {v for v in live if len(adj[v] & live) >= k}
            live = keep
        return {v: len(adj[v] & live) for v in live}

    def _dense_fixture(self):
        segs = list(_synth_segs(200))
        base = 10_000
        for i in range(40):
            a = (i * 48271 + 11) % 400
            b = (i * 69621 + 137) % 400
            segs.append(
                (base + i, -200 + a, -250, -200 + b, 250)
                if i % 2 == 0
                else (base + i, -250, -200 + a, 250, -200 + b)
            )
        return segs

    def test_matches_peel_twin(self, spark):
        segs = self._dense_fixture()
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        for k, rounds in ((2, 0), (3, 1), (3, 4), (5, 4)):
            got = {
                r.seg: r.deg
                for r in segments.crossing_kcore(df, k=k, max_rounds=rounds).collect()
            }
            assert got == self._peel_twin(segs, k, rounds), (k, rounds)
        full = self._peel_twin(segs, 3, 4)
        assert full and all(d >= 3 for d in full.values())  # converged core

    def test_chain_peels_to_nothing(self, spark):
        # X-shape chain: every node has degree <= 2, so the 3-core is
        # empty after enough rounds (ends peel first, then inward)
        segs = [
            (i, i * 100, -100 if i % 2 == 0 else 100, (i + 2) * 100, 100 if i % 2 == 0 else -100)
            for i in range(8)
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        assert segments.crossing_kcore(df, k=3, max_rounds=2).collect() == []
        got = {r.seg: r.deg for r in segments.crossing_kcore(df, k=2, max_rounds=4).collect()}
        assert got == self._peel_twin(segs, 2, 4)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1, 1)], "seg long, x1 long, y1 long, x2 long, y2 long")
        with pytest.raises(ValueError):
            segments.crossing_kcore(df, k=0)
        with pytest.raises(ValueError):
            segments.crossing_kcore(df, max_rounds=-1)


class TestCrossingHops:
    @staticmethod
    def _bfs_twin(segs, seed_ids, rounds):
        adj = {s[0]: set() for s in segs}
        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    adj[a[0]].add(b[0])
                    adj[b[0]].add(a[0])
        dist = {s: 0 for s in seed_ids}
        frontier = set(seed_ids)
        for r in range(1, rounds + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = r
                        nxt.add(v)
            frontier = nxt
        return dist

    def test_matches_bfs_twin(self, spark):
        # the dense chord fixture: the LCG graph alone is too sparse for
        # seeds to border non-seeds
        segs = TestCrossingKcore._dense_fixture(TestCrossingKcore())
        seed_ids = [s[0] for s in segs if s[0] % 9 == 0]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(s,) for s in seed_ids], "seg long")
        for rounds in (0, 1, 3):
            got = {
                r.seg: r.hops
                for r in segments.crossing_hops(df, sdf, max_rounds=rounds).collect()
            }
            assert got == self._bfs_twin(segs, seed_ids, rounds), rounds
        full = self._bfs_twin(segs, seed_ids, 3)
        assert any(h > 0 for h in full.values())  # expansion happened

    def test_chain_layers(self, spark):
        # X-chain: seed at one end, hops grow along the chain and stop
        # at the round bound
        segs = [
            (i, i * 100, -100 if i % 2 == 0 else 100, (i + 2) * 100, 100 if i % 2 == 0 else -100)
            for i in range(8)
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(0,)], "seg long")
        got = {r.seg: r.hops for r in segments.crossing_hops(df, sdf, max_rounds=2).collect()}
        assert got == self._bfs_twin(segs, [0], 2)
        assert got[0] == 0 and max(got.values()) == 2

    def test_isolated_seed_reports_zero(self, spark):
        segs = [(1, 0, 0, 10, 10), (2, 1000, 1000, 1010, 1010)]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(2,)], "seg long")
        got = {r.seg: r.hops for r in segments.crossing_hops(df, sdf, max_rounds=3).collect()}
        assert got == {2: 0}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1, 1)], "seg long, x1 long, y1 long, x2 long, y2 long")
        with pytest.raises(ValueError):
            segments.crossing_hops(df, df.select("seg"), max_rounds=-1)


class TestCrossingSssp:
    @staticmethod
    def _bf_twin(segs, seed_ids, rounds):
        # round-bounded Bellman-Ford: d_r(v) = cheapest path from any
        # seed using <= r crossings; entering v costs v's L1 length
        wt = {s[0]: abs(s[3] - s[1]) + abs(s[4] - s[2]) for s in segs}
        adj = {s[0]: set() for s in segs}
        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    adj[a[0]].add(b[0])
                    adj[b[0]].add(a[0])
        dist = {s: 0 for s in seed_ids}
        for _ in range(rounds):
            nxt = dict(dist)
            for u, du in dist.items():
                for v in adj.get(u, ()):
                    c = du + wt[v]
                    if v not in nxt or c < nxt[v]:
                        nxt[v] = c
            dist = nxt
        return dist

    def test_matches_bellman_ford_twin(self, spark):
        segs = TestCrossingKcore._dense_fixture(TestCrossingKcore())
        seed_ids = [s[0] for s in segs if s[0] % 9 == 0]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(s,) for s in seed_ids], "seg long")
        for rounds in (0, 1, 3):
            got = {
                r.seg: r.dist
                for r in segments.crossing_sssp(df, sdf, max_rounds=rounds).collect()
            }
            assert got == self._bf_twin(segs, seed_ids, rounds), rounds
        full = self._bf_twin(segs, seed_ids, 3)
        assert any(d > 0 for d in full.values())  # expansion happened

    def test_cheaper_long_way_beats_direct_hop(self, spark):
        # hub H is crossed directly by an EXPENSIVE segment and also
        # reachable via two cheap ones: round 1 pays the expensive entry,
        # round 2 must undercut it — the case plain BFS cannot express
        segs = [
            (0, 0, 0, 0, 1000),        # seed, vertical
            (1, -10, 500, 4000, 500),  # expensive horizontal, crosses seed & hub
            (2, -10, 100, 30, 100),    # cheap horizontal, crosses seed
            (3, 20, 90, 20, 610),      # cheap vertical, crosses 2 and 4
            (4, -10, 600, 4000, 600),  # "hub": expensive but entered cheaply via 3
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(0,)], "seg long")
        r1 = {r.seg: r.dist for r in segments.crossing_sssp(df, sdf, max_rounds=1).collect()}
        r3 = {r.seg: r.dist for r in segments.crossing_sssp(df, sdf, max_rounds=3).collect()}
        assert r1 == self._bf_twin(segs, [0], 1)
        assert r3 == self._bf_twin(segs, [0], 3)
        assert r3[4] == r1[4]  # both reach 4; entry cost is 4's own length either way
        assert r3[1] == r1[1] and r1[1] == abs(4000 - (-10))  # direct expensive entry
        # monotone: more rounds never increase any distance
        assert all(r3[k] <= v for k, v in r1.items())

    def test_isolated_seed_reports_zero(self, spark):
        segs = [(1, 0, 0, 10, 10), (2, 1000, 1000, 1010, 1010)]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        sdf = spark.createDataFrame([(2,)], "seg long")
        got = {r.seg: r.dist for r in segments.crossing_sssp(df, sdf, max_rounds=3).collect()}
        assert got == {2: 0}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1, 1)], "seg long, x1 long, y1 long, x2 long, y2 long")
        with pytest.raises(ValueError):
            segments.crossing_sssp(df, df.select("seg"), max_rounds=-1)


class TestWalkCounts:
    @staticmethod
    def _twin(segs, k):
        adj = {s[0]: set() for s in segs}
        for i, a in enumerate(segs):
            for b in segs[i + 1:]:
                if _proper(a[1:], b[1:]):
                    adj[a[0]].add(b[0])
                    adj[b[0]].add(a[0])
        w = {s[0]: 1 for s in segs}
        for _ in range(k):
            w = {v: sum(w[u] for u in adj[v]) for v in adj}
        return w

    def test_matches_matvec_twin(self, spark):
        segs = TestCrossingKcore._dense_fixture(TestCrossingKcore())
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        for k in (0, 1, 3):
            got = {
                r.seg: r.walks
                for r in segments.crossing_walk_counts(df, k=k).collect()
            }
            assert got == self._twin(segs, k), k
        w3 = self._twin(segs, 3)
        assert max(w3.values()) > 1  # walks actually multiply

    def test_isolated_zero_and_path_counts(self, spark):
        # path graph a-b-c (+ isolated d): length-2 walks ending at an
        # end are a->b->a and c->b->a (2 each), at the middle b->a->b and
        # b->c->b (2); the isolated segment reports 0
        segs = [
            (0, 0, 0, 0, 200), (1, -10, 100, 210, 100), (2, 200, 0, 200, 200),
            (3, 5000, 5000, 5100, 5100),
        ]
        df = spark.createDataFrame(segs, "seg long, x1 long, y1 long, x2 long, y2 long")
        got = {r.seg: r.walks for r in segments.crossing_walk_counts(df, k=2).collect()}
        assert got == {0: 2, 1: 2, 2: 2, 3: 0}
        got1 = {r.seg: r.walks for r in segments.crossing_walk_counts(df, k=1).collect()}
        assert got1 == {0: 1, 1: 2, 2: 1, 3: 0}  # k=1 is plain degree

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1, 1)], "seg long, x1 long, y1 long, x2 long, y2 long")
        with pytest.raises(ValueError):
            segments.crossing_walk_counts(df, k=-1)
